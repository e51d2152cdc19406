"""Arrow-batched pandas-UDF kernel: validate a column of raw JSON text
against a compiled spec.

This is the fallback path for constraints a native ``Column`` cannot express
(recursive specs over free-form JSON, composite enum variants, ...). Data
crosses the JVM↔Python boundary once per Arrow batch — never per row.

The spec travels to executors as its *source JSON text* (tiny, stable), and
each executor process compiles it exactly once (module-level cache keyed by
text), mirroring the reference's compile-once contract
(/root/reference/compiler.go:48-247) in a distributed setting.
"""

from __future__ import annotations

import json
from decimal import Decimal
from fractions import Fraction
from typing import Optional

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SCHEMA_CACHE: dict = {}

VERDICT_TYPE = T.StructType(
    [
        T.StructField("valid", T.BooleanType(), False),
        T.StructField("n_violations", T.IntegerType(), False),
        T.StructField("first_path", T.StringType(), True),
        T.StructField("first_keyword", T.StringType(), True),
        T.StructField("first_message", T.StringType(), True),
    ]
)


def _compiled(spec_text: str):
    compiled = _SCHEMA_CACHE.get(spec_text)
    if compiled is None:
        # local import keeps executor-side deserialization lean
        from jsonschema_spark.spec.compile import compile_spec

        compiled = compile_spec(spec_text)
        _SCHEMA_CACHE[spec_text] = compiled
    return compiled


def _as_json_value(v):
    """Arrow/pandas cell → the evaluator's JSON value model. Numeric
    columns arrive as numpy scalars (and nullable ints as float64 NaN),
    decimals as decimal.Decimal — convert to int/float/Fraction so the
    pure-Python evaluator's exact-Fraction arithmetic applies (reference
    big.Rat semantics, internal/jsonequal/equal.go:39-79)."""
    import math

    if v is None:
        return None
    if isinstance(v, bool) or type(v) in (int, str, Fraction):
        return v
    if isinstance(v, float):
        return None if math.isnan(v) else v  # NaN = Arrow's null promotion
    import numpy as np

    if isinstance(v, np.generic):
        return _as_json_value(v.item())
    if isinstance(v, Decimal):
        return Fraction(v)
    if isinstance(v, (list, tuple, np.ndarray)):
        return [_as_json_value(x) for x in v]
    if isinstance(v, dict):
        return {k: _as_json_value(x) for k, x in v.items()}
    return v


def json_validation_kernel(spec: dict | str, doc_col: Column) -> Column:
    """Return a struct column ``(valid, n_violations, first_path,
    first_keyword, first_message)`` for each JSON document in ``doc_col``.

    NULL documents are treated as JSON ``null`` instances (consistent with
    the typed-column convention in compiler/columns.py).
    """
    spec_text = spec if isinstance(spec, str) else json.dumps(spec)

    @F.pandas_udf(VERDICT_TYPE)
    def _validate(batch: pd.Series) -> pd.DataFrame:
        from jsonschema_spark.spec.evaluate import validate_json, validate_value

        compiled = _compiled(spec_text)
        valid, nviol, paths, keywords, messages = [], [], [], [], []
        for text in batch:
            if text is None:
                violations = validate_value(compiled, None)
            else:
                violations = validate_json(compiled, text)
            valid.append(not violations)
            nviol.append(len(violations))
            first = violations[0] if violations else None
            paths.append(first.path if first else None)
            keywords.append(first.keyword if first else None)
            messages.append(first.message if first else None)
        return pd.DataFrame(
            {
                "valid": valid,
                "n_violations": nviol,
                "first_path": paths,
                "first_keyword": keywords,
                "first_message": messages,
            }
        )

    return _validate(doc_col)


def value_validation_kernel(spec: dict | str, value_col: Column) -> Column:
    """Boolean validity of a *raw typed value* column (NOT JSON text)
    against a compiled spec — the fallback when the native lowering refuses
    a string-column check (e.g. the regex dialect gate): the cell value is
    validated as a JSON string instance with the pure-Python evaluator, so
    kernel semantics match the evaluator exactly. Arrow-batched; used only
    for the rare checks the gate diverts off the codegen fast path."""
    spec_text = spec if isinstance(spec, str) else json.dumps(spec)

    @F.pandas_udf(T.BooleanType())
    def _validate(batch: pd.Series) -> pd.Series:
        from jsonschema_spark.spec.evaluate import validate_value

        compiled = _compiled(spec_text)
        return pd.Series(
            [not validate_value(compiled, _as_json_value(v)) for v in batch]
        )

    return _validate(value_col)


def multi_spec_validity_kernel(specs: list, idx_col: Column, doc_col: Column) -> Column:
    """Boolean validity of each JSON document against ``specs[idx]``.

    One Arrow-batched kernel serving many specs at once — used by the suite
    parity harness (557 cases in one Spark job) and by multi-tenant
    validation jobs where different row groups carry different contracts.
    """
    specs_text = [s if isinstance(s, str) else json.dumps(s) for s in specs]

    @F.pandas_udf(T.BooleanType())
    def _validate(idx: pd.Series, docs: pd.Series) -> pd.Series:
        from jsonschema_spark.spec.evaluate import validate_json, validate_value

        compiled = [_compiled(t) for t in specs_text]
        out = []
        for i, text in zip(idx, docs):
            schema = compiled[int(i)]
            if text is None:
                out.append(not validate_value(schema, None))
            else:
                out.append(not validate_json(schema, text))
        return pd.Series(out)

    return _validate(idx_col, doc_col)
