"""Seeded differential fuzzing: random specs x random typed values, the
pure-Python evaluator (ground truth, suite-verified) vs the Spark Column
lowering — verdicts must agree exactly. Complements the official suite with
combinations it doesn't enumerate (bound+enum+combinator interactions,
nested arrays, null placement). Deterministic seed -> reproducible."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from jsonschema_spark.compiler.columns import LoweringError, lower_predicate
from jsonschema_spark.spec.compile import compile_spec
from jsonschema_spark.spec.evaluate import is_valid

rng = random.Random(20260817)


def _num_spec():
    spec = {}
    if rng.random() < 0.6:
        spec["type"] = rng.choice(["integer", "number", ["integer", "number"]])
    if rng.random() < 0.6:
        spec["minimum"] = rng.choice([0, -5, 3, 2.5, 7])
        if rng.random() < 0.4:
            spec["exclusiveMinimum"] = True
    if rng.random() < 0.6:
        spec["maximum"] = rng.choice([10, 4, 100, 6.5])
        if rng.random() < 0.4:
            spec["exclusiveMaximum"] = True
    if rng.random() < 0.3:
        spec["multipleOf"] = rng.choice([1, 2, 3, 0.5])
    if rng.random() < 0.25:
        spec["enum"] = rng.sample([0, 1, 2, 3, 5, 8, 13, 2.5], k=rng.randint(1, 4))
    if rng.random() < 0.2:
        spec["not"] = {"minimum": rng.choice([2, 5])}
    if rng.random() < 0.2:
        spec["anyOf"] = [{"maximum": 2}, {"minimum": rng.choice([6, 8])}]
    return spec


def _str_spec():
    spec = {}
    if rng.random() < 0.5:
        spec["type"] = "string"
    if rng.random() < 0.6:
        spec["minLength"] = rng.randint(0, 4)
    if rng.random() < 0.6:
        spec["maxLength"] = rng.randint(2, 8)
    if rng.random() < 0.4:
        spec["pattern"] = rng.choice(["^a", "b$", "a.c", "^[ab]+$"])
    if rng.random() < 0.25:
        spec["enum"] = rng.sample(["a", "ab", "abc", "b", "ça"], k=rng.randint(1, 3))
    if rng.random() < 0.2:
        spec["oneOf"] = [{"minLength": 2}, {"pattern": "^z"}]
    return spec


def _arr_spec():
    spec = {}
    if rng.random() < 0.5:
        spec["type"] = "array"
    if rng.random() < 0.5:
        spec["minItems"] = rng.randint(0, 2)
    if rng.random() < 0.5:
        spec["maxItems"] = rng.randint(2, 5)
    if rng.random() < 0.5:
        spec["uniqueItems"] = True
    if rng.random() < 0.7:
        spec["items"] = _num_spec() or {"minimum": 0}
    return spec


def _num_values():
    return [rng.choice([None, -7, -5, 0, 1, 2, 3, 4, 5, 6, 7, 8, 10, 13, 2.5, 6.5, 3.0, -0.5, 100])
            for _ in range(40)]


def _str_values():
    return [rng.choice([None, "", "a", "ab", "abc", "abcd", "b", "z", "zz", "ça", "aXc", "bbbb", "abababab"])
            for _ in range(40)]


def _arr_values():
    out = []
    for _ in range(40):
        if rng.random() < 0.1:
            out.append(None)
        else:
            n = rng.randint(0, 5)
            out.append([rng.choice([0, 1, 2, 3, 5, 5, -2, 7]) for _ in range(n)])
    return out


@pytest.mark.parametrize("kind,dtype,mk_spec,mk_vals", [
    ("num-int", T.IntegerType(), _num_spec, lambda: [v for v in _num_values() if v is None or isinstance(v, int)]),
    ("num-double", T.DoubleType(), _num_spec, _num_values),
    ("string", T.StringType(), _str_spec, _str_values),
    ("array", T.ArrayType(T.IntegerType()), _arr_spec, _arr_values),
])
def test_differential(spark, kind, dtype, mk_spec, mk_vals):
    """200 random specs per kind; each evaluated over a 40-value column in
    ONE Spark job per kind (specs become parallel predicate columns)."""
    cases = []
    for _ in range(200):
        spec_dict = mk_spec()
        if not spec_dict:
            continue
        compiled = compile_spec(spec_dict)
        cases.append((spec_dict, compiled))

    values = mk_vals()
    schema = T.StructType([T.StructField("v", dtype)])
    df = spark.createDataFrame(
        [(float(v),) if isinstance(v, (int, float)) and isinstance(dtype, T.DoubleType)
         and v is not None else (v,) for v in values],
        schema,
    )
    preds = []
    kept = []
    for i, (spec_dict, compiled) in enumerate(cases):
        try:
            preds.append(lower_predicate(compiled, F.col("v"), dtype).alias(f"p{i}"))
            kept.append((i, spec_dict, compiled))
        except LoweringError:
            continue
    rows = df.select(F.col("v"), *preds).collect()
    mismatches = []
    for row, value in zip(rows, values):
        pyval = float(value) if isinstance(dtype, T.DoubleType) and value is not None and isinstance(value, (int, float)) else value
        for i, spec_dict, compiled in kept:
            want = is_valid(compiled, pyval)
            got = row[f"p{i}"]
            if want != got:
                mismatches.append((spec_dict, value, want, got))
    assert not mismatches, f"{len(mismatches)} disagreements, first 3: {mismatches[:3]}"


def _obj_spec():
    spec = {}
    if rng.random() < 0.4:
        spec["type"] = "object"
    props = {}
    for name in ("a", "b", "c"):
        if rng.random() < 0.5:
            props[name] = rng.choice([
                {"type": "integer", "minimum": 0},
                {"minimum": 2},
                {"maximum": 5},
                {"enum": [1, 2, 3]},
                {"not": {"minimum": 4}},
            ])
    if props:
        spec["properties"] = props
    if rng.random() < 0.5:
        spec["required"] = rng.sample(["a", "b", "c"], k=rng.randint(1, 2))
    if rng.random() < 0.3:
        spec["dependencies"] = {"a": rng.sample(["b", "c"], k=rng.randint(1, 2))}
    if rng.random() < 0.3:
        spec["minProperties"] = rng.randint(0, 2)
    if rng.random() < 0.3:
        spec["maxProperties"] = rng.randint(1, 3)
    return spec


def _obj_values():
    out = []
    for _ in range(40):
        if rng.random() < 0.08:
            out.append(None)
        else:
            out.append({
                name: rng.choice([None, 0, 1, 2, 3, 4, 5, 6])
                for name in ("a", "b", "c") if rng.random() < 0.75
            })
    return out


def test_differential_struct(spark):
    """Object keywords over a typed struct column: NULL field == absent
    member (documented bridge); evaluator runs on the dict-with-absences
    view, lowering on the struct."""
    dtype = T.StructType([T.StructField(n, T.IntegerType()) for n in "abc"])
    cases = []
    for _ in range(200):
        spec_dict = _obj_spec()
        if spec_dict:
            cases.append((spec_dict, compile_spec(spec_dict)))
    values = _obj_values()
    rows = [
        (None,) if v is None
        else ((v.get("a"), v.get("b"), v.get("c")),)
        for v in values
    ]
    df = spark.createDataFrame(rows, T.StructType([T.StructField("v", dtype)]))
    preds, kept = [], []
    for i, (spec_dict, compiled) in enumerate(cases):
        try:
            preds.append(lower_predicate(compiled, F.col("v"), dtype).alias(f"p{i}"))
            kept.append((i, spec_dict, compiled))
        except LoweringError:
            continue
    out = df.select(*preds).collect()
    mismatches = []
    for row, v in zip(out, values):
        # struct-column semantics: NULL field == absent member
        pyv = None if v is None else {k: x for k, x in v.items() if x is not None}
        for i, spec_dict, compiled in kept:
            want = is_valid(compiled, pyv)
            got = row[f"p{i}"]
            if want != got:
                mismatches.append((spec_dict, v, want, got))
    assert not mismatches, f"{len(mismatches)} disagreements, first 3: {mismatches[:3]}"


def test_differential_map(spark):
    """Object keywords over map<string,int>: absent-vs-null preserved, so
    the evaluator sees the dict verbatim (None values stay)."""
    dtype = T.MapType(T.StringType(), T.IntegerType())
    cases = []
    for _ in range(200):
        spec_dict = _obj_spec()
        if spec_dict:
            cases.append((spec_dict, compile_spec(spec_dict)))
    values = _obj_values()
    df = spark.createDataFrame([(v,) for v in values],
                               T.StructType([T.StructField("v", dtype)]))
    preds, kept = [], []
    for i, (spec_dict, compiled) in enumerate(cases):
        try:
            preds.append(lower_predicate(compiled, F.col("v"), dtype).alias(f"p{i}"))
            kept.append((i, spec_dict, compiled))
        except LoweringError:
            continue
    out = df.select(*preds).collect()
    mismatches = []
    for row, v in zip(out, values):
        for i, spec_dict, compiled in kept:
            want = is_valid(compiled, v)
            got = row[f"p{i}"]
            if want != got:
                mismatches.append((spec_dict, v, want, got))
    assert not mismatches, f"{len(mismatches)} disagreements, first 3: {mismatches[:3]}"


def test_render_fuzz_no_crash():
    """Every violation from 400 random spec×value evaluations renders to
    a reference-format string without raising (the render dispatch must
    be total over whatever the fuzz grammar produces — a narrower
    property than the keyword-exact pins in test_render_errors.py, over
    far more shapes; this leg caught the double-quoted-repr key bug)."""
    from jsonschema_spark.spec.evaluate import validate_value
    from jsonschema_spark.spec.render import render_reference_error

    legs = [
        (_num_spec, _num_values),
        (_str_spec, _str_values),
        (_arr_spec, _arr_values),
        (_obj_spec, _obj_values),
    ]
    n_rendered = 0
    for mk_spec, mk_vals in legs:
        for _ in range(100):
            spec_dict = mk_spec()
            if not spec_dict:
                continue
            compiled = compile_spec(spec_dict)
            for value in mk_vals()[:10]:
                for v in validate_value(compiled, value):
                    out = render_reference_error(value, v)
                    assert out and isinstance(out, str)
                    n_rendered += 1
    assert n_rendered > 500, n_rendered
