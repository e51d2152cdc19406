"""Native VariantType lowering for free-form JSON columns (Spark 4).

The kernel path (compiler/kernel.py) re-parses every JSON document in
Python per Arrow batch. Spark 4's variant encoding moves that work
JVM-side: ``try_parse_json`` parses once in the scan stage, and
type/required/pointer probes lower to ``try_variant_get`` /
``schema_of_variant`` expressions that stay inside whole-stage codegen —
no Python anywhere. SURVEY §1.4 names this mapping; the reference
validates parsed documents one at a time (/root/reference/validate.go),
so this is the table-scale equivalent of its type/required/bounds walk.

Supported subset (everything else raises LoweringError and the caller
falls back to the kernel): root ``type: object``, ``required``, nested
``properties`` with scalar ``type`` gates (integer-by-value semantics),
``minimum``/``maximum`` (+exclusive), ``minLength``/``maxLength``, and
root-level ``additionalProperties: false`` (via ``json_object_keys``).

Measured semantics this module is built on (probed on pyspark 4.1.2):

- absent member -> ``try_variant_get(..., 'variant')`` is SQL NULL;
  a JSON ``null`` member is PRESENT (``is_variant_null`` = true, VOID)
- ``schema_of_variant`` yields BIGINT / DECIMAL(p,s) / DOUBLE / STRING /
  BOOLEAN / OBJECT<...> / ARRAY<...> / VOID per value
- numeric casts coerce (5.5 -> long 5 truncates; "str" -> long NULL), so
  type checks must come from ``schema_of_variant``, never from a cast
  succeeding; values keep exactness through decimal(38,18) and fall back
  to double beyond it (1e40 -> decimal NULL, double 1e40)
"""

from __future__ import annotations

import json

from pyspark.sql import Column
from pyspark.sql import functions as F

from jsonschema_spark.compiler.columns import LoweringError, _fraction_literal
from jsonschema_spark.spec.compile import compile_spec
from jsonschema_spark.spec.model import CompiledSchema

_SCALAR_UNSUPPORTED = (
    "enum", "all_of", "any_of", "one_of", "not_", "multiple_of", "pattern",
    "min_items", "max_items", "unique_items", "items", "additional_items",
    "pattern_properties", "dependencies", "min_properties", "max_properties",
)


def _require_subset(s: CompiledSchema, *, root: bool) -> None:
    for attr in _SCALAR_UNSUPPORTED:
        v = getattr(s, attr)
        if v not in (None, False, [], {}, ()):
            raise LoweringError(f"variant path does not lower {attr!r}")
    if s.ref is not None:
        raise LoweringError("variant path does not lower $ref")
    if s.additional_properties not in (None, True) and not (
        root and s.additional_properties is False
    ):
        raise LoweringError(
            "variant path lowers additionalProperties:false at root only"
        )


def _member_type(m: Column) -> Column:
    return F.schema_of_variant(m)


def _number_pred(s: CompiledSchema, m: Column) -> Column:
    """Bound comparisons on a member known (by the caller's type gate or
    the when-guard here) to be numeric: exact through decimal(38,18),
    double beyond it."""
    dec = F.try_variant_get(m, "$", "decimal(38,18)")
    dbl = F.try_variant_get(m, "$", "double")

    def cmp(op) -> Column:
        return F.when(dec.isNotNull(), op(dec)).otherwise(op(dbl))

    pred = F.lit(True)
    if s.minimum is not None:
        b = _fraction_literal(s.minimum)
        pred = pred & cmp((lambda x: x > b) if s.exclusive_minimum else (lambda x: x >= b))
    if s.maximum is not None:
        b = _fraction_literal(s.maximum)
        pred = pred & cmp((lambda x: x < b) if s.exclusive_maximum else (lambda x: x <= b))
    return pred


def _scalar_pred(s: CompiledSchema, m: Column) -> Column:
    """Predicate for one present member variant ``m``."""
    _require_subset(s, root=False)
    if s.properties or s.required:
        raise LoweringError("nested objects lower via pointer paths, not here")
    t = _member_type(m)
    is_num = t.isin("BIGINT", "DOUBLE", "FLOAT") | t.startswith("DECIMAL")
    pred = F.lit(True)

    if s.types:
        type_ok = F.lit(False)
        for name in s.types:
            if name == "string":
                type_ok = type_ok | (t == "STRING")
            elif name == "boolean":
                type_ok = type_ok | (t == "BOOLEAN")
            elif name == "null":
                type_ok = type_ok | F.is_variant_null(m)
            elif name == "number":
                type_ok = type_ok | is_num
            elif name == "integer":
                # integer-by-value (draft-4 / reference semantics): 5.0 is
                # an integer; JSON admits no NaN/inf so floor-equality is safe
                dbl = F.try_variant_get(m, "$", "double")
                type_ok = type_ok | (is_num & (dbl == F.floor(dbl)))
            else:
                raise LoweringError(f"variant path does not gate type {name!r}")
        pred = pred & type_ok

    if s.minimum is not None or s.maximum is not None:
        # draft-4: numeric keywords constrain numbers only
        pred = pred & F.when(is_num, _number_pred(s, m)).otherwise(F.lit(True))
    if s.min_length is not None or s.max_length is not None:
        sv = F.try_variant_get(m, "$", "string")
        ln = F.length(sv)
        str_ok = F.lit(True)
        if s.min_length is not None:
            str_ok = str_ok & (ln >= s.min_length)
        if s.max_length is not None:
            str_ok = str_ok & (ln <= s.max_length)
        pred = pred & F.when(t == "STRING", str_ok).otherwise(F.lit(True))
    return pred


def _object_pred(
    s: CompiledSchema, v: Column, path: str, text_col: Column | None
) -> Column:
    """Predicate over the (sub)object at variant path ``path``."""
    _require_subset(s, root=path == "$")
    if s.types and s.types != frozenset({"object"}):
        raise LoweringError("variant object path requires type: object")
    t = _member_type(v)
    pred = t.startswith("OBJECT")

    for name in s.required:
        pred = pred & F.try_variant_get(v, f"{path}.{name}", "variant").isNotNull()

    for name, child in s.properties.items():
        cpath = f"{path}.{name}"
        m = F.try_variant_get(v, cpath, "variant")
        target = child.ref if child.ref is not None else child
        if target.properties or target.required or target.types == frozenset({"object"}):
            member_ok = _object_pred(target, m, "$", None)
        else:
            member_ok = _scalar_pred(target, m)
        pred = pred & F.when(m.isNull(), F.lit(True)).otherwise(
            F.coalesce(member_ok, F.lit(False))
        )

    if s.additional_properties is False:
        if text_col is None:
            raise LoweringError(
                "variant path lowers additionalProperties:false at root only"
            )
        known = F.array(*[F.lit(k) for k in s.properties]) if s.properties else (
            F.array().cast("array<string>")
        )
        keys = F.json_object_keys(text_col)
        pred = pred & F.coalesce(
            F.forall(keys, lambda k: F.array_contains(known, k)), F.lit(False)
        )
    return pred


def variant_validation_predicate(spec: dict | str, text_col: Column) -> Column:
    """Boolean validity of a free-form JSON text column against a draft-4
    spec (supported subset), lowered to native variant expressions: one
    ``try_parse_json`` in the scan stage, then pure codegen probes.
    Malformed JSON and SQL NULL both fail the root ``type: object`` gate,
    matching the kernel's verdict on the same inputs
    (tests/test_variant_path.py pins kernel/variant/evaluator parity)."""
    compiled = compile_spec(json.loads(spec) if isinstance(spec, str) else spec)
    target = compiled.ref if compiled.ref is not None else compiled
    if not target.types:
        raise LoweringError("variant path requires an explicit root type: object")
    v = F.try_parse_json(text_col)
    return F.coalesce(_object_pred(target, v, "$", text_col), F.lit(False))
