"""VariantType path (Spark 4) parity: the native variant lowering must
agree with the Arrow kernel AND the pure-Python evaluator on every
document, including the traps the probe run surfaced (numeric casts
coerce, JSON null members are present, 5.0 is an integer by value)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from jsonschema_spark.compiler.columns import LoweringError
from jsonschema_spark.compiler.kernel import json_validation_kernel
from jsonschema_spark.compiler.variant import variant_validation_predicate
from jsonschema_spark.spec.compile import compile_spec
from jsonschema_spark.spec.evaluate import validate_json

SPEC = {
    "type": "object",
    "required": ["k"],
    "properties": {
        "k": {"type": "integer", "minimum": 0, "maximum": 80},
        "s": {"type": "string", "minLength": 2, "maxLength": 4},
        "x": {"minimum": 1.5, "exclusiveMinimum": True},
        "nest": {
            "type": "object",
            "required": ["a"],
            "properties": {"a": {"type": "number", "maximum": 10}},
        },
    },
}

DOCS = [
    '{"k": 5}', '{"k": 0}', '{"k": 80}', '{"k": -1}', '{"k": 81}',
    '{"k": 5.0}',            # integer by VALUE -> accept
    '{"k": 5.5}',            # coerces to long 5 in a cast - must reject
    '{"k": "5"}',            # string - no string->number coercion
    '{"k": true}',           # boolean is not an integer
    '{"k": null}',           # present JSON null - fails type
    '{}',                    # required k absent
    '{"k": 5, "s": "ab"}', '{"k": 5, "s": "abcde"}', '{"k": 5, "s": "a"}',
    '{"k": 5, "s": 7}',      # number where string constrained: length n/a
    '{"k": 5, "x": 1.5}',    # exclusive bound - reject
    '{"k": 5, "x": 1.6}', '{"k": 5, "x": "str"}',
    '{"k": 5, "nest": {"a": 3}}', '{"k": 5, "nest": {"a": 11}}',
    '{"k": 5, "nest": {}}',  # nested required
    '{"k": 5, "nest": [1]}', # nested type gate
    '[1, 2]', '"str"', 'not json', '', None, '{"k": 1e40}',
    '{"k": 0.30000000000000004}',
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame([(i, d) for i, d in enumerate(DOCS)], "id long, props string")


def _spec_no_extra():
    s = dict(SPEC)
    s["additionalProperties"] = False
    return s


def test_variant_matches_kernel_and_evaluator(spark, docs_df):
    pred = variant_validation_predicate(SPEC, F.col("props"))
    kern = json_validation_kernel(SPEC, F.col("props")).getField("valid")
    rows = docs_df.select("id", pred.alias("v"), kern.alias("k")).collect()
    compiled = compile_spec(SPEC)
    for r in rows:
        doc = DOCS[r.id]
        if doc is None:
            expect = False  # SQL NULL: no document, fails type object
        else:
            expect = not validate_json(compiled, doc)
        assert r.v == expect, f"variant vs evaluator on {doc!r}"
        assert r.k == expect, f"kernel vs evaluator on {doc!r}"


def test_variant_additional_properties_false(spark, docs_df):
    spec = _spec_no_extra()
    pred = variant_validation_predicate(spec, F.col("props"))
    kern = json_validation_kernel(spec, F.col("props")).getField("valid")
    extra = spark.createDataFrame(
        [(100, '{"k": 5, "zz": 1}'), (101, '{"k": 5, "s": "ab"}')],
        "id long, props string",
    )
    rows = extra.select("id", pred.alias("v"), kern.alias("k")).collect()
    got = {r.id: (r.v, r.k) for r in rows}
    assert got == {100: (False, False), 101: (True, True)}


def test_variant_plan_is_pure_codegen(spark, docs_df):
    """The whole point: no Python anywhere — parse + probes stay JVM-side."""
    pred = variant_validation_predicate(SPEC, F.col("props"))
    plan = (
        docs_df.select(pred.alias("ok"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_unsupported_keywords_raise_for_kernel_fallback(spark):
    for spec in (
        {"type": "object", "properties": {"k": {"enum": [1, 2]}}},
        {"type": "object", "properties": {"k": {"pattern": "^a"}}},
        {"type": "object", "properties": {"k": {"multipleOf": 2}}},
        {"type": "object", "patternProperties": {"^x": {"type": "string"}}},
        {"type": "object", "properties": {
            "n": {"type": "object", "additionalProperties": False}}},
        {"type": "string"},
    ):
        with pytest.raises(LoweringError):
            variant_validation_predicate(spec, F.col("props"))
