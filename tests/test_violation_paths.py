"""Struct-path violation detail on the native path (VERDICT r1 #7): the
typed lowering names per-field predicates so violation rows carry the
failing field location — the reference's path-wrapped errors
(validate.go:74,346,500) — while the conjunction stays exactly the
single-column predicate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from jsonschema_spark.compiler.columns import (
    lower_named_predicates,
    lower_predicate,
)
from jsonschema_spark.plans.job import ValidationJob
from jsonschema_spark.plans.plan import TableSpec, compile_table_spec
from jsonschema_spark.spec.compile import compile_spec

DOC_TYPE = (
    "id long, doc struct<name: string, n: long,"
    " addr: struct<street: string, zip: string>>"
)

DOC_SPEC = {
    "type": "object",
    "required": ["name"],
    "properties": {
        "name": {"type": "string", "minLength": 3},
        "n": {"minimum": 0},
        "addr": {
            "type": "object",
            "properties": {
                "street": {"minLength": 5},
                "zip": {"pattern": "^[0-9]{5}$"},
            },
            "required": ["zip"],
        },
    },
}

ROWS = [
    (1, ("alice", 5, ("long street", "12345"))),   # all pass
    (2, ("al", 5, ("long street", "12345"))),      # /name too short
    (3, ("alice", -1, ("long street", "12345"))),  # /n below minimum
    (4, ("alice", 5, ("st", "12345"))),            # /addr/street too short
    (5, ("alice", 5, ("long street", "12x45"))),   # /addr/zip bad pattern
    (6, ("alice", 5, ("long street", None))),      # /addr required zip -> /addr root
    (7, (None, 5, ("long street", "12345"))),      # required name -> root ''
    (8, ("al", 5, ("st", "12x45"))),               # three paths at once
    (9, None),                                     # null object: type check at root
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(ROWS, DOC_TYPE)


def test_named_conjunction_equals_single_predicate(spark, docs):
    compiled = compile_spec(DOC_SPEC)
    dtype = docs.schema["doc"].dataType
    single = lower_predicate(compiled, F.col("doc"), dtype)
    named = lower_named_predicates(compiled, F.col("doc"), dtype)
    assert "" in named and "/name" in named and "/addr/zip" in named
    conj = F.lit(True)
    for pred in named.values():
        conj = conj & pred
    mismatches = docs.filter(single != conj).count()
    assert mismatches == 0


def test_violation_rows_carry_field_paths(spark, docs):
    plan = compile_table_spec(
        TableSpec.from_dict({"columns": {"doc": DOC_SPEC}}), docs.schema
    )
    assert "col_doc" in plan.detail
    job = ValidationJob(plan, id_column="id")
    ann = job.annotate(docs)
    got = {
        (r.id, r.check, r.path)
        for r in job.violations(ann).collect()
    }
    assert got == {
        (2, "col_doc", "/name"),
        (3, "col_doc", "/n"),
        (4, "col_doc", "/addr/street"),
        (5, "col_doc", "/addr/zip"),
        (6, "col_doc", "/addr"),   # nested `required` fails at the addr node
        (7, "col_doc", ""),        # object-level required -> root path
        (8, "col_doc", "/name"),
        (8, "col_doc", "/addr/street"),
        (8, "col_doc", "/addr/zip"),
        (9, "col_doc", ""),        # null object fails `type: object` at root
    }


def test_scalar_checks_report_root_path(spark):
    df = spark.createDataFrame([(1, 5), (2, -3)], "id long, v long")
    plan = compile_table_spec(
        TableSpec.from_dict({"columns": {"v": {"minimum": 0}}}), df.schema
    )
    job = ValidationJob(plan, id_column="id")
    rows = job.violations(job.annotate(df)).collect()
    assert [(r.id, r.check, r.path, r.detail) for r in rows] == [
        (2, "col_v", "", '{"minimum":0}')
    ]


def test_detail_carries_violated_fragment(spark, docs):
    """The detail column holds the spec fragment at the failing path —
    the reference's keyword-bearing error text, statically folded."""
    plan = compile_table_spec(
        TableSpec.from_dict({"columns": {"doc": DOC_SPEC}}), docs.schema
    )
    job = ValidationJob(plan, id_column="id")
    by_key = {
        (r.id, r.path): r.detail
        for r in job.violations(job.annotate(docs)).collect()
    }
    assert by_key[(2, "/name")] == '{"minLength":3,"type":"string"}'
    assert by_key[(5, "/addr/zip")] == '{"pattern":"^[0-9]{5}$"}'
    assert by_key[(3, "/n")] == '{"minimum":0}'


def test_additional_properties_false_paths(spark):
    df = spark.createDataFrame(
        [(1, ("a", None)), (2, ("a", "extra"))],
        "id long, doc struct<k: string, junk: string>",
    )
    spec = {"properties": {"k": {"type": "string"}}, "additionalProperties": False}
    plan = compile_table_spec(
        TableSpec.from_dict({"columns": {"doc": spec}}), df.schema
    )
    job = ValidationJob(plan, id_column="id")
    rows = {(r.id, r.path) for r in job.violations(job.annotate(df)).collect()}
    assert rows == {(2, "/junk")}


def test_null_object_fails_at_root_when_type_object(spark, docs):
    """Row 9 (null struct): draft-4 'type: object' rejects null — the
    violation lands at the root path, not a field."""
    plan = compile_table_spec(
        TableSpec.from_dict({"columns": {"doc": DOC_SPEC}}), docs.schema
    )
    job = ValidationJob(plan, id_column="id")
    rows = {
        (r.id, r.path)
        for r in job.violations(job.annotate(docs)).collect()
        if r.id == 9
    }
    assert rows == {(9, "")}


def test_kernel_json_violations_carry_evaluator_paths(spark):
    """json_columns checks surface the evaluator's own error location
    (first_path/keyword/message from the verdict struct) in violation
    rows — the kernel runs once for both the boolean and the detail."""
    rows = [
        (1, '{"k": 5}'),
        (2, '{"k": -1}'),
        (3, '{"nope": 1}'),
        (4, "not json"),
    ]
    df = spark.createDataFrame(rows, "id long, payload string")
    spec = TableSpec.from_dict(
        {
            "json_columns": {
                "payload": {
                    "type": "object",
                    "required": ["k"],
                    "properties": {"k": {"type": "integer", "minimum": 0}},
                }
            }
        }
    )
    plan = compile_table_spec(spec, df.schema)
    job = ValidationJob(plan, id_column="id")
    got = {
        r.id: (r.check, r.path, r.detail)
        for r in job.violations(job.annotate(df)).collect()
    }
    assert set(got) == {2, 3, 4}
    assert got[2] == ("json_payload", "/k", "minimum: value must be >= 0")
    assert got[3][1] == "" and got[3][2].startswith("required")
    assert got[4][2].startswith("json")


def test_precision_warning_beyond_decimal38(spark):
    """VERDICT r1 missing #3: bounds beyond Decimal(38) emit a compile-time
    PrecisionWarning and compile to the double approximation (saturating to
    inf for values beyond double range, like the reference's 1e1000 case)."""
    from jsonschema_spark.compiler.columns import PrecisionWarning

    compiled = compile_spec({"minimum": 10**1000})
    with pytest.warns(PrecisionWarning):
        pred = lower_predicate(compiled, F.col("v"), T.DoubleType())
    df = spark.createDataFrame([(1.0,), (float("inf"),)], "v: double")
    assert [r[0] for r in df.select(pred).collect()] == [False, True]

    # exact-range bounds stay silent
    import warnings as W

    with W.catch_warnings():
        W.simplefilter("error", PrecisionWarning)
        lower_predicate(
            compile_spec({"minimum": 0.07, "maximum": 10**30}),
            F.col("v"),
            T.DoubleType(),
        )


MAP_SPEC = {
    "type": "object",
    "required": ["a"],
    "properties": {
        "a": {"type": "integer", "minimum": 0},
        "b": {"type": "integer", "maximum": 10},
    },
    "additionalProperties": False,
}

MAP_ROWS = [
    (1, {"a": 5, "b": 3}),    # all pass
    (2, {"a": -1, "b": 3}),   # /a below minimum
    (3, {"a": 5, "b": 99}),   # /b above maximum
    (4, {"b": 3}),            # required a -> root ''
    (5, {"a": 5, "x": 1}),    # additionalProperties (dynamic key) -> root ''
    (6, None),                # null object -> type check at root
]


@pytest.fixture(scope="module")
def map_docs(spark):
    return spark.createDataFrame(MAP_ROWS, "id long, doc map<string, long>")


def test_map_named_conjunction_equals_single_predicate(spark, map_docs):
    compiled = compile_spec(MAP_SPEC)
    dtype = map_docs.schema["doc"].dataType
    single = lower_predicate(compiled, F.col("doc"), dtype)
    named = lower_named_predicates(compiled, F.col("doc"), dtype)
    assert set(named) == {"", "/a", "/b"}
    conj = F.lit(True)
    for pred in named.values():
        conj = conj & pred
    assert map_docs.filter(single != conj).count() == 0


def test_map_violations_pinpoint_declared_keys(spark, map_docs):
    """Map columns report the failing DECLARED key in the path — the
    reference's per-key wrapped object errors (validate.go:500) — AND
    (VERDICT r3 #4) dynamic keys rejected by additionalProperties report
    their runtime key name too, not the check-level root."""
    plan = compile_table_spec(
        TableSpec.from_dict({"columns": {"doc": MAP_SPEC}}), map_docs.schema
    )
    assert "col_doc" in plan.detail
    assert "col_doc" in plan.detail_dynamic
    job = ValidationJob(plan, id_column="id")
    got = {(r.id, r.path) for r in job.violations(job.annotate(map_docs)).collect()}
    assert got == {
        (2, "/a"),
        (3, "/b"),
        (4, ""),    # object-level required -> root
        (5, "/x"),  # additionalProperties: false -> the offending key
        (6, ""),    # null object fails type at root
    }


DYN_SPEC = {
    "type": "object",
    "properties": {"a": {"type": "integer", "minimum": 0}},
    "patternProperties": {"^n_": {"minimum": 0}},
    "additionalProperties": {"maximum": 100},
}

DYN_ROWS = [
    (1, {"a": 5, "n_x": 1, "other": 50}),    # all pass
    (2, {"a": 5, "n_bad": -3}),              # pattern key fails -> /n_bad
    (3, {"a": 5, "free": 999}),              # additional schema fails -> /free
    (4, {"a": -1, "n_ok": 2}),               # declared key fails -> /a (static)
    (5, {"n_bad": -1, "wild": 101, "z": 3}), # two dynamic failures at once
]


@pytest.fixture(scope="module")
def dyn_docs(spark):
    return spark.createDataFrame(DYN_ROWS, "id long, doc map<string, long>")


def test_dynamic_key_violations_carry_runtime_paths(spark, dyn_docs):
    """VERDICT r3 #4: keys matched only by patternProperties /
    additionalProperties produce per-key '/name' paths computed at runtime
    (reference validate.go:471-500), with the violated keyword fragment in
    detail."""
    plan = compile_table_spec(
        TableSpec.from_dict({"columns": {"doc": DYN_SPEC}}), dyn_docs.schema
    )
    assert "col_doc" in plan.detail_dynamic
    job = ValidationJob(plan, id_column="id")
    rows = job.violations(job.annotate(dyn_docs)).collect()
    got = {(r.id, r.path) for r in rows}
    assert got == {
        (2, "/n_bad"),
        (3, "/free"),
        (4, "/a"),
        (5, "/n_bad"),
        (5, "/wild"),
    }
    details = {(r.id, r.path): r.detail for r in rows}
    assert details[(2, "/n_bad")] == '{"patternProperties":{"^n_":{"minimum":0}}}'
    assert details[(3, "/free")] == '{"additionalProperties":{"maximum":100}}'


def test_dynamic_conjunction_equals_single_predicate(spark, dyn_docs, map_docs):
    """The split contract: AND(static named predicates) AND
    size(dynamic failures) == 0 must equal lower_predicate exactly —
    nothing double-reported, nothing dropped."""
    from jsonschema_spark.compiler.columns import lower_dynamic_key_violations

    for spec, docs in ((DYN_SPEC, dyn_docs), (MAP_SPEC, map_docs)):
        compiled = compile_spec(spec)
        dtype = docs.schema["doc"].dataType
        single = lower_predicate(compiled, F.col("doc"), dtype)
        named = lower_named_predicates(
            compiled, F.col("doc"), dtype, dynamic_paths=True
        )
        dyn = lower_dynamic_key_violations(compiled, F.col("doc"), dtype)
        assert dyn is not None
        conj = F.size(dyn) == 0
        for pred in named.values():
            conj = conj & pred
        assert docs.filter(single != conj).count() == 0


def test_beyond_decimal38_routes_to_exact_kernel(spark):
    """A bound past Spark's exact range (long / Decimal(38)) must not be
    approximated natively: compile_table_spec routes the check to the
    evaluator kernel's Fraction math (reference big.Rat semantics,
    internal/jsonequal/equal.go:39-79 / equal_test.go:45). The case below
    is adversarial: v = 10^38-1 < B = 10^38+7 exactly, but double(v) ==
    double(B), so the native approximation would wrongly accept."""
    from decimal import Decimal

    B = 10**38 + 7
    rows = [(1, Decimal(10**38 - 1)), (2, Decimal(10**37))]
    df = spark.createDataFrame(rows, "id long, v decimal(38,0)")

    plan = compile_table_spec(
        TableSpec.from_dict({"columns": {"v": {"minimum": B}}}), df.schema
    )
    assert "col_v" in plan.kernel_checks and "col_v" not in plan.checks

    job = ValidationJob(plan, id_column="id")
    got = {r.id for r in job.violations(job.annotate(df)).collect()}
    assert got == {1, 2}  # both below B exactly — the evaluator's verdict

    # evaluator parity on the same values (suite-style cross-check)
    from jsonschema_spark.spec.evaluate import is_valid

    compiled = compile_spec({"minimum": B})
    assert not is_valid(compiled, 10**38 - 1)
    assert not is_valid(compiled, 10**37)

    # 1e1000: beyond double range entirely — kernel still exact
    plan2 = compile_table_spec(
        TableSpec.from_dict({"columns": {"v": {"maximum": 10**1000}}}), df.schema
    )
    assert "col_v" in plan2.kernel_checks
    job2 = ValidationJob(plan2, id_column="id")
    assert job2.violations(job2.annotate(df)).count() == 0  # all <= 1e1000

    # in-range bounds stay on the native codegen path
    plan3 = compile_table_spec(
        TableSpec.from_dict({"columns": {"v": {"minimum": 0}}}), df.schema
    )
    assert "col_v" in plan3.checks and not plan3.kernel_checks
