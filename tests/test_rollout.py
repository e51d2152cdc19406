"""spec_rollout_audit + violation_cooccurrence (plans/rollout.py)."""

import pyspark.sql.functions as F
import pytest

from jsonschema_spark.plans.plan import TableSpec, compile_table_spec
from jsonschema_spark.plans.rollout import (
    spec_rollout_audit,
    violation_cooccurrence,
)


def _plans(spark, df):
    v1 = TableSpec.from_dict(
        {
            "columns": {
                "x": {"type": "integer", "minimum": 0, "maximum": 100},
            },
            "required": ["x"],
            "row_checks": {"even": "x % 2 = 0"},
        }
    )
    # v2 tightens the ceiling to 50 and drops the evenness row check
    v2 = TableSpec.from_dict(
        {
            "columns": {
                "x": {"type": "integer", "minimum": 0, "maximum": 50},
            },
            "required": ["x"],
        }
    )
    schema = df.schema
    return compile_table_spec(v1, schema), compile_table_spec(v2, schema)


@pytest.fixture(scope="module")
def frame(spark):
    # per group g: x = 2g..2g+9 → group "a": 0..9, "b": 2..11, ...
    rows = [(g, x) for g in ["a", "b"] for x in range(10)]
    return spark.createDataFrame(
        [(g, {"a": 0, "b": 60}[g] + x * 7) for g, x in rows],
        "grp string, x int",
    )


def test_transition_matrix_exact(spark, frame):
    # group a: x = 0,7,14,...,63 — all within [0,100]; even iff x%14==0
    #   v1 pass = {0,14,28,42,56} (5), v2 pass = x<=50 → {0..49}: 8 rows
    # group b: x = 60,67,...,123 — v1: x<=100 and even → {60,74,88} (3 of 6
    #   within bounds; 67,81,95 odd fail row check; 102+ fail bounds)
    #   v2: x<=50 → none pass
    out = {
        r["group"]: r
        for r in spec_rollout_audit(
            frame, *_plans(spark, frame), group_col="grp"
        ).collect()
    }
    a, b = out["a"], out["b"]
    assert a["n"] == 10 and b["n"] == 10
    # every row lands in exactly one cell
    for r in (a, b):
        assert (
            r["pass_pass"] + r["pass_fail"] + r["fail_pass"] + r["fail_fail"]
            == r["n"]
        )
    # group a: v1 pass = even x in [0,100] = {0,14,28,42,56} (5)
    #          v2 pass = x in [0,50] = {0,7,14,21,28,35,42,49} (8)
    assert (a["pass_pass"], a["pass_fail"], a["fail_pass"], a["fail_fail"]) \
        == (4, 1, 4, 1)
    # group b: x = 60..123 step 7; v1 pass = even and <=100 = {60,74,88}
    #          v2 pass = none (all > 50)
    assert (b["pass_pass"], b["pass_fail"], b["fail_pass"], b["fail_fail"]) \
        == (0, 3, 0, 7)
    assert a["break_rate"] == pytest.approx(0.1)
    assert b["break_rate"] == pytest.approx(0.3)


def test_rollout_single_scan(spark, frame):
    from jsonschema_spark.plans.audit import plan_report

    rep = plan_report(
        spec_rollout_audit(frame, *_plans(spark, frame), group_col="grp")
    )
    assert not rep["cartesian"] and not rep["row_python"]
    # one groupBy shuffle + the orderBy on ≤|groups| rows — never more
    assert rep["exchanges"] <= 2


def test_cooccurrence_pairs(spark):
    df = spark.createDataFrame(
        [(0, 200), (1, 1), (2, 999), (3, 4)], "doc_id int, x int"
    )
    spec = TableSpec.from_dict(
        {
            "columns": {"x": {"type": "integer", "maximum": 100}},
            "required": ["x"],
            "row_checks": {"small": "x < 500", "even": "x % 2 = 0"},
        }
    )
    plan = compile_table_spec(spec, df.schema)
    out = {
        (r["check_a"], r["check_b"]): r["n_docs"]
        for r in violation_cooccurrence(plan.annotate(df)).collect()
    }
    # doc 0 (200): fails col_x only → no pair
    # doc 1 (1): fails row_even only → no pair
    # doc 2 (999): fails col_x + row_small + row_even → 3 pairs
    # doc 3 (4): passes everything
    assert out == {
        ("col_x", "row_even"): 1,
        ("col_x", "row_small"): 1,
        ("row_even", "row_small"): 1,
    }


def test_cooccurrence_min_docs_and_order(spark):
    df = spark.createDataFrame(
        [(i, 999) for i in range(3)] + [(9, 2)], "doc_id int, x int"
    )
    spec = TableSpec.from_dict(
        {
            "columns": {"x": {"type": "integer", "maximum": 100}},
            "row_checks": {"small": "x < 500"},
        }
    )
    plan = compile_table_spec(spec, df.schema)
    rows = violation_cooccurrence(plan.annotate(df), min_docs=2).collect()
    assert [(r["check_a"], r["check_b"], r["n_docs"]) for r in rows] == [
        ("col_x", "row_small", 3)
    ]
    # names are emitted in sorted order: check_a < check_b always
    for r in rows:
        assert r["check_a"] < r["check_b"]


def test_check_activation_profile_statuses(spark):
    from jsonschema_spark.plans.rollout import check_activation_profile

    df = spark.createDataFrame(
        [(0, 200), (1, 1), (2, 999), (3, 4)], "doc_id int, x int"
    )
    spec = TableSpec.from_dict(
        {
            "columns": {"x": {"type": "integer", "maximum": 100}},
            "required": ["x"],
            "row_checks": {
                "small": "x < 500",
                "even": "x % 2 = 0",
                "never": "x < -1000",
            },
        }
    )
    plan = compile_table_spec(spec, df.schema)
    out = {
        r["check"]: r
        for r in check_activation_profile(plan.annotate(df)).collect()
    }
    assert set(out) == {
        "col_x", "required_x", "row_small", "row_even", "row_never"
    }
    assert all(r["n"] == 4 for r in out.values())
    assert (out["col_x"]["n_fail"], out["col_x"]["status"]) == (2, "active")
    assert (out["required_x"]["n_fail"], out["required_x"]["status"]) == (
        0, "dead",
    )
    assert (out["row_never"]["n_fail"], out["row_never"]["status"]) == (
        4, "always",
    )
    assert out["row_small"]["fail_rate"] == 0.25
    assert out["row_even"]["fail_rate"] == 0.5


def test_check_activation_null_verdict_counts_as_fail(spark):
    from jsonschema_spark.plans.rollout import check_activation_profile

    df = spark.createDataFrame([(0, 4), (1, None)], "doc_id int, x int")
    spec = TableSpec.from_dict(
        {"required": ["x"], "row_checks": {"small": "x < 500"}}
    )
    plan = compile_table_spec(spec, df.schema)
    out = {
        r["check"]: r
        for r in check_activation_profile(plan.annotate(df)).collect()
    }
    # the NULL x row fails the row check (NULL verdict = reject), so the
    # check is active, not dead
    assert (out["row_small"]["n_fail"], out["row_small"]["status"]) == (
        1, "active",
    )
    assert out["required_x"]["n_fail"] == 1


def test_check_activation_requires_annotation(spark):
    import pytest as _pytest

    from jsonschema_spark.plans.rollout import check_activation_profile

    df = spark.createDataFrame([(0, 4)], "doc_id int, x int")
    with _pytest.raises(ValueError):
        check_activation_profile(df)


def test_violation_examples_deterministic_topk(spark):
    import hashlib

    from jsonschema_spark.plans.rollout import violation_examples

    df = spark.createDataFrame(
        [(f"d{i}", 999 if i % 3 == 0 else 4) for i in range(60)],
        "doc_id string, x int",
    )
    spec = TableSpec.from_dict(
        {"columns": {"x": {"type": "integer", "maximum": 100}}}
    )
    plan = compile_table_spec(spec, df.schema)
    out = {
        r["check"]: r
        for r in violation_examples(
            plan.annotate(df), id_col="doc_id", k=5, salt_buckets=8
        ).collect()
    }
    assert set(out) == {"col_x"}
    row = out["col_x"]
    assert row["n_examples"] == 5

    def h(s):
        return int(hashlib.md5(f"vx:{s}".encode()).hexdigest()[:15], 16)

    failing = [f"d{i}" for i in range(60) if i % 3 == 0]
    want = [d for _, d in sorted((h(d), d) for d in failing)[:5]]
    assert row["example_ids"] == want

    # layout-independent: repartitioned input yields identical examples
    out2 = {
        r["check"]: r["example_ids"]
        for r in violation_examples(
            plan.annotate(df.repartition(13)), id_col="doc_id", k=5,
            salt_buckets=4,
        ).collect()
    }
    assert out2["col_x"] == want

    # fewer failures than k: all of them, still hash-ordered
    small = spark.createDataFrame(
        [("a", 999), ("b", 999), ("c", 1)], "doc_id string, x int"
    )
    [r] = violation_examples(
        compile_table_spec(spec, small.schema).annotate(small),
        id_col="doc_id", k=5,
    ).collect()
    assert r["n_examples"] == 2
    assert sorted(r["example_ids"]) == ["a", "b"]
