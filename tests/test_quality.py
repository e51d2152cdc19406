"""Unit tests for the Deequ-style profiling / constraint-discovery
operators (operators/quality.py), pinned against closed-form references
computed inline (Schelter et al. VLDB 2018 metric definitions; TANE g3;
Benford/Hill digit law; Cover & Thomas entropy identities)."""

from __future__ import annotations

import math

import pytest

from jsonschema_spark.operators.quality import (
    benford_first_digit,
    categorical_mi,
    column_profile,
    fd_audit,
    freshness_audit,
    inclusion_audit,
    join_cardinality_profile,
    metric_anomaly,
)
from jsonschema_spark.plans.audit import assert_plan


def _entropy(counts):
    n = sum(counts)
    return sum(-(c / n) * math.log(c / n) for c in counts if c > 0)


class TestColumnProfile:
    def test_matches_closed_form(self, spark):
        rows = [
            (1, "a", "x"),
            (2, "a", "y"),
            (3, "b", None),
            (4, "b", "y"),
            (5, "c", "y"),
        ]
        df = spark.createDataFrame(rows, "id bigint, cat string, opt string")
        out = {
            r["column"]: r
            for r in column_profile(df, ["id", "cat", "opt"]).collect()
        }
        # id: all distinct, all unique, entropy ln(5)
        assert out["id"]["n_rows"] == 5 and out["id"]["n_null"] == 0
        assert out["id"]["n_distinct"] == 5 and out["id"]["n_unique"] == 5
        assert out["id"]["distinctness"] == 1.0
        assert out["id"]["uniqueness"] == 1.0
        assert out["id"]["entropy"] == pytest.approx(math.log(5), abs=1e-6)
        # cat: counts a=2 b=2 c=1; mode tie a/b broken by value desc -> b
        assert out["cat"]["n_distinct"] == 3 and out["cat"]["n_unique"] == 1
        assert out["cat"]["distinctness"] == pytest.approx(0.6)
        assert out["cat"]["uniqueness"] == pytest.approx(0.2)
        assert out["cat"]["entropy"] == pytest.approx(
            _entropy([2, 2, 1]), abs=1e-6
        )
        assert out["cat"]["mode_value"] == "b" and out["cat"]["mode_count"] == 2
        # opt: one null; non-null x=1 y=3
        assert out["opt"]["n_null"] == 1
        assert out["opt"]["n_distinct"] == 2 and out["opt"]["n_unique"] == 1
        assert out["opt"]["distinctness"] == pytest.approx(0.5)
        assert out["opt"]["entropy"] == pytest.approx(
            _entropy([1, 3]), abs=1e-6
        )
        assert out["opt"]["mode_value"] == "y" and out["opt"]["mode_count"] == 3

    def test_all_null_column(self, spark):
        df = spark.createDataFrame(
            [(None,), (None,)], "only string"
        )
        row = column_profile(df, ["only"]).collect()[0]
        assert row["n_null"] == 2 and row["n_distinct"] == 0
        assert row["distinctness"] is None and row["entropy"] is None
        assert row["mode_value"] is None

    def test_plan_is_guarded(self, spark):
        df = spark.createDataFrame([(1, "a")], "id bigint, cat string")
        assert_plan(
            column_profile(df, ["id", "cat"]),
            no_cartesian=True,
            no_row_python=True,
        )


class TestNumericProfile:
    def test_matches_closed_form(self, spark):
        from jsonschema_spark.operators.quality import numeric_profile

        rows = [(1.0, 10.0), (2.0, 20.0), (3.0, None), (4.0, 40.0)]
        df = spark.createDataFrame(rows, "a double, b double")
        out = {r["column"]: r for r in numeric_profile(df, ["a", "b"]).collect()}
        a = out["a"]
        assert a["n_rows"] == 4 and a["n_null"] == 0
        assert a["min"] == 1.0 and a["max"] == 4.0 and a["mean"] == 2.5
        assert a["std"] == pytest.approx(
            math.sqrt(sum((x - 2.5) ** 2 for x in (1, 2, 3, 4)) / 3), abs=1e-6
        )
        assert a["p50"] == pytest.approx(2.5)
        assert a["p25"] == pytest.approx(1.75)  # linear interpolation
        assert a["p95"] == pytest.approx(3.85)
        b = out["b"]
        assert b["n_null"] == 1 and b["p50"] == pytest.approx(20.0)


class TestFdAudit:
    def test_violations_and_g3(self, spark):
        # l=1 -> {x,x,y}: violating, g3 contributes 1
        # l=2 -> {z,z}:   holds
        # l=3 -> {x}:     holds; null rows excluded
        rows = [
            (1, "x"), (1, "x"), (1, "y"),
            (2, "z"), (2, "z"),
            (3, "x"),
            (None, "q"), (4, None),
        ]
        df = spark.createDataFrame(rows, "l int, r string")
        row = fd_audit(df, "l", "r").collect()[0]
        assert row["n_groups"] == 3
        assert row["n_violating_groups"] == 1
        assert row["n_rows"] == 6
        assert row["n_violating_rows"] == 3
        assert row["g3_rows"] == 1
        assert row["fd_strength"] == pytest.approx(1 - 1 / 6, abs=1e-6)

    def test_exact_fd(self, spark):
        df = spark.createDataFrame(
            [(1, "a"), (1, "a"), (2, "b")], "l int, r string"
        )
        row = fd_audit(df, "l", "r").collect()[0]
        assert row["n_violating_groups"] == 0 and row["g3_rows"] == 0
        assert row["fd_strength"] == 1.0


class TestCategoricalMi:
    def test_independent_columns(self, spark):
        # uniform 2x2 grid: H(A)=H(B)=ln2, MI=0
        rows = [(a, b) for a in "pq" for b in "uv" for _ in range(3)]
        df = spark.createDataFrame(rows, "a string, b string")
        row = categorical_mi(df, "a", "b").collect()[0]
        assert row["n_rows"] == 12 and row["n_cells"] == 4
        assert row["h_a"] == pytest.approx(math.log(2), abs=1e-6)
        assert row["h_ab"] == pytest.approx(math.log(4), abs=1e-6)
        assert row["mi"] == pytest.approx(0.0, abs=1e-6)
        assert row["nmi"] == pytest.approx(0.0, abs=1e-6)

    def test_perfectly_dependent(self, spark):
        rows = [("p", "u")] * 4 + [("q", "v")] * 4
        df = spark.createDataFrame(rows, "a string, b string")
        row = categorical_mi(df, "a", "b").collect()[0]
        # B = f(A): MI = H(A) = H(B) = ln2, NMI = 1
        assert row["mi"] == pytest.approx(math.log(2), abs=1e-6)
        assert row["nmi"] == pytest.approx(1.0, abs=1e-6)

    def test_null_rows_excluded(self, spark):
        rows = [("p", "u"), ("p", None), (None, "u"), ("q", "v")]
        df = spark.createDataFrame(rows, "a string, b string")
        row = categorical_mi(df, "a", "b").collect()[0]
        assert row["n_rows"] == 2


class TestBenford:
    def test_digit_extraction_and_law(self, spark):
        # values in cents-domain: 1.23 -> 123 -> digit 1; 0.05 -> 5
        rows = [(1.23,), (0.05,), (912.0,), (19.99,), (-3.0,), (0.0,)]
        df = spark.createDataFrame(rows, "v double")
        out = {r["digit"]: r for r in benford_first_digit(df, "v").collect()}
        # ALL nine rows emit — zero-observation digits included, so a
        # summed chi2 keeps their N*P(d) contribution (ADVICE r4)
        assert set(out) == set(range(1, 10))
        assert out[1]["n"] == 2  # 1.23 -> 123, 19.99 -> 1999
        assert out[5]["n"] == 1 and out[9]["n"] == 1
        assert out[1]["rate"] == pytest.approx(0.5)
        assert out[1]["expected"] == pytest.approx(math.log10(2), abs=1e-6)
        n, big_n, e = 2, 4, math.log10(2)
        assert out[1]["chi2_term"] == pytest.approx(
            (n - big_n * e) ** 2 / (big_n * e), abs=1e-6
        )
        e2 = math.log10(1 + 1 / 2)
        assert out[2]["n"] == 0 and out[2]["rate"] == 0.0
        assert out[2]["chi2_term"] == pytest.approx(big_n * e2, abs=1e-6)

    def test_benford_like_sample_scores_low(self, spark):
        # 10^k-spaced magnitudes drawn to follow the law loosely
        vals = []
        for d in range(1, 10):
            reps = round(100 * math.log10(1 + 1 / d))
            vals += [(d * 1.0 + 0.11,)] * reps
        df = spark.createDataFrame(vals, "v double")
        rows = benford_first_digit(df, "v").collect()
        chi2 = sum(r["chi2_term"] for r in rows)
        assert chi2 < 16.0  # chi2_{8, 0.95} ~ 15.5


class TestJoinCardinalityProfile:
    def test_one_to_many_with_orphans(self, spark):
        left = spark.createDataFrame(
            [(1,), (2,), (3,), (None,)], "k int"
        )
        right = spark.createDataFrame(
            [(1, "a"), (1, "b"), (2, "c"), (9, "d"), (None, "e")],
            "k int, v string",
        )
        row = join_cardinality_profile(left, "k", right, "k").collect()[0]
        assert row["n_left_rows"] == 3 and row["n_right_rows"] == 4
        assert row["n_left_keys"] == 3 and row["n_right_keys"] == 3
        assert row["n_matched_keys"] == 2
        assert row["n_left_only_keys"] == 1  # key 3
        assert row["n_right_only_keys"] == 1  # key 9
        assert row["max_left_per_key"] == 1
        assert row["max_right_per_key"] == 2
        assert row["max_fanout"] == 2
        assert row["join_rows"] == 3  # key1: 1*2, key2: 1*1
        assert row["left_match_rate"] == pytest.approx(2 / 3, abs=1e-6)
        assert row["relationship"] == "1:N"

    def test_many_to_many_explosion(self, spark):
        left = spark.createDataFrame([(1,)] * 3 + [(2,)], "k int")
        right = spark.createDataFrame([(1,)] * 4 + [(2,)], "k int")
        row = join_cardinality_profile(left, "k", right, "k").collect()[0]
        assert row["relationship"] == "N:M"
        assert row["max_fanout"] == 12 and row["join_rows"] == 13

    def test_disjoint(self, spark):
        left = spark.createDataFrame([(1,)], "k int")
        right = spark.createDataFrame([(2,)], "k int")
        row = join_cardinality_profile(left, "k", right, "k").collect()[0]
        assert row["relationship"] == "disjoint"
        assert row["join_rows"] == 0 and row["left_match_rate"] == 0.0

    def test_one_to_one(self, spark):
        df = spark.createDataFrame([(1,), (2,)], "k int")
        row = join_cardinality_profile(df, "k", df, "k").collect()[0]
        assert row["relationship"] == "1:1" and row["join_rows"] == 2


class TestEvaluateExpectations:
    def test_verdicts(self, spark):
        from jsonschema_spark.operators.quality import evaluate_expectations

        df = spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0), (3, None, 30.0)],
            "id bigint, cat string, x double",
        )
        exps = [
            {"name": "rows_min", "metric": "n_rows", "column": None,
             "op": ">=", "threshold": 3.0},
            {"name": "cat_complete", "metric": "null_rate", "column": "cat",
             "op": "<=", "threshold": 0.0},  # fails: 1/3 null
            {"name": "cat_distinct", "metric": "n_distinct", "column": "cat",
             "op": "<=", "threshold": 2.0},
            {"name": "x_floor", "metric": "min", "column": "x",
             "op": ">=", "threshold": 10.0},
            {"name": "x_ceiling", "metric": "max", "column": "x",
             "op": "<=", "threshold": 25.0},  # fails: max 30
            {"name": "x_mean", "metric": "mean", "column": "x",
             "op": ">=", "threshold": 20.0},
        ]
        out = {r["name"]: r for r in evaluate_expectations(df, exps).collect()}
        assert len(out) == 6
        assert out["rows_min"]["passed"] and out["rows_min"]["value"] == 3.0
        assert not out["cat_complete"]["passed"]
        assert out["cat_complete"]["value"] == pytest.approx(1 / 3, abs=1e-6)
        assert out["cat_distinct"]["passed"]
        assert out["x_floor"]["passed"]
        assert not out["x_ceiling"]["passed"]
        assert out["x_mean"]["passed"] and out["x_mean"]["value"] == 20.0

    def test_empty_table_fails_closed(self, spark):
        from jsonschema_spark.operators.quality import evaluate_expectations

        df = spark.createDataFrame([], "x double")
        exps = [
            {"name": "floor", "metric": "min", "column": "x",
             "op": ">=", "threshold": 0.0},
            {"name": "nonempty", "metric": "n_rows", "column": None,
             "op": ">=", "threshold": 1.0},
        ]
        out = {r["name"]: r for r in evaluate_expectations(df, exps).collect()}
        assert not out["floor"]["passed"]  # null metric -> fail closed
        assert out["floor"]["value"] is None
        assert not out["nonempty"]["passed"]

    def test_malformed_op_raises(self, spark):
        """A malformed op must raise like an unknown metric does — not
        silently evaluate as '>=' (ADVICE r4)."""
        from jsonschema_spark.operators.quality import evaluate_expectations

        df = spark.createDataFrame([(1.0,)], "x double")
        for bad in ("<", "==", ">", "!="):
            with pytest.raises(ValueError, match="unknown expectation op"):
                evaluate_expectations(df, [
                    {"name": "a", "metric": "min", "column": "x",
                     "op": bad, "threshold": 0.0},
                ])

    def test_single_pass_plan(self, spark):
        from jsonschema_spark.operators.quality import evaluate_expectations
        from jsonschema_spark.plans.audit import assert_plan

        df = spark.createDataFrame([(1.0,)], "x double")
        exps = [
            {"name": "a", "metric": "min", "column": "x", "op": ">=",
             "threshold": 0.0},
            {"name": "b", "metric": "mean", "column": "x", "op": "<=",
             "threshold": 9.0},
        ]
        plan = evaluate_expectations(df, exps)
        assert_plan(plan, no_cartesian=True, no_row_python=True)


class TestSuggestConstraints:
    def test_suggestions_close_the_loop(self, spark):
        from jsonschema_spark.operators.quality import (
            evaluate_expectations,
            suggest_constraints,
        )

        df = spark.createDataFrame(
            [(1, "a", 5.0), (2, "a", 7.0), (3, None, 9.0)],
            "id bigint, cat string, x double",
        )
        out = suggest_constraints(
            df, ["id", "cat"], numeric_cols=["x"]
        ).collect()
        by = {(r["column"], r["kind"]): r for r in out}
        assert len(out) == 8  # 3 per profiled col + 2 per numeric col
        assert by[("id", "required")]["suggested"]
        assert by[("id", "unique")]["suggested"]
        assert not by[("cat", "required")]["suggested"]  # has a null
        assert not by[("cat", "unique")]["suggested"]  # 'a' repeats
        assert by[("cat", "enum_bounded")]["suggested"]
        assert by[("cat", "enum_bounded")]["threshold"] == 1.0
        assert by[("x", "min_bound")]["threshold"] == 5.0
        assert by[("x", "max_bound")]["threshold"] == 9.0
        # the loop: every suggested constraint re-verifies green
        exps = [
            {"name": f"{r['column']}_{r['kind']}", "metric": r["metric"],
             "column": r["column"] if r["metric"] != "n_rows" else None,
             "op": r["op"], "threshold": r["threshold"]}
            for r in out if r["suggested"] and r["metric"] != "n_distinct"
        ]
        verdicts = evaluate_expectations(df, exps).collect()
        assert verdicts and all(v["passed"] for v in verdicts)


class TestInclusionAudit:
    def test_partial_containment(self, spark):
        child = spark.createDataFrame(
            [(1,), (1,), (2,), (3,), (None,)], "k int"
        )
        parent = spark.createDataFrame([(1,), (2,), (9,), (None,)], "k int")
        row = inclusion_audit(child, "k", parent, "k").collect()[0]
        assert row["n_child_values"] == 3
        assert row["n_parent_values"] == 3
        assert row["n_missing_values"] == 1  # value 3
        assert row["containment"] == pytest.approx(2 / 3, abs=1e-6)

    def test_fk_candidate(self, spark):
        child = spark.createDataFrame([(1,), (2,)], "k int")
        parent = spark.createDataFrame([(1,), (2,), (3,)], "k int")
        row = inclusion_audit(child, "k", parent, "k").collect()[0]
        assert row["containment"] == 1.0 and row["n_missing_values"] == 0


class TestFreshnessAudit:
    def test_staleness_and_rate(self, spark):
        import datetime as dt

        t0 = dt.datetime(2026, 1, 1, 0, 0, 0)

        def ts(h):
            return t0 + dt.timedelta(hours=h)

        rows = (
            [("a", ts(0)), ("a", ts(12)), ("a", ts(24))]  # spans 1 day
            + [("b", ts(0)), ("b", ts(48))]  # last at the high-water mark
        )
        df = spark.createDataFrame(rows, "src string, ts timestamp")
        out = {r["group"]: r for r in freshness_audit(df, "src", "ts").collect()}
        day_us = 86_400_000_000
        assert out["a"]["n_events"] == 3
        assert out["a"]["staleness_us"] == day_us  # hw=48h, last=24h
        assert out["a"]["span_us"] == day_us
        assert out["a"]["events_per_day"] == pytest.approx(3.0)
        assert out["b"]["staleness_us"] == 0
        assert out["b"]["events_per_day"] == pytest.approx(1.0)

    def test_single_event_group(self, spark):
        import datetime as dt

        df = spark.createDataFrame(
            [("a", dt.datetime(2026, 1, 1))], "src string, ts timestamp"
        )
        row = freshness_audit(df, "src", "ts").collect()[0]
        assert row["span_us"] == 0 and row["events_per_day"] is None


class TestMetricAnomaly:
    def _hist(self, spark, values, metric="m"):
        rows = [(metric, f"2026-01-{i+1:02d}", float(v)) for i, v in enumerate(values)]
        return spark.createDataFrame(rows, "metric string, ds string, value double")

    def test_spike_flagged_warmup_not(self, spark):
        df = self._hist(spark, [10, 10, 10, 10, 11, 9, 100])
        out = {r["ds"]: r for r in metric_anomaly(df, window=6).collect()}
        # first three points: < min_periods priors -> never anomalous
        for ds in ("2026-01-01", "2026-01-02", "2026-01-03"):
            assert not out[ds]["is_anomaly"]
        last = out["2026-01-07"]
        prior = [10, 10, 10, 10, 11, 9]
        mean = sum(prior) / 6
        sd = math.sqrt(sum((x - mean) ** 2 for x in prior) / 5)
        assert last["prior_n"] == 6
        assert last["prior_mean"] == pytest.approx(mean, abs=1e-6)
        assert last["prior_std"] == pytest.approx(sd, abs=1e-6)
        assert last["z"] == pytest.approx((100 - mean) / sd, abs=1e-4)
        assert last["is_anomaly"]

    def test_flat_history_jump(self, spark):
        df = self._hist(spark, [5, 5, 5, 5, 6])
        out = {r["ds"]: r for r in metric_anomaly(df).collect()}
        last = out["2026-01-05"]
        assert last["prior_std"] == 0.0 and last["z"] is None
        assert last["is_anomaly"]  # flat priors, value moved
        assert not out["2026-01-04"]["is_anomaly"]

    def test_metrics_are_independent(self, spark):
        a = self._hist(spark, [10, 10, 10, 10], metric="a")
        b = self._hist(spark, [1000, 1000, 1000, 1000], metric="b")
        out = metric_anomaly(a.unionAll(b)).collect()
        assert not any(r["is_anomaly"] for r in out)
