"""Temporal operators (operators/temporal.py): as-of join, interval
containment join, gap sessionization — semantics pinned on tiny frames,
plan shape pinned to hash joins (never BroadcastNestedLoop)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from jsonschema_spark.operators.temporal import (
    asof_join,
    interval_join,
    sessionize,
)


def _ts(s: str) -> dt.datetime:
    return dt.datetime.strptime(s, "%Y-%m-%d %H:%M:%S")


class TestAsofJoin:
    def _frames(self, spark):
        fact = spark.createDataFrame(
            [
                (1, _ts("2024-01-01 00:00:00"), "k1"),  # before first rev
                (2, _ts("2024-01-02 00:00:00"), "k1"),  # tie with rev A
                (3, _ts("2024-01-05 12:00:00"), "k1"),  # between A and B
                (4, _ts("2024-01-20 00:00:00"), "k1"),  # after B
                (5, _ts("2024-01-10 00:00:00"), "k9"),  # key not in dim
            ],
            "event_id long, ts timestamp, k string",
        )
        dim = spark.createDataFrame(
            [
                ("k1", _ts("2024-01-02 00:00:00"), 10.0),   # rev A
                ("k1", _ts("2024-01-10 00:00:00"), 20.0),   # rev B
                ("k2", _ts("2024-01-01 00:00:00"), 99.0),
            ],
            "k string, rev_ts timestamp, thr double",
        )
        return fact, dim

    def test_semantics(self, spark):
        fact, dim = self._frames(spark)
        out = {
            r["event_id"]: r["thr"]
            for r in asof_join(
                fact, dim, "k", "ts", dim_ts_col="rev_ts"
            ).collect()
        }
        assert out == {1: None, 2: 10.0, 3: 10.0, 4: 20.0, 5: None}

    def test_null_payload_supersedes(self, spark):
        # a revision that sets the payload to NULL must hide the older
        # value (the struct carry, not per-column last-ignorenulls)
        fact = spark.createDataFrame(
            [(1, _ts("2024-01-05 00:00:00"), "k")],
            "event_id long, ts timestamp, k string",
        )
        dim = spark.createDataFrame(
            [
                ("k", _ts("2024-01-01 00:00:00"), 1.0),
                ("k", _ts("2024-01-03 00:00:00"), None),
            ],
            "k string, rev_ts timestamp, thr double",
        )
        [row] = asof_join(fact, dim, "k", "ts", dim_ts_col="rev_ts").collect()
        assert row["thr"] is None

    def test_no_join_operator_in_plan(self, spark):
        fact, dim = self._frames(spark)
        plan = asof_join(
            fact, dim, "k", "ts", dim_ts_col="rev_ts"
        )._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoop" not in plan
        assert "Join" not in plan  # union + window: no join at all


class TestIntervalJoin:
    def _frames(self, spark):
        pts = spark.createDataFrame(
            [
                (1, _ts("2024-01-02 03:00:00")),  # inside w0
                (2, _ts("2024-01-02 06:00:00")),  # == w0 end (inclusive)
                (3, _ts("2024-01-02 06:00:01")),  # just outside
                (4, _ts("2024-01-15 13:00:00")),  # inside w3 AND w4
                (5, _ts("2024-01-25 00:00:00")),  # uncovered
            ],
            "event_id long, ts timestamp",
        )
        win = spark.createDataFrame(
            [
                ("w0", _ts("2024-01-02 00:00:00"), _ts("2024-01-02 06:00:00")),
                ("w3", _ts("2024-01-15 00:00:00"), _ts("2024-01-16 00:00:00")),
                ("w4", _ts("2024-01-15 12:00:00"), _ts("2024-01-15 18:00:00")),
            ],
            "window_id string, start_ts timestamp, end_ts timestamp",
        )
        return pts, win

    def test_inner_semantics(self, spark):
        pts, win = self._frames(spark)
        got = sorted(
            (r["event_id"], r["window_id"])
            for r in interval_join(
                pts, win, "ts", "start_ts", "end_ts", bucket_seconds=3600
            ).collect()
        )
        assert got == [(1, "w0"), (2, "w0"), (4, "w3"), (4, "w4")]

    def test_left_keeps_uncovered(self, spark):
        pts, win = self._frames(spark)
        got = sorted(
            (r["event_id"], r["window_id"])
            for r in interval_join(
                pts,
                win,
                "ts",
                "start_ts",
                "end_ts",
                bucket_seconds=86400,
                how="left",
            ).collect()
        )
        assert got == [
            (1, "w0"),
            (2, "w0"),
            (3, None),
            (4, "w3"),
            (4, "w4"),
            (5, None),
        ]

    def test_bucket_width_invariance_and_plan(self, spark):
        pts, win = self._frames(spark)
        for width in (60, 3600, 7 * 86400):
            got = sorted(
                (r["event_id"], r["window_id"])
                for r in interval_join(
                    pts, win, "ts", "start_ts", "end_ts", bucket_seconds=width
                ).collect()
            )
            assert got == [(1, "w0"), (2, "w0"), (4, "w3"), (4, "w4")]
        plan = interval_join(
            pts, win, "ts", "start_ts", "end_ts", bucket_seconds=3600
        )._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoop" not in plan
        with pytest.raises(ValueError):
            interval_join(
                pts, win, "ts", "start_ts", "end_ts", 60, how="outer"
            )


class TestSessionize:
    def test_closed_form(self, spark):
        base = _ts("2024-01-01 00:00:00")
        rows = [
            # user 1: 3 events 10 min apart, then a 3h gap, then 1 more
            (1, base, 1.0),
            (1, base + dt.timedelta(minutes=10), 2.0),
            (1, base + dt.timedelta(minutes=20), 3.0),
            (1, base + dt.timedelta(hours=3, minutes=20), 4.0),
            # user 2: single event
            (2, base + dt.timedelta(days=1), 10.0),
        ]
        df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
        out = {
            (r["user_id"], r["session_seq"]): r
            for r in sessionize(
                df, "user_id", "ts", gap_seconds=7200, agg_value=F.col("value")
            ).collect()
        }
        assert set(out) == {(1, 1), (1, 2), (2, 1)}
        s11 = out[(1, 1)]
        assert s11["n_events"] == 3
        assert s11["duration_us"] == 20 * 60 * 1_000_000
        assert s11["value_sum"] == 6.0
        s12 = out[(1, 2)]
        assert (s12["n_events"], s12["duration_us"], s12["value_sum"]) == (
            1, 0, 4.0,
        )
        assert out[(2, 1)]["n_events"] == 1

    def test_gap_boundary_exclusive(self, spark):
        # a gap EXACTLY equal to gap_seconds does NOT split
        base = _ts("2024-01-01 00:00:00")
        df = spark.createDataFrame(
            [(1, base, 0.0), (1, base + dt.timedelta(seconds=100), 0.0)],
            "user_id long, ts timestamp, value double",
        )
        assert sessionize(df, "user_id", "ts", gap_seconds=100).count() == 1
        assert sessionize(df, "user_id", "ts", gap_seconds=99).count() == 2


class TestWatermarkAudit:
    def test_matches_python_prefix_scan(self, spark):
        from jsonschema_spark.operators.temporal import watermark_audit

        base = 1_700_000_000
        ts_sec = [10, 5, 20, 15, 30, 25, 40, 1, 50, 45]
        rows = [
            (i, dt.datetime.utcfromtimestamp(base + s))
            for i, s in enumerate(ts_sec)
        ]
        df = spark.createDataFrame(rows, "arrival long, ts timestamp")
        # bucket_size=4 forces the cross-bucket broadcast-prefix path
        got = {
            r["lateness_sec"]: r["n_events"]
            for r in watermark_audit(df, "arrival", "ts", bucket_size=4).collect()
        }
        run, want = -1, {}
        for s in ts_sec:
            run = max(run, s)
            late = run - s
            want[late] = want.get(late, 0) + 1
        assert got == want
        # event arriving 7th (ts=1) saw running max 40 from bucket 0/1
        assert want[39] == 1 and got[39] == 1

    def test_sorted_stream_all_zero(self, spark):
        from jsonschema_spark.operators.temporal import watermark_audit

        df = spark.range(100).select(
            F.col("id").alias("arrival"),
            F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id")).alias("ts"),
        )
        [row] = watermark_audit(df, "arrival", "ts", bucket_size=16).collect()
        assert (row["lateness_sec"], row["n_events"]) == (0, 100)


class TestRollupFromPartials:
    def test_merged_partials_equal_direct(self, spark):
        from jsonschema_spark.operators.temporal import rollup_from_partials

        base = _ts("2024-01-01 00:00:00")
        rows = [
            (base + dt.timedelta(minutes=17 * i), float((i * 7) % 13) + 0.25)
            for i in range(300)  # spans ~3.5 days, many hours
        ]
        df = spark.createDataFrame(rows, "ts timestamp, value double")
        got = {
            r["bucket"]: r
            for r in rollup_from_partials(
                df, "ts", "value", fine="hour", coarse="day"
            ).collect()
        }
        want = {
            r["bucket"]: r
            for r in df.groupBy(
                F.date_format(
                    F.date_trunc("day", F.col("ts")), "yyyy-MM-dd"
                ).alias("bucket")
            )
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.round(F.sum("value"), 6).alias("value_sum"),
                F.round(F.min("value"), 6).alias("value_min"),
                F.round(F.max("value"), 6).alias("value_max"),
                F.round(F.sum("value") / F.count(F.lit(1)), 6).alias(
                    "value_avg"
                ),
            )
            .collect()
        }
        assert set(got) == set(want) and len(got) >= 4
        for k in got:
            assert got[k].asDict() == want[k].asDict()
