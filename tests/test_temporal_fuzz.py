"""Seeded differential fuzz for the temporal operators: random event /
revision streams (plus adversarial edges — ties, before-first-revision
facts, unknown keys, exact-gap boundaries, bucket-boundary intervals)
run through the Spark operators and compared against independent
pure-Python models, the same two-backend discipline the token/keyword
fuzzers apply."""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import functions as F

from jsonschema_spark.operators.temporal import (
    asof_join,
    interval_join,
    sessionize,
    watermark_audit,
)

BASE = dt.datetime(2024, 1, 1)


def _t(sec: int) -> dt.datetime:
    return BASE + dt.timedelta(seconds=sec)


def test_asof_join_fuzz_vs_python(spark):
    rng = random.Random(404)
    keys = ["a", "b", "c", "d"]
    dim_rows = []
    for k in keys[:3]:  # key "d" deliberately absent from dim
        times = sorted(rng.sample(range(0, 10_000, 10), 6))
        for j, s in enumerate(times):
            dim_rows.append((k, _t(s), float(j) if j != 2 else None))
    fact_rows = []
    for i in range(200):
        k = rng.choice(keys)
        s = rng.randrange(-100, 10_500)
        fact_rows.append((i, _t(s), k))
    # adversarial: exact-tie facts on every dim revision time
    nxt = len(fact_rows)
    for k, ts, _ in dim_rows[:8]:
        fact_rows.append((nxt, ts, k))
        nxt += 1

    fact = spark.createDataFrame(
        fact_rows, "event_id long, ts timestamp, k string"
    )
    dim = spark.createDataFrame(
        dim_rows, "k string, rev_ts timestamp, v double"
    )
    got = {
        r["event_id"]: r["v"]
        for r in asof_join(fact, dim, "k", "ts", dim_ts_col="rev_ts").collect()
    }

    by_key: dict = {}
    for k, ts, v in dim_rows:
        by_key.setdefault(k, []).append((ts, v))
    for k in by_key:
        by_key[k].sort(key=lambda x: x[0])
    want = {}
    for eid, ts, k in fact_rows:
        best = None
        for rts, v in by_key.get(k, []):
            if rts <= ts:
                best = v
            else:
                break
        want[eid] = best
    assert got == want


def test_interval_join_fuzz_vs_python(spark):
    rng = random.Random(405)
    ivals = []
    for i in range(12):
        s = rng.randrange(0, 9_000)
        ivals.append((f"w{i}", _t(s), _t(s + rng.choice([1, 59, 60, 61, 600, 3600]))))
    pts = [(i, _t(rng.randrange(-50, 10_000))) for i in range(150)]
    # adversarial: points exactly on interval starts/ends
    nxt = 150
    for _, s, e in ivals[:6]:
        pts.append((nxt, s))
        pts.append((nxt + 1, e))
        nxt += 2

    pdf = spark.createDataFrame(pts, "event_id long, ts timestamp")
    idf = spark.createDataFrame(
        ivals, "window_id string, start_ts timestamp, end_ts timestamp"
    )
    for width in (60, 600):
        got = sorted(
            (r["event_id"], r["window_id"])
            for r in interval_join(
                pdf, idf, "ts", "start_ts", "end_ts", bucket_seconds=width
            ).collect()
        )
        want = sorted(
            (eid, w)
            for eid, ts in pts
            for w, s, e in ivals
            if s <= ts <= e
        )
        assert got == want, f"width={width}"


def test_sessionize_fuzz_vs_python(spark):
    rng = random.Random(406)
    rows = []
    for u in range(6):
        s = rng.randrange(0, 100)
        for _ in range(rng.randrange(1, 40)):
            rows.append((u, _t(s), float(u)))
            # include the exact-gap boundary (does NOT split: > gap splits)
            s += rng.choice([1, 30, 100, 101, 500])
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    got = {
        (r["user_id"], r["session_seq"]): (
            r["start_us"], r["end_us"], r["n_events"], r["duration_us"]
        )
        for r in sessionize(
            df, "user_id", "ts", gap_seconds=100, agg_value=F.col("value")
        ).collect()
    }

    epoch = dt.datetime(1970, 1, 1)
    by_user: dict = {}
    for u, ts, _ in rows:
        # naive datetimes are UTC under the session's pinned timezone
        by_user.setdefault(u, []).append(
            int((ts - epoch).total_seconds() * 1_000_000)
        )
    want = {}
    for u, times in by_user.items():
        times.sort()
        seq, start, prev, cnt = 1, times[0], times[0], 0
        for t in times:
            if t - prev > 100 * 1_000_000:
                want[(u, seq)] = (start, prev, cnt, prev - start)
                seq, start, cnt = seq + 1, t, 0
            cnt += 1
            prev = t
        want[(u, seq)] = (start, prev, cnt, prev - start)
    assert {k: v[:2] + (v[2],) + (v[3],) for k, v in want.items()} == got


def test_watermark_audit_fuzz_vs_python(spark):
    rng = random.Random(407)
    ts_sec = [rng.randrange(0, 5_000) for _ in range(500)]
    rows = [(i, _t(s)) for i, s in enumerate(ts_sec)]
    df = spark.createDataFrame(rows, "arrival long, ts timestamp")
    for bucket in (7, 64, 1 << 20):
        got = {
            r["lateness_sec"]: r["n_events"]
            for r in watermark_audit(
                df, "arrival", "ts", bucket_size=bucket
            ).collect()
        }
        run, want = -(10**9), {}
        for s in ts_sec:
            run = max(run, s)
            late = run - s
            want[late] = want.get(late, 0) + 1
        assert got == want, f"bucket={bucket}"
