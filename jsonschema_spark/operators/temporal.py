"""Temporal operators: as-of join, interval (range) containment join, and
gap-based sessionization — the three time-indexed shapes a validation /
curation pipeline needs around an event stream that stock Spark has no
single operator for (the reference has no time axis at all; these are
north-rule "new semantics", like the drift checks).

Each is built so the physical plan is a HASH join / one keyed shuffle —
never a BroadcastNestedLoopJoin:

- ``asof_join``: the classic union-and-carry-forward formulation — one
  shuffle of fact∪dim on the key, a per-key ordered window carrying the
  last dim payload forward. No range condition ever reaches the join
  planner, so there is nothing for it to plan as a nested loop.
- ``interval_join``: equi-join on a fixed-width time-bucket key (each
  interval explodes to the buckets it covers, each point computes its
  bucket) with the exact containment predicate as a residual filter —
  the standard de-thetafication; candidate volume is |points| +
  Σ(interval span / width), not |points| × |intervals|.
- ``sessionize``: one shuffle on the entity key; lag + running-sum
  windows ordered by time within each key.

Skew note (100 TB): a single hot key serializes its window partition in
``asof_join``/``sessionize``. Both compose with pre-salting the key by a
coarse time bucket when per-key volume is pathological (sessionization
is bucket-separable whenever gap << bucket width; as-of needs the
previous bucket's last dim row seeded into each bucket — the standard
watermark-carry trick). The operators themselves stay oblivious.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    fact: DataFrame,
    dim: DataFrame,
    key_col: str,
    ts_col: str,
    dim_ts_col: str | None = None,
    payload_cols: list | None = None,
) -> DataFrame:
    """LEFT as-of join: every fact row picks up the payload of the
    LATEST dim row with ``dim.ts <= fact.ts`` for the same key (ties
    inclusive: a dim revision stamped exactly at the fact timestamp
    applies to it — DuckDB/kdb ``ASOF JOIN`` semantics). Fact rows
    before a key's first revision, or with a key the dim never saw,
    keep NULL payloads. Output = all fact columns + ``payload_cols``
    (default: every dim column except the key and its timestamp).

    Spark shape: tag-union both sides, ONE shuffle on the key, then a
    per-key window ordered by ``(ts, tag)`` (dim tag 0 sorts before
    fact tag 1 at equal timestamps) carries each payload forward with
    ``last(..., ignorenulls=True)``. The range condition never reaches
    a join planner — there is no join operator at all, so the plan can
    never degrade to the BroadcastNestedLoop a ``BETWEEN``-theta
    formulation plans into at scale.
    """
    dim_ts_col = dim_ts_col or ts_col
    if payload_cols is None:
        payload_cols = [
            c for c in dim.columns if c not in (key_col, dim_ts_col)
        ]
    fact_cols = [c for c in fact.columns if c != key_col]
    # the whole dim payload rides as ONE struct, so a revision that sets
    # a payload field to NULL still supersedes the previous revision
    # (per-column last(ignorenulls) would resurrect the old value)
    d_side = dim.select(
        F.col(key_col).alias("_k"),
        F.col(dim_ts_col).alias("_ts"),
        F.lit(0).alias("_tag"),
        F.lit(None).cast("struct<" + ",".join(
            f"`{c}`:{fact.schema[c].dataType.simpleString()}"
            for c in fact_cols
        ) + ">").alias("_fact")
        if fact_cols
        else F.lit(None).alias("_fact"),
        F.struct(*[F.col(c) for c in payload_cols]).alias("_dim"),
    )
    f_side = fact.select(
        F.col(key_col).alias("_k"),
        F.col(ts_col).alias("_ts"),
        F.lit(1).alias("_tag"),
        F.struct(*[F.col(c) for c in fact_cols]).alias("_fact"),
        F.lit(None).cast(d_side.schema["_dim"].dataType).alias("_dim"),
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = f_side.unionByName(d_side).select(
        "_tag",
        "_k",
        "_fact",
        F.last("_dim", ignorenulls=True).over(w).alias("_dim"),
    )
    return carried.filter(F.col("_tag") == 1).select(
        F.col("_k").alias(key_col),
        *[F.col("_fact").getField(c).alias(c) for c in fact_cols],
        *[F.col("_dim").getField(c).alias(c) for c in payload_cols],
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int,
    how: str = "inner",
) -> DataFrame:
    """Containment join: pair every point row with every interval row
    whose ``[start, end]`` (inclusive both ends) contains the point's
    timestamp. Overlapping intervals all match; ``how='left'`` keeps
    uncovered points with NULL interval columns.

    Spark shape: the theta condition is rewritten as an EQUI-join on a
    fixed-width time-bucket key — each interval explodes to the
    ``span/width + 1`` buckets it touches, each point computes its one
    bucket, and the exact ``BETWEEN`` runs as a residual filter on
    hash-join candidates. Candidate volume is |points| + Σ interval
    replication, never |points| × |intervals| — the
    BroadcastNestedLoopJoin a naive range predicate plans into is
    exactly what dies first at 100 TB. Pick ``bucket_seconds`` near the
    typical interval length: wider buckets cost residual misses,
    narrower ones interval replication. The left variant runs the same
    inner join then anti-joins the points back (two hash joins, still
    no nested loop).
    """
    if how not in ("inner", "left"):
        raise ValueError("how must be 'inner' or 'left'")
    b = F.lit(int(bucket_seconds))
    pts = points.select(
        F.floor(F.unix_timestamp(F.col(ts_col)) / b).alias("_bucket"),
        *[F.col(c) for c in points.columns],
    )
    blown = intervals.select(
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start_col)) / b),
                F.floor(F.unix_timestamp(F.col(end_col)) / b),
            )
        ).alias("_bucket"),
        *[F.col(c) for c in intervals.columns],
    )
    matches = (
        pts.join(blown, on="_bucket")
        .filter(
            (F.col(ts_col) >= F.col(start_col))
            & (F.col(ts_col) <= F.col(end_col))
        )
        .drop("_bucket")
    )
    if how == "inner":
        return matches
    uncovered = points.join(
        matches.select(*points.columns).distinct(),
        on=list(points.columns),
        how="left_anti",
    )
    for c in intervals.columns:
        uncovered = uncovered.withColumn(
            c, F.lit(None).cast(intervals.schema[c].dataType)
        )
    return matches.unionByName(uncovered)


def watermark_audit(
    df: DataFrame,
    order_col: str,
    ts_col: str,
    bucket_size: int = 1 << 20,
) -> DataFrame:
    """(lateness_sec, n_events): the exact out-of-orderness histogram of
    an event stream — each event's lateness is ``running_max(event
    time over everything that ARRIVED before it) − its own event
    time``, with arrival order given by ``order_col`` (an ingest
    sequence / offset). This is precisely the delay a Structured
    Streaming watermark must absorb: the histogram's p99 tail IS the
    ``withWatermark`` setting that keeps 99% of events inside the
    horizon, measured instead of guessed.

    Scale shape: a global running max is an ordered prefix scan — the
    naive window (``ORDER BY order`` unpartitioned) single-partitions
    the corpus. Same cure as global_shuffle_order: ``order/bucket_size``
    range buckets are order-preserving, so one map-side-combined
    per-bucket max (≤ n/bucket_size driver rows) turns into broadcast
    EXCLUSIVE prefix maxima, and the within-bucket running max is a
    window over ~bucket_size-row partitions. The histogram aggregate is
    keyed by whole seconds of lateness — bounded by the actual
    disorder, not the corpus.
    """
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    base = (
        df.select(
            F.col(order_col).alias("_o"),
            us.alias("_us"),
            F.floor(F.col(order_col) / F.lit(int(bucket_size))).alias("_b"),
        )
    ).localCheckpoint(eager=False)
    per_bucket = (
        base.groupBy("_b").agg(F.max("_us").alias("_mx")).collect()
    )
    prefix = []
    run = None
    for r in sorted(per_bucket, key=lambda r: r["_b"]):
        prefix.append((r["_b"], run))
        run = r["_mx"] if run is None else max(run, r["_mx"])
    pre = df.sparkSession.createDataFrame(
        prefix, "_b long, _pre long"
    )
    w = (
        Window.partitionBy("_b")
        .orderBy("_o")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = F.greatest(
        F.max("_us").over(w), F.coalesce(F.col("_pre"), F.lit(0))
    )
    return (
        base.join(F.broadcast(pre), "_b")
        .select(
            F.floor((running - F.col("_us")) / F.lit(1_000_000))
            .cast("long")
            .alias("lateness_sec")
        )
        .groupBy("lateness_sec")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy("lateness_sec")
    )


def rollup_from_partials(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    fine: str = "hour",
    coarse: str = "day",
    decimals: int = 6,
) -> DataFrame:
    """(bucket, n_events, value_sum, value_min, value_max, value_avg) at
    the COARSE granularity, computed by re-aggregating the FINE level's
    partial aggregates — the continuous-aggregate / hypertable-rollup
    pattern: raw events are scanned once to build the fine level, and
    every coarser level merges partials (count→sum, sum→sum, min→min,
    max→max, avg = merged sum / merged count). The test/oracle contract
    is that this equals aggregating the raw events directly at the
    coarse grain — the mergeability proof that makes the fine table a
    safe materialization to serve every coarser query from.

    Scale shape: shuffle #1 is keyed by the fine bucket (map-side
    combined: partitions × fine-buckets rows at most); shuffle #2 runs
    over ≤ |fine buckets| rows — raw data is never re-scanned for the
    coarse level.
    """
    ts = F.col(ts_col).cast("timestamp")
    fine_tbl = (
        df.select(
            F.date_trunc(fine, ts).alias("_f"),
            F.col(value_col).alias("_v"),
        )
        .groupBy("_f")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("_v").alias("s"),
            F.min("_v").alias("mn"),
            F.max("_v").alias("mx"),
        )
    )
    return (
        fine_tbl.groupBy(
            F.date_format(F.date_trunc(coarse, F.col("_f")), "yyyy-MM-dd")
            .alias("bucket")
        )
        .agg(
            F.sum("n").alias("n_events"),
            F.round(F.sum("s"), decimals).alias("value_sum"),
            F.round(F.min("mn"), decimals).alias("value_min"),
            F.round(F.max("mx"), decimals).alias("value_max"),
            F.round(F.sum("s") / F.sum("n"), decimals).alias("value_avg"),
        )
        .orderBy("bucket")
    )


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int,
    agg_value: Column | None = None,
    decimals: int = 6,
) -> DataFrame:
    """Gap-based sessions: ``(key, session_seq, start_us, end_us,
    n_events, duration_us, value_sum)`` — a new session starts whenever
    the gap since the key's previous event exceeds ``gap_seconds``.
    ``session_seq`` is the key's 1-based session ordinal; session
    bounds are exact epoch MICROSECONDS (integers — no float timestamp
    formatting for two engines to disagree on). ``agg_value`` is an
    optional per-event metric summed per session (defaults to 0.0).

    Spark shape: one shuffle on the entity key; ``lag`` + running-sum
    windows ordered by event time within each key produce the session
    ordinal, then one groupBy on (key, session_seq) — the window and
    the aggregate reuse the same hash partitioning, so the whole
    operator is a single exchange. For keys whose event volume breaks
    a single window partition, pre-split the key by a coarse time
    bucket (gap << bucket width makes sessions bucket-separable).
    """
    # parquet TIMESTAMP_NTZ needs the cast; the session pins UTC so the
    # reinterpretation is identity
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    wk = Window.partitionBy("_key").orderBy("_us")
    gap = int(gap_seconds) * 1_000_000
    base = df.select(
        F.col(key_col).alias("_key"),
        us.alias("_us"),
        (agg_value if agg_value is not None else F.lit(0.0)).alias("_v"),
    )
    with_id = base.select(
        "_key",
        "_us",
        "_v",
        (
            F.sum(
                F.when(
                    F.col("_us") - F.lag("_us").over(wk) > F.lit(gap),
                    F.lit(1),
                ).otherwise(F.lit(0))
            )
            .over(wk.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            + 1
        ).alias("session_seq"),
    )
    return (
        with_id.groupBy("_key", "session_seq")
        .agg(
            F.min("_us").alias("start_us"),
            F.max("_us").alias("end_us"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("_v"), decimals).alias("value_sum"),
        )
        .select(
            F.col("_key").alias(key_col),
            F.col("session_seq").cast("long").alias("session_seq"),
            "start_us",
            "end_us",
            "n_events",
            (F.col("end_us") - F.col("start_us")).alias("duration_us"),
            "value_sum",
        )
    )
