"""Streaming metrics repository + anomaly gate: the continuous twin of
operators/quality.py::metric_anomaly (Deequ's metrics-repository anomaly
detection, Schelter et al. VLDB 2018), persisting per-micro-batch metric
values to a parquet repository and scoring each new batch against its
own metric history.

This is the north rule's "metrics persisted to a results table" made
continuous: every micro-batch appends one row per metric to
``repo_dir/batch_id=N`` and is judged against the trailing window of
STRICTLY EARLIER batches — the same replay-safe visibility rule as
streaming/neardup.py, so a checkpoint-replayed batch recomputes its
metrics from the same input, overwrites its own partition with identical
rows, and reaches the same verdict (idempotent by construction; the
batch's own half-written partition can never leak into its history).

Scale shape: each metric is ONE keyless map-side-combined aggregate over
the micro-batch (no shuffle of batch rows beyond the aggregate); the
repository is runs × metrics — metadata-sized — so the scoring pass is
driver-trivial while still running through the same partition-parallel
``metric_anomaly`` plan as the batch operator.
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.errors import AnalysisException

from jsonschema_spark.operators.quality import metric_anomaly

_SCHEMA = "metric string, batch_id long, value double"


def _read_history(spark, repo_dir: str, batch_id: int) -> Optional[DataFrame]:
    """Metric rows visible to ``batch_id``: strictly earlier partitions
    only (see module docstring for why the batch's own partition is
    excluded on replay)."""
    if not os.path.isdir(repo_dir):
        return None
    try:
        df = spark.read.parquet(repo_dir)
    except AnalysisException:
        # just-created/empty dir: no parquet footers yet, schema
        # inference fails — legitimately "no history". Any OTHER read
        # error (corrupt files, permissions) must propagate: a
        # monitoring gate that silently scores against empty history
        # fails open with no signal (ADVICE r4).
        return None
    return df.select(
        "metric", F.col("batch_id").cast("long").alias("batch_id"), "value"
    ).filter(F.col("batch_id") < F.lit(batch_id))


def metric_repository_monitor(
    metric_exprs: Dict[str, Column],
    repo_dir: str,
    window: int = 6,
    min_periods: int = 3,
    z_thresh: float = 3.0,
    on_report: Optional[Callable[[int, list], None]] = None,
):
    """Returns a foreachBatch function: per micro-batch, (1) compute every
    metric in ``metric_exprs`` (name → aggregate Column) with one keyless
    aggregate, (2) overwrite ``repo_dir/batch_id=N`` with the (metric,
    batch_id, value) rows, (3) score this batch's values against the
    strictly-earlier history via ``metric_anomaly`` and hand
    ``on_report(batch_id, reports)`` one dict per metric:
    ``{metric, value, prior_n, prior_mean, prior_std, z, is_anomaly}``.
    Metrics whose aggregate is NULL on an empty batch are recorded as NaN
    in the repository (for audit) but excluded from scoring on both
    sides — they are never anomalous and never poison a later window
    (Spark orders NaN above every number, so a NaN reaching a z-compare
    would otherwise flag)."""

    names = list(metric_exprs)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        agg_row = batch_df.agg(
            *[expr.alias(n) for n, expr in metric_exprs.items()]
        ).first()
        cur_rows = [
            (n, batch_id, float(agg_row[n]) if agg_row[n] is not None else float("nan"))
            for n in names
        ]
        cur = spark.createDataFrame(cur_rows, _SCHEMA)
        cur.write.mode("overwrite").parquet(
            os.path.join(repo_dir, f"batch_id={batch_id}")
        )
        hist = _read_history(spark, repo_dir, batch_id)
        full = (cur if hist is None else hist.unionByName(cur)).filter(
            ~F.isnan("value")
        )
        scored = metric_anomaly(
            full,
            metric_col="metric",
            ds_col="batch_id",
            value_col="value",
            window=window,
            min_periods=min_periods,
            z_thresh=z_thresh,
        ).filter(F.col("ds") == F.lit(batch_id))
        reports = [
            {
                "metric": r["metric"],
                "value": r["value"],
                "prior_n": r["prior_n"],
                "prior_mean": r["prior_mean"],
                "prior_std": r["prior_std"],
                "z": r["z"],
                "is_anomaly": bool(r["is_anomaly"]),
            }
            for r in scored.collect()
        ]
        if on_report is not None:
            on_report(batch_id, reports)

    return _process


def run_metric_monitor(
    stream_df: DataFrame,
    metric_exprs: Dict[str, Column],
    repo_dir: str,
    checkpoint_dir: str,
    reports: list,
    window: int = 6,
    min_periods: int = 3,
    z_thresh: float = 3.0,
):
    """Drain the stream with availableNow, appending ``(batch_id,
    [per-metric report dicts])`` tuples into ``reports`` (driver-side
    list; swap for a sink write in production)."""
    fb = metric_repository_monitor(
        metric_exprs,
        repo_dir,
        window=window,
        min_periods=min_periods,
        z_thresh=z_thresh,
        on_report=lambda bid, rep: reports.append((bid, rep)),
    )
    q = (
        stream_df.writeStream.foreachBatch(fb)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return reports
