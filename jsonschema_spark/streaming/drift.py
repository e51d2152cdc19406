"""Streaming distribution-drift monitoring: per-micro-batch PSI/chi-square
of the incoming n_tok (or any numeric column) histogram against a baseline
snapshot, via foreachBatch.

foreachBatch is the right shape here: the drift comparison needs the
*whole* micro-batch histogram against a broadcast baseline — a tiny
aggregate per batch — and emits one report row per batch to a results sink.
The heavy lifting (the histogram) is the same one-pass map-side-combined
aggregation as the batch path; state stays O(bins).
"""

from __future__ import annotations

import time
from typing import Callable, Optional

from pyspark.sql import DataFrame

from jsonschema_spark.operators import drift as drift_ops
from jsonschema_spark.operators import stats as stats_ops


def drift_monitor(
    stream_df: DataFrame,
    column: str,
    baseline: DataFrame,
    bins: int,
    lo: float,
    hi: float,
    on_report: Optional[Callable[[int, dict], None]] = None,
    psi_threshold: float = 0.25,
):
    """Returns a foreachBatch function computing the drift report of each
    micro-batch vs the baseline histogram. ``on_report(batch_id, report)``
    receives {psi, chi_square, dof, drifted, n_rows, batch_id, ts}."""
    baseline_rows = baseline.collect()  # <= bins rows, driver-held

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        base = spark.createDataFrame(baseline_rows, baseline.schema)
        # persist: drift_report and the row count are two actions over the
        # same micro-batch — without it the source recomputes per action
        batch_df.persist()
        try:
            current = stats_ops.histogram(batch_df, column, bins, lo, hi)
            report = drift_ops.drift_report(
                current, base, key="bucket", psi_threshold=psi_threshold
            )
            n_rows = batch_df.count()
        finally:
            batch_df.unpersist()
        report.update({"n_rows": n_rows, "batch_id": batch_id, "ts": time.time()})
        if on_report is not None:
            on_report(batch_id, report)

    return _process


def run_drift_monitor(
    stream_df: DataFrame,
    column: str,
    baseline: DataFrame,
    bins: int,
    lo: float,
    hi: float,
    checkpoint_dir: str,
    reports: list,
    psi_threshold: float = 0.25,
):
    """Drain the stream with availableNow, appending one drift report per
    micro-batch into ``reports`` (driver-side list; swap for a sink write
    in production)."""
    fb = drift_monitor(
        stream_df, column, baseline, bins, lo, hi,
        on_report=lambda bid, rep: reports.append(rep),
        psi_threshold=psi_threshold,
    )
    q = (
        stream_df.writeStream.foreachBatch(fb)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return reports
