"""Streaming ingest integrity: per-micro-batch shard manifests appended to
a parquet state table, via foreachBatch.

foreachBatch is the right shape: the manifest is a tiny aggregate per
batch (rows = files in the batch), and the state is cross-restart parquet
(not the watermark-bounded state store) — re-running a batch overwrites
its own ``batch_id=N`` partition, so resume is idempotent (the same
exactly-once contract as streaming/neardup.py's index appends). Pair the
accumulated manifest with ``operators/checks.py::manifest_diff`` against
a trusted snapshot to localize a corrupted or re-fetched shard the moment
it enters the stream instead of at the next full-table audit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jsonschema_spark.operators.checks import shard_manifest


def manifest_writer(
    id_col: str,
    out_path: str,
    content_cols: list[str] | None = None,
):
    """Returns a foreachBatch function appending each micro-batch's shard
    manifest (plus ``batch_id``) to ``out_path``, idempotently per
    batch."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        m = shard_manifest(batch_df, id_col, content_cols=content_cols)
        (
            m.withColumn("batch_id", F.lit(batch_id))
            .repartition(1)
            .write.mode("overwrite")
            .partitionBy("batch_id")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(out_path)
        )

    return _process


def run_manifest_stream(
    stream_df: DataFrame,
    id_col: str,
    out_path: str,
    checkpoint: str,
    content_cols: list[str] | None = None,
):
    """Wire a file-source stream into the manifest writer; returns the
    StreamingQuery (caller awaits/stops)."""
    return (
        stream_df.writeStream.foreachBatch(
            manifest_writer(id_col, out_path, content_cols=content_cols)
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
