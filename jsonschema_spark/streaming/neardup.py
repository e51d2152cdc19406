"""Streaming history near-dedup ingestion: each micro-batch near-dedups
against the band index of everything accepted so far, then appends its
survivors (rows + their LSH band rows) — the Structured Streaming twin of
``operators/dedup.py::incremental_minhash_new_docs`` and the unbounded
generalization of the reference's ``uniqueItems`` walk
(/root/reference/validate.go:320-370) to a corpus that never stops arriving.

foreachBatch is the right shape (not ``dropDuplicates``): near-dup state is
the full LSH band index of ACCEPTED history — it must persist across
restarts and grow with the corpus, not sit in the streaming state store
bounded by a watermark. The index lives as parquet on disk; each batch runs
the same asymmetric bucket join as the batch operator (batch bands are tiny;
the index side scales to 10^12 band rows because the join is an equi-join on
(band, h) with exact verification touching only candidate ids).

Exactly-once: survivors and band rows are written to hive-style
``batch_id=N`` partition directories with overwrite — a replayed micro-batch
(failure before the checkpoint commit) rewrites its own partition instead of
appending duplicates. Spark's streaming checkpoint (offsets) plus these
idempotent partition writes give the same resume contract as the batch
job's lineage table (plans/job.py).

Within-batch near-dups are NOT collapsed (both survive if neither matches
HISTORY) — same contract as the batch operator; run ``minhash_near_dup`` on
a micro-batch first if intra-batch dedup is required.
"""

from __future__ import annotations

import os
from typing import Callable, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from jsonschema_spark.operators.dedup import (
    incremental_minhash_new_docs,
    lsh_band_index,
)


def _read_or_none(spark, path: str) -> Optional[DataFrame]:
    """Read a partitioned parquet dir, or None while it has no files yet
    (bootstrap: the first micro-batch sees an empty history)."""
    if not os.path.isdir(path):
        return None
    try:
        return spark.read.parquet(path)
    except Exception:  # AnalysisException: unable to infer schema (no files)
        return None


def neardup_ingest(
    corpus_dir: str,
    index_dir: str,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 128,
    bands: int = 32,
    threshold: float = 0.8,
    elements: Column | None = None,
    shingle_sep: str = " ",
    on_batch: Optional[Callable[[int, dict], None]] = None,
):
    """Returns a foreachBatch function. Per micro-batch: survivors =
    ``incremental_minhash_new_docs(batch, accepted, snapshot_bands=index)``;
    survivors' rows land in ``corpus_dir/batch_id=N`` and their band rows
    (same signature parameters — a mismatch silently yields zero collisions)
    in ``index_dir/batch_id=N``. ``on_batch(batch_id, stats)`` receives
    ``{n_in, n_new, n_dropped, batch_id}``."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        # two traversals of the source batch (count + dedup pipeline)
        batch_df.persist()
        try:
            n_in = batch_df.count()
            seen = _read_or_none(spark, corpus_dir)
            index = _read_or_none(spark, index_dir)
            if seen is None or index is None or n_in == 0:
                survivors = batch_df
            else:
                survivors = incremental_minhash_new_docs(
                    batch_df,
                    seen.select(*batch_df.columns),
                    id_col,
                    text_col,
                    n,
                    num_hashes,
                    bands,
                    threshold,
                    elements=elements,
                    shingle_sep=shingle_sep,
                    snapshot_bands=index.select("id", "band", "h"),
                )
            part = f"batch_id={batch_id}"
            out_path = os.path.join(corpus_dir, part)
            survivors.write.mode("overwrite").parquet(out_path)
            # count from the written files — no second run of the dedup
            # plan; an all-dropped batch may write zero part files
            accepted = _read_or_none(spark, out_path)
            n_new = 0 if accepted is None else accepted.count()
            if n_new:
                lsh_band_index(
                    accepted,
                    id_col,
                    text_col,
                    n=n,
                    num_hashes=num_hashes,
                    bands=bands,
                    elements=elements,
                ).write.mode("overwrite").parquet(os.path.join(index_dir, part))
        finally:
            batch_df.unpersist()
        if on_batch is not None:
            on_batch(
                batch_id,
                {
                    "n_in": n_in,
                    "n_new": n_new,
                    "n_dropped": n_in - n_new,
                    "batch_id": batch_id,
                },
            )

    return _process


def run_neardup_ingest(
    stream_df: DataFrame,
    corpus_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    id_col: str,
    text_col: str,
    stats: list,
    n: int = 3,
    num_hashes: int = 128,
    bands: int = 32,
    threshold: float = 0.8,
    elements: Column | None = None,
    shingle_sep: str = " ",
):
    """Drain the stream with availableNow, one stats dict per micro-batch
    appended to ``stats``. Resume = rerun with the same ``checkpoint_dir``
    (only unprocessed source offsets replay; a replayed batch overwrites
    its own partitions)."""
    fb = neardup_ingest(
        corpus_dir,
        index_dir,
        id_col,
        text_col,
        n=n,
        num_hashes=num_hashes,
        bands=bands,
        threshold=threshold,
        elements=elements,
        shingle_sep=shingle_sep,
        on_batch=lambda bid, s: stats.append(s),
    )
    q = (
        stream_df.writeStream.foreachBatch(fb)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stats
