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
appending duplicates. Critically, the history a batch dedups against is
restricted to partitions from STRICTLY EARLIER batches (``batch_id <
current``): a replayed batch must never see its own previous attempt's
partition as "seen" — it would self-match at jaccard 1.0 and rewrite its
partition empty (data loss), and the lazy survivors plan would race the
overwrite that deletes the very files it reads. The partition filter also
makes a crash BETWEEN the survivor write and the index write repairable:
replay recomputes both partitions from pre-batch history only. Spark's
streaming checkpoint (offsets) plus these idempotent partition writes give
the same resume contract as the batch job's lineage table (plans/job.py).

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


def _read_history(spark, path: str, batch_id: int) -> Optional[DataFrame]:
    """History visible to micro-batch ``batch_id``: partitions written by
    strictly earlier batches only. Excluding ``batch_id=N`` itself is what
    makes replay idempotent — the filter is on the hive partition column,
    so partition pruning never even lists this batch's own stale files
    into the scan that the overwrite below is about to delete."""
    df = _read_or_none(spark, path)
    if df is None:
        return None
    return df.filter(F.col("batch_id") < F.lit(batch_id))


def _index_bands(
    spark, index_dir: str, index_table: Optional[str], batch_id: int
) -> Optional[DataFrame]:
    """The full band-row history visible to ``batch_id``: the compacted
    bucketed table (all of whose rows are from committed — hence strictly
    earlier — batches by the compaction precondition) unioned with the
    not-yet-compacted ``batch_id=N`` partitions from earlier batches."""
    parts = _read_history(spark, index_dir, batch_id)
    tbl = None
    if index_table is not None and spark.catalog.tableExists(index_table):
        tbl = spark.table(index_table).select("id", "band", "h")
    if parts is None:
        return tbl
    parts = parts.select("id", "band", "h")
    return parts if tbl is None else tbl.unionByName(parts)


def compact_band_index(
    spark,
    index_dir: str,
    index_table: str,
    upto_batch_id: int,
    num_buckets: int = 64,
) -> dict:
    """Maintenance pass for the streaming band index: fold every
    ``batch_id <= upto_batch_id`` partition of ``index_dir`` into the
    bucketed ``(band, h)`` table layout of
    ``operators/dedup.py::write_band_index_bucketed``, then remove the
    folded partition directories. Without it a long-lived ingest
    accumulates one directory per micro-batch — the classic small-file /
    listing problem — and every batch's candidate join re-shuffles the
    unbucketed history; after compaction the bulk of the index is read
    bucket-aligned (no Exchange, no re-sort).

    Replay contract: ``upto_batch_id`` MUST be at most the last batch the
    streaming checkpoint has COMMITTED (only the latest uncommitted batch
    can ever replay), and the pass must not run concurrently with an
    in-flight micro-batch. Under that precondition every compacted row is
    strictly-earlier history for any replayable batch, so
    ``_index_bands`` needs no batch_id filter on the table side.

    Crash safety: the fold materializes (localCheckpoint) BEFORE touching
    the table or the source directories. A crash between the table append
    and the directory removal leaves the folded rows present TWICE —
    harmless for correctness (the candidate join deduplicates pairs with
    ``distinct``) but a re-run would append them again; rewrite the table
    with ``write_band_index_bucketed(spark.table(t).distinct(), t)`` to
    reclaim. Directory removal uses local-filesystem semantics (this
    sandbox); an object-store deployment swaps in its FileSystem API.

    Returns ``{"folded_batches": k, "folded_rows": n}``."""
    import shutil

    df = _read_or_none(spark, index_dir)
    if df is None:
        return {"folded_batches": 0, "folded_rows": 0}
    fold = df.filter(F.col("batch_id") <= F.lit(upto_batch_id))
    batches = [r.batch_id for r in fold.select("batch_id").distinct().collect()]
    if not batches:
        return {"folded_batches": 0, "folded_rows": 0}
    rows = fold.select("id", "band", "h").localCheckpoint(eager=True)
    n = rows.count()
    mode = "append" if spark.catalog.tableExists(index_table) else "overwrite"
    (
        rows.write.mode(mode)
        .bucketBy(num_buckets, "band", "h")
        .sortBy("band", "h")
        .format("parquet")
        .saveAsTable(index_table)
    )
    for b in batches:
        shutil.rmtree(os.path.join(index_dir, f"batch_id={b}"), ignore_errors=True)
    return {"folded_batches": len(batches), "folded_rows": n}


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
    index_table: Optional[str] = None,
):
    """Returns a foreachBatch function. Per micro-batch: survivors =
    ``incremental_minhash_new_docs(batch, accepted, snapshot_bands=index)``;
    survivors' rows land in ``corpus_dir/batch_id=N`` and their band rows
    (same signature parameters — a mismatch silently yields zero collisions)
    in ``index_dir/batch_id=N``. ``on_batch(batch_id, stats)`` receives
    ``{n_in, n_new, n_dropped, batch_id}``. Pass ``index_table`` to also
    consult (and keep feeding, via ``compact_band_index``) a bucketed
    compacted history table."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        # two traversals of the source batch (count + dedup pipeline)
        batch_df.persist()
        try:
            n_in = batch_df.count()
            seen = _read_history(spark, corpus_dir, batch_id)
            index = _index_bands(spark, index_dir, index_table, batch_id)
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
                    snapshot_bands=index,
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
    index_table: Optional[str] = None,
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
        index_table=index_table,
    )
    q = (
        stream_df.writeStream.foreachBatch(fb)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stats
