"""Sequence packing: assign documents to fixed token-budget training
windows (new semantics per the north rule — the reference validates
single documents; a training-data pipeline must also *assemble* them
into context-window-sized packs, and the pack assignment is itself a
checkable table property).

Semantics (deterministic, engine-replayable): documents are first
routed to one of ``streams`` independent pack streams by a portable
content hash of the id, then each stream is walked in (hash, id) order
with the classic greedy rule — if the running total plus the next doc
fits the budget, append; otherwise start a new pack. A document larger
than the budget occupies its own (oversize) pack. Because both the
routing and the walk order are pure functions of row content, the
assignment is byte-identical across partitionings, re-runs, and engines
— a recursive-CTE oracle replays it exactly.

Scale shape: ONE shuffle (groupBy stream); the greedy walk runs per
stream inside an Arrow-batched ``applyInPandas`` kernel whose state is a
single running total — O(rows/streams) memory per task. Pick ``streams``
so a stream's rows fit an executor (10^12 docs / 2^20 streams ≈ 10^6
rows ≈ tens of MB of (id, n_tok) pairs). The walk is inherently
sequential per stream (data-dependent reset — no closed form), which is
exactly why the stream fan-out exists: parallelism comes from streams,
not from vectorizing the recurrence. Cross-stream packing quality is
unaffected in expectation (hash routing is uniform), and fill ratio
concentrates fast for budget >> median doc length.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from jsonschema_spark.functions.text import portable_hash60


def pack_assignments(
    df: DataFrame,
    id_col: str,
    tok_col: str,
    budget: int,
    streams: int = 8,
) -> DataFrame:
    """Per-document pack assignment
    ``(id, n_tok, stream, pack_id, pack_pos)``: ``pack_id`` counts packs
    within the stream from 0 in walk order, ``pack_pos`` the document's
    position within its pack. Global pack identity is (stream, pack_id).
    """
    routed = df.select(
        F.col(id_col).alias("id"),
        F.col(tok_col).cast("long").alias("n_tok"),
        F.pmod(
            portable_hash60(F.col(id_col).cast("string")), F.lit(streams)
        ).cast("int").alias("stream"),
        portable_hash60(F.col(id_col).cast("string")).alias("_h"),
    )
    id_field = df.schema[id_col].dataType
    out_schema = T.StructType(
        [
            T.StructField("id", id_field),
            T.StructField("n_tok", T.LongType()),
            T.StructField("stream", T.IntegerType()),
            T.StructField("pack_id", T.LongType()),
            T.StructField("pack_pos", T.LongType()),
        ]
    )

    def walk(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["_h", "id"], kind="mergesort")
        toks = pdf["n_tok"].to_numpy()
        pack_ids = [0] * len(toks)
        pack_pos = [0] * len(toks)
        acc = 0
        pack = 0
        pos = 0
        for i, n in enumerate(toks):
            if i == 0:
                acc, pos = int(n), 0
            elif acc + int(n) <= budget:
                acc += int(n)
                pos += 1
            else:
                acc, pos = int(n), 0
                pack += 1
            pack_ids[i] = pack
            pack_pos[i] = pos
        out = pdf[["id", "n_tok", "stream"]].copy()
        out["pack_id"] = pack_ids
        out["pack_pos"] = pack_pos
        return out

    return routed.groupBy("stream").applyInPandas(walk, schema=out_schema)


def pack_summary(
    df: DataFrame,
    id_col: str,
    tok_col: str,
    budget: int,
    streams: int = 8,
    decimals: int = 6,
) -> DataFrame:
    """Per-pack summary ``(stream, pack_id, n_docs, pack_tokens,
    fill_ratio, oversize)`` — the table the packing acceptance gate reads
    (fill_ratio distribution, oversize count). Aggregating the
    assignment table is one more tiny shuffle on (stream, pack_id)."""
    a = pack_assignments(df, id_col, tok_col, budget, streams)
    return (
        a.groupBy("stream", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("pack_tokens"),
        )
        .select(
            "stream",
            "pack_id",
            "n_docs",
            "pack_tokens",
            F.round(
                F.least(
                    F.col("pack_tokens") / F.lit(float(budget)), F.lit(1.0)
                ),
                decimals,
            ).alias("fill_ratio"),
            (F.col("pack_tokens") > budget).alias("oversize"),
        )
    )


def packing_efficiency(
    df: DataFrame,
    id_col: str,
    tok_col: str,
    budget: int,
    streams: int = 8,
    decimals: int = 6,
) -> DataFrame:
    """One-row packing quality report ``(n_docs, n_packs, total_tokens,
    n_oversize, fill_ratio)`` where fill_ratio counts only non-oversize
    packs (oversize packs are single docs the budget cannot host)."""
    s = pack_summary(df, id_col, tok_col, budget, streams)
    regular = F.when(~F.col("oversize"), F.col("pack_tokens"))
    return s.agg(
        F.sum("n_docs").alias("n_docs"),
        F.count(F.lit(1)).alias("n_packs"),
        F.sum("pack_tokens").alias("total_tokens"),
        F.sum(F.col("oversize").cast("long")).alias("n_oversize"),
        F.round(
            F.sum(regular)
            / (
                F.lit(float(budget))
                * F.sum((~F.col("oversize")).cast("long"))
            ),
            decimals,
        ).alias("fill_ratio"),
    )


def chunk_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    max_len: int = 64,
    stride: int | None = None,
) -> DataFrame:
    """Context-window chunking — the inverse of packing: split every
    sequence into windows of at most ``max_len`` tokens starting every
    ``stride`` positions (default ``stride = max_len`` → disjoint chunks;
    ``stride < max_len`` → sliding overlap so no next-token prediction
    straddles a hard cut). Output ``(id, chunk_idx, tokens, n_tok)``
    preserves lineage; chunk 0 starts at position 1, chunk i at
    ``1 + i*stride``; the last chunk may be short; an empty sequence
    yields no chunks. Chunk starts stop at the FIRST window that reaches
    the final token (the sliding-window rule tokenizer overflow uses), so
    no emitted window is fully contained in the previous one.

    Scale shape: one scan-stage HOF builds the per-row chunk array, then
    one ``posexplode`` emits chunk rows — embarrassingly parallel, zero
    shuffle, zero Python; output size is input size × overlap factor, the
    same blow-up any trainer pays materializing windows.
    """
    if stride is None:
        stride = max_len
    if stride < 1 or max_len < 1:
        raise ValueError("max_len and stride must be >= 1")
    from ..functions.text import index_range

    toks = F.col(tokens_col)
    n = F.size(toks)
    # last start index K = ceil((n - max_len) / stride): the first window
    # whose end reaches token n; short sequences get exactly one chunk
    n_chunks = (
        F.when(n <= 0, F.lit(0))
        .when(n <= max_len, F.lit(1))
        .otherwise(
            F.ceil((n - F.lit(max_len)).cast("double") / F.lit(float(stride)))
            .cast("int")
            + F.lit(1)
        )
    )
    chunks = F.transform(
        index_range(n_chunks),
        lambda i: F.slice(toks, (i - 1) * stride + 1, max_len),
    )
    return (
        df.select(F.col(id_col).alias("id"), chunks.alias("_chunks"))
        .select("id", F.posexplode("_chunks").alias("chunk_idx", tokens_col))
        .select(
            "id",
            "chunk_idx",
            F.col(tokens_col),
            F.size(tokens_col).alias("n_tok"),
        )
    )


def padding_waste(
    df: DataFrame,
    tok_col: str = "n_tok",
    max_len: int = 2048,
    bucket_width: int = 128,
    decimals: int = 6,
) -> DataFrame:
    """Padding-waste analysis of length-bucketed batching — the planning
    twin of :func:`pack_assignments`: when a trainer pads each batch to a
    fixed ``max_len`` vs. to the longest sequence in its length bucket,
    how many pad tokens does each policy burn? This is the standard
    decision table for choosing between padding, bucketing, and packing
    (waste_fixed >> waste_bucketed >> packing's 1 - fill_ratio).

    Sequences longer than ``max_len`` are counted at ``max_len`` (they
    would be truncated or chunked upstream — chunk_sequences' job);
    null/empty sequences are dropped (sequence_structure's job to flag).
    Per bucket ``floor((min(n_tok, max_len) - 1) / bucket_width)``
    returns ``(bucket_id, bucket_hi, n_seqs, sum_tok, max_tok,
    pad_bucketed, pad_fixed, waste_bucketed, waste_fixed)`` — pad counts
    are exact integers, the two waste columns are the rounded pad
    fractions of each policy's padded volume.

    Scale shape: one map-side-combined groupBy over ~max_len/width
    buckets; nothing else moves. The analysis reads only ``n_tok`` —
    column pruning keeps the token arrays unscanned.
    """
    eff = F.least(F.col(tok_col), F.lit(max_len)).cast("long")
    bucket = F.floor((eff - 1) / F.lit(bucket_width)).cast("long")
    agg = (
        df.filter(F.col(tok_col) >= 1)
        .select(eff.alias("eff"), bucket.alias("bucket_id"))
        .groupBy("bucket_id")
        .agg(
            F.count(F.lit(1)).alias("n_seqs"),
            F.sum("eff").alias("sum_tok"),
            F.max("eff").alias("max_tok"),
        )
    )
    bucket_hi = F.least(
        (F.col("bucket_id") + 1) * F.lit(bucket_width), F.lit(max_len)
    )
    pad_b = F.col("n_seqs") * F.col("max_tok") - F.col("sum_tok")
    pad_f = F.col("n_seqs") * F.lit(max_len) - F.col("sum_tok")
    return agg.select(
        "bucket_id",
        bucket_hi.alias("bucket_hi"),
        "n_seqs",
        "sum_tok",
        "max_tok",
        pad_b.alias("pad_bucketed"),
        pad_f.alias("pad_fixed"),
        F.round(
            pad_b / (F.col("n_seqs") * F.col("max_tok")), decimals
        ).alias("waste_bucketed"),
        F.round(
            pad_f / (F.col("n_seqs") * F.lit(max_len)), decimals
        ).alias("waste_fixed"),
    )
