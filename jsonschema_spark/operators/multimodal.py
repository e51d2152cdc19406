"""Multimodal column handling: image/audio/video as opaque ``binary``
columns with typed metadata, plus Arrow-batched decode / feature-extract /
frame-sample plumbing.

The sandbox has no image/audio codecs, so the *decode step* is stubbed: by
default it raises NotImplementedError, and tests inject a deterministic fake
codec. Everything Spark-side is real and exercised — schemas, mapInPandas
batch iteration, output shapes, partitioning behavior — which is the part
that has to be right at 100 TB (a codec swap is a one-line change; a wrong
batch contract is a redesign).

Scale notes: blobs ride the scan as binary columns (Parquet keeps them
column-pruned when untouched); decode runs in mapInPandas so one task
processes a whole Arrow batch per Python call, and decoded features are
small fixed-width columns — the blob itself never leaves the stage unless
explicitly selected.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator, Optional

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

BLOB_META_SCHEMA = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha", T.StringType()),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("mean_pixel", T.DoubleType()),
    ]
)


def attach_fake_blob(df: DataFrame, text_col: str, mime: str = "image/fake") -> DataFrame:
    """Deterministic stand-in payload: the utf-8 bytes of the text column.
    Gives every row a binary column + metadata struct with real lineage to
    the row, so hashing/size/propagation tests are meaningful."""
    blob = F.encode(F.col(text_col), "UTF-8")
    return df.withColumn("blob", blob).withColumn(
        "blob_meta",
        F.struct(
            F.lit(mime).alias("mime"),
            F.octet_length(blob).cast("long").alias("n_bytes"),
            F.md5(blob).alias("sha"),
        ),
    )


def blob_stats(df: DataFrame, blob_col: str = "blob") -> DataFrame:
    """Corpus-level blob profile: count, total/avg/max bytes, distinct
    payloads (via md5). One aggregation pass, content never shuffled."""
    return df.agg(
        F.count(F.lit(1)).alias("n_blobs"),
        F.sum(F.octet_length(blob_col)).cast("long").alias("total_bytes"),
        F.round(F.avg(F.octet_length(blob_col)), 3).alias("avg_bytes"),
        F.max(F.octet_length(blob_col)).cast("long").alias("max_bytes"),
        F.count_distinct(F.md5(F.col(blob_col))).alias("distinct_payloads"),
    )


def default_image_codec(payload: bytes) -> tuple[int, int, int, float]:
    """Stub for the real decoder (PIL/opencv are not in this container)."""
    raise NotImplementedError(
        "image decode requires a codec; inject one via decode_images(codec=...)"
    )


def fake_image_codec(payload: bytes) -> tuple[int, int, int, float]:
    """Deterministic fake decode: derives (h, w, c, mean_pixel) from a
    sha256 of the payload. Lets tests assert exact values end-to-end."""
    digest = hashlib.sha256(payload).digest()
    h = 1 + digest[0] % 64
    w = 1 + digest[1] % 64
    c = 1 + digest[2] % 4
    mean_pixel = round(digest[3] / 255.0, 6)
    return h, w, c, mean_pixel


def decode_images(
    df: DataFrame,
    id_col: str = "doc_id",
    blob_col: str = "blob",
    codec: Optional[Callable[[bytes], tuple[int, int, int, float]]] = None,
) -> DataFrame:
    """mapInPandas decode: Arrow batches in, fixed-width feature rows out.
    The codec runs per blob (decoding is inherently per-payload); batching
    amortizes serialization, and the output schema is stable and small."""
    codec = codec or default_image_codec

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            decoded = [codec(p) for p in batch[blob_col]]
            yield pd.DataFrame(
                {
                    "doc_id": batch[id_col].astype("int64"),
                    "height": [d[0] for d in decoded],
                    "width": [d[1] for d in decoded],
                    "channels": [d[2] for d in decoded],
                    "mean_pixel": [d[3] for d in decoded],
                }
            )

    return df.select(id_col, blob_col).mapInPandas(decode, IMAGE_FEATURES_SCHEMA)


def frame_sample(
    df: DataFrame,
    id_col: str = "doc_id",
    blob_col: str = "blob",
    frame_bytes: int = 16,
    every_n: int = 4,
) -> DataFrame:
    """Treat the payload as a fake fixed-rate video: split into frame_bytes
    chunks natively and keep every n-th — the Spark-side shape of frame
    sampling (explode with positional pruning), codec-free."""
    n_frames = F.floor(F.octet_length(blob_col) / F.lit(frame_bytes)).cast("int")
    frame_idx = F.filter(
        F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0))),
        lambda i: (i % every_n == 0) & (n_frames > 0),
    )
    return (
        df.select(F.col(id_col), F.explode(frame_idx).alias("frame_idx"),
                  F.col(blob_col).alias("_b"))
        .select(
            id_col,
            "frame_idx",
            F.col("_b").substr(
                F.col("frame_idx") * frame_bytes + 1, F.lit(frame_bytes)
            ).alias("frame"),
        )
    )
