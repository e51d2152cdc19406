"""Multimodal column handling: image/audio/video as opaque ``binary``
columns with typed metadata, plus Arrow-batched decode / feature-extract /
frame-sample plumbing.

Decode is REAL for the container-independent formats this sandbox can
parse without codec libraries: uncompressed 24-bit BMP (``decode_bmp``)
and 16-bit PCM WAV (``decode_wav``) — header parse + numpy view over the
sample bytes, exact integer sums for the statistics so any engine
reproduces them bit-for-bit. Compressed codecs (JPEG/PNG/MP3/H.264) stay
stubbed behind NotImplementedError (PIL/opencv/ffmpeg are not in this
container); tests inject a deterministic fake for those paths. Everything
Spark-side — schemas, mapInPandas batch iteration, output shapes,
partitioning behavior — is identical for real and stubbed codecs, which
is the part that has to be right at 100 TB (a codec swap is a one-line
change; a wrong batch contract is a redesign).

Scale notes: blobs ride the scan as binary columns (Parquet keeps them
column-pruned when untouched); decode runs in mapInPandas so one task
processes a whole Arrow batch per Python call, and decoded features are
small fixed-width columns — the blob itself never leaves the stage unless
explicitly selected.
"""

from __future__ import annotations

import hashlib
import math
import struct
from typing import Callable, Iterator, Optional

import numpy as np
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


def make_bmp(doc_id: int) -> bytes:
    """Deterministic 24-bit BMP keyed by ``doc_id``: dims
    ``h = 4 + doc_id % 5``, ``w = 4 + doc_id % 7`` (w=5,6,9,10 exercise
    non-trivial row padding), pixel byte ``i`` (logical, padding excluded)
    valued ``(doc_id * 31 + i) % 256``. The formula is the contract: a SQL
    oracle computes the expected decode statistics closed-form from
    ``doc_id`` alone, giving the real decoder an INDEPENDENT cross-engine
    check (not a roundtrip through this writer)."""
    h = 4 + doc_id % 5
    w = 4 + doc_id % 7
    row_bytes = w * 3
    stride = (row_bytes + 3) // 4 * 4
    img_size = stride * h
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    rows = []
    for r in range(h):
        base = doc_id * 31 + r * row_bytes
        rows.append(
            bytes((base + j) % 256 for j in range(row_bytes))
            + b"\x00" * (stride - row_bytes)
        )
    return header + info + b"".join(rows)


def make_wav(doc_id: int) -> bytes:
    """Deterministic mono 16-bit PCM WAV keyed by ``doc_id``:
    ``n = 32 + doc_id % 17`` frames at 8 kHz, sample ``i`` valued
    ``(doc_id * 131 + i * 7919) % 4096 - 2048``. Same closed-form-oracle
    contract as :func:`make_bmp`."""
    n = 32 + doc_id % 17
    rate = 8000
    samples = [((doc_id * 131 + i * 7919) % 4096) - 2048 for i in range(n)]
    data = struct.pack("<%dh" % n, *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def attach_synth_blob(
    df: DataFrame,
    id_col: str = "doc_id",
    maker: Callable[[int], bytes] = make_bmp,
    blob_col: str = "blob",
) -> DataFrame:
    """Attach a deterministic synthesized payload per row (mapInPandas —
    bytes construction is inherently Python; Arrow batches amortize it).
    Test/bench scaffolding: real corpora arrive with blob columns already
    materialized, so this never sits on a production hot path."""
    out_schema = T.StructType(
        df.schema.fields + [T.StructField(blob_col, T.BinaryType())]
    )

    def attach(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            batch[blob_col] = [maker(int(i)) for i in batch[id_col]]
            yield batch

    return df.mapInPandas(attach, out_schema)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("rms", T.DoubleType()),
    ]
)


def decode_audio(
    df: DataFrame,
    id_col: str = "doc_id",
    blob_col: str = "blob",
    codec: Optional[Callable[[bytes], tuple[int, int, int, float]]] = None,
) -> DataFrame:
    """mapInPandas audio decode twin of :func:`decode_images`: Arrow
    batches in, fixed-width ``(doc_id, sample_rate, channels, n_frames,
    rms)`` rows out. Defaults to the real PCM-WAV decoder."""
    codec = codec or decode_wav

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            decoded = [codec(p) for p in batch[blob_col]]
            yield pd.DataFrame(
                {
                    "doc_id": batch[id_col].astype("int64"),
                    "sample_rate": [d[0] for d in decoded],
                    "channels": [d[1] for d in decoded],
                    "n_frames": [d[2] for d in decoded],
                    "rms": [d[3] for d in decoded],
                }
            )

    return df.select(id_col, blob_col).mapInPandas(decode, AUDIO_FEATURES_SCHEMA)


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


def decode_bmp(payload: bytes) -> tuple[int, int, int, float]:
    """Real decoder for uncompressed 24-bit BMP (BITMAPINFOHEADER,
    BI_RGB): returns ``(height, width, channels, mean_pixel)``. The mean
    is computed from an EXACT integer sum over the pixel bytes (row
    padding excluded), so it is reproducible bit-for-bit by any engine
    that can sum the same integers — the cross-engine-parity contract
    every operator in this repo follows. numpy works on views of the
    payload buffer; nothing is copied."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload (missing BM magic)")
    pix_offset = int.from_bytes(payload[10:14], "little")
    width = int.from_bytes(payload[18:22], "little", signed=True)
    height = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    compression = int.from_bytes(payload[30:34], "little")
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only 24-bit BI_RGB BMP is decodable codec-free (got bpp={bpp},"
            f" compression={compression})"
        )
    height = abs(height)  # negative height = top-down row order
    row_bytes = width * 3
    stride = (row_bytes + 3) // 4 * 4
    rows = np.frombuffer(payload, np.uint8, stride * height, pix_offset)
    pixels = rows.reshape(height, stride)[:, :row_bytes]
    mean_pixel = int(pixels.sum(dtype=np.int64)) / pixels.size if pixels.size else 0.0
    return height, width, 3, mean_pixel


def decode_wav(payload: bytes) -> tuple[int, int, int, float]:
    """Real decoder for 16-bit PCM WAV: walks the RIFF chunk list (extra
    chunks tolerated, odd-size chunk padding honored) and returns
    ``(sample_rate, channels, n_frames, rms)``. RMS uses an exact int64
    sum of squares before the one float division + sqrt, same
    cross-engine-exactness contract as :func:`decode_bmp`."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    fmt = data = None
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, channels, sample_rate = struct.unpack_from("<HHI", fmt, 0)
    bits = struct.unpack_from("<H", fmt, 14)[0]
    if audio_fmt != 1 or bits != 16:
        raise NotImplementedError(
            f"only 16-bit PCM WAV is decodable codec-free (got fmt={audio_fmt},"
            f" bits={bits})"
        )
    samples = np.frombuffer(data, np.int16, len(data) // 2)
    n_frames = samples.size // channels if channels else 0
    if samples.size:
        sq = int(np.dot(samples.astype(np.int64), samples.astype(np.int64)))
        rms = math.sqrt(sq / samples.size)
    else:
        rms = 0.0
    return sample_rate, channels, n_frames, rms


def default_image_codec(payload: bytes) -> tuple[int, int, int, float]:
    """Magic-byte dispatch: BMP decodes for real; compressed formats need
    a codec library this container doesn't ship (PIL/opencv) and raise."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    raise NotImplementedError(
        "image decode beyond BMP requires a codec; inject one via"
        " decode_images(codec=...)"
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


# --------------------------------------------------------------------------
# Perceptual hashing: content-addressed near-dup detection for decoded
# blobs. aHash (average hash) for images — pool the grayscale image onto a
# fixed grid, binarize each cell against the global mean — and a
# sign-of-first-difference fingerprint for audio. Both hashes are EXACT
# integer computations (no float thresholds), so a SQL engine can
# reproduce them closed-form from the synthetic-blob contract, same
# cross-engine-parity discipline as decode_bmp/decode_wav. Near-dup
# candidates come from pigeonhole chunk buckets (never all pairs),
# mirroring dedup.simhash_near_dup: Hamming distance <= r implies at
# least one of r+1 chunks is identical.
# --------------------------------------------------------------------------


def ahash_bmp(payload: bytes, grid_rows: int = 4, grid_cols: int = 8) -> int:
    """Average-hash of a 24-bit BMP on a fixed ``grid_rows x grid_cols``
    grid (dimension-invariant, the point of a perceptual hash): pixel
    (y, x) maps to cell ``(y*grid_rows//h, x*grid_cols//w)``; cell bit k
    is set iff ``cell_sum * n_pixels > total_sum * cell_count`` — the
    division-free form of "cell mean > global mean", exact in integers.
    Grayscale is the plain channel sum (no luma weights: integer-exact and
    order-free over BGR). Empty cells (w or h below the grid) compare
    0 > 0 and stay 0. Allocation is O(h*w) on tiny buffers — the decode
    itself dominates."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload (missing BM magic)")
    pix_offset = int.from_bytes(payload[10:14], "little")
    width = int.from_bytes(payload[18:22], "little", signed=True)
    height = abs(int.from_bytes(payload[22:26], "little", signed=True))
    bpp = int.from_bytes(payload[28:30], "little")
    if bpp != 24:
        raise NotImplementedError("ahash_bmp handles 24-bit BI_RGB only")
    row_bytes = width * 3
    stride = (row_bytes + 3) // 4 * 4
    rows = np.frombuffer(payload, np.uint8, stride * height, pix_offset)
    gray = (
        rows.reshape(height, stride)[:, :row_bytes]
        .reshape(height, width, 3)
        .sum(axis=2, dtype=np.int64)
    )
    n = height * width
    tot = int(gray.sum())
    ys = (np.arange(height) * grid_rows) // height
    xs = (np.arange(width) * grid_cols) // width
    cell = (ys[:, None] * grid_cols + xs[None, :]).ravel()
    n_cells = grid_rows * grid_cols
    sums = np.bincount(cell, weights=gray.ravel(), minlength=n_cells)
    counts = np.bincount(cell, minlength=n_cells)
    bits = 0
    for k in range(n_cells):
        if int(sums[k]) * n > tot * int(counts[k]):
            bits |= 1 << k
    return bits


def fingerprint_wav(payload: bytes, n_bits: int = 32) -> int:
    """Sign-of-first-difference audio fingerprint over 16-bit PCM WAV:
    bit i is set iff ``sample[i+1] > sample[i]``, over the first
    ``min(n_samples - 1, n_bits)`` deltas (channel-interleaved order —
    the raw sample stream is the contract). The delta-sign sequence is
    the classic codec-free fingerprint primitive: invariant to gain
    scaling and DC offset, exact in integers."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    data = None
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        if cid == b"data":
            data = payload[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)
    if data is None:
        raise ValueError("WAV missing data chunk")
    samples = np.frombuffer(data, np.int16, len(data) // 2)
    m = min(samples.size - 1, n_bits)
    if m <= 0:
        return 0
    up = samples[1 : m + 1] > samples[:m]
    return int(np.sum((1 << np.arange(m, dtype=np.int64))[up]))


PHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("phash", T.LongType()),
    ]
)


def perceptual_hashes(
    df: DataFrame,
    id_col: str = "doc_id",
    blob_col: str = "blob",
    hasher: Callable[[bytes], int] = ahash_bmp,
) -> DataFrame:
    """mapInPandas hash pass: Arrow batches of (id, blob) in, fixed-width
    (doc_id, phash) rows out. Same batch contract as decode_images —
    blobs never leave the stage; downstream joins see 16 bytes/row."""

    def hash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            yield pd.DataFrame(
                {
                    "doc_id": batch[id_col].astype("int64"),
                    "phash": [hasher(p) for p in batch[blob_col]],
                }
            )

    return df.select(id_col, blob_col).mapInPandas(hash_batches, PHASH_SCHEMA)


def phash_dup_groups(hashes: DataFrame) -> DataFrame:
    """Exact perceptual-dup groups: (phash, n_docs, keep_id) for hashes
    shared by >1 doc, keep-first semantics. One groupBy on a uniform
    integer key — scales like dedup_exact."""
    return (
        hashes.groupBy("phash")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("keep_id"))
        .filter(F.col("n_docs") > 1)
    )


def phash_near_dup(
    hashes: DataFrame, max_hamming: int = 1, hash_bits: int = 32
) -> DataFrame:
    """(id_a, id_b, distance) pairs with Hamming(phash_a, phash_b) <=
    max_hamming. Pigeonhole blocking exactly as dedup.simhash_near_dup:
    the hash splits into ``max_hamming + 1`` chunks, distance <= r forces
    at least one chunk equal, so candidates are a self-equi-join on
    (chunk_idx, chunk_value) with AQE sharding hot buckets; verification
    is native bit_count(xor). localCheckpoint before the self-join — no
    ReusedExchange across aliases (CLAUDE.md rule 4)."""
    n_chunks = max_hamming + 1
    chunk_bits = hash_bits // n_chunks
    mask = (1 << chunk_bits) - 1
    chunks = hashes.select(
        F.col("doc_id").alias("id"),
        F.col("phash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright(F.col("phash"), c * chunk_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("v"),
                    )
                    for c in range(n_chunks)
                ]
            )
        ).alias("cc"),
    ).select("id", "phash", F.col("cc.chunk").alias("chunk"), F.col("cc.v").alias("v"))
    chunks = chunks.localCheckpoint(eager=False)
    a = chunks.alias("a")
    b = chunks.alias("b")
    return (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.v") == F.col("b.v"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(
                F.col("a.phash").bitwiseXOR(F.col("b.phash"))
            ).alias("distance"),
        )
        .filter(F.col("distance") <= max_hamming)
        .distinct()
    )
