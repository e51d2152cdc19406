"""Unit tests for greedy sequence packing (operators/packing.py), pinned
against a pure-Python replay of the deterministic walk."""

from __future__ import annotations

import hashlib

from jsonschema_spark.operators.packing import (
    pack_assignments,
    pack_summary,
    packing_efficiency,
)


def _h60(doc_id) -> int:
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16)


def _replay(rows, budget, streams):
    """rows = [(id, n_tok)] → {id: (stream, pack_id, pack_pos)}."""
    out = {}
    for s in range(streams):
        stream_rows = sorted(
            (r for r in rows if _h60(r[0]) % streams == s),
            key=lambda r: (_h60(r[0]), r[0]),
        )
        acc, pack, pos = 0, 0, 0
        for i, (doc, n) in enumerate(stream_rows):
            if i == 0:
                acc, pos = n, 0
            elif acc + n <= budget:
                acc, pos = acc + n, pos + 1
            else:
                acc, pack, pos = n, pack + 1, 0
            out[doc] = (s, pack, pos)
    return out


def test_assignments_match_python_replay(spark):
    rows = [(i, 50 + (i * 131) % 900) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    got = {
        r["id"]: (r["stream"], r["pack_id"], r["pack_pos"])
        for r in pack_assignments(df, "doc_id", "n_chars", 2000, 8).collect()
    }
    assert got == _replay(rows, 2000, 8)


def test_partitioning_invariance(spark):
    rows = [(i, 100 + i % 300) for i in range(150)]
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    a = sorted(
        tuple(r)
        for r in pack_assignments(df, "doc_id", "n_chars", 1000, 4).collect()
    )
    b = sorted(
        tuple(r)
        for r in pack_assignments(
            df.repartition(13), "doc_id", "n_chars", 1000, 4
        ).collect()
    )
    assert a == b


def test_budget_respected_and_oversize_isolated(spark):
    rows = [(1, 500), (2, 800), (3, 5000), (4, 300), (5, 900), (6, 700)]
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    packs = pack_summary(df, "doc_id", "n_chars", 1000, 2).collect()
    for p in packs:
        if p["oversize"]:
            assert p["n_docs"] == 1  # an oversize doc never shares a pack
        else:
            assert p["pack_tokens"] <= 1000
    assert sum(p["n_docs"] for p in packs) == 6


def test_efficiency_report(spark):
    rows = [(i, 400) for i in range(20)]  # 5 docs fill a 2000 budget exactly
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    rep = packing_efficiency(df, "doc_id", "n_chars", 2000, 1).collect()[0]
    assert rep["n_docs"] == 20
    assert rep["n_packs"] == 4
    assert rep["total_tokens"] == 8000
    assert rep["n_oversize"] == 0
    assert rep["fill_ratio"] == 1.0


def test_chunk_sequences_disjoint(spark):
    from jsonschema_spark.operators.packing import chunk_sequences

    df = spark.createDataFrame(
        [(1, list(range(1, 11))), (2, [1, 2, 3]), (3, [])],
        "doc_id: long, tokens: array<int>",
    )
    rows = chunk_sequences(df, max_len=4).orderBy("id", "chunk_idx").collect()
    got = [(r["id"], r["chunk_idx"], r["tokens"]) for r in rows]
    assert got == [
        (1, 0, [1, 2, 3, 4]),
        (1, 1, [5, 6, 7, 8]),
        (1, 2, [9, 10]),
        (2, 0, [1, 2, 3]),
    ]  # empty doc 3 yields no chunks


def test_chunk_sequences_sliding_overlap(spark):
    from jsonschema_spark.operators.packing import chunk_sequences

    df = spark.createDataFrame(
        [(1, list(range(1, 11)))], "doc_id: long, tokens: array<int>"
    )
    rows = chunk_sequences(df, max_len=8, stride=2).orderBy("chunk_idx").collect()
    # last start is the FIRST window reaching token 10 — no contained dups
    assert [r["tokens"] for r in rows] == [
        [1, 2, 3, 4, 5, 6, 7, 8],
        [3, 4, 5, 6, 7, 8, 9, 10],
    ]
    # every token covered, adjacent windows overlap by max_len - stride
    assert rows[0]["n_tok"] == rows[1]["n_tok"] == 8


def test_chunk_sequences_rejects_bad_params(spark):
    import pytest as _pytest

    from jsonschema_spark.operators.packing import chunk_sequences

    df = spark.createDataFrame([(1, [1])], "doc_id: long, tokens: array<int>")
    with _pytest.raises(ValueError):
        chunk_sequences(df, max_len=0)
    with _pytest.raises(ValueError):
        chunk_sequences(df, max_len=4, stride=0)


def test_chunk_sequences_disjoint_reconstruction_property(spark):
    """Disjoint chunking is a partition: concatenating a doc's chunks in
    chunk_idx order reproduces the original token sequence exactly."""
    from pyspark.sql import functions as F

    from jsonschema_spark.operators.packing import chunk_sequences
    from jsonschema_spark.sources.corpus import token_neardup_corpus

    df = token_neardup_corpus(spark, 200, seed=11)
    rebuilt = (
        chunk_sequences(df, max_len=16)
        .groupBy("id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("chunk_idx", "tokens"))
                    ),
                    lambda s: s.getField("tokens"),
                )
            ).alias("rebuilt")
        )
    )
    bad = (
        df.join(rebuilt, df.doc_id == rebuilt.id)
        .filter(F.col("tokens") != F.col("rebuilt"))
        .count()
    )
    assert bad == 0
    assert rebuilt.count() == 200


def test_padding_waste_closed_forms(spark):
    import pytest
    from pyspark.sql import functions as F

    from jsonschema_spark.operators.packing import padding_waste

    # widths 4, max_len 8: lengths 1,3 -> bucket 0; 5,7 -> bucket 1;
    # 9 and 20 clamp to 8 -> bucket 1
    df = spark.createDataFrame(
        [(1,), (3,), (5,), (7,), (9,), (20,), (0,), (None,)],
        "n_tok: int",
    )
    rows = {
        r.bucket_id: r
        for r in padding_waste(df, "n_tok", max_len=8, bucket_width=4).collect()
    }
    assert set(rows) == {0, 1}
    b0 = rows[0]
    assert (b0.bucket_hi, b0.n_seqs, b0.sum_tok, b0.max_tok) == (4, 2, 4, 3)
    assert b0.pad_bucketed == 2 * 3 - 4 and b0.pad_fixed == 2 * 8 - 4
    assert b0.waste_bucketed == pytest.approx(2 / 6, abs=1e-6)
    b1 = rows[1]
    # clamp: 9 and 20 count as 8
    assert (b1.bucket_hi, b1.n_seqs, b1.sum_tok, b1.max_tok) == (8, 4, 28, 8)
    assert b1.pad_bucketed == 4 * 8 - 28 and b1.pad_fixed == 4 * 8 - 28
    # bucketed padding never wastes more than fixed padding
    for r in rows.values():
        assert r.pad_bucketed <= r.pad_fixed
