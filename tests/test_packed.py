"""Packed-binary token layout (sources/packed.py): round-trip token-array
equality (the north-rule per-row invariant) and verdict-count equality with
the array-layout validation pass."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jsonschema_spark.sources.corpus import corpus
from jsonschema_spark.sources.packed import (
    pack_corpus,
    pack_tokens,
    packed_validation_pass,
    token_bounds_kernel,
    unpack_tokens,
)

N = 20_000


@pytest.fixture(scope="module")
def corpus_paths(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("packed")
    array_path = str(base / "array")
    packed_path = str(base / "packed")
    corpus(spark, N, seed=42).write.parquet(array_path)
    pack_corpus(spark, array_path, packed_path)
    return array_path, packed_path


def test_pack_unpack_roundtrip_token_array_equality(spark, corpus_paths):
    """unpack(pack(tokens)) == tokens element-wise for every row — the
    BASELINE.json per-row invariant (token-array equality). Row-local
    comparison (doc_id is NOT unique: the corpus injects duplicate ids)."""
    array_path, packed_path = corpus_paths
    arr = spark.read.parquet(array_path)
    roundtrip = arr.select(
        "tokens",
        unpack_tokens(pack_tokens(F.col("tokens"))).alias("tokens2"),
    )
    assert roundtrip.filter(~(F.col("tokens") == F.col("tokens2"))).count() == 0

    # and the materialized packed table holds exactly the same payload
    # multiset as packing the array table on the fly
    want = (
        arr.select(F.md5(pack_tokens(F.col("tokens"))).alias("h"))
        .groupBy("h").count()
    )
    got = (
        spark.read.parquet(packed_path)
        .select(F.md5(F.col("tokens_bin")).alias("h"))
        .groupBy("h").count()
    )
    assert want.exceptAll(got).count() == 0
    assert got.exceptAll(want).count() == 0


def test_packed_pass_matches_array_pass(spark, corpus_paths):
    from jsonschema_spark.benchlib import corpus_validation_pass

    array_path, packed_path = corpus_paths
    a = corpus_validation_pass(spark, array_path)
    p = packed_validation_pass(spark, packed_path)
    assert p == a  # (n_rows, n_valid, n_tokens, n_dups) identical


def test_bounds_kernel_edges(spark):
    rows = [
        (1, [0, 5, 9]),      # in bounds
        (2, [0, 10]),        # hi violated
        (3, [-1, 5]),        # lo violated
        (4, []),             # empty: bounds vacuously ok
        (5, None),           # null blob: False
    ]
    df = spark.createDataFrame(rows, "id long, tokens array<int>")
    packed = df.select("id", pack_tokens(F.col("tokens")).alias("b"))
    ok = token_bounds_kernel(0, 9)
    got = {r.id: r.ok for r in packed.select("id", ok(F.col("b")).alias("ok")).collect()}
    assert got == {1: True, 2: False, 3: False, 4: True, 5: False}


def test_stats_pass_matches_full_passes(spark, corpus_paths):
    """Zone-map (metadata-only) re-validation produces identical verdict
    counts to both full-rescan passes."""
    from jsonschema_spark.benchlib import corpus_validation_pass
    from jsonschema_spark.sources.packed import packed_stats_validation_pass

    array_path, packed_path = corpus_paths
    assert (
        packed_stats_validation_pass(spark, packed_path)
        == corpus_validation_pass(spark, array_path)
    )


def test_stats_pass_never_reads_the_blob(spark, corpus_paths):
    """Column pruning proof: the metadata-only pass's scan schema must not
    include tokens_bin (the multi-GB column at scale)."""
    from pyspark.sql import functions as F2
    from jsonschema_spark.sources.packed import _corpus_checks_from, TOKEN_BYTES
    from jsonschema_spark.sources.corpus import MAX_TOKENS, VOCAB_SIZE

    _, packed_path = corpus_paths
    df = spark.read.parquet(packed_path)
    bounds_ok = (
        (F2.col("n_bytes") >= TOKEN_BYTES)
        & (F2.col("tok_min") >= 0)
        & (F2.col("tok_max") <= VOCAB_SIZE - 1)
    )
    annotated = _corpus_checks_from(
        df, bounds_ok, F2.col("n_bytes"), F2.col("n_bytes").isNotNull(), MAX_TOKENS
    )
    agg = annotated.agg(F2.sum(F2.col("_valid").cast("long")))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "tokens_bin" not in plan
