"""Unit proofs for the round-3 text-QA / corpus-overlap operators:
Unicode-script + mojibake profiling, hashed linear classifier scoring,
corpus MinHash overlap, token-native n-gram diversity."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from jsonschema_spark.functions.text import (
    CONTROL_CLASS,
    REPLACEMENT_CLASS,
    char_class_count,
    dominant_script,
    hashed_classifier_score,
)
from jsonschema_spark.operators.drift import corpus_minhash_overlap
from jsonschema_spark.operators.stats import token_ngram_diversity


def _profile(spark, text):
    row = (
        spark.createDataFrame([(text,)], "t: string")
        .select(
            dominant_script(F.col("t")).alias("script"),
            char_class_count(F.col("t"), REPLACEMENT_CLASS).alias("repl"),
            char_class_count(F.col("t"), CONTROL_CLASS).alias("ctl"),
        )
        .collect()[0]
    )
    return row["script"], row["repl"], row["ctl"]


def test_dominant_script_per_script(spark):
    cases = {
        "hello world": "latin",
        "привет мир": "cyrillic",
        "你好世界": "cjk",
        "κόσμος": "greek",
        "한국어 텍스트": "hangul",
        "مرحبا بالعالم": "arabic",
        "1234 !!": "none",
    }
    for text, want in cases.items():
        got, _, _ = _profile(spark, text)
        assert got == want, (text, got, want)


def test_mojibake_signals(spark):
    # U+FFFD replacement chars and C0 controls counted; tab/newline exempt.
    _, repl, ctl = _profile(spark, "ok �� bad \x00\x07 but\tnot\nthese")
    assert repl == 2
    assert ctl == 2
    _, repl, ctl = _profile(spark, "clean prose")
    assert (repl, ctl) == (0, 0)


def _py_bucket60(word: str, n_buckets: int) -> int:
    h = int(hashlib.md5(word.encode()).hexdigest()[:15], 16)
    return h % n_buckets


def test_classifier_score_explicit_weights_closed_form(spark):
    # One-word doc: score must be sigmoid(weights[bucket(word)]).
    n_buckets = 8
    weights = [(-1.0) ** b * (b + 1) / 4.0 for b in range(n_buckets)]
    df = spark.createDataFrame([("alpha",), ("beta gamma",)], "text: string")
    got = {
        r["text"]: r["s"]
        for r in df.select(
            "text",
            hashed_classifier_score(
                F.col("text"), n_buckets=n_buckets, weights=weights
            ).alias("s"),
        ).collect()
    }
    w_alpha = weights[_py_bucket60("alpha", n_buckets)]
    assert got["alpha"] == pytest.approx(
        1 / (1 + math.exp(-w_alpha)), abs=1e-6
    )
    mean_bg = (
        weights[_py_bucket60("beta", n_buckets)]
        + weights[_py_bucket60("gamma", n_buckets)]
    ) / 2
    assert got["beta gamma"] == pytest.approx(
        1 / (1 + math.exp(-mean_bg)), abs=1e-6
    )


def test_classifier_score_surrogate_and_edge_cases(spark):
    df = spark.createDataFrame([("",), ("  ",), ("Word word WORD",)], "text: string")
    rows = df.select(
        hashed_classifier_score(F.col("text")).alias("s")
    ).collect()
    # Empty / whitespace-only docs carry no evidence -> sigmoid(0) = 0.5.
    assert rows[0]["s"] == pytest.approx(0.5)
    assert rows[1]["s"] == pytest.approx(0.5)
    # Case-folded: all three tokens hash identically -> score equals the
    # single-word surrogate score, reproducible closed-form.
    b = _py_bucket60("word", 1024)
    w = (b % 997) / 498.0 - 1.0
    assert rows[2]["s"] == pytest.approx(1 / (1 + math.exp(-w)), abs=1e-6)

    with pytest.raises(ValueError):
        hashed_classifier_score(F.col("text"), n_buckets=4, weights=[0.0])


def _docs(spark, texts):
    return spark.createDataFrame([(t,) for t in texts], "text: string")


def test_corpus_overlap_identical_and_disjoint(spark):
    a = _docs(spark, [f"doc {i}" for i in range(30)])
    row = corpus_minhash_overlap(a, a, n_perm=16).collect()[0]
    assert row["exact_jaccard"] == pytest.approx(1.0)
    assert row["est_jaccard"] == pytest.approx(1.0)

    b = _docs(spark, [f"other {i}" for i in range(30)])
    row = corpus_minhash_overlap(a, b, n_perm=16).collect()[0]
    assert row["exact_jaccard"] == pytest.approx(0.0)
    # Disjoint 60-bit min-hashes collide with negligible probability.
    assert row["est_jaccard"] == pytest.approx(0.0)


def test_corpus_overlap_partial_exact_and_normalization(spark):
    # A = {0..19}, B = {10..29}: |A∩B|=10, |A∪B|=30 -> exact 1/3. The
    # estimate is a 64-permutation Broder sketch (sd ≈ 0.06): assert a wide
    # but meaningful band rather than the point value.
    a = _docs(spark, [f"doc {i}" for i in range(20)])
    b = _docs(spark, [f"doc {i}" for i in range(10, 30)])
    row = corpus_minhash_overlap(a, b, n_perm=64).collect()[0]
    assert row["exact_jaccard"] == pytest.approx(1 / 3, abs=1e-6)
    assert 0.08 <= row["est_jaccard"] <= 0.62
    # Fingerprints normalize: case/whitespace variants are the same content.
    a2 = _docs(spark, [f"  DOC   {i} " for i in range(20)])
    row = corpus_minhash_overlap(a2, a, n_perm=16).collect()[0]
    assert row["exact_jaccard"] == pytest.approx(1.0)
    assert row["est_jaccard"] == pytest.approx(1.0)


def test_token_ngram_diversity_closed_forms(spark):
    df = spark.createDataFrame(
        [
            (1, [1, 2, 3, 4]),       # 3 bigrams, all distinct
            (2, [7, 7, 7, 7]),       # 3 bigrams, 1 distinct
            (3, [5, 6, 5, 6, 5]),    # 4 bigrams, 2 distinct
            (4, [9]),                # too short: 0 grams
            (5, []),                 # empty
        ],
        "doc_id: long, tokens: array<int>",
    )
    rows = {r["id"]: r for r in token_ngram_diversity(df, n=2).collect()}
    assert (rows[1]["n_grams"], rows[1]["n_distinct"]) == (3, 3)
    assert rows[1]["diversity"] == pytest.approx(1.0)
    assert rows[2]["diversity"] == pytest.approx(round(1 / 3, 6))
    assert (rows[3]["n_grams"], rows[3]["n_distinct"]) == (4, 2)
    assert rows[3]["diversity"] == pytest.approx(0.5)
    assert rows[4]["n_grams"] == 0 and rows[4]["diversity"] is None
    assert rows[5]["n_grams"] == 0 and rows[5]["diversity"] is None


def test_token_ngram_diversity_trigram_no_collisions(spark):
    # Exact comma-joined grams: [1,23] vs [12,3] must NOT collide.
    df = spark.createDataFrame(
        [(1, [1, 23, 1, 23]), (2, [12, 3, 12, 3])],
        "doc_id: long, tokens: array<int>",
    )
    rows = {r["id"]: r for r in token_ngram_diversity(df, n=3).collect()}
    # grams doc1: "1,23,1","23,1,23"; doc2: "12,3,12","3,12,3" — distinct.
    assert rows[1]["n_distinct"] == 2
    assert rows[2]["n_distinct"] == 2


def test_tokenizer_fertility_qa_closed_forms(spark):
    """Hand-computable fertility/compression values, both verdict branches,
    and the empty-doc semantics (skipped by the means, counts as not-high)."""
    from jsonschema_spark.operators.stats import tokenizer_fertility_qa

    df = spark.createDataFrame(
        [
            ("a", "short words here"),               # ws 3, bpe 3 -> fert 1.0
            ("a", "extraordinarily incomprehensible"),  # ws 2, bpe 6 -> fert 3.0
            ("b", ""),                                # empty: null ratios
            ("b", "ok go"),                           # ws 2, bpe 2 -> fert 1.0
        ],
        "source string, text string",
    )
    rows = {
        r.source: r
        for r in tokenizer_fertility_qa(
            df, fertility_gate=1.5, max_high_rate=0.4
        ).collect()
    }
    a, b = rows["a"], rows["b"]
    assert a.n_docs == 2 and b.n_docs == 2
    # a: fertilities (1.0, 3.0); chars/bpe = 16/3 and 32/6 = 5.333333
    assert a.mean_fertility == 2.0
    assert a.mean_chars_per_token == pytest.approx(16 / 3, abs=1e-6)
    assert a.high_fertility_rate == 0.5 and a.verdict == "fail"
    # b: empty doc skipped by both means, counted not-high in the rate
    assert b.mean_fertility == 1.0
    assert b.mean_chars_per_token == 2.5
    assert b.high_fertility_rate == 0.0 and b.verdict == "pass"
