"""Seeded differential fuzz for the token-array operators: random
sequences (plus adversarial edges) are run through the Spark operators and
compared against independent pure-Python models — the same two-backend
discipline test_differential_fuzz.py applies to the keyword vocabulary.
"""

from __future__ import annotations

import math
import random

from jsonschema_spark.operators.checks import repair_sequences, sequence_structure
from jsonschema_spark.operators.packing import chunk_sequences
from jsonschema_spark.operators.stats import dup_gram_scale, token_ngram_diversity
from jsonschema_spark.operators.vocab import prune_vocab

VOCAB = 32_000
SPECIALS = (1, 2, 0)  # bos, eos, pad


def _corpus(seed: int = 77, n: int = 40):
    rng = random.Random(seed)
    rows = [(0, []), (1, [1]), (2, [2]), (3, [0]), (4, [1, 2]), (5, [7] * 9)]
    for i in range(6, n):
        length = rng.choice([1, 2, 3, 5, 8, 20, 33])
        toks = [
            rng.choice(
                [0, 1, 2, 3, rng.randrange(4, 500), 99_999, -5, 31_999]
            )
            for _ in range(length)
        ]
        rows.append((i, toks))
    return rows


def test_fuzz_repair_and_structure(spark):
    rows = _corpus()
    df = spark.createDataFrame(rows, "doc_id: long, tokens: array<int>")
    got = {r["doc_id"]: r for r in repair_sequences(df).collect()}
    for i, toks in rows:
        core = [t for t in toks if t not in SPECIALS]
        fixed = [1] + [t if 0 <= t < VOCAB else 3 for t in core] + [2]
        r = got[i]
        assert r["tokens"] == fixed, (i, toks)
        assert r["n_stripped"] == len(toks) - len(core)
        assert r["n_remapped"] == sum(1 for t in core if not 0 <= t < VOCAB)
        assert r["changed"] == (fixed != toks)
    # closure: every repaired row validates
    rep = repair_sequences(df).select("doc_id", "tokens")
    assert sequence_structure(rep).filter("NOT structure_ok").count() == 0


def test_fuzz_chunking(spark):
    rows = _corpus(seed=78)
    df = spark.createDataFrame(rows, "doc_id: long, tokens: array<int>")
    for max_len, stride in [(8, 8), (8, 3), (5, 1), (64, 16)]:
        got = {}
        for r in chunk_sequences(df, max_len=max_len, stride=stride).collect():
            got.setdefault(r["id"], {})[r["chunk_idx"]] = r["tokens"]
        for i, toks in rows:
            n = len(toks)
            if n == 0:
                expect = []
            elif n <= max_len:
                expect = [toks]
            else:
                k = math.ceil((n - max_len) / stride)
                expect = [
                    toks[j * stride : j * stride + max_len] for j in range(k + 1)
                ]
            mine = [got.get(i, {})[j] for j in range(len(got.get(i, {})))]
            assert mine == expect, (i, max_len, stride, toks)


def test_fuzz_prune_vocab_against_model(spark):
    rows = _corpus(seed=79)
    df = spark.createDataFrame(rows, "doc_id: long, tokens: array<int>")
    min_count = 3
    counts: dict[int, int] = {}
    for _, toks in rows:
        for t in toks:
            counts[t] = counts.get(t, 0) + 1
    kept = sorted(
        (t for t, c in counts.items() if c >= min_count),
        key=lambda t: (-counts[t], t),
    )
    remap = {t: i + 1 for i, t in enumerate(kept)}
    got = {r["doc_id"]: r for r in prune_vocab(df, min_count=min_count).collect()}
    for i, toks in rows:
        expect = [remap.get(t, 0) for t in toks]
        assert got[i]["tokens"] == expect, (i, toks)
        assert got[i]["n_oov"] == sum(1 for t in toks if t not in remap)


def test_fuzz_diversity_and_dup_scale(spark):
    rows = _corpus(seed=80)
    df = spark.createDataFrame(rows, "doc_id: long, tokens: array<int>")
    div = {r["id"]: r for r in token_ngram_diversity(df, n=2).collect()}
    dup = {r["id"]: r["max_dup_scale"] for r in dup_gram_scale(df).collect()}
    for i, toks in rows:
        grams = [tuple(toks[j : j + 2]) for j in range(len(toks) - 1)]
        assert div[i]["n_grams"] == len(grams)
        assert div[i]["n_distinct"] == len(set(grams))
        expect_scale = 0
        for n in (1, 2, 4, 8, 16, 32):
            gs = [tuple(toks[j : j + n]) for j in range(len(toks) - n + 1)]
            if len(gs) != len(set(gs)):
                expect_scale = n
        assert dup[i] == expect_scale, (i, toks)
