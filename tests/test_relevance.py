"""Unit tests for corpus-relevance operators (operators/relevance.py),
A-ES weighted sampling (operators/sampling.py::weighted_sample) and
time-sliced drift (operators/drift.py::windowed_psi), pinned against
closed-form references computed inline in pure Python."""

from __future__ import annotations

import hashlib
import math

import pytest

from jsonschema_spark.operators.drift import token_sketch_psi, windowed_psi
from jsonschema_spark.operators.relevance import (
    pairwise_js_divergence,
    tfidf_top_terms,
)
from jsonschema_spark.operators.sampling import weighted_sample


class TestTfidfTopTerms:
    def test_matches_closed_form(self, spark):
        docs = [
            (1, "apple apple banana"),
            (2, "banana cherry"),
            (3, "cherry cherry cherry date"),
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        out = tfidf_top_terms(df, "doc_id", "text", k=2).collect()
        n = 3
        dfreq = {"apple": 1, "banana": 2, "cherry": 2, "date": 1}

        def idf(t):
            return math.log((1.0 + n) / (1.0 + dfreq[t]))

        by_doc = {}
        for r in out:
            by_doc.setdefault(r["doc_id"], []).append(r)
        # doc 1: apple tf=2 (rare) beats banana tf=1
        assert [r["term"] for r in by_doc[1]] == ["apple", "banana"]
        assert by_doc[1][0]["tfidf"] == pytest.approx(2 * idf("apple"), abs=1e-6)
        # doc 2: banana/cherry tie on tfidf -> term-asc tie-break
        assert [r["term"] for r in by_doc[2]] == ["banana", "cherry"]
        # doc 3: cherry tf=3 then date (rarer idf beats common cherry? no:
        # 3*ln(4/3)=0.863 > 1*ln(2)=0.693)
        assert [r["term"] for r in by_doc[3]] == ["cherry", "date"]
        assert all(r["rank"] in (1, 2) for r in out)

    def test_k_bounds_rows_per_doc(self, spark):
        df = spark.createDataFrame(
            [(i, "a b c d e f g") for i in range(5)], "doc_id long, text string"
        )
        out = tfidf_top_terms(df, "doc_id", "text", k=3).collect()
        assert len(out) == 15


class TestUnigramPerplexity:
    def test_reference_like_scores_lower(self, spark):
        """CCNet semantics: docs wordled from the reference vocabulary get
        lower perplexity (and the head tile) vs out-of-vocabulary noise."""
        from pyspark.sql import functions as F

        from jsonschema_spark.operators.relevance import (
            perplexity_buckets, unigram_perplexity,
        )

        ref = [(100 + i, "the cat sat on the mat", "ref") for i in range(5)]
        like = [(1, "the cat on the mat", "pool"), (2, "the mat the cat", "pool")]
        noise = [(3, "zq wvx jjk qqp", "pool"), (4, "xoxo zzz yyy", "pool")]
        df = spark.createDataFrame(
            ref + like + noise, "doc_id long, text string, source string"
        )
        out = {
            r.doc_id: r
            for r in unigram_perplexity(df, F.col("source") == "ref").collect()
        }
        assert set(out) == {1, 2, 3, 4}  # reference rows are never scored
        assert max(out[1].ppl, out[2].ppl) < min(out[3].ppl, out[4].ppl)
        for r in out.values():  # ppl = exp(xent) by construction
            assert r.ppl == pytest.approx(math.exp(r.xent), rel=1e-5)

        tiles = {
            r.doc_id: r.tile
            for r in perplexity_buckets(
                df, F.col("source") == "ref", n_buckets=2
            ).collect()
        }
        assert tiles[1] == 1 and tiles[2] == 1
        assert tiles[3] == 2 and tiles[4] == 2

    def test_smoothing_prices_oov(self, spark):
        """Every-token-OOV doc gets exactly ppl = (ref_tot + s*B) / s under
        Laplace smoothing (all its buckets coalesce to count 0)."""
        from pyspark.sql import functions as F

        from jsonschema_spark.operators.relevance import unigram_perplexity

        df = spark.createDataFrame(
            [(1, "a b a b", "ref"), (2, "zz yy", "pool")],
            "doc_id long, text string, source string",
        )
        row = unigram_perplexity(
            df, F.col("source") == "ref", buckets=64, smoothing=1.0
        ).first()
        # zz/yy almost surely miss a/b's 2 buckets of 64; if not, the
        # expected ppl would differ and this assert would catch it
        assert row.ppl == pytest.approx(4 + 1.0 * 64, abs=1e-4)


class TestPairwiseJsDivergence:
    def test_identical_groups_zero(self, spark):
        rows = [("a", "x y z"), ("b", "x y z"), ("a", "x x"), ("b", "x x")]
        df = spark.createDataFrame(rows, "source string, text string")
        out = pairwise_js_divergence(df, "source", "text").collect()
        assert len(out) == 1
        assert out[0]["jsd"] == pytest.approx(0.0)

    def test_disjoint_groups_ln2(self, spark):
        rows = [("a", "x x y"), ("b", "p q q")]
        df = spark.createDataFrame(rows, "source string, text string")
        out = pairwise_js_divergence(df, "source", "text").collect()[0]
        assert out["grp_a"] == "a" and out["grp_b"] == "b"
        assert out["jsd"] == pytest.approx(math.log(2.0), abs=1e-6)

    def test_pair_count(self, spark):
        rows = [(g, "w") for g in "abcd"]
        df = spark.createDataFrame(rows, "source string, text string")
        assert pairwise_js_divergence(df, "source", "text").count() == 6


def _aes_key(doc_id: int, weight: int) -> float:
    h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16)
    u = (h + 1) / float(1 << 60)
    return u ** (1.0 / weight)


class TestWeightedSample:
    def test_matches_python_replay_and_partitioning_invariant(self, spark):
        rows = [(i, 10 + (i * 37) % 400) for i in range(300)]
        df = spark.createDataFrame(rows, "doc_id long, n_chars long")
        expect = {
            i for i, _ in sorted(
                rows, key=lambda r: (-_aes_key(r[0], r[1]), r[0])
            )[:40]
        }
        got = {r["doc_id"] for r in weighted_sample(df, "doc_id", "n_chars", 40).collect()}
        assert got == expect
        got13 = {
            r["doc_id"]
            for r in weighted_sample(
                df.repartition(13), "doc_id", "n_chars", 40
            ).collect()
        }
        assert got13 == expect

    def test_weight_bias(self, spark):
        # one heavy group vs one light group: heavy ids must dominate
        rows = [(i, 1000) for i in range(100)] + [
            (i, 1) for i in range(100, 200)
        ]
        df = spark.createDataFrame(rows, "doc_id long, n_chars long")
        got = [r["doc_id"] for r in weighted_sample(df, "doc_id", "n_chars", 50).collect()]
        heavy = sum(1 for i in got if i < 100)
        assert heavy >= 45  # w=1000 vs w=1 → light ids need u ~ 1 - 1e-3

    def test_nonpositive_weights_excluded(self, spark):
        """w=0 gives u^inf (key 0, silently unsampleable) and w<0 gives
        keys > 1 that would dominate the top-k — both are excluded: zero
        weight means zero inclusion probability by definition."""
        rows = [(1, 10), (2, 0), (3, -5), (4, 7), (5, None)]
        df = spark.createDataFrame(rows, "doc_id long, n_chars int")
        got = {r["doc_id"] for r in weighted_sample(df, "doc_id", "n_chars", 5).collect()}
        assert got == {1, 4}


class TestWindowedPsi:
    def test_shifted_day_flagged(self, spark):
        import datetime as dt

        day1 = dt.datetime(2024, 1, 1, 6)
        day2 = dt.datetime(2024, 1, 2, 6)
        rows = [(day1, float(5 + (i % 10))) for i in range(200)] + [
            (day2, float(150 + (i % 10))) for i in range(200)
        ]
        df = spark.createDataFrame(rows, "ts timestamp, value double")
        out = {
            r["window_start"]: r
            for r in windowed_psi(df, "ts", "value", "1 day", 10, 0.0, 200.0).collect()
        }
        assert set(out) == {"2024-01-01 00:00:00", "2024-01-02 00:00:00"}
        assert all(r["n"] == 200 for r in out.values())
        # each day occupies one bucket; baseline is 50/50 → per-day PSI is
        # symmetric and large: (1-0.5)ln(2) + (eps-0.5)ln(eps/0.5) × 1 bucket
        p_hit, q_hit = 1.0, 0.5
        eps = 1e-6
        expected = (p_hit - q_hit) * math.log(p_hit / q_hit) + (
            eps - q_hit
        ) * math.log(eps / q_hit)
        for r in out.values():
            assert r["psi"] == pytest.approx(expected, abs=1e-6)

    def test_uniform_days_no_drift(self, spark):
        import datetime as dt

        rows = [
            (dt.datetime(2024, 1, 1 + d, 3), float(v))
            for d in range(3)
            for v in (10, 50, 90, 130, 170) * 20
        ]
        df = spark.createDataFrame(rows, "ts timestamp, value double")
        out = windowed_psi(df, "ts", "value", "1 day", 10, 0.0, 200.0).collect()
        assert len(out) == 3
        assert all(r["psi"] == pytest.approx(0.0, abs=1e-9) for r in out)


class TestTokenSketchPsi:
    @staticmethod
    def _bucket(token: int, buckets: int = 64) -> int:
        # pure-python twin of pmod(portable_hash60(cast(token as string)), buckets)
        return int(hashlib.md5(str(token).encode()).hexdigest()[:15], 16) % buckets

    def test_identical_sides_zero_psi(self, spark):
        rows = [(i, [i % 7, (i * 3) % 11, 5]) for i in range(100)]
        df = spark.createDataFrame(rows, "doc_id long, tokens array<int>")
        out = token_sketch_psi(df, df, buckets=64).collect()
        assert len(out) > 0
        assert all(r["psi_term"] == pytest.approx(0.0, abs=1e-9) for r in out)

    def test_matches_closed_form(self, spark):
        cur_rows = [(0, [1, 1, 2])]
        base_rows = [(0, [1, 1, 2]), (1, [3])]
        cur = spark.createDataFrame(cur_rows, "doc_id long, tokens array<int>")
        base = spark.createDataFrame(base_rows, "doc_id long, tokens array<int>")
        out = {r["bucket"]: r["psi_term"] for r in
               token_sketch_psi(cur, base, buckets=64).collect()}

        from collections import Counter
        cur_cnt = Counter(self._bucket(t) for t in [1, 1, 2])
        base_cnt = Counter(self._bucket(t) for t in [1, 1, 2, 3])
        eps = 1e-6
        expected = {}
        for b in set(cur_cnt) | set(base_cnt):
            p = max(cur_cnt.get(b, 0) / 3.0, eps)
            q = max(base_cnt.get(b, 0) / 4.0, eps)
            expected[b] = round((p - q) * math.log(p / q), 6)
        assert out == expected
        # the bucket holding token 3 (absent from current) must drift
        assert out[self._bucket(3)] > 0

    def test_shifted_corpus_drifts(self, spark):
        base = spark.createDataFrame(
            [(i, [i % 50]) for i in range(500)], "doc_id long, tokens array<int>"
        )
        cur = spark.createDataFrame(
            [(i, [1000 + i % 50]) for i in range(500)],
            "doc_id long, tokens array<int>",
        )
        total = sum(
            r["psi_term"] for r in token_sketch_psi(cur, base, buckets=64).collect()
        )
        assert total > 0.25  # canonical "significant drift" PSI threshold


def test_bigram_perplexity_closed_forms(spark):
    import math

    from pyspark.sql import functions as F

    from jsonschema_spark.operators.relevance import bigram_perplexity

    # reference doc 0 = "1 2 1 2 1 2": B(1,2)=3, B(2,1)=2, H(1)=3, H(2)=2, V=2
    df = spark.createDataFrame(
        [(0, [1, 2, 1, 2, 1, 2]), (1, [1, 2]), (2, [9, 9]), (3, [5])],
        "doc_id: long, tokens: array<int>",
    )
    rows = {
        r["id"]: r
        for r in bigram_perplexity(df, F.col("doc_id") == 0).collect()
    }
    p12 = (3 + 0.5) / (3 + 0.5 * 2)      # seen bigram, seen history
    p99 = (0 + 0.5) / (0 + 0.5 * 2)      # unseen everything -> uniform 1/V
    assert rows[1]["ppl"] == pytest.approx(1 / p12, abs=1e-6)
    assert rows[2]["ppl"] == pytest.approx(1 / p99, abs=1e-6)
    # in-domain scores strictly better than out-of-domain
    assert rows[1]["xent"] < rows[2]["xent"]
    # single-token doc has no conditional to price
    assert 3 not in rows and 0 not in rows


def test_trigram_stupid_backoff_closed_forms(spark):
    from pyspark.sql import functions as F

    from jsonschema_spark.operators.relevance import trigram_stupid_backoff

    # reference doc 0 = "1 2 3 1 2 3 1 2 3":
    #   T(1,2,3)=3 T(2,3,1)=2 T(3,1,2)=2  B(1,2)=3 B(2,3)=3 B(3,1)=2
    #   U(1)=3 U(2)=3 U(3)=3  N=9 V=3
    df = spark.createDataFrame(
        [
            (0, [1, 2, 3, 1, 2, 3, 1, 2, 3]),
            (1, [1, 2, 3]),        # seen trigram: S = T(1,2,3)/B(1,2) = 1
            (2, [9, 2, 3]),        # unseen trigram, seen bigram (2,3):
                                   #   S = 0.4 * B(2,3)/U(2) = 0.4
            (3, [9, 9, 9]),        # full backoff to the unigram base:
                                   #   S = 0.16 * (0+0.5)/(9+0.5*3)
            (4, [5, 6]),           # no trigram position -> absent
        ],
        "doc_id: long, tokens: array<int>",
    )
    rows = {
        r["id"]: r
        for r in trigram_stupid_backoff(df, F.col("doc_id") == 0).collect()
    }
    import math

    assert rows[1]["n_trigrams"] == 1 and rows[1]["n_hit3"] == 1
    assert rows[1]["xent"] == pytest.approx(0.0, abs=1e-6)
    assert rows[2]["n_hit3"] == 0 and rows[2]["n_hit2"] == 1
    assert rows[2]["xent"] == pytest.approx(-math.log(0.4), abs=1e-6)
    base = (0.4 * 0.4) * 0.5 / (9 + 0.5 * 3)
    assert rows[3]["n_hit3"] == 0 and rows[3]["n_hit2"] == 0
    assert rows[3]["xent"] == pytest.approx(-math.log(base), abs=1e-6)
    # in-domain strictly better than out-of-domain, tier by tier
    assert rows[1]["xent"] < rows[2]["xent"] < rows[3]["xent"]
    assert 4 not in rows and 0 not in rows


def test_kn_bigram_perplexity_closed_forms(spark):
    from pyspark.sql import functions as F

    from jsonschema_spark.operators.relevance import kn_bigram_perplexity

    # reference doc 0 = "1 2 1 2 1 2": B(1,2)=3, B(2,1)=2, H(1)=3, H(2)=2,
    # N1+(1,.)=N1+(2,.)=1, N1+(.,1)=N1+(.,2)=1, N1+(..)=2, V=2
    df = spark.createDataFrame(
        [
            (0, [1, 2, 1, 2, 1, 2]),
            (1, [1, 2]),
            (2, [9, 9]),
            (3, [5]),
            (4, [1, 9]),
        ],
        "doc_id: long, tokens: array<int>",
    )
    rows = {
        r["id"]: r
        for r in kn_bigram_perplexity(df, F.col("doc_id") == 0).collect()
    }
    pc_seen = (1 + 0.5) / (2 + 0.5 * 2)    # = 0.5 for tokens 1 and 2
    pc_unseen = 0.5 / (2 + 0.5 * 2)        # = 1/6 for token 9
    # seen bigram, seen history: discounted ML + continuation backoff
    p12 = (3 - 0.75) / 3 + 0.75 * 1 / 3 * pc_seen
    assert rows[1]["ppl"] == pytest.approx(1 / p12, abs=1e-6)
    assert rows[1]["n_seen_hist"] == 1
    # unseen history -> pure continuation probability
    assert rows[2]["ppl"] == pytest.approx(1 / pc_unseen, abs=1e-6)
    assert rows[2]["n_seen_hist"] == 0
    # seen history, unseen continuation: only the backoff term survives
    p19 = 0.75 * 1 / 3 * pc_unseen
    assert rows[4]["ppl"] == pytest.approx(1 / p19, abs=1e-6)
    # in-domain strictly better than out-of-domain; the seen-history/
    # unseen-continuation case is priced below the raw continuation prob
    assert rows[1]["xent"] < rows[2]["xent"] < rows[4]["xent"]
    # single-token doc has no conditional to price; ref doc not scored
    assert 3 not in rows and 0 not in rows


def test_kn_trigram_perplexity_closed_forms(spark):
    from pyspark.sql import functions as F

    from jsonschema_spark.operators.relevance import kn_trigram_perplexity

    # ref doc 0 = "1 2 1 2 1 2": T(121)=2, T(212)=2; H(1,2)=H(2,1)=2;
    # M(2,1)=M(1,2)=1, M(b.)=1, N1c(b)=1; bigram types {(1,2),(2,1)} ->
    # P1(1)=P1(2)=0.5, P1(unseen)=1/6
    df = spark.createDataFrame(
        [
            (0, [1, 2, 1, 2, 1, 2]),
            (1, [1, 2, 1]),
            (2, [9, 9, 9]),
            (3, [2, 1, 9]),
            (4, [5, 7]),
        ],
        "doc_id: long, tokens: array<int>",
    )
    rows = {
        r["id"]: r
        for r in kn_trigram_perplexity(df, F.col("doc_id") == 0).collect()
    }
    p1_seen, p1_unseen = 0.5, 1 / 6
    # seen trigram: discounted ML + backoff through both KN levels
    p2_12 = (1 - 0.75) / 1 + 0.75 * 1 / 1 * p1_seen        # P2(1|2)
    p121 = (2 - 0.75) / 2 + 0.75 * 1 / 2 * p2_12
    assert rows[1]["ppl"] == pytest.approx(1 / p121, abs=1e-6)
    assert rows[1]["n_seen_hist"] == 1
    # everything unseen -> smoothed continuation unigram
    assert rows[2]["ppl"] == pytest.approx(1 / p1_unseen, abs=1e-6)
    assert rows[2]["n_seen_hist"] == 0
    # seen history, unseen trigram AND unseen middle continuation
    p2_91 = 0 + 0.75 * 1 / 1 * p1_unseen                    # P2(9|1)
    p219 = 0 + 0.75 * 1 / 2 * p2_91
    assert rows[3]["ppl"] == pytest.approx(1 / p219, abs=1e-6)
    assert rows[3]["n_seen_hist"] == 1
    # ordering: in-domain best, pure-OOV middle, deep-miss worst
    assert rows[1]["xent"] < rows[2]["xent"] < rows[3]["xent"]
    # a 2-token doc has no trigram to price; ref doc not scored
    assert 4 not in rows and 0 not in rows
