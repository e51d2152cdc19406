"""Unit proofs for the round-2 pipeline operators: KS drift, deterministic
sampling, repetition scoring, PII corpus closed forms, JSONL corrupt-line
capture."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from jsonschema_spark.functions.text import repetition_ratio
from jsonschema_spark.operators.drift import ks_statistic
from jsonschema_spark.operators.sampling import cap_per_group, hash_sample
from jsonschema_spark.sources.corpus import (
    PII_DIGITS_MOD,
    PII_EMAIL_MOD,
    PII_SSN_MOD,
    pii_corpus,
)
from jsonschema_spark.sources.jsonl import (
    corrupt_rows,
    ingest_verdicts,
    read_jsonl,
)


def _hist(spark, counts):
    return spark.createDataFrame(
        [(k, v) for k, v in counts.items()], "bucket: long, cnt: long"
    )


def test_ks_known_value(spark):
    cur = _hist(spark, {1: 1, 2: 1})
    base = _hist(spark, {1: 1, 2: 1, 3: 2})
    # CDFs: cur = .5, 1, 1 ; base = .25, .5, 1 -> max gap 0.5 at k=2
    assert ks_statistic(cur, base).collect()[0]["ks"] == pytest.approx(0.5)


def test_ks_identical_is_zero(spark):
    h = _hist(spark, {1: 10, 5: 3, 9: 7})
    assert ks_statistic(h, h).collect()[0]["ks"] == 0.0


def test_ks_missing_buckets_on_either_side(spark):
    cur = _hist(spark, {1: 4})
    base = _hist(spark, {2: 4})
    # cur's mass is entirely below base's -> KS = 1
    assert ks_statistic(cur, base).collect()[0]["ks"] == pytest.approx(1.0)


def test_hash_sample_deterministic_and_nested(spark):
    df = spark.range(20_000).withColumnRenamed("id", "doc_id")
    small = {r["doc_id"] for r in hash_sample(df, "doc_id", 0.01).collect()}
    big = {r["doc_id"] for r in hash_sample(df, "doc_id", 0.10).collect()}
    assert small <= big  # content-addressed samples nest
    # rate lands near target (hash uniformity; wide tolerance)
    assert 0.05 < len(big) / 20_000 < 0.15
    # identical under a different physical layout
    again = {
        r["doc_id"]
        for r in hash_sample(df.repartition(13), "doc_id", 0.10).collect()
    }
    assert again == big


def test_cap_per_group(spark):
    rows = [(f"s{i % 3}", i) for i in range(100)]
    df = spark.createDataFrame(rows, "source: string, doc_id: long")
    capped = cap_per_group(df, "source", k=5, order_col="doc_id")
    got = capped.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"), F.max("doc_id").alias("mx")
    ).collect()
    assert {r["source"]: r["n"] for r in got} == {"s0": 5, "s1": 5, "s2": 5}
    # deterministic: the k SMALLEST doc_ids survive per group
    assert all(r["mx"] <= 14 for r in got)
    with pytest.raises(ValueError):
        cap_per_group(df, "source", k=5)


def test_repetition_ratio(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c a b c a b c"),   # 7 grams, 3 distinct -> 1 - 3/7
            (2, "all words fully unique here now"),
            (3, "two words"),           # < n words -> 0
            (4, ""),
        ],
        "doc_id: long, text: string",
    )
    got = {
        r["doc_id"]: r["r"]
        for r in df.select(
            "doc_id", F.round(repetition_ratio(F.col("text"), 3), 6).alias("r")
        ).collect()
    }
    assert got[1] == pytest.approx(1 - 3 / 7, abs=1e-6)
    assert got[2] == 0.0
    assert got[3] == 0.0
    assert got[4] == 0.0


def test_pii_corpus_closed_forms(spark):
    n = 2_000
    df = pii_corpus(spark, n, seed=9)
    email_re, ssn_re, digits_re = (
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        r"[0-9]{3}-[0-9]{2}-[0-9]{4}",
        r"[0-9]{9,}",
    )
    row = df.agg(
        F.sum(F.regexp_count("text", F.lit(email_re))).alias("e"),
        F.sum(F.regexp_count("text", F.lit(ssn_re))).alias("s"),
        F.sum(F.regexp_count("text", F.lit(digits_re))).alias("d"),
    ).collect()[0]
    assert row["e"] == len([i for i in range(n) if i % PII_EMAIL_MOD == 3])
    assert row["s"] == len([i for i in range(n) if i % PII_SSN_MOD == 5])
    assert row["d"] == len([i for i in range(n) if i % PII_DIGITS_MOD == 2])


def test_jsonl_corrupt_capture(spark, tmp_path):
    path = os.path.join(tmp_path, "rows.jsonl")
    with open(path, "w") as f:
        f.write(json.dumps({"a": 1, "b": "x"}) + "\n")
        f.write("{broken json here\n")
        f.write(json.dumps({"a": 2, "b": "y"}) + "\n")
        f.write("also not json\n")
    schema = T.StructType(
        [T.StructField("a", T.LongType()), T.StructField("b", T.StringType())]
    )
    df = ingest_verdicts(read_jsonl(spark, path, schema))
    # SPARK-21610: the count must touch a data column, not just the verdict
    row = df.agg(
        F.count(F.when(F.col("wellformed"), F.col("a"))).alias("ok"),
        F.count(F.when(~F.col("wellformed"), 1)).alias("bad"),
    ).collect()[0]
    assert (row["ok"], row["bad"]) == (2, 2)
    bad = sorted(r["raw_line"] for r in corrupt_rows(spark, path, schema).collect())
    assert bad == ["also not json", "{broken json here"]


def test_mix_to_proportions(spark):
    """Re-mixing to 50/30/20 must (a) be exactly reproducible across
    partitionings, (b) achieve each group's target rate within bucket
    sampling tolerance at n=2000/group, (c) drop groups absent from the
    proportion spec, and (d) honor an explicit total."""
    from jsonschema_spark.operators.sampling import mix_to_proportions

    rows = [(g * 10_000 + i, f"g{g}") for g in range(4) for i in range(2000)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    props = {"g0": 0.5, "g1": 0.3, "g2": 0.2}

    picked = mix_to_proportions(df, "source", "doc_id", props)
    got = {r.source: r.cnt for r in
           picked.groupBy("source").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    # max achievable total = min(2000/0.5, 2000/0.3, 2000/0.2) = 4000
    assert "g3" not in got
    assert got["g0"] == 2000  # rate 1.0 keeps the whole limiting group
    assert abs(got["g1"] - 1200) < 150  # 4000 * 0.3, hash-sampling tolerance
    assert abs(got["g2"] - 800) < 120

    ids_a = sorted(r.doc_id for r in picked.collect())
    ids_b = sorted(
        r.doc_id
        for r in mix_to_proportions(
            df.repartition(17), "source", "doc_id", props
        ).collect()
    )
    assert ids_a == ids_b  # content-addressed, layout-independent

    small = mix_to_proportions(df, "source", "doc_id", props, total=1000)
    got_small = {r.source: r.cnt for r in
                 small.groupBy("source").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert abs(got_small["g0"] - 500) < 90
    assert abs(got_small["g1"] - 300) < 70
    assert abs(got_small["g2"] - 200) < 60
    # the explicit-total sample nests inside the max-total sample per group
    assert set(r.doc_id for r in small.collect()) <= set(ids_a) | {
        r.doc_id for r in picked.collect()
    }


def test_near_dup_exact_guard_raises_on_large_input(spark):
    from jsonschema_spark.operators.dedup import near_dup_pairs_exact

    df = spark.range(50).select(
        F.col("id").alias("doc_id"), F.lit("a b c").alias("text")
    )
    with pytest.raises(ValueError, match="O\\(n"):
        near_dup_pairs_exact(df, "doc_id", "text", max_rows=10)
    # under the cap (and with the cap disabled) the baseline still builds
    assert near_dup_pairs_exact(df.limit(5), "doc_id", "text").count() == 10
    assert near_dup_pairs_exact(
        df.limit(5), "doc_id", "text", max_rows=None
    ).count() == 10


def test_temperature_mix_flattens_toward_uniform(spark):
    from jsonschema_spark.operators.sampling import temperature_mix

    df = (
        spark.range(1400)
        .withColumnRenamed("id", "doc_id")
        .withColumn(
            "src",
            F.when(F.col("doc_id") < 1000, F.lit("big")).otherwise(F.lit("small")),
        )
    )
    # alpha=1 keeps natural proportions
    nat = {
        r["src"]: r["n"]
        for r in temperature_mix(df, "src", "doc_id", alpha=1.0)
        .groupBy("src").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    nat_ratio = nat["big"] / nat["small"]
    assert 2.1 <= nat_ratio <= 2.9  # ~1000/400
    # alpha=0 targets uniform
    flat = {
        r["src"]: r["n"]
        for r in temperature_mix(df, "src", "doc_id", alpha=0.0)
        .groupBy("src").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert 0.9 <= flat["big"] / flat["small"] <= 1.1
    # determinism: selection is content-addressed
    a = {r["doc_id"] for r in temperature_mix(df, "src", "doc_id", alpha=0.7).collect()}
    b = {r["doc_id"] for r in temperature_mix(df, "src", "doc_id", alpha=0.7).collect()}
    assert a == b
    with pytest.raises(ValueError):
        temperature_mix(df, "src", "doc_id", alpha=-1)


def test_positional_entropy_template_prefix(spark):
    import math

    from jsonschema_spark.operators.stats import positional_entropy

    df = spark.createDataFrame(
        [(i, [42, 1 + (i % 2), 1 + (i % 4), 99]) for i in range(64)],
        "doc_id: long, tokens: array<int>",
    )
    rows = {r["pos"]: r for r in positional_entropy(df, max_pos=10).collect()}
    assert rows[1]["entropy"] == 0.0 and rows[1]["n_distinct"] == 1
    assert rows[2]["entropy"] == pytest.approx(math.log(2), abs=1e-6)
    assert rows[3]["entropy"] == pytest.approx(math.log(4), abs=1e-6)
    assert rows[4]["entropy"] == 0.0
    assert rows[1]["n_seqs"] == 64
    assert 5 not in rows  # positions past every sequence emit nothing


def test_emd_known_values(spark):
    from jsonschema_spark.operators.drift import emd_statistic

    # point mass moved 0 -> 5: W1 = 5 exactly
    cur = _hist(spark, {0: 10})
    base = _hist(spark, {5: 10})
    assert emd_statistic(cur, base).collect()[0]["emd"] == pytest.approx(5.0)

    # uniform {1,2,3} shifted to {2,3,4}: every unit of mass moves 1
    cur = _hist(spark, {1: 1, 2: 1, 3: 1})
    base = _hist(spark, {2: 1, 3: 1, 4: 1})
    assert emd_statistic(cur, base).collect()[0]["emd"] == pytest.approx(1.0)

    # identical -> 0; and KS saturation contrast: +1 shift on wide support
    h = _hist(spark, {1: 10, 5: 3, 9: 7})
    assert emd_statistic(h, h).collect()[0]["emd"] == 0.0

    # non-uniform gaps weight the CDF difference by distance
    cur = _hist(spark, {0: 1})
    base = _hist(spark, {0: 1, 100: 1})
    # CDF gap 0.5 over [0, 100) -> W1 = 50
    assert emd_statistic(cur, base).collect()[0]["emd"] == pytest.approx(50.0)


def test_corpus_datasheet_closed_form(spark):
    """Every datasheet column against closed forms on a tiny corpus with
    one exact dup pair and two sources."""
    from pyspark.sql import functions as F

    from jsonschema_spark.functions.text import quality_score
    from jsonschema_spark.operators.stats import corpus_datasheet

    rows = [
        (1, "the cat and the dog ran", "a"),
        (2, "the cat and the dog ran", "a"),   # exact dup of 1
        (3, "completely different words here", "a"),
        (4, "one more unique document text", "b"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"]).withColumn(
        "n_chars", F.length("text")
    )
    r = corpus_datasheet(df).collect()[0]
    assert r.n_docs == 4
    assert r.total_words == 6 + 6 + 4 + 5
    assert r.exact_dup_rate == 0.25  # 3 distinct fingerprints / 4 docs
    assert r.n_sources == 2
    assert r.source_hhi == round((9 + 1) / 16, 6)
    qs = [
        round(x.q, 6)
        for x in df.select(quality_score(F.col("text")).alias("q")).collect()
    ]
    assert r.mean_quality == round(sum(qs) / 4, 6)
    lens = sorted(len(t) for _, t, _ in rows)
    med = (lens[1] + lens[2]) / 2
    assert r.p50_chars == round(med, 6)
