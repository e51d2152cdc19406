"""Capstone composition test: the canonical training-data pipeline built
ONLY from this engine's operators, run end to end over the synthetic
tokenized corpus, with the invariant a corpus owner would check asserted
after every stage — validate → exact dedup → near-dup survivors →
quality floor → benchmark decontamination → temperature mix → packing.
Every stage's input/output contract is an operator already proven in
isolation; this pins that they COMPOSE (column names, determinism, and
monotonically shrinking row counts all line up)."""

from __future__ import annotations

from pyspark.sql import functions as F

from jsonschema_spark.operators.components import near_dedup_survivors
from jsonschema_spark.operators.dedup import (
    minhash_near_dup,
    token_content_hash,
)
from jsonschema_spark.operators.packing import pack_assignments
from jsonschema_spark.operators.sampling import temperature_mix
from jsonschema_spark.operators.stats import rare_token_rate
from jsonschema_spark.sources.corpus import token_neardup_corpus


def _run_pipeline(spark):
    # token corpus with injected exact + near duplicates, plus the
    # validation corpus's doc_id/source framing
    toks = token_neardup_corpus(spark, 2_000, seed=5)
    df = (
        toks.withColumn("source", F.pmod(F.col("doc_id"), F.lit(4)).cast("string"))
        .withColumn("n_tok", F.size("tokens"))
    )
    counts = {"raw": df.count()}

    # 1. validate: length consistency + non-empty (the per-row gate)
    ok = df.filter((F.col("n_tok") == F.size("tokens")) & (F.col("n_tok") > 0))
    counts["validated"] = ok.count()

    # 2. exact dedup, keep-first on the token fingerprint
    keep = (
        ok.select("doc_id", token_content_hash(F.col("tokens")).alias("_fp"))
        .groupBy("_fp")
        .agg(F.min("doc_id").alias("doc_id"))
    )
    exact = ok.join(keep.select("doc_id"), on="doc_id", how="left_semi")
    counts["exact_dedup"] = exact.count()

    # 3. near-dup pairs -> connected components -> keep one per cluster
    pairs = minhash_near_dup(
        exact, "doc_id", "tokens", threshold=0.8,
        elements=F.col("tokens"), shingle_sep=",",
    )
    survivors = near_dedup_survivors(exact, "doc_id", pairs)
    counts["near_dedup"] = survivors.count()

    # 4. quality floor: drop docs dominated by corpus-rare tokens
    rr = rare_token_rate(survivors, min_count=3)
    good_ids = rr.filter(F.coalesce(F.col("rare_rate"), F.lit(0.0)) <= 0.5)
    quality = survivors.join(
        good_ids.select(F.col("id").alias("doc_id")), on="doc_id",
        how="left_semi",
    )
    counts["quality"] = quality.count()

    # 5. decontamination: a "benchmark" of 20 kept documents must vanish
    bench = quality.orderBy("doc_id").limit(20).select("tokens")
    from jsonschema_spark.operators.dedup import contaminated_docs

    dirty = contaminated_docs(
        quality, "doc_id", "tokens", bench,
        n=13, elements=F.col("tokens"),
        bench_elements=F.col("tokens"), shingle_sep=",",
    )
    clean = quality.join(
        dirty.select(F.col("id").alias("doc_id")), on="doc_id", how="left_anti"
    )
    counts["decontaminated"] = clean.count()

    # 6. temperature mix to soften source skew
    mixed = temperature_mix(clean, "source", "doc_id", alpha=0.5)
    counts["mixed"] = mixed.count()

    # 7. pack into 512-token training windows
    packs = pack_assignments(mixed, "doc_id", "n_tok", budget=512)
    counts["packed_docs"] = packs.count()

    # 8. two decorrelated epoch orders over the final corpus, then the
    # order audit as the pipeline's closing gate
    from jsonschema_spark.operators.sampling import (
        global_shuffle_order,
        training_order_audit,
    )

    orders = [
        global_shuffle_order(mixed, "doc_id", seed=s, num_buckets=16)
        .withColumn("epoch", F.lit(e))
        for e, s in enumerate((101, 202))
    ]
    audit = training_order_audit(
        orders[0].unionByName(orders[1]), id_col="doc_id"
    )
    return counts, mixed, packs, audit


def test_pipeline_composes_with_monotone_counts(spark):
    counts, mixed, packs, audit = _run_pipeline(spark)
    order = [
        "raw", "validated", "exact_dedup", "near_dedup", "quality",
        "decontaminated", "mixed",
    ]
    for a, b in zip(order, order[1:]):
        assert counts[b] <= counts[a], (a, counts[a], b, counts[b])
    # every stage actually bit: dups exist by construction, the benchmark
    # overlap removes at least its own 20 members, the mix drops rows
    assert counts["exact_dedup"] < counts["validated"]
    assert counts["near_dedup"] < counts["exact_dedup"]
    assert counts["decontaminated"] <= counts["quality"] - 20
    assert counts["packed_docs"] == counts["mixed"] > 0

    # final corpus has no exact-duplicate fingerprints left
    n_fp = (
        mixed.select(token_content_hash(F.col("tokens")).alias("fp"))
        .groupBy("fp").count().filter("count > 1").count()
    )
    assert n_fp == 0

    # packing respects the budget for every non-oversize pack
    over = (
        packs.groupBy("stream", "pack_id")
        .agg(F.sum("n_tok").alias("fill"), F.count(F.lit(1)).alias("n"))
        .filter((F.col("fill") > 512) & (F.col("n") > 1))
        .count()
    )
    assert over == 0

    # the closing gate: both epoch orders are exact permutations of the
    # final corpus and the two epochs are decorrelated (seed reuse would
    # report rho == 1.0)
    rows = {r["epoch"]: r for r in audit.collect()}
    assert rows[0]["is_permutation"] and rows[1]["is_permutation"]
    assert rows[0]["n_rows"] == counts["mixed"]
    assert abs(rows[1]["spearman_vs_prev"]) < 0.3


def test_pipeline_is_deterministic(spark):
    _, mixed_a, _, _ = _run_pipeline(spark)
    _, mixed_b, _, _ = _run_pipeline(spark)
    ids_a = {r["doc_id"] for r in mixed_a.select("doc_id").collect()}
    ids_b = {r["doc_id"] for r in mixed_b.select("doc_id").collect()}
    assert ids_a == ids_b
