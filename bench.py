"""Benchmark harness — prints ONE JSON line with per-query wall seconds.

Headline (BASELINE.json north rule): validated **sequences/sec and
tokens/sec** of one full validation pass (per-row draft-4 checks +
length-consistency + referential + uniqueness + stats histogram) over a
materialized tokenized-corpus parquet table with ~1% injected violations.

The corpus is generated once per (sf, seed) into a cache dir and read back
from parquet, so the measured pass is scan -> validate -> aggregate, not
generation. Operator queries from `__spark_entry__.queries()` run at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).

Env knobs:
    SPARK_GRAFT_SF_DIR   testdata dir (default /root/testdata/sf0.1)
    SPARK_GRAFT_CPUS     local[N] cores (default 32)
    BENCH_CORPUS_ROWS    corpus rows (default 1_000_000 at sf0.1, scaled)
    BENCH_CACHE_DIR      corpus parquet cache (default /tmp/jsonschema_spark_bench)
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F


def _sf(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.removeprefix("sf"))
    except ValueError:
        return 0.1


from jsonschema_spark.benchlib import (  # noqa: E402
    corpus_validation_pass,
    materialize_corpus,
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = _sf(sf_dir)
    # 4M rows at sf0.1 — the SAME corpus BASELINE.md's headline pins
    # (4M sequences / 2.07B tokens), so BENCH_rN vs BASELINE.md is a direct
    # file-to-file comparison instead of an overhead-confounded one
    default_rows = max(int(4_000_000 * (sf / 0.1)), 20_000)
    corpus_rows = int(os.environ.get("BENCH_CORPUS_ROWS", str(default_rows)))
    cache_dir = os.environ.get("BENCH_CACHE_DIR", "/tmp/jsonschema_spark_bench")

    from jsonschema_spark.sources.session import get_spark

    spark = get_spark(app_name="jsonschema_spark-bench", cores=cores)

    import __spark_entry__ as entry

    corpus_path = materialize_corpus(spark, corpus_rows, cache_dir)

    timings: dict[str, float] = {}

    # warm the JVM / parquet footer caches with one cheap action
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    # Host-drift calibration: a FIXED, code-independent unit of work (pure
    # codegen hash-sum over a range, no I/O, no repo code), recorded so
    # cross-round comparisons can be normalized for shared-host load — the
    # r1->r2 bench file could not distinguish host drift from regression.
    # Best-of-3 like everything else on this tenant-noisy box.
    def _calibration() -> float:
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            spark.range(500_000_000, numPartitions=64).select(
                # pmod keeps the ANSI sum far from long overflow
                F.sum(F.pmod(F.xxhash64("id"), F.lit(1_000_000)))
            ).collect()
            best = min(best, time.time() - t0)
        return round(best, 3)

    _calibration()  # JIT warm-up
    calibration_sec = _calibration()

    # Second calibration axis: a SCAN-class unit of work (parquet decode of
    # the nested tokens column + array traversal over the pinned corpus).
    # Needed because the two classes drift independently on this host: one
    # same-day pair measured the codegen row IMPROVING 1.22s -> 0.81s while
    # the validation scan degraded 8.5s -> 14.7s — a single CPU-bound
    # calibration cannot normalize bandwidth/decode-bound queries. The
    # corpus is deterministic per (rows, seed), so the unit is code-stable.
    def _calibration_scan() -> float:
        cdf = spark.read.parquet(corpus_path)
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            cdf.agg(
                F.sum(F.array_min("tokens") + F.array_max("tokens"))
            ).collect()
            best = min(best, time.time() - t0)
        return round(best, 3)

    _calibration_scan()  # page-cache / reader warm-up
    calibration_scan_sec = _calibration_scan()

    # Third calibration axis: an INTERPRETED-HOF unit of work (transform/
    # filter lambdas over synthetic arrays — no codegen, no parquet).
    # Round-4 adjudication found this class drifting independently of the
    # other two: repair/chunking/dup-gram-style queries (HOF-dominated)
    # moved ~1.7x together while codegen improved and scan degraded, and
    # an interleaved old-code-vs-HEAD A/B proved the code identical.
    # Normalize HOF-heavy queries by THIS row.
    def _calibration_hof() -> float:
        hdf = spark.range(2_000_000, numPartitions=64).select(
            F.sequence(F.lit(0), F.pmod(F.col("id"), F.lit(50)) + 10).alias(
                "arr"
            )
        )
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            hdf.select(
                F.sum(
                    F.aggregate(
                        F.filter(
                            F.transform(
                                "arr", lambda x: F.pmod(x * 7 + 3, F.lit(97))
                            ),
                            lambda x: x % 2 == 0,
                        ),
                        F.lit(0).cast("long"),
                        lambda acc, x: acc + x,
                    )
                )
            ).collect()
            best = min(best, time.time() - t0)
        return round(best, 3)

    _calibration_hof()  # interpreter warm-up
    calibration_hof_sec = _calibration_hof()

    # warm-up pass (JIT + parquet footer caches), then best-of-N steady state
    corpus_validation_pass(spark, corpus_path)
    # 4 timed passes: the shared host shows 5-8% CPU steal with bursts that
    # stretch a 10s pass to 50s — best-of-4 rides out one bad window
    repeat = int(os.environ.get("BENCH_REPEAT", "4"))
    corpus_sec = float("inf")
    for _ in range(repeat):
        t0 = time.time()
        n_rows, n_valid, n_tokens, n_dups = corpus_validation_pass(spark, corpus_path)
        corpus_sec = min(corpus_sec, time.time() - t0)
    timings["corpus_validate_full"] = round(corpus_sec, 3)

    headline = [
        "tpch_q1",
        "join_agg",
        "topk_per_group",
        "dup_keys",
        "orphans",
        "word_freq",
        "exact_stats",
        "json_schema_kernel",
        "json_schema_variant",
        "forall_items",
        "minhash_near_dup",
        "simhash_near_dup",
        "embedding_topk",
        "lang_id_counts",
        "quality_score",
        "exact_dedup_groups",
        "windowed_counts",
        "pattern_properties",
        "blob_stats",
        "ann_topk",
        "dup_components",
        "repetition_score",
        "decontaminate",
        "tfidf_top_terms",
        "source_divergence",
        "dsir_select",
        "source_mix",
        "shared_ngram_pairs",
        "longest_shared_run",
        "ngram_novelty",
        "diverse_sample",
        "infer_spec",
        "weighted_sample",
        "windowed_drift",
        "gopher_quality",
        "chunk_dedup",
        "semantic_decontam",
        "spec_diff",
        "unigram_ppl",
        "c4_clean",
        "image_decode",
        "audio_decode",
        "script_mojibake",
        "classifier_score",
        "corpus_overlap",
        "token_ngram_diversity",
        "sequence_structure",
        "zipf_slope",
        "token_prefix_dups",
        "pii_redact",
        "cross_source_dups",
        "vocab_prune",
        "chunk_sequences",
        "bigram_pmi",
        "dup_gram_scale",
        "repair_sequences",
        "temperature_mix",
        "positional_entropy",
        "bigram_ppl",
        "winnow_dups",
        "token_winnow_dups",
        "trigram_sbo",
        "semdedup",
        "padding_waste",
        "stratified_split",
        "unimax_alloc",
        "split_leakage_audit",
        "embedding_quant_qa",
        "vocab_richness",
        "vocab_diversity",
        "image_ahash_groups",
        "image_ahash_near_dup",
        "audio_fingerprint_groups",
        "url_dedup_groups",
        "domain_cap",
        "id_gap_audit",
        "incremental_near_dup",
        "tokenizer_fertility",
        "dup_spans",
        "dup_span_stats",
        "token_dup_spans",
        "decontam_spans",
        "global_shuffle",
        "dup_loss_mask",
        "effective_tokens",
        "ingest_dedup_trend",
        "shard_manifest",
        "emd_drift",
        "manifest_diff",
        "periodic_sequences",
        "classifier_eval",
        "contam_attribution",
        "source_concentration",
        "corpus_datasheet",
        "neardup_threshold_curve",
        "source_relative_filter",
        "url_content_conflicts",
        "key_skew_profile",
        "snapshot_churn",
        "vocab_churn",
        "lang_mismatch",
        "embedding_parity",
        "quality_survivors",
        # round-4 additions
        "component_size_hist",
        "containment_dups",
        "token_burstiness",
        "doremi_weights",
        "spec_rollout",
        "violation_cooccur",
        "check_activation",
        "bigram_kn_ppl",
        "repeat_value",
        "epoch_order_audit",
        "asof_thresholds",
        "maintenance_overlap",
        "event_sessions",
        "watermark_audit",
        "event_rollup",
        "lsh_recall",
        "violation_examples",
        "component_purity",
        "trigram_kn_ppl",
        # quality / constraint-discovery family
        "column_profile",
        "fd_audit",
        "categorical_mi",
        "benford_digits",
        "metric_anomaly",
        "join_cardinality",
        "inclusion_dependency",
        "freshness_audit",
        "numeric_profile",
        "fd_audit_by",
        "table_expectations",
        "suggest_constraints",
    ]
    qs = entry.queries()
    # VERDICT r4 #5: bench EVERY queries() entry, not just the curated
    # headline — the curated list sets the order (expensive / load-bearing
    # first); the remainder (keyword micro-queries etc.) append after it
    # so BENCH/bench_full_latest.json covers all 193 and a new query can
    # never be silently unbenched.
    bench_order = [n for n in headline if n in qs] + [
        n for n in qs if n not in set(headline)
    ]
    for name in bench_order:
        fn = qs.get(name)
        if fn is None:
            continue
        # best-of-3: the first run pays python-worker spawn + JIT + page
        # cache, and the shared host's CPU bursts can stretch one more
        # (r4: a 0.32 s query measured 2.06 s inside best-of-2)
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            n = fn(spark, sf_dir).count()
            best = min(best, time.time() - t0)
            assert n >= 0
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    result = {
        "metric": "total headline wall time (corpus validation pass + operator queries)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "corpus_rows": n_rows,
        "corpus_tokens": int(n_tokens),
        "corpus_invalid": int(n_rows - n_valid),
        "corpus_duplicates": int(n_dups),
        "sequences_per_sec": round(n_rows / corpus_sec, 1),
        "tokens_per_sec": round(n_tokens / corpus_sec, 1),
        "cores": cores,
        "calibration_sec": calibration_sec,
        "calibration_hof_sec": calibration_hof_sec,
        "calibration_scan_sec": calibration_scan_sec,
    }
    # The driver captures only the LAST ~2000 chars of stdout; r3's full
    # per-query line outgrew that and its JSON header was cut off
    # (BENCH_r03.json parsed: null). Persist the complete result to a file,
    # then print a stdout line guaranteed to fit the tail window: if the
    # full line is too long, drop the FASTEST queries (their timings live
    # in the file) until it fits and record how many were elided.
    full_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH", "bench_full_latest.json")
    os.makedirs(os.path.dirname(full_path), exist_ok=True)
    with open(full_path, "w") as f:
        json.dump(result, f, indent=2)
        f.write("\n")
    tail_budget = 1900
    line = json.dumps(result, separators=(",", ":"))
    if len(line) > tail_budget:
        stdout_result = dict(result)
        stdout_result["full_results"] = "BENCH/bench_full_latest.json"
        kept = dict(sorted(timings.items(), key=lambda kv: -kv[1]))
        while len(json.dumps({**stdout_result, "queries": kept}, separators=(",", ":"))) > tail_budget and kept:
            kept.pop(next(reversed(kept)))
        stdout_result["queries"] = kept
        stdout_result["queries_elided"] = len(timings) - len(kept)
        line = json.dumps(stdout_result, separators=(",", ":"))
    print(line)
    sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
