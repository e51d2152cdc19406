"""spark-submitted job: CCNet-style unigram-perplexity scoring pass over
the same deterministic synthetic corpus as dedup_scaling_job.py — scaling
evidence for the explode -> broadcast-model-join -> per-doc agg plan class
(shared by unigram_perplexity, dsir_weights, tfidf, rare_token_rate),
which is a different shape from the scan-heavy validation headline and
the shuffle-heavy dedup/CC jobs already in BENCH/scaling.json. Prints ONE
JSON line. Every 10th document is the reference slice; the rest are
scored.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from dedup_scaling_job import materialize  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--rows", type=int, default=2_000_000)
    ap.add_argument("--repeat", type=int, default=2)
    ap.add_argument(
        "--cache-dir",
        default=os.environ.get("BENCH_CACHE_DIR", "/tmp/jsonschema_spark_bench"),
    )
    args = ap.parse_args()

    spark = SparkSession.builder.getOrCreate()
    from jsonschema_spark.operators.relevance import unigram_perplexity

    path = materialize(spark, args.rows, args.cache_dir)
    docs = spark.read.parquet(path)

    def one_pass() -> tuple[int, int]:
        scored = unigram_perplexity(
            docs, F.pmod(F.col("doc_id"), F.lit(10)) == 0, buckets=4096
        )
        row = scored.agg(
            F.count(F.lit(1)).alias("n_docs"), F.sum("n_tok").alias("n_tok")
        ).first()
        return int(row.n_docs), int(row.n_tok)

    n_docs, n_tok = one_pass()  # warm-up (JIT, python workers, page cache)
    best = float("inf")
    for _ in range(args.repeat):
        t0 = time.time()
        n_docs, n_tok = one_pass()
        best = min(best, time.time() - t0)

    print(
        json.dumps(
            {
                "job": "unigram_ppl",
                "rows": args.rows,
                "scored_docs": n_docs,
                "scored_tokens": n_tok,
                "wall_sec": round(best, 3),
                "docs_per_sec": round(n_docs / best, 1),
                "tokens_per_sec": round(n_tok / best, 1),
            }
        )
    )
    sys.stdout.flush()
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
