"""spark-submitted job: token-distribution statistics pass (Zipf-slope
fit per source + top-k vocab coverage) over a deterministic pre-tokenized
corpus — scaling evidence for the explode → map-side-combined token-count
→ rank-window plan class (shared by zipf_slope, vocab_coverage,
bigram_pmi, token_frequencies), whose heavy stage is the corpus-sized
explode and whose window stages run over ≤ |vocab| rows. Prints ONE JSON
line.
"""

from __future__ import annotations

import argparse
import json
import os
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def materialize_tokens(spark, rows: int, cache_dir: str) -> str:
    from jsonschema_spark.sources.corpus import token_neardup_corpus

    path = os.path.join(cache_dir, f"token_corpus_{rows}_seed5.parquet")
    if not os.path.isdir(path):
        token_neardup_corpus(spark, rows, seed=5).repartition(64).write.mode(
            "overwrite"
        ).parquet(path)
    return path


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
    from jsonschema_spark.operators.stats import vocab_coverage, zipf_slope

    path = materialize_tokens(spark, args.rows, args.cache_dir)
    docs = spark.read.parquet(path).withColumn(
        "source", F.pmod(F.col("doc_id"), F.lit(8)).cast("string")
    )
    n_tok = int(docs.agg(F.sum(F.size("tokens"))).first()[0])

    def one_pass() -> tuple[int, int]:
        slopes = zipf_slope(docs, top_v=400).agg(
            F.count(F.lit(1)), F.sum("n_terms")
        ).first()
        cov = vocab_coverage(docs, ks=(50, 200)).agg(
            F.sum("covered_tokens")
        ).first()
        return int(slopes[0]), int(cov[0])

    n_groups, _ = one_pass()  # warm-up
    best = float("inf")
    for _ in range(args.repeat):
        t0 = time.time()
        n_groups, covered = one_pass()
        best = min(best, time.time() - t0)

    print(
        json.dumps(
            {
                "rows": args.rows,
                "tokens": n_tok,
                "groups": n_groups,
                "wall_sec": round(best, 3),
                "sequences_per_sec": round(args.rows / best, 1),
                "tokens_per_sec": round(n_tok / best, 1),
                "parallelism": spark.sparkContext.defaultParallelism,
                "cores": args.cores,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
