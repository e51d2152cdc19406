"""spark-submitted job: exact-substring dup-span pass (Lee et al.
ExactSubstr span extraction, operators/dedup.py::dup_spans) over the same
deterministic synthetic corpus as dedup_scaling_job.py — scaling evidence
for the LINEAR substring-dedup shape (posexplode -> map-side-combined
occurrence agg -> join-back -> per-doc gaps-and-islands window; no pair
join anywhere). Prints ONE JSON line.

Uses portable=False (xxhash64 gram identity — the at-scale fast path;
the md5 portable mode exists for oracle parity, not production).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

from pyspark.sql import SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from dedup_scaling_job import materialize  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--rows", type=int, default=500_000)
    ap.add_argument("--repeat", type=int, default=2)
    ap.add_argument(
        "--cache-dir",
        default=os.environ.get("BENCH_CACHE_DIR", "/tmp/jsonschema_spark_bench"),
    )
    args = ap.parse_args()

    spark = SparkSession.builder.getOrCreate()
    from pyspark.sql import functions as F

    from jsonschema_spark.operators.dedup import dup_span_stats

    path = materialize(spark, args.rows, args.cache_dir)
    docs = spark.read.parquet(path)

    def one_pass():
        # full per-doc scorecard (spans + aggregate): one row per doc;
        # reduce to two corpus totals so the action is a tiny collect
        row = (
            dup_span_stats(docs, "doc_id", "text", n=13, portable=False)
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("dup_tokens").alias("dup_tokens"),
            )
            .collect()[0]
        )
        return int(row.n_docs), int(row.dup_tokens)

    n_docs, dup_tokens = one_pass()  # warm-up
    best = float("inf")
    for _ in range(args.repeat):
        t0 = time.time()
        n_docs, dup_tokens = one_pass()
        best = min(best, time.time() - t0)

    print(
        json.dumps(
            {
                "job": "dup_spans",
                "rows": args.rows,
                "n_docs": n_docs,
                "dup_tokens": dup_tokens,
                "wall_sec": round(best, 3),
                "docs_per_sec": round(args.rows / best, 1),
                "tokens_per_sec": round(args.rows / best, 1),
            }
        )
    )
    sys.stdout.flush()
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
