"""spark-submitted job: winnowing-fingerprint near-copy pass over the same
deterministic synthetic corpus as dedup_scaling_job.py — scaling evidence
for the round-3 Arrow fingerprint kernel (polynomial rolling hash +
strided window minima in mapInPandas; see operators/dedup.py::
winnow_fingerprint_rows). Prints ONE JSON line.
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
    from jsonschema_spark.operators.dedup import winnow_near_dup

    path = materialize(spark, args.rows, args.cache_dir)
    docs = spark.read.parquet(path)

    def one_pass() -> int:
        return winnow_near_dup(
            docs, "doc_id", "text", k=12, window=8, min_shared=3,
            max_doc_freq=64,
        ).count()

    n_pairs = one_pass()  # warm-up (JIT, python workers, page cache)
    best = float("inf")
    for _ in range(args.repeat):
        t0 = time.time()
        n_pairs = one_pass()
        best = min(best, time.time() - t0)

    print(
        json.dumps(
            {
                "job": "winnow_near_dup",
                "rows": args.rows,
                "n_pairs": int(n_pairs),
                "wall_sec": round(best, 3),
                "docs_per_sec": round(args.rows / best, 1),
                # scaling.py divides tokens_per_sec; docs/sec is the metric
                "tokens_per_sec": round(args.rows / best, 1),
            }
        )
    )
    sys.stdout.flush()
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
