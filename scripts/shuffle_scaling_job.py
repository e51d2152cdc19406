"""spark-submitted job: deterministic global training-order shuffle
(operators/sampling.py::global_shuffle_order) over a synthetic id corpus —
scaling evidence for the two-phase bucket-rank formulation (the naive
row_number-over-global-ORDER-BY plan single-partitions and cannot run at
target scale; see BENCH/BASELINE.md for the interleaved A/B). Prints ONE
JSON line."""

from __future__ import annotations

import argparse
import json
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--rows", type=int, default=4_000_000)
    ap.add_argument("--repeat", type=int, default=2)
    ap.add_argument("--cache-dir", default="")  # unused; harness symmetry
    args = ap.parse_args()

    spark = SparkSession.builder.getOrCreate()
    from jsonschema_spark.operators.sampling import global_shuffle_order

    df = (
        spark.range(args.rows)
        .selectExpr("id AS doc_id")
        .repartition(64)
        .localCheckpoint()
    )

    def one_pass():
        row = (
            global_shuffle_order(df, "doc_id", seed=7, num_buckets=1024)
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("shuffle_pos").alias("chk"),
            )
            .collect()[0]
        )
        # positions are a permutation of 1..n -> checksum is closed-form
        assert row.chk == args.rows * (args.rows + 1) // 2, row
        return int(row.n)

    n = one_pass()  # warm-up
    best = float("inf")
    for _ in range(args.repeat):
        t0 = time.time()
        n = one_pass()
        best = min(best, time.time() - t0)

    print(
        json.dumps(
            {
                "job": "global_shuffle",
                "rows": args.rows,
                "n": n,
                "wall_sec": round(best, 3),
                "rows_per_sec": round(args.rows / best, 1),
                "tokens_per_sec": round(args.rows / best, 1),
            }
        )
    )
    sys.stdout.flush()
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
