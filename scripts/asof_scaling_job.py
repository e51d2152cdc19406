"""spark-submitted job: as-of join (operators/temporal.py::asof_join) of a
synthetic event stream against a revisioned dimension — scaling evidence
for the tag-union + carry-forward-window formulation (the BETWEEN-theta
formulation plans into BroadcastNestedLoop and cannot run at target
scale). Data is built so the matched-payload sum has a closed form the
job asserts every pass. Prints ONE JSON line."""

from __future__ import annotations

import argparse
import json
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

KEYS = 4_000
REVS = 25


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--rows", type=int, default=4_000_000)
    ap.add_argument("--repeat", type=int, default=2)
    ap.add_argument("--cache-dir", default="")  # unused; harness symmetry
    args = ap.parse_args()

    spark = SparkSession.builder.getOrCreate()
    from jsonschema_spark.operators.temporal import asof_join

    n = args.rows - (args.rows % REVS)  # exact closed form needs REVS | n
    stride = n // REVS  # revision j covers ts in [j*stride, (j+1)*stride)

    fact = (
        spark.range(n)
        .select(
            (F.col("id") % KEYS).alias("key"),
            F.timestamp_seconds(F.col("id")).alias("ts"),
            F.col("id").alias("event_id"),
        )
        .repartition(64)
        .localCheckpoint()
    )
    dim = (
        spark.range(KEYS * REVS)
        .select(
            (F.col("id") % KEYS).alias("key"),
            F.timestamp_seconds(
                (F.col("id") / KEYS).cast("long") * F.lit(stride)
            ).alias("rev_ts"),
            (F.col("id") / KEYS).cast("long").alias("payload"),
        )
        .repartition(8)
        .localCheckpoint()
    )
    # every event's matched payload is floor(event_ts / stride), so the
    # sum over all events is stride * sum(0..REVS-1), key-independent
    want = stride * (REVS * (REVS - 1) // 2)

    def one_pass():
        row = (
            asof_join(
                fact,
                dim,
                key_col="key",
                ts_col="ts",
                dim_ts_col="rev_ts",
                payload_cols=["payload"],
            )
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("payload").alias("chk"),
                F.sum(F.col("payload").isNull().cast("long")).alias("miss"),
            )
            .collect()[0]
        )
        assert (row.n, row.chk, row.miss) == (n, want, 0), row
        return int(row.n)

    one_pass()  # warm-up
    best = float("inf")
    for _ in range(args.repeat):
        t0 = time.time()
        one_pass()
        best = min(best, time.time() - t0)

    print(
        json.dumps(
            {
                "job": "asof",
                "rows": n,
                "dim_rows": KEYS * REVS,
                "wall_sec": round(best, 3),
                "rows_per_sec": round(n / best, 1),
                "tokens_per_sec": round(n / best, 1),
            }
        )
    )
    sys.stdout.flush()
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
