"""spark-submitted job: gap-based sessionization
(operators/temporal.py::sessionize) over a synthetic event stream whose
session structure has a closed form — scaling evidence for the
one-keyed-shuffle lag/cumsum-window + aggregate shape. Each user's event
times step 60 s with a 360 s jump at every 7th event (gap = 200 s), so
sessions split exactly at the jumps: sessions/user = floor((m-1)/7) + 1,
asserted every pass. Prints ONE JSON line."""

from __future__ import annotations

import argparse
import json
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

KEYS = 4_000


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--rows", type=int, default=4_000_000)
    ap.add_argument("--repeat", type=int, default=2)
    ap.add_argument("--cache-dir", default="")  # unused; harness symmetry
    args = ap.parse_args()

    spark = SparkSession.builder.getOrCreate()
    from jsonschema_spark.operators.temporal import sessionize

    n = args.rows - (args.rows % KEYS)
    m = n // KEYS  # events per user
    df = (
        spark.range(n)
        .select(
            (F.col("id") % KEYS).alias("user"),
            F.timestamp_seconds(
                (F.col("id") / KEYS).cast("long") * 60
                + ((F.col("id") / KEYS).cast("long") / 7).cast("long") * 300
                + F.col("id") % KEYS
            ).alias("ts"),
        )
        .repartition(64)
        .localCheckpoint()
    )
    want_sessions = KEYS * ((m - 1) // 7 + 1)

    def one_pass():
        row = (
            sessionize(df, "user", "ts", gap_seconds=200)
            .agg(
                F.count(F.lit(1)).alias("n_sessions"),
                F.sum("n_events").alias("n_events"),
            )
            .collect()[0]
        )
        assert (row.n_sessions, row.n_events) == (want_sessions, n), row
        return int(row.n_sessions)

    one_pass()  # warm-up
    best = float("inf")
    for _ in range(args.repeat):
        t0 = time.time()
        one_pass()
        best = min(best, time.time() - t0)

    print(
        json.dumps(
            {
                "job": "sessions",
                "rows": n,
                "sessions": want_sessions,
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
