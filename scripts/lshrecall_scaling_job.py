"""spark-submitted job: the LSH recall QA probe (dedup.py
``lsh_recall_probe``) over the deterministic synthetic text corpus —
scaling evidence for the VERDICT-r4 fix: the probe's truth join is
O(k²) over a CONSTANT-SIZE k-smallest-hash sample, so wall time must be
(a) ~flat in corpus rows (the only corpus-sized stage is the
scan + TakeOrderedAndProject sample pick) and (b) scale with cores on
the scan side. Prints ONE JSON line.

Run at two --rows sizes to evidence the size-invariance claim; the
driver-side merge in scripts/scaling.py records each under its own key
(copy the old record to a suffixed key first, per CLAUDE.md).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from pyspark.sql import SparkSession

from dedup_scaling_job import materialize


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--rows", type=int, default=500_000)
    ap.add_argument("--repeat", type=int, default=2)
    ap.add_argument("--sample-k", type=int, default=256)
    ap.add_argument(
        "--cache-dir",
        default="/tmp/jsonschema_spark_bench",
    )
    args = ap.parse_args()

    spark = SparkSession.builder.getOrCreate()
    from jsonschema_spark.operators.dedup import lsh_recall_probe

    path = materialize(spark, args.rows, args.cache_dir)
    docs = spark.read.parquet(path)

    def one_pass():
        return lsh_recall_probe(
            docs, "doc_id", "text", threshold=0.5, n=3,
            num_perms=32, rows_per_band=2, sample_k=args.sample_k,
        ).collect()[0]

    row = one_pass()  # warm-up (JIT, python workers, page cache)
    best = float("inf")
    for _ in range(args.repeat):
        t0 = time.time()
        row = one_pass()
        best = min(best, time.time() - t0)

    print(
        json.dumps(
            {
                "job": "lsh_recall_probe",
                "rows": args.rows,
                "sample_k": args.sample_k,
                "n_docs": int(row["n_docs"]),
                "n_true_pairs": int(row["n_true_pairs"]),
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
