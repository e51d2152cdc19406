"""spark-submitted job: SemDeDup pass (cluster assignment + blocked
per-cluster matmul dedup) over a deterministic synthetic embedding corpus
with planted cluster structure — scaling evidence for the
embedding/matmul-bound plan class (semdedup, and the kernel shape behind
ivf assignment): one Arrow assignment kernel in the scan stage, ONE
shuffle routing each vector to its cluster task, then numpy dgemm blocks
per cluster. Distinct from every other job class here: the heavy stage is
floating-point arithmetic inside Arrow workers, not codegen, parquet
decode, or shuffle volume. Prints ONE JSON line.

Centroids are trained once outside the timed loop (a model artifact:
production trains on a sample, then assigns the full corpus with frozen
centroids — the timed pass is the part that scales with corpus size).
"""

from __future__ import annotations

import argparse
import json
import os
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

DIM = 64


def n_clusters(rows: int) -> int:
    """Cluster count scales with corpus size (the paper's regime: roughly
    constant expected cluster size), keeping per-cluster matmul work flat
    as rows grow — the shape that holds at 10^12 vectors."""
    return max(64, rows // 1000)


def synth_embeddings(spark, rows: int, clusters: int):
    """Deterministic clustered embeddings, all JVM-side expressions:
    cluster id = vec_id % clusters; embedding = per-cluster base vector
    (hash-derived) + 5% per-vector hash noise, so within-cluster cosines
    sit ~0.99 and cross-cluster cosines near 0 — the planted structure
    SemDeDup exists to find."""
    cl = F.pmod(F.col("vec_id"), F.lit(clusters))

    def unit(*cols):
        # hash -> [-1, 1) with 1e-3 resolution
        return (F.pmod(F.xxhash64(*cols), F.lit(1000)) - F.lit(500.0)) / F.lit(500.0)

    emb = F.transform(
        F.sequence(F.lit(0), F.lit(DIM - 1)),
        lambda d: (
            unit(F.lit("base"), cl, d)
            + F.lit(0.05) * unit(F.lit("noise"), F.col("vec_id"), d)
        ).cast("float"),
    )
    return spark.range(rows).select(
        F.col("id").alias("vec_id"), emb.alias("embedding")
    )


def materialize(spark, rows: int, clusters: int, cache_dir: str) -> str:
    path = os.path.join(cache_dir, f"embeddings_{rows}_c{clusters}.parquet")
    if not os.path.isdir(path):
        synth_embeddings(spark, rows, clusters).repartition(64).write.mode(
            "overwrite"
        ).parquet(path)
    return path


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
    from jsonschema_spark.operators.similarity import ivf_train, semdedup

    clusters = n_clusters(args.rows)
    path = materialize(spark, args.rows, clusters, args.cache_dir)
    df = spark.read.parquet(path)
    # train on a deterministic ~2% sample (content-addressed), frozen
    sample = df.filter(F.pmod(F.xxhash64("vec_id"), F.lit(50)) == 0)
    centroids = ivf_train(sample, "embedding", n_lists=clusters, iters=1)

    def one_pass() -> tuple[int, int]:
        out = semdedup(df, "embedding", centroids, threshold=0.9).agg(
            F.count(F.lit(1)), F.sum("n_dups")
        ).first()
        return int(out[0]), int(out[1] or 0)

    n_dup_rows, _ = one_pass()  # warm-up (python workers, page cache)
    best = float("inf")
    for _ in range(args.repeat):
        t0 = time.time()
        n_dup_rows, total_hits = one_pass()
        best = min(best, time.time() - t0)

    print(
        json.dumps(
            {
                "rows": args.rows,
                "tokens": args.rows * DIM,  # floats moved; throughput basis
                "dup_rows": n_dup_rows,
                "wall_sec": round(best, 3),
                "sequences_per_sec": round(args.rows / best, 1),
                "tokens_per_sec": round(args.rows * DIM / best, 1),
                "parallelism": spark.sparkContext.defaultParallelism,
                "cores": args.cores,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
