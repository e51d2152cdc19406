"""spark-submitted job: connected-components pass over a deterministic
synthetic edge set — scaling evidence for the clustering stage of the
near-dup pipeline (operators/components.py). Prints ONE JSON line.

Edge corpus shape (hash-generated, identical at any parallelism):

- 98% random pairs over a node space of 1.25x the edge count — a sparse
  random graph: many small components, the realistic near-dup regime.
- 2% chain edges (i -> i+1 runs) — long paths, the worst case for label
  propagation, exercising the O(log n) star-contraction rounds.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CHAIN_MOD = 50  # i % 50 == 0 -> chain edge


def edge_corpus(spark: SparkSession, n_edges: int, seed: int = 23) -> DataFrame:
    n_nodes = int(n_edges * 1.25)
    base = spark.range(n_edges)
    i = F.col("id")
    is_chain = F.pmod(i, CHAIN_MOD) == 0
    rnd_a = F.pmod(F.xxhash64(i + F.lit(seed), F.lit(1)), F.lit(n_nodes))
    rnd_b = F.pmod(F.xxhash64(i + F.lit(seed), F.lit(2)), F.lit(n_nodes))
    # every CHAIN_MOD-th edge extends a 1000-node path in a reserved id
    # range above the random-node space: chain c spans nodes
    # [n_nodes + 1001*c, n_nodes + 1001*c + 1000]
    j = F.floor(i / CHAIN_MOD)
    chain_node = F.lit(n_nodes) + F.floor(j / 1000) * 1001 + F.pmod(j, F.lit(1000))
    a = F.when(is_chain, chain_node).otherwise(rnd_a)
    b = F.when(is_chain, chain_node + 1).otherwise(rnd_b)
    return base.select(a.alias("id_a"), b.alias("id_b")).filter(
        F.col("id_a") != F.col("id_b")
    )


def materialize(spark: SparkSession, n_edges: int, cache_dir: str) -> str:
    path = os.path.join(cache_dir, f"edge_corpus_n{n_edges}_s23")
    if not os.path.isdir(path):
        # Fixed 64-file layout: spark.range inherits the creating session's
        # parallelism, and a 2-core materialize writes 2 unsplittable row
        # groups that pin every later level's scan at 2 tasks (see
        # dedup_scaling_job.materialize for the measured pathology).
        edge_corpus(spark, n_edges).repartition(64).write.mode(
            "overwrite"
        ).parquet(path)
    return path


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--rows", type=int, default=4_000_000, help="edge count")
    ap.add_argument("--repeat", type=int, default=2)
    ap.add_argument(
        "--cache-dir",
        default=os.environ.get("BENCH_CACHE_DIR", "/tmp/jsonschema_spark_bench"),
    )
    args = ap.parse_args()

    spark = SparkSession.builder.getOrCreate()
    from jsonschema_spark.operators.components import connected_components

    path = materialize(spark, args.rows, args.cache_dir)
    edges = spark.read.parquet(path)

    stats: dict = {}

    def one_pass() -> int:
        return connected_components(edges, stats=stats).count()

    n_assigned = one_pass()  # warm-up
    best = float("inf")
    for _ in range(args.repeat):
        t0 = time.time()
        n_assigned = one_pass()
        best = min(best, time.time() - t0)

    print(
        json.dumps(
            {
                "job": "connected_components",
                "rows": args.rows,
                "n_assigned": int(n_assigned),
                "rounds": stats.get("rounds"),
                "sec_per_round": round(best / stats["rounds"], 3)
                if stats.get("rounds")
                else None,
                "wall_sec": round(best, 3),
                "edges_per_sec": round(args.rows / best, 1),
                # scaling.py computes efficiency from tokens_per_sec;
                # edges/sec is the CC throughput metric
                "tokens_per_sec": round(args.rows / best, 1),
            }
        )
    )
    sys.stdout.flush()
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
