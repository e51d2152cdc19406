"""spark-submitted job: MinHash+LSH near-dup pass over a deterministic
synthetic text corpus — the dedup counterpart of throughput_job.py for the
two-cluster-size scaling protocol. Prints ONE JSON line.

The corpus is hash-generated inside Spark (same determinism contract as
sources/corpus.py: identical content at any parallelism) and materialized
once to a shared parquet cache, so every measured pass is scan -> shingle ->
signature -> band join -> verify.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

VOCAB = 30_000
NEAR_DUP_MOD = 101  # every 101st doc = previous doc's text + one extra word


def text_corpus(spark: SparkSession, n_rows: int, seed: int = 11) -> DataFrame:
    """(doc_id long, text string): 20-140 word docs over a 30k vocabulary;
    ~1% injected near-duplicates (copy of the previous doc plus one word, so
    shingle Jaccard is high but not 1.0)."""
    base = spark.range(n_rows)
    i = F.col("id")
    is_dup = F.pmod(i, NEAR_DUP_MOD) == NEAR_DUP_MOD - 1
    src = F.when(is_dup, i - 1).otherwise(i) + F.lit(seed)
    u = F.pmod(F.xxhash64(src, F.lit(1)), F.lit(1_000_000_007)).cast("double") / 1_000_000_007.0
    n_words = (F.lit(20) + F.floor(F.lit(120) * u)).cast("int")
    words = F.transform(
        F.sequence(F.lit(1), n_words),
        lambda p: F.concat(
            F.lit("w"), F.pmod(F.xxhash64(src, p), F.lit(VOCAB)).cast("string")
        ),
    )
    text = F.concat_ws(" ", words)
    text = F.when(is_dup, F.concat(text, F.lit(" zz"), i.cast("string"))).otherwise(text)
    return base.select(i.alias("doc_id"), text.alias("text"))


def materialize(spark: SparkSession, n_rows: int, cache_dir: str, seed: int = 11) -> str:
    path = os.path.join(cache_dir, f"text_corpus_n{n_rows}_s{seed}")
    if not os.path.isdir(path):
        # Fixed 64-file layout regardless of the creating session's cores:
        # spark.range inherits defaultParallelism, so a 2-core materialize
        # used to write 2 files = 2 unsplittable ~91 MB row groups, pinning
        # every later level's text scan at 2 tasks (winnow kernel_noop wall
        # was IDENTICAL at local[2] and local[8] until this was found —
        # the host-isolated kernel scales at 0.98). Real corpora have
        # thousands of files; the cache must too.
        text_corpus(spark, n_rows, seed).repartition(64).write.mode(
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
    from jsonschema_spark.operators.dedup import minhash_near_dup

    path = materialize(spark, args.rows, args.cache_dir)
    docs = spark.read.parquet(path)

    def one_pass() -> int:
        return minhash_near_dup(
            docs, "doc_id", "text", n=3, threshold=0.8
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
                "job": "minhash_near_dup",
                "rows": args.rows,
                "n_pairs": int(n_pairs),
                "wall_sec": round(best, 3),
                "docs_per_sec": round(args.rows / best, 1),
                # scaling.py divides tokens_per_sec; docs/sec is the dedup metric
                "tokens_per_sec": round(args.rows / best, 1),
            }
        )
    )
    sys.stdout.flush()
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
