"""spark-submitted job: single-pass multi-column profile
(operators/quality.py::column_profile — the Deequ discovery pass) over a
deterministic pre-tokenized corpus — scaling evidence for the stacked
generate → groupBy(column, value) plan class, whose heavy stage is one
corpus-sized explode feeding a mixed-cardinality histogram shuffle (the
id column's histogram is corpus-sized; the categorical columns collapse
map-side). Asserts closed-form profile invariants every pass. Prints ONE
JSON line.
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
    from jsonschema_spark.operators.quality import column_profile

    path = materialize_tokens(spark, args.rows, args.cache_dir)
    # four profile columns spanning the cardinality ladder: a unique key,
    # a corpus-scale-but-repeating numeric, a vocab-bounded token, a
    # tiny categorical — the mixed-histogram shuffle the operator's
    # docstring contracts for
    docs = spark.read.parquet(path).select(
        F.col("doc_id"),
        F.size("tokens").alias("n_tok"),
        F.element_at("tokens", 1).alias("lead_tok"),
        F.pmod(F.col("doc_id"), F.lit(8)).cast("string").alias("source"),
    )
    n_tok = int(docs.agg(F.sum("n_tok")).first()[0])

    def one_pass() -> dict:
        rows = column_profile(
            docs, ["doc_id", "n_tok", "lead_tok", "source"]
        ).collect()
        prof = {r["column"]: r for r in rows}
        assert len(prof) == 4
        for r in prof.values():
            assert r["n_rows"] == args.rows and r["n_null"] == 0
        assert prof["doc_id"]["n_distinct"] == args.rows
        assert prof["doc_id"]["uniqueness"] == 1.0
        assert prof["source"]["n_distinct"] == min(8, args.rows)
        return prof

    one_pass()  # warm-up
    best = float("inf")
    for _ in range(args.repeat):
        t0 = time.time()
        one_pass()
        best = min(best, time.time() - t0)

    print(
        json.dumps(
            {
                "rows": args.rows,
                "tokens": n_tok,
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
