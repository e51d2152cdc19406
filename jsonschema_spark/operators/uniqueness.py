"""Table-scope uniqueness checks — the reference's ``uniqueItems``
(/root/reference/validate.go:320-370, O(n²) within one array) lifted to a
distributed key-uniqueness check over 10^12 rows.

Strategy (north rule: skew handled explicitly):

- ``duplicate_keys``: two-phase *salted* aggregation. Phase 1 groups by
  (salt, key) where salt varies per partition — a hot key is split across
  S reducers, each emitting one (key, partial_count) row; phase 2 sums the
  ≤S partials per key. A pathological key that appears 10^9 times costs
  bounded rows per reducer instead of 10^9. For near-unique keys AQE
  coalesces the tiny second shuffle.
- ``uniqueness_report``: cheap O(1)-output pre-check — exact count vs
  approx_count_distinct in one pass. At design scale you run the report
  first; only if it signals duplicates do you pay for the exact listing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def duplicate_keys(df: DataFrame, key: str, salt_buckets: int = 64) -> DataFrame:
    """``(key, dup_count)`` for every key value appearing more than once.

    The salt must vary *within* a key or it splits nothing: we salt by
    partition id, so a key appearing 10^9 times across the cluster
    contributes at most (#partitions) phase-1 rows spread over
    salt_buckets reducers, and phase 2 sums ≤ salt_buckets partials per
    key. (Catalyst's map-side partial aggregation gives count-aggs similar
    protection implicitly; the explicit two-phase shape keeps the bound
    even where partial agg degrades — hash-table spill fallback — and is
    the required pattern for non-combinable aggregates.)"""
    salted = (
        df.select(F.col(key).alias("key"))
        .withColumn("salt", F.pmod(F.spark_partition_id(), F.lit(salt_buckets)))
        .groupBy("salt", "key")
        .agg(F.count(F.lit(1)).alias("partial"))
    )
    return (
        salted.groupBy("key")
        .agg(F.sum("partial").alias("dup_count"))
        .filter(F.col("dup_count") > 1)
        .select(F.col("key").alias(key), "dup_count")
    )


def uniqueness_report(df: DataFrame, key: str) -> dict:
    """Single-pass scalar report: {n_rows, approx_distinct, approx_duplicates,
    exact (bool|None)}. approx_count_distinct (HLL++, rsd 1%) makes this a
    constant-memory pre-check; `exact` is decided only when the approx gap is
    far outside the HLL error band."""
    row = df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.approx_count_distinct(key, 0.01).alias("approx_distinct"),
        F.sum(F.col(key).isNull().cast("long")).alias("n_null"),
    ).collect()[0]
    gap = row.n_rows - row.approx_distinct
    band = int(row.n_rows * 0.02)
    exact = None
    if gap > band:
        exact = False
    elif gap <= 0:
        exact = True
    return {
        "n_rows": row.n_rows,
        "approx_distinct": row.approx_distinct,
        "approx_duplicates": max(gap, 0),
        "n_null": row.n_null,
        "unique": exact,
    }
