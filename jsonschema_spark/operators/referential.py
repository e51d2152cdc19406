"""Referential-integrity checks — the reference's ``enum``
(/root/reference/validate.go:79-98) lifted from a static variant list to a
dynamic domain given by a dimension table (SURVEY.md §2.3).

The dimension is small by construction (a source registry), so the check is
a *broadcast* left-anti join: the fact side streams through executors once,
probing an in-memory hash set — no shuffle of the 10^12-row side, ever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def orphan_rows(
    fact: DataFrame, fact_key: str, dim: DataFrame, dim_key: str
) -> DataFrame:
    """Rows of ``fact`` whose ``fact_key`` has no match in ``dim.dim_key``.
    NULL keys are not orphans (missingness is the `required` check's job)."""
    dim_keys = dim.select(F.col(dim_key).alias(fact_key)).distinct()
    return fact.filter(F.col(fact_key).isNotNull()).join(
        F.broadcast(dim_keys), on=fact_key, how="left_anti"
    )


def orphan_key_counts(
    fact: DataFrame, fact_key: str, dim: DataFrame, dim_key: str,
    salt_buckets: int = 64,
) -> DataFrame:
    """``(fact_key, n_rows)`` per distinct orphan key, via two-phase salted
    aggregation: orphan keys are adversarially skewed by nature (one
    unregistered source typically accounts for most violations — our
    injected corpus does exactly this), so phase 1 groups by (salt, key)
    splitting any hot key across salt_buckets reducers; phase 2 sums ≤
    salt_buckets partials per key."""
    salted = (
        orphan_rows(fact, fact_key, dim, dim_key)
        .select(F.col(fact_key).alias("key"))
        .withColumn("salt", F.pmod(F.spark_partition_id(), F.lit(salt_buckets)))
        .groupBy("salt", "key")
        .agg(F.count(F.lit(1)).alias("partial"))
    )
    return (
        salted.groupBy("key")
        .agg(F.sum("partial").alias("n_rows"))
        .select(F.col("key").alias(fact_key), "n_rows")
    )


def domain_predicate(fact: DataFrame, fact_key: str, dim: DataFrame, dim_key: str):
    """Boolean membership column usable inside the one-pass verdict select:
    collects the (small) domain to the driver once and compiles it into an
    ``isin`` hash set — the dynamic-enum fast path. Falls back conceptually
    to the anti-join when the domain is too large to broadcast."""
    domain = [r[0] for r in dim.select(dim_key).distinct().collect()]
    return F.col(fact_key).isin(domain) | F.col(fact_key).isNull()
