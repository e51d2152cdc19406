"""Results-sink abstraction: Iceberg tables on a real cluster, parquet
directories in-sandbox — the lineage/checkpoint logic is identical either
way (SURVEY.md §7 "checkpoint/resume without Iceberg in-sandbox").

The north rule persists per-partition lineage and metrics to an Iceberg
results table. Iceberg gives atomic append + snapshot isolation, which the
resume contract needs on a real cluster (concurrent writers, partial-failure
cleanup via snapshot rollback). A parquet directory gives the same logical
behavior for single-writer sandbox runs. The sink is selected at runtime:
``iceberg_available(spark)`` probes for the Iceberg Spark extension; jobs
call ``write``/``read`` and never branch themselves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """True iff an Iceberg catalog is usable in this session (the runtime
    jar is not shipped in-sandbox; on a cluster set
    spark.sql.catalog.<name>=org.apache.iceberg.spark.SparkCatalog)."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


class ResultsSink:
    """mode='iceberg': target is a table identifier (catalog.db.table);
    mode='parquet': target is a directory path."""

    def __init__(self, spark: SparkSession, mode: str | None = None):
        self.spark = spark
        if mode is None:
            mode = "iceberg" if iceberg_available(spark) else "parquet"
        if mode not in ("iceberg", "parquet"):
            raise ValueError(f"unknown sink mode {mode!r}")
        self.mode = mode

    def write(self, df: DataFrame, target: str, append: bool = False) -> None:
        if self.mode == "iceberg":
            writer = df.writeTo(target)
            writer.append() if append else writer.createOrReplace()
        else:
            df.write.mode("append" if append else "overwrite").parquet(target)

    def read(self, target: str) -> DataFrame:
        if self.mode == "iceberg":
            return self.spark.read.table(target)
        return self.spark.read.parquet(target)

    def exists(self, target: str) -> bool:
        if self.mode == "iceberg":
            return self.spark.catalog.tableExists(target)
        import os

        return os.path.isdir(target)
