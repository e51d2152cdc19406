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
    """True iff an Iceberg catalog is usable in this session: the runtime
    jar must be on the classpath AND at least one spark.sql.catalog.* conf
    must point at an Iceberg catalog — a cluster shipping the jar without a
    configured catalog would otherwise select iceberg mode and fail at
    write time. In-sandbox (no jar) this is always False."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
    except Exception:
        return False
    return _has_iceberg_catalog_conf(spark)


def _has_iceberg_catalog_conf(spark: SparkSession) -> bool:
    """Scan session + context confs for spark.sql.catalog.<name> entries
    whose implementation class mentions iceberg."""
    entries: dict[str, str] = dict(spark.sparkContext.getConf().getAll())
    try:  # runtime-set confs (spark.conf.set) live in the session conf
        jmap = spark._jsparkSession.conf().getAll()
        it = jmap.iterator()
        while it.hasNext():
            e = it.next()
            entries[e._1()] = e._2()
    except Exception:
        pass
    return any(
        k.startswith("spark.sql.catalog.")
        and k.count(".") == 3  # the catalog root key, not .<name>.type etc.
        and "iceberg" in str(v).lower()
        for k, v in entries.items()
    )


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
