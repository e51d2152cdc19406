"""SparkSession factory tuned for the sandbox (local[N]) but configured the
way the engine wants a real cluster: AQE on (runtime re-plan + skew-join),
Arrow enabled for the kernel path, UTC timezone for oracle parity, shuffle
partitions sized to cores rather than the 200 default."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "jsonschema_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 8)
    mem = os.environ.get("SPARK_DRIVER_MEMORY", "16g")
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", mem)
        # Fixed, pre-touched heap: a growing heap page-faults its way up
        # under multi-threaded allocation pressure (measured: 50-85% kernel
        # time, 10x slowdown at local[32] on the corpus validation pass —
        # see BASELINE.md). Committing+touching the heap once at startup
        # removes the page-zeroing storm from the measured path.
        .config(
            "spark.driver.extraJavaOptions",
            f"-Xms{mem} -XX:+AlwaysPreTouch",
        )
        # vectorized decode for array<int> token columns (off by default in
        # Spark; measured ~1.6x on the corpus scan at local[32])
        .config("spark.sql.parquet.enableNestedColumnVectorizedReader", "true")
        .config("spark.ui.enabled", "false")
    )
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
