"""JSONL (newline-delimited JSON) ingest with validation on entry — the
table-scale twin of the reference's top-level flow: parse the raw document
(reference jsonschema.go:Parse over raw bytes), reject malformed input,
then validate the typed result. Here the unit is a corpus file of JSON
lines instead of one document.

Scale shape: ``spark.read.json`` is a distributed line-splittable scan
(each executor parses its own byte ranges; schema is REQUIRED at scale —
never let Spark infer it with an extra pass over 100 TB). Malformed lines
are captured per-row in ``_corrupt_record`` (PERMISSIVE mode), so bad
input becomes violation rows in the same pass instead of failing the job,
exactly the engine's verdict model.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def _with_corrupt_field(schema: T.StructType) -> T.StructType:
    """Copy of ``schema`` with the corrupt-record column appended.
    ``StructType.add`` MUTATES the receiver — never call it on a schema
    the caller still owns (it made repeated read_jsonl/corrupt_rows calls
    stack duplicate corrupt columns)."""
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """Read newline-delimited JSON with an explicit schema; malformed
    lines land with every data column null and the raw line preserved in
    ``_corrupt_record``. The returned frame always carries that column."""
    full = _with_corrupt_field(schema)
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def ingest_verdicts(df: DataFrame) -> DataFrame:
    """Split an ingested frame into per-row well-formedness verdicts:
    adds ``wellformed`` (boolean).

    CONSTRAINT (SPARK-21610): a downstream plan must reference at least
    one DATA column of the scan along with the verdict — a query that
    prunes down to only ``_corrupt_record`` (e.g. ``filter(wellformed)
    .count()``) is rejected by the analyzer. Aggregate over a data column
    (``agg(count(col))``) or use :func:`corrupt_rows` for the raw
    rejected lines."""
    return df.withColumn("wellformed", F.col(CORRUPT_COL).isNull())


def corrupt_rows(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """The rejected lines, raw — the ingest-stage violation stream.

    Reads the file as text and probes each line with ``from_json`` (NULL
    result = malformed) rather than filtering the PERMISSIVE read's
    ``_corrupt_record``: Spark refuses a query that touches ONLY the
    internal corrupt column of a JSON scan (SPARK-21610 — it would require
    re-parsing; the documented workaround is cache(), which leaks). The
    text re-scan is one extra pass over only-the-corrupt-report path, not
    the ingest hot path."""
    probe = _with_corrupt_field(schema)
    parsed = F.from_json(
        F.col("value"), probe, {"columnNameOfCorruptRecord": CORRUPT_COL}
    )
    # PERMISSIVE from_json yields an all-null struct (never NULL) on bad
    # input, so the malformed signal must come from its own corrupt field
    return (
        spark.read.text(path)
        .filter(parsed.getField(CORRUPT_COL).isNotNull())
        .select(F.col("value").alias("raw_line"))
    )
