"""Constraint-spec inference: bootstrap a TableSpec FROM the corpus, the
inverse of validation (profile a healthy snapshot once, then validate
everything after against the inferred spec — the standard "learn the
contract from the golden data" workflow; the reference has no inference,
it only checks hand-written schemas, so this is engine-level new
semantics per SURVEY.md §2.3).

Scale shape: TWO bounded aggregation passes.

Pass 1 (partial+final agg, one driver row) computes every column's cheap
evidence simultaneously — min/max, null count, string length bounds,
array size + element bounds (array_min/array_max, no explode), and
approximate distinct (HLL sketch, fixed-size buffers) for BOTH
uniqueness nomination and enum nomination. No collect_set anywhere in
this pass: Spark's collect_set has no per-partition cap, so running it
over a high-cardinality column (doc_id, text) would pull every distinct
value into the aggregation buffers — the one "runs at sf0.1, dies at
100 TB" shape, and exactly what this module must never do.

Pass 2 runs ONLY for string columns whose HLL estimate is at or below
the enum gate: a second tiny agg (column-pruned scan — parquet reads
just the nominated columns) collect_sets values whose distinct count is
already PROVEN small, so its buffers hold at most ~enum_max values per
column by construction. When no column is nominated the pass is skipped
entirely. The profile collects exactly one driver row per pass. By
construction the data it was inferred from validates clean against the
result (tests/test_infer.py), and tests/test_plan_shapes.py pins that
pass 1 contains no collect_set and that high-cardinality columns are
never nominated for pass 2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_INT_TYPES = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
_FLOAT_TYPES = (T.FloatType, T.DoubleType, T.DecimalType)


def enum_nominees(row: dict, string_cols: list, enum_max: int, rsd: float) -> list:
    """String columns whose pass-1 HLL distinct estimate clears the enum
    gate. The gate is slack-padded (3 HLL standard deviations plus a small
    absolute floor) so an HLL *underestimate* of a barely-too-big column
    only costs a wasted tiny collect; the exact ``len(vals) <= enum_max``
    check after pass 2 keeps the output correct either way. A column the
    sketch places clearly above the gate (e.g. doc_id, text) is never
    collected at all."""
    gate = enum_max * (1.0 + 3.0 * rsd) + 3
    out = []
    for name in string_cols:
        adist = row.get(f"{name}__adist")
        if adist is not None and adist <= gate:
            out.append(name)
    return out


def pass1_aggs(fields: dict, unique_hint_rsd: float) -> list:
    """The sketch-only profile aggregates — fixed-size buffers per column
    (min/max/null count/HLL), NO collect_set (tests/test_plan_shapes.py
    pins that invariant on the physical plan)."""
    aggs = [F.count(F.lit(1)).alias("_n")]
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
    return aggs


def infer_table_spec(
    df: DataFrame,
    enum_max: int = 20,
    unique_hint_rsd: float = 0.02,
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

    ``unique_hint_rsd`` trades sketch precision for per-partition HLL
    register size: rsd 0.01 costs ~1 s of pure buffer/merge fixed cost
    per column per job on this host vs ~0.2 s at 0.02 (measured, 5k-row
    input — the cost is size-independent). Both nomination gates are
    slack-padded by 3 rsd and both nominations are advisory (the exact
    pass-2 check and the salted uniqueness proof keep the output
    correct), so the default favors the cheaper sketch.
    """
    fields = {f.name: f.dataType for f in df.schema.fields}
    row = df.agg(*pass1_aggs(fields, unique_hint_rsd)).collect()[0].asDict()
    n = row["_n"]

    # Pass 2: exact enum values, ONLY for columns the HLL sketch proves
    # small — collect_set buffers are bounded by the gate, not the corpus.
    string_cols = [c for c, dt in fields.items() if isinstance(dt, T.StringType)]
    nominees = enum_nominees(row, string_cols, enum_max, unique_hint_rsd)
    if nominees:
        enum_aggs = [
            F.slice(F.sort_array(F.collect_set(F.col(c))), 1, enum_max + 1).alias(
                f"{c}__vals"
            )
            for c in nominees
        ]
        row.update(df.select(*nominees).agg(*enum_aggs).collect()[0].asDict())

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
            vals = row.get(f"{name}__vals")
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


_BOUND_KEYS = (
    ("minimum", -1),
    ("maximum", 1),
    ("minLength", -1),
    ("maxLength", 1),
    ("minItems", -1),
    ("maxItems", 1),
)


def _fmt(v) -> str:
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, list):
        return ",".join(str(x) for x in v)
    return str(v)


def spec_diff(golden: dict, candidate: dict, columns: list | None = None) -> list:
    """Constraint drift between two inferred TableSpecs — the
    schema-evolution check of a validation engine: profile the golden
    snapshot once, re-profile each new snapshot, and diff the CONTRACTS
    instead of the data (a metadata-sized comparison no matter how big
    either snapshot is; both inputs are bounded driver dicts from
    ``infer_table_spec``, so this never touches an executor).

    Returns (column, constraint, golden, candidate, change) tuples for
    every constraint whose value differs. ``change`` classifies drift
    direction: a bound is ``widened`` when the candidate admits MORE
    values (alarm: new data outside the golden contract), ``narrowed``
    when it admits fewer; enums likewise by set containment; ``required``
    flips are ``relaxed`` (nulls appeared) or ``tightened``. The HLL
    uniqueness nomination is excluded, same contract as the infer_spec
    driver query (not cross-engine reproducible; the salted uniqueness
    check proves it instead)."""
    rows = []
    cols = columns or sorted(set(golden["columns"]) | set(candidate["columns"]))
    for col in cols:
        g = golden["columns"].get(col, {})
        c = candidate["columns"].get(col, {})
        for key, widen_dir in _BOUND_KEYS:
            gv, cv = g.get(key), c.get(key)
            if gv == cv:
                continue
            if gv is None or cv is None:
                change = "changed"
            elif (cv - gv) * widen_dir > 0:
                change = "widened"
            else:
                change = "narrowed"
            rows.append((col, key, _fmt(gv), _fmt(cv), change))
        ge, ce = g.get("enum"), c.get("enum")
        if ge != ce:
            # a missing enum means UNCONSTRAINED (any value), not empty-set:
            # losing the enum widens the contract, gaining one narrows it
            if ge is None:
                change = "narrowed"
            elif ce is None:
                change = "widened"
            else:
                gs, cs = set(ge), set(ce)
                change = (
                    "widened" if gs < cs else "narrowed" if cs < gs else "changed"
                )
            rows.append(
                (
                    col,
                    "enum",
                    _fmt(sorted(ge) if ge is not None else None),
                    _fmt(sorted(ce) if ce is not None else None),
                    change,
                )
            )
    gr = set(golden.get("required") or [])
    cr = set(candidate.get("required") or [])
    for col in cols:
        if (col in gr) != (col in cr):
            rows.append(
                (
                    col,
                    "required",
                    _fmt(col in gr),
                    _fmt(col in cr),
                    "relaxed" if col in gr else "tightened",
                )
            )
    return rows
