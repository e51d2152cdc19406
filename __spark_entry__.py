"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` — flagship: full TableSpec validation of the documents table
at sf0.001 (per-check fail counts, the engine's verdict-summary shape).

`queries()` — one entry per implemented operator from SURVEY.md §2 (keyword
operators lowered through the engine's compiler, table-level operators from
jsonschema_spark.operators). Each returns a DataFrame over (spark, sf_dir).

`oracle_sql()` — DuckDB twin per query. Aggregates are aliased identically
on both sides; count-based metrics avoid HUGEINT/float-order pitfalls, and
double sums go through exact DECIMAL accumulation then a final double cast.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jsonschema_spark.compiler.columns import lower_predicate
from jsonschema_spark.compiler.kernel import json_validation_kernel
from jsonschema_spark.spec.compile import compile_spec


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _pred(df: DataFrame, column: str, spec: dict):
    """Engine-lowered predicate for a draft-4 spec on one typed column."""
    return lower_predicate(
        compile_spec(spec), F.col(column), df.schema[column].dataType
    )


def _struct_pred(df: DataFrame, columns: list, spec: dict):
    """Engine-lowered predicate for an object spec over a struct of columns."""
    from pyspark.sql import types as T

    struct_type = T.StructType([df.schema[c] for c in columns])
    return lower_predicate(
        compile_spec(spec), F.struct(*[F.col(c) for c in columns]), struct_type
    )


def _count_pass(df: DataFrame, pred) -> DataFrame:
    return df.agg(
        F.count(F.when(pred, 1)).alias("n_pass"),
        F.count(F.lit(1)).alias("n_rows"),
    )


# --------------------------------------------------------------------------
# flagship
# --------------------------------------------------------------------------

DOCS_SPEC = {
    "columns": {
        "doc_id": {"type": "integer", "minimum": 0},
        "text": {"type": "string", "minLength": 10},
        "lang": {"enum": ["en", "de", "fr", "es", "zh"]},
        "source": {"type": "string", "pattern": "^src[0-9]+$"},
        "n_chars": {"type": "integer", "minimum": 1, "maximum": 10000},
    },
    "required": ["doc_id", "text", "lang", "source", "n_chars"],
    "row_checks": {"chars_consistent": "n_chars = length(text)"},
    "unique": ["doc_id"],
}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: validate the documents table end-to-end; one row per check
    with its fail count (stable schema: check string, n_fail long, n_rows
    long) — the engine's verdict-summary shape."""
    from jsonschema_spark.plans.plan import TableSpec, compile_table_spec
    from jsonschema_spark.plans.job import ValidationJob

    df = _t(spark, "/root/testdata/sf0.001", "documents")
    plan = compile_table_spec(TableSpec.from_dict(DOCS_SPEC), df.schema)
    job = ValidationJob(plan, id_column="doc_id")
    annotated = job.annotate(df)
    checks = job.check_columns(annotated)
    aggs = [
        F.sum((~F.col(c)).cast("long")).alias(c.removeprefix("chk_")) for c in checks
    ] + [F.count(F.lit(1)).alias("n_rows")]
    wide = annotated.agg(*aggs)
    names = [c.removeprefix("chk_") for c in checks]
    stacked = wide.select(
        F.expr(
            "stack({n}, {pairs}) as (check, n_fail)".format(
                n=len(names),
                pairs=", ".join(f"'{c}', `{c}`" for c in names),
            )
        ),
        "n_rows",
    )
    return stacked


# --------------------------------------------------------------------------
# operator queries (SURVEY.md §2) + oracles
# --------------------------------------------------------------------------


def q_type_integer(spark, sf_dir):
    """SURVEY §2.1 #1: integer-by-value (1.0 passes) on a double column."""
    df = _t(spark, sf_dir, "lineitem")
    return _count_pass(df, _pred(df, "l_quantity", {"type": "integer"}))


def q_enum_scalar(spark, sf_dir):
    """SURVEY §2.1 #2: enum as hash-set membership."""
    df = _t(spark, sf_dir, "orders")
    return _count_pass(df, _pred(df, "o_orderstatus", {"enum": ["O", "F"]}))


def q_all_of(spark, sf_dir):
    """SURVEY §2.1 #3: conjunction of subschemas."""
    df = _t(spark, sf_dir, "part")
    spec = {"allOf": [{"minimum": 10}, {"maximum": 40}, {"multipleOf": 5}]}
    return _count_pass(df, _pred(df, "p_size", spec))


def q_any_of(spark, sf_dir):
    """SURVEY §2.1 #4: disjunction."""
    df = _t(spark, sf_dir, "customer")
    spec = {"anyOf": [{"maximum": 0}, {"minimum": 9000}]}
    return _count_pass(df, _pred(df, "c_acctbal", spec))


def q_one_of(spark, sf_dir):
    """SURVEY §2.1 #5: exactly-one via cast-sum == 1."""
    df = _t(spark, sf_dir, "events")
    spec = {
        "oneOf": [
            {"properties": {"value": {"minimum": 50, "exclusiveMinimum": True}}},
            {"properties": {"event_type": {"enum": ["click"]}}},
        ]
    }
    return _count_pass(df, _struct_pred(df, ["event_type", "value"], spec))


def q_not(spark, sf_dir):
    """SURVEY §2.1 #6: negation."""
    df = _t(spark, sf_dir, "lineitem")
    return _count_pass(df, _pred(df, "l_returnflag", {"not": {"enum": ["A", "R"]}}))


def q_bounds_exclusive(spark, sf_dir):
    """SURVEY §2.1 #7/#8: minimum/maximum with exclusive flags."""
    df = _t(spark, sf_dir, "lineitem")
    spec = {"minimum": 0.02, "maximum": 0.08, "exclusiveMaximum": True}
    return _count_pass(df, _pred(df, "l_discount", spec))


def q_multiple_of(spark, sf_dir):
    """SURVEY §2.1 #9: multipleOf via pmod on integral columns."""
    df = _t(spark, sf_dir, "part")
    return _count_pass(df, _pred(df, "p_size", {"multipleOf": 7}))


def q_string_length(spark, sf_dir):
    """SURVEY §2.1 #10: min/maxLength (code points)."""
    df = _t(spark, sf_dir, "documents")
    return _count_pass(df, _pred(df, "text", {"minLength": 100, "maxLength": 400}))


def q_pattern(spark, sf_dir):
    """SURVEY §2.1 #11: regex search via rlike."""
    df = _t(spark, sf_dir, "customer")
    return _count_pass(df, _pred(df, "c_name", {"pattern": "^Customer#00[0-9]+$"}))


def q_array_bounds(spark, sf_dir):
    """SURVEY §2.1 #13: minItems/maxItems."""
    df = _t(spark, sf_dir, "embeddings")
    return _count_pass(df, _pred(df, "embedding", {"minItems": 64, "maxItems": 64}))


def q_unique_items(spark, sf_dir):
    """SURVEY §2.1 #14: uniqueItems via array_distinct."""
    df = _t(spark, sf_dir, "embeddings")
    return _count_pass(df, _pred(df, "embedding", {"uniqueItems": True}))


def q_forall_items(spark, sf_dir):
    """SURVEY §2.1 #15: items (single-schema) via forall."""
    df = _t(spark, sf_dir, "embeddings")
    spec = {"items": {"minimum": -0.5, "maximum": 0.5}}
    return _count_pass(df, _pred(df, "embedding", spec))


def q_required(spark, sf_dir):
    """SURVEY §2.1 #20: required as isNotNull."""
    df = _t(spark, sf_dir, "documents")
    spec = {"required": ["lang", "source", "text"]}
    return _count_pass(
        df, _struct_pred(df, ["lang", "source", "text"], spec)
    )


def q_dependencies(spark, sf_dir):
    """SURVEY §2.1 #21/#22: dependentSchemas over a struct of columns."""
    df = _t(spark, sf_dir, "events")
    spec = {"dependencies": {"value": {"properties": {"value": {"minimum": 1}}}}}
    return _count_pass(df, _struct_pred(df, ["event_type", "value"], spec))


def q_properties_struct(spark, sf_dir):
    """SURVEY §2.1 #17: properties over struct columns."""
    df = _t(spark, sf_dir, "customer")
    spec = {
        "properties": {
            "c_acctbal": {"minimum": 0},
            "c_mktsegment": {"enum": ["BUILDING", "MACHINERY", "AUTOMOBILE"]},
        }
    }
    return _count_pass(df, _struct_pred(df, ["c_acctbal", "c_mktsegment"], spec))


def q_json_wellformed(spark, sf_dir):
    """SURVEY §2.1 #25: whole-document well-formedness (kernel path)."""
    df = _t(spark, sf_dir, "events")
    verdict = json_validation_kernel({"type": "object"}, F.col("props"))
    return _count_pass(df, verdict.getField("valid"))


def q_json_schema_kernel(spark, sf_dir):
    """Kernel path: full draft-4 spec over a free-form JSON column."""
    df = _t(spark, sf_dir, "events")
    spec = {
        "type": "object",
        "required": ["k"],
        "properties": {"k": {"type": "integer", "minimum": 0, "maximum": 80}},
        "additionalProperties": False,
    }
    verdict = json_validation_kernel(spec, F.col("props"))
    return _count_pass(df, verdict.getField("valid"))


def q_dup_keys(spark, sf_dir):
    """SURVEY §2.3: table-scope uniqueness via salted two-phase agg."""
    from jsonschema_spark.operators.uniqueness import duplicate_keys

    df = _t(spark, sf_dir, "orders")
    return duplicate_keys(df, "o_custkey")


def q_orphans(spark, sf_dir):
    """SURVEY §2.3: referential check via broadcast anti-join (dimension =
    customers with even custkey, so orphans provably exist)."""
    from jsonschema_spark.operators.referential import orphan_key_counts

    fact = _t(spark, sf_dir, "orders")
    dim = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") % 2 == 0)
    return orphan_key_counts(fact, "o_custkey", dim, "c_custkey")


def q_exact_stats(spark, sf_dir):
    """SURVEY §2.3: per-column stats profile (exact subset)."""
    df = _t(spark, sf_dir, "lineitem")
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        F.count(F.when(F.col("l_orderkey").isNull(), 1)).alias("n_null"),
        F.min("l_shipdate").cast("date").cast("string").alias("min_ship"),
        F.max("l_shipdate").cast("date").cast("string").alias("max_ship"),
    )


def q_histogram(spark, sf_dir):
    """SURVEY §2.3: fixed-width histogram agg (drift input)."""
    from jsonschema_spark.operators.stats import histogram

    df = _t(spark, sf_dir, "documents")
    return histogram(df, "n_chars", bins=20, lo=0, hi=600)


def q_word_freq(spark, sf_dir):
    """SURVEY §2.3: token frequencies via explode + map-side-combined agg."""
    df = _t(spark, sf_dir, "documents")
    return (
        df.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def q_psi_terms(spark, sf_dir):
    """SURVEY §2.3: distribution drift — per-bucket PSI contributions of the
    English subset vs the whole corpus, all as DataFrame ops."""
    from jsonschema_spark.operators.stats import histogram
    from jsonschema_spark.operators.drift import psi_terms

    df = _t(spark, sf_dir, "documents")
    current = histogram(df.filter(F.col("lang") == "en"), "n_chars", 12, 0, 600)
    baseline = histogram(df, "n_chars", 12, 0, 600)
    return psi_terms(current, baseline)


def q_tpch_q1(spark, sf_dir):
    """Classic scan→filter→agg shape (pushdown + partial agg)."""
    df = _t(spark, sf_dir, "lineitem")
    disc_price = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    return (
        df.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_topk_per_group(spark, sf_dir):
    """Top-K per group via window (dedup/ranking building block)."""
    from pyspark.sql import Window as W

    df = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "rn")
    )


def q_join_agg(spark, sf_dir):
    """Broadcast dim join + agg (revenue per market segment)."""
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


def q_corpus_validate(spark, sf_dir):
    """Flagship synthetic-corpus validation (north rule): per-check fail
    counts over 50k generated rows with ~1% injected violations. The
    generator is hash-based Spark SQL (not SQL-expressible) → rows-only
    check; exact counts are asserted in tests/test_corpus_pipeline.py."""
    from jsonschema_spark.sources.corpus import corpus, dim_source, MAX_TOKENS, VOCAB_SIZE
    from jsonschema_spark.plans.plan import TableSpec, compile_table_spec
    from jsonschema_spark.plans.job import ValidationJob

    df = corpus(spark, 50_000, seed=42)
    spec = TableSpec.from_dict(
        {
            "columns": {
                "doc_id": {"type": "string", "pattern": "^doc-[0-9]{12}$"},
                "tokens": {
                    "type": "array",
                    "minItems": 1,
                    "items": {"type": "integer", "minimum": 0, "maximum": VOCAB_SIZE - 1},
                },
                "n_tok": {"type": "integer", "minimum": 1, "maximum": MAX_TOKENS},
            },
            "required": ["doc_id", "tokens", "n_tok", "source"],
            "row_checks": {"len_consistent": "n_tok = size(tokens)"},
            "unique": ["doc_id"],
            "references": {"source": {"dim": "dim_source", "key": "source_id"}},
        }
    )
    plan = compile_table_spec(spec, df.schema)
    job = ValidationJob(plan, dims={"dim_source": dim_source(spark)})
    annotated = job.annotate(df)
    checks = job.check_columns(annotated)
    return annotated.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("_valid").cast("long")).alias("n_valid"),
        *[F.sum((~F.col(c)).cast("long")).alias(f"fail_{c.removeprefix('chk_')}") for c in checks],
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "type_integer": q_type_integer,
        "enum_scalar": q_enum_scalar,
        "all_of": q_all_of,
        "any_of": q_any_of,
        "one_of": q_one_of,
        "not": q_not,
        "bounds_exclusive": q_bounds_exclusive,
        "multiple_of": q_multiple_of,
        "string_length": q_string_length,
        "pattern": q_pattern,
        "array_bounds": q_array_bounds,
        "unique_items": q_unique_items,
        "forall_items": q_forall_items,
        "required": q_required,
        "dependencies": q_dependencies,
        "properties_struct": q_properties_struct,
        "json_wellformed": q_json_wellformed,
        "json_schema_kernel": q_json_schema_kernel,
        "dup_keys": q_dup_keys,
        "orphans": q_orphans,
        "exact_stats": q_exact_stats,
        "histogram": q_histogram,
        "word_freq": q_word_freq,
        "psi_terms": q_psi_terms,
        "tpch_q1": q_tpch_q1,
        "topk_per_group": q_topk_per_group,
        "join_agg": q_join_agg,
        "corpus_validate": q_corpus_validate,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "type_integer": (
            "SELECT count(*) FILTER (WHERE l_quantity = floor(l_quantity)) AS n_pass,"
            " count(*) AS n_rows FROM lineitem"
        ),
        "enum_scalar": (
            "SELECT count(*) FILTER (WHERE o_orderstatus IN ('O','F')) AS n_pass,"
            " count(*) AS n_rows FROM orders"
        ),
        "all_of": (
            "SELECT count(*) FILTER (WHERE p_size >= 10 AND p_size <= 40 AND p_size % 5 = 0)"
            " AS n_pass, count(*) AS n_rows FROM part"
        ),
        "any_of": (
            "SELECT count(*) FILTER (WHERE c_acctbal <= 0 OR c_acctbal >= 9000) AS n_pass,"
            " count(*) AS n_rows FROM customer"
        ),
        "one_of": (
            "SELECT count(*) FILTER (WHERE"
            " (CASE WHEN value IS NULL OR value > 50 THEN 1 ELSE 0 END"
            "  + CASE WHEN event_type IS NULL OR event_type = 'click' THEN 1 ELSE 0 END) = 1)"
            " AS n_pass, count(*) AS n_rows FROM events"
        ),
        "not": (
            "SELECT count(*) FILTER (WHERE l_returnflag NOT IN ('A','R')) AS n_pass,"
            " count(*) AS n_rows FROM lineitem"
        ),
        "bounds_exclusive": (
            "SELECT count(*) FILTER (WHERE l_discount >= 0.02 AND l_discount < 0.08)"
            " AS n_pass, count(*) AS n_rows FROM lineitem"
        ),
        "multiple_of": (
            "SELECT count(*) FILTER (WHERE p_size % 7 = 0) AS n_pass,"
            " count(*) AS n_rows FROM part"
        ),
        "string_length": (
            "SELECT count(*) FILTER (WHERE length(text) BETWEEN 100 AND 400) AS n_pass,"
            " count(*) AS n_rows FROM documents"
        ),
        "pattern": (
            "SELECT count(*) FILTER (WHERE regexp_matches(c_name, '^Customer#00[0-9]+$'))"
            " AS n_pass, count(*) AS n_rows FROM customer"
        ),
        "array_bounds": (
            "SELECT count(*) FILTER (WHERE len(embedding) = 64) AS n_pass,"
            " count(*) AS n_rows FROM embeddings"
        ),
        "unique_items": (
            "SELECT count(*) FILTER (WHERE len(list_distinct(embedding)) = len(embedding))"
            " AS n_pass, count(*) AS n_rows FROM embeddings"
        ),
        "forall_items": (
            "SELECT count(*) FILTER (WHERE len(list_filter(embedding,"
            " e -> e < -0.5 OR e > 0.5)) = 0) AS n_pass, count(*) AS n_rows FROM embeddings"
        ),
        "required": (
            "SELECT count(*) FILTER (WHERE lang IS NOT NULL AND source IS NOT NULL"
            " AND text IS NOT NULL) AS n_pass, count(*) AS n_rows FROM documents"
        ),
        "dependencies": (
            "SELECT count(*) FILTER (WHERE value IS NULL OR value >= 1) AS n_pass,"
            " count(*) AS n_rows FROM events"
        ),
        "properties_struct": (
            "SELECT count(*) FILTER (WHERE (c_acctbal IS NULL OR c_acctbal >= 0)"
            " AND (c_mktsegment IS NULL OR c_mktsegment IN"
            " ('BUILDING','MACHINERY','AUTOMOBILE'))) AS n_pass,"
            " count(*) AS n_rows FROM customer"
        ),
        "json_wellformed": (
            "SELECT count(*) FILTER (WHERE json_valid(props)"
            " AND json_type(json(props)) = 'OBJECT') AS n_pass,"
            " count(*) AS n_rows FROM events"
        ),
        "json_schema_kernel": (
            "SELECT count(*) FILTER (WHERE json_valid(props)"
            " AND json_type(json(props)) = 'OBJECT'"
            " AND json_type(json(props), '$.k') IN ('UBIGINT','BIGINT')"
            " AND CAST(json_extract_string(props, '$.k') AS DOUBLE) BETWEEN 0 AND 80"
            " AND len(json_keys(json(props))) = 1) AS n_pass,"
            " count(*) AS n_rows FROM events"
        ),
        "dup_keys": (
            "SELECT o_custkey, count(*) AS dup_count FROM orders"
            " GROUP BY o_custkey HAVING count(*) > 1"
        ),
        "orphans": (
            "SELECT o_custkey, count(*) AS n_rows FROM orders"
            " WHERE o_custkey IS NOT NULL AND o_custkey NOT IN"
            " (SELECT c_custkey FROM customer WHERE c_custkey % 2 = 0)"
            " GROUP BY o_custkey"
        ),
        "exact_stats": (
            "SELECT count(*) AS n_rows, min(l_extendedprice) AS min_price,"
            " max(l_extendedprice) AS max_price,"
            " count(*) FILTER (WHERE l_orderkey IS NULL) AS n_null,"
            " CAST(CAST(min(l_shipdate) AS DATE) AS VARCHAR) AS min_ship,"
            " CAST(CAST(max(l_shipdate) AS DATE) AS VARCHAR) AS max_ship"
            " FROM lineitem"
        ),
        "histogram": (
            "SELECT CASE WHEN n_chars IS NULL THEN NULL"
            " WHEN n_chars < 0 THEN -1 WHEN n_chars >= 600 THEN 20"
            " ELSE CAST(floor(n_chars / 30.0) AS INT) END AS bucket,"
            " count(*) AS cnt FROM documents GROUP BY 1"
        ),
        "word_freq": (
            "SELECT word, count(*) AS cnt FROM (SELECT unnest(string_split(text, ' '))"
            " AS word FROM documents) WHERE word <> '' GROUP BY word"
        ),
        "psi_terms": (
            "WITH hist AS (SELECT CASE WHEN n_chars < 0 THEN -1 WHEN n_chars >= 600 THEN 12"
            "   ELSE CAST(floor(n_chars / 50.0) AS INT) END AS bucket,"
            "   count(*) AS cnt_all,"
            "   count(*) FILTER (WHERE lang = 'en') AS cnt_en"
            "  FROM documents GROUP BY 1),"
            " tot AS (SELECT sum(cnt_en) AS n_cur, sum(cnt_all) AS n_base FROM hist)"
            " SELECT bucket, round((p - q) * ln(p / q), 6) AS psi_term FROM ("
            "  SELECT bucket, greatest(cnt_en / CAST(n_cur AS DOUBLE), 1e-6) AS p,"
            "         greatest(cnt_all / CAST(n_base AS DOUBLE), 1e-6) AS q"
            "  FROM hist, tot)"
        ),
        "tpch_q1": (
            "SELECT l_returnflag, l_linestatus,"
            " CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,"
            " CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,"
            " CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)"
            "   AS sum_disc_price,"
            " count(*) AS count_order"
            " FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'"
            " GROUP BY l_returnflag, l_linestatus"
        ),
        "topk_per_group": (
            "SELECT o_custkey, o_orderkey, rn FROM ("
            " SELECT o_custkey, o_orderkey, row_number() OVER ("
            "  PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn"
            " FROM orders) WHERE rn <= 3"
        ),
        "join_agg": (
            "SELECT c_mktsegment,"
            " CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,"
            " count(*) AS n_orders"
            " FROM orders JOIN customer ON o_custkey = c_custkey"
            " GROUP BY c_mktsegment"
        ),
        # corpus_validate: hash-based generator not expressible in SQL → rows-only
    }
