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

from pyspark.sql import Column, DataFrame, SparkSession
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


def q_json_schema_variant(spark, sf_dir):
    """SURVEY §1.4 VariantType path: the SAME draft-4 spec as
    json_schema_kernel, lowered to native Spark 4 variant expressions —
    try_parse_json once in the scan stage, then pure-codegen
    type/required/bounds/keys probes (no Python anywhere). Twin of the
    kernel query: identical verdict counts, JVM-side throughput."""
    from jsonschema_spark.compiler.variant import variant_validation_predicate

    df = _t(spark, sf_dir, "events")
    spec = {
        "type": "object",
        "required": ["k"],
        "properties": {"k": {"type": "integer", "minimum": 0, "maximum": 80}},
        "additionalProperties": False,
    }
    return _count_pass(df, variant_validation_predicate(spec, F.col("props")))


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


def _corpus_oracle_path() -> str:
    """Stable parquet path for the 50k seed-42 corpus: the Spark query
    materializes it once (content is deterministic at any parallelism), and
    the DuckDB oracle reads the SAME bytes — converting corpus_validate from
    a rows-only check into a full value-hash oracle row."""
    import os

    cache = os.environ.get("BENCH_CACHE_DIR", "/tmp/jsonschema_spark_bench")
    return os.path.join(cache, "corpus_oracle_50k_seed42.parquet")


def q_corpus_validate(spark, sf_dir):
    """Flagship synthetic-corpus validation (north rule): per-check fail
    counts over 50k generated rows with ~1% injected violations. The corpus
    is materialized to parquet (deterministic content) so the DuckDB oracle
    can recompute every check over the same file; exact closed-form counts
    are additionally asserted in tests/test_corpus_pipeline.py."""
    import os

    from jsonschema_spark.sources.corpus import corpus, dim_source, MAX_TOKENS, VOCAB_SIZE
    from jsonschema_spark.plans.plan import TableSpec, compile_table_spec
    from jsonschema_spark.plans.job import ValidationJob

    path = _corpus_oracle_path()
    if not os.path.isdir(path):
        corpus(spark, 50_000, seed=42).write.mode("overwrite").parquet(path)
    df = spark.read.parquet(path)
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


def q_sampled_gate(spark, sf_dir):
    """Constant-size PRE-FLIGHT validation gate (round 5): the Wilson
    upper bound on the corpus violation rate measured from the 500
    documents with the smallest portable_hash60('vgate:'+id) — the
    cheap "is this snapshot roughly sane?" answer you compute BEFORE
    paying for the full 10^12-row validation pass. Runs the exact same
    compiled plan as corpus_validate over the sample; verdict compares
    the ROUNDED bound to a 3%% budget (the corpus injects ~1%%
    violations, so the gate passes with the bound doing real work)."""
    import os

    from jsonschema_spark.operators.checks import sampled_validation_gate
    from jsonschema_spark.plans.job import ValidationJob
    from jsonschema_spark.plans.plan import TableSpec, compile_table_spec
    from jsonschema_spark.sources.corpus import (
        MAX_TOKENS,
        VOCAB_SIZE,
        corpus,
        dim_source,
    )

    path = _corpus_oracle_path()
    if not os.path.isdir(path):
        corpus(spark, 50_000, seed=42).write.mode("overwrite").parquet(path)
    df = spark.read.parquet(path)
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
            "references": {"source": {"dim": "dim_source", "key": "source_id"}},
        }
    )
    plan = compile_table_spec(spec, df.schema)
    job = ValidationJob(plan, dims={"dim_source": dim_source(spark)})
    return sampled_validation_gate(
        df, "doc_id", job.annotate, sample_k=500, budget=0.03
    )


def q_quarantine_rows(spark, sf_dir):
    """Verdict routing (round 5): the QUARANTINED side of the
    accepted/quarantined split over the 50k corpus — every failing row
    with its sorted, comma-joined failed-check label (the triage
    artifact an ingest-repair queue consumes; the reference's fail-fast
    reject lifted to a table-scale router). Both halves are filters over
    one annotated scan — no shuffle, no second pass."""
    import os

    from jsonschema_spark.plans.job import ValidationJob
    from jsonschema_spark.plans.plan import TableSpec, compile_table_spec
    from jsonschema_spark.sources.corpus import (
        MAX_TOKENS,
        VOCAB_SIZE,
        corpus,
        dim_source,
    )

    path = _corpus_oracle_path()
    if not os.path.isdir(path):
        corpus(spark, 50_000, seed=42).write.mode("overwrite").parquet(path)
    df = spark.read.parquet(path)
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
            "references": {"source": {"dim": "dim_source", "key": "source_id"}},
        }
    )
    plan = compile_table_spec(spec, df.schema)
    job = ValidationJob(plan, dims={"dim_source": dim_source(spark)})
    _, quarantined = job.quarantine(job.annotate(df))
    return quarantined.select("doc_id", "source", "n_failed", "failed_checks")


def q_tuple_items(spark, sf_dir):
    """SURVEY §2.1 #16: tuple-form items + additionalItems schema — element
    1 checked positionally, the tail checked by the additionalItems
    subschema (forall over the bounded slice)."""
    df = _t(spark, sf_dir, "part")
    arr_df = df.select(
        F.array(
            F.col("p_size").cast("double"), F.col("p_retailprice").cast("double")
        ).alias("xs")
    )
    spec = {"items": [{"minimum": 10}], "additionalItems": {"maximum": 1500}}
    return _count_pass(arr_df, _pred(arr_df, "xs", spec))


def q_map_object(spark, sf_dir):
    """SURVEY §2.1 #17/#20/#23 on a MAP column (dynamic keys, absent-vs-null
    preserved): required + minProperties/maxProperties over parsed JSON."""
    df = _t(spark, sf_dir, "events")
    from pyspark.sql import types as T

    mcol = F.from_json(F.col("props"), "map<string,string>")
    m_df = df.select(mcol.alias("m"))
    spec = {"type": "object", "required": ["k"], "minProperties": 1, "maxProperties": 2}
    pred = lower_predicate(
        compile_spec(spec), F.col("m"), T.MapType(T.StringType(), T.StringType())
    )
    return _count_pass(m_df, pred)


def q_windowed_counts(spark, sf_dir):
    """Tumbling-window aggregation over the events stream table (the batch
    twin of streaming/validate.windowed_verdicts): per 6-hour window, event
    count + count of value >= 100 failures-style predicate."""
    df = _t(spark, sf_dir, "events")
    return (
        df.groupBy(F.window(F.col("ts"), "6 hours").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count(F.when(F.col("value") >= 100, 1)).alias("n_high"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n_events",
            "n_high",
        )
    )


def q_pattern_properties(spark, sf_dir):
    """SURVEY §2.1 #18/#19: patternProperties + additionalProperties:false
    on a map column — every key must match ^[a-z]$ and its value must look
    a single digit (per-entry forall; no per-row Python)."""
    df = _t(spark, sf_dir, "events")
    from pyspark.sql import types as T

    mcol = F.from_json(F.col("props"), "map<string,string>")
    m_df = df.select(mcol.alias("m"))
    spec = {
        "type": "object",
        "patternProperties": {"^[a-z]$": {"pattern": "^[0-9]$"}},
        "additionalProperties": False,
    }
    pred = lower_predicate(
        compile_spec(spec), F.col("m"), T.MapType(T.StringType(), T.StringType())
    )
    return _count_pass(m_df, pred)


# --------------------------------------------------------------------------
# training-data pipeline operators (dedup / similarity / text / multimodal)
# --------------------------------------------------------------------------


def q_exact_dedup_groups(spark, sf_dir):
    """Exact dedup via content-hash groupBy (uniform md5 keys, no salt needed)."""
    from jsonschema_spark.operators.dedup import exact_duplicate_groups

    df = _t(spark, sf_dir, "documents")
    return exact_duplicate_groups(df, "doc_id", "text")


def q_dedup_count(spark, sf_dir):
    """Keep-first exact dedup: corpus size before/after (semi-join on the
    per-fingerprint min id)."""
    from jsonschema_spark.operators.dedup import dedup_exact

    df = _t(spark, sf_dir, "documents")
    kept = dedup_exact(df, "doc_id", "text")
    return kept.agg(F.count(F.lit(1)).alias("n_kept")).crossJoin(
        df.agg(F.count(F.lit(1)).alias("n_docs"))
    )


def q_ngram_jaccard_pairs(spark, sf_dir):
    """Brute-force 3-gram Jaccard near-dup pairs (exact oracle baseline)."""
    from jsonschema_spark.operators.dedup import near_dup_pairs_exact

    df = _t(spark, sf_dir, "documents")
    return near_dup_pairs_exact(df, "doc_id", "text", n=3, threshold=0.8)


def q_minhash_near_dup(spark, sf_dir):
    """MinHash+LSH near-dup pairs, exact-Jaccard verified — so false
    positives are impossible by construction, and at threshold 0.8 with
    128 hashes / 32 bands of 4 the per-pair miss probability is
    (1-j^4)^32 <= 5e-8: the output equals the exact pair set, which is the
    oracle (verified equal at sf0.01; containment additionally asserted in
    tests/test_training_ops.py)."""
    from jsonschema_spark.operators.dedup import minhash_near_dup

    df = _t(spark, sf_dir, "documents")
    return minhash_near_dup(df, "doc_id", "text", n=3, threshold=0.8)


def q_simhash_near_dup(spark, sf_dir):
    """SimHash near-dup pairs (Hamming <= 3) via 16-bit-band pigeonhole
    blocking; signature folded in an Arrow kernel. The blocking is
    EXHAUSTIVE for distance <= 3 (pigeonhole over 4 chunks), so the result
    is exactly all pairs within distance 3 — and with the portable md5-based
    word hash the DuckDB oracle recomputes the full simhash + Hamming join
    independently."""
    from jsonschema_spark.operators.dedup import simhash_near_dup

    df = _t(spark, sf_dir, "documents")
    return simhash_near_dup(df, "doc_id", "text", max_distance=3)


def _token_corpus_path() -> str:
    """Stable parquet path for the 1k token-dedup corpus (injected exact +
    near duplicates); materialized once by the Spark queries, read by the
    DuckDB oracles — same pattern as _corpus_oracle_path."""
    import os

    cache = os.environ.get("BENCH_CACHE_DIR", "/tmp/jsonschema_spark_bench")
    return os.path.join(cache, "token_corpus_1k_seed5.parquet")


def _token_corpus(spark):
    import os

    from jsonschema_spark.sources.corpus import token_neardup_corpus

    path = _token_corpus_path()
    if not os.path.isdir(path):
        token_neardup_corpus(spark, 1_000, seed=5).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def q_token_dedup_groups(spark, sf_dir):
    """Exact dedup of PRE-TOKENIZED sequences (no detokenization): md5 of
    the comma-joined token ids, keep-first groups."""
    from jsonschema_spark.operators.dedup import (
        exact_duplicate_groups,
        token_content_hash,
    )

    df = _token_corpus(spark)
    return exact_duplicate_groups(
        df, "doc_id", "tokens", fingerprint=token_content_hash(F.col("tokens"))
    )


def q_token_minhash_near_dup(spark, sf_dir):
    """MinHash+LSH near-dup over token 3-gram shingles (the tokenized-corpus
    twin of minhash_near_dup): same banding, exact-Jaccard verified, so the
    output equals the exact token-shingle pair set (oracle = brute-force
    SQL over the same parquet)."""
    from jsonschema_spark.operators.dedup import minhash_near_dup

    df = _token_corpus(spark)
    return minhash_near_dup(
        df, "doc_id", "tokens", threshold=0.8,
        elements=F.col("tokens"), shingle_sep=",",
    )


def q_token_winnow_dups(spark, sf_dir):
    """Winnow-fingerprint near-copy pairs over PRE-TOKENIZED sequences
    (token-native twin of winnow_dups): any shared run of >=
    window + k - 1 = 13 tokens is guaranteed a shared fingerprint
    (Schleimer et al. SIGMOD'03), catching spliced/quoted token passages
    below the minhash Jaccard threshold. The polynomial rolling hash runs
    directly over token ids — no detokenize, no normalization — so the
    DuckDB oracle replays every window minimum with HUGEINT arithmetic."""
    from jsonschema_spark.operators.dedup import token_winnow_near_dup

    df = _token_corpus(spark)
    return token_winnow_near_dup(
        df, k=8, window=6, min_shared=2, max_doc_freq=64
    )


def q_incremental_dedup(spark, sf_dir):
    """Continuous-ingestion exact dedup: the token corpus split at
    doc_id 736 into a 'seen' snapshot (fingerprints of docs < 736) and an
    incoming batch (docs >= 736). The boundary sits ON an injected exact-dup
    row (736 copies 735), so the batch exercises BOTH drop paths
    non-vacuously: one snapshot hit (736) and three within-batch dups
    (803/870/937 copy their in-batch predecessors). Returns the surviving
    (doc_id, fingerprint) rows — exactly what gets appended to the snapshot
    for the next batch (checkpoint/resume semantics of the north rule,
    applied to dedup state)."""
    from jsonschema_spark.operators.dedup import (
        incremental_new_docs,
        token_content_hash,
    )

    df = _token_corpus(spark)
    fp = token_content_hash(F.col("tokens"))
    seen = (
        df.filter(F.col("doc_id") < 736)
        .select(fp.alias("fingerprint"))
        .distinct()
    )
    out = incremental_new_docs(
        df.filter(F.col("doc_id") >= 736), "doc_id", "tokens", seen,
        fingerprint=fp,
    )
    return out.select("doc_id", "fingerprint")


def q_incremental_near_dup(spark, sf_dir):
    """Continuous-ingestion NEAR-dup dedup (the MinHash twin of
    incremental_dedup): the token corpus split into a 'seen' snapshot (at
    scale, a persisted (id, band, h) LSH index) and an incoming batch =
    every injected dup row (doc_id % 67 == 66 exact copies, % 41 == 40
    near copies) plus the % 13 == 0 plain rows. Batch docs with a verified
    token-3-gram Jaccard >= 0.8 match in the snapshot are dropped; the
    surviving (doc_id, n_tok) rows are what gets appended to the corpus +
    band index for the next batch. Non-vacuous on BOTH verify paths: exact
    rows match their snapshot source at j = 1.0, near rows (source tokens
    plus one appended id) at j ~ 0.95, and dup rows whose source itself
    landed in the batch (e.g. 66, whose source 65 has 65 % 13 == 0) must
    SURVIVE — history dedup sees only the snapshot; within-batch dedup is
    minhash_near_dup's job, a different join shape. Banding recall at
    j >= 0.8 is 1 - 5e-8 per pair, so the LSH output equals the exact pair
    set and the brute-force DuckDB twin matches."""
    from jsonschema_spark.operators.dedup import incremental_minhash_new_docs

    df = _token_corpus(spark)
    is_batch = (
        (F.pmod(F.col("doc_id"), F.lit(67)) == 66)
        | (F.pmod(F.col("doc_id"), F.lit(41)) == 40)
        | (F.pmod(F.col("doc_id"), F.lit(13)) == 0)
    )
    snapshot = df.filter(~is_batch)
    batch = df.filter(is_batch)
    out = incremental_minhash_new_docs(
        batch, snapshot, "doc_id", "tokens", threshold=0.8,
        elements=F.col("tokens"), shingle_sep=",",
    )
    return out.select("doc_id", F.size("tokens").cast("long").alias("n_tok"))


def q_decontaminate(spark, sf_dir):
    """Benchmark decontamination: documents sharing >= 1 word 5-gram with
    the 'benchmark' subset (doc_id < 10) and the count of distinct shared
    grams. Hash-prefiltered, exact-string verified — output is exact, so
    the brute-force SQL twin matches."""
    from jsonschema_spark.operators.dedup import contaminated_docs

    df = _t(spark, sf_dir, "documents")
    bench = df.filter(F.col("doc_id") < 10)
    return contaminated_docs(df, "doc_id", "text", bench, n=5)


def q_decontam_spans(spark, sf_dir):
    """SURGICAL decontamination: the exact token ranges of each document
    that overlap the benchmark subset (doc_id < 10) by >= one 5-gram —
    cut or loss-mask these spans instead of dropping the document.
    Benchmark gram set broadcasts; corpus positions semi-join it (linear,
    no pair join); gaps-and-islands merge."""
    from jsonschema_spark.operators.dedup import contamination_spans

    df = _t(spark, sf_dir, "documents")
    bench = df.filter(F.col("doc_id") < 10)
    return contamination_spans(df, "doc_id", "text", bench, "text", n=5)


def q_neardup_threshold_curve(spark, sf_dir):
    """Dedup threshold chosen from data: pairs and affected docs at each
    candidate Jaccard threshold 0.5-0.9 (3-gram shingles). 64 bands of 2
    make the 0.5 floor recall-exact (1-1e-8); candidates are verified
    with exact Jaccard, so the oracle is the brute-force pair set with
    the j >= 0.5 size-ratio prefilter."""
    from jsonschema_spark.operators.dedup import neardup_threshold_curve

    df = _t(spark, sf_dir, "documents")
    return neardup_threshold_curve(df, "doc_id", "text")


def q_contam_attribution(spark, sf_dir):
    """Which eval set leaked where: distinct shared 5-grams per
    (document, benchmark) pair, benchmarks = docs 0-9 each acting as its
    own eval set. Benchmark gram table broadcasts; corpus grams explode
    once."""
    from jsonschema_spark.operators.dedup import contamination_attribution

    df = _t(spark, sf_dir, "documents")
    bench = df.filter(F.col("doc_id") < 10).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    return contamination_attribution(
        df, "doc_id", "text", bench, "bench_id", "text", n=5
    )


def q_source_relative_filter(spark, sf_dir):
    """Per-source RELATIVE quality filter: keep each source's top 60% by
    n_chars (cut = exact per-source 0.4 quantile, ties kept) — preserves
    the source mix while dropping each source's own worst; the keep
    decision is a scan-stage comparison against broadcast thresholds."""
    from jsonschema_spark.operators.sampling import source_relative_filter

    df = _t(spark, sf_dir, "documents")
    return source_relative_filter(
        df, "doc_id", "n_chars", "source", keep_frac=0.6
    )


def q_corpus_datasheet(spark, sf_dir):
    """The corpus front page in one row: doc/word totals, median length,
    exact-dup rate, mean quality score, source count and HHI — each
    column's deep form exists as its own operator; this is the summary a
    datasheet or model card pulls first."""
    from jsonschema_spark.operators.stats import corpus_datasheet

    df = _t(spark, sf_dir, "documents")
    return corpus_datasheet(df)


def q_source_concentration(spark, sf_dir):
    """Corpus mixing audit: source count, top share, HHI, and entropy of
    the document distribution across sources — weighted by n_chars so a
    verbose crawl shows its true dominance."""
    from jsonschema_spark.operators.stats import source_concentration

    df = _t(spark, sf_dir, "documents")
    return source_concentration(df, "source", weight_col="n_chars")


def q_token_decontaminate(spark, sf_dir):
    """Decontamination WITHOUT detokenizing (the payload axis is
    pre-tokenized sequences): corpus docs sharing >= 1 token 5-gram with a
    'benchmark' subset of the token corpus, plus the distinct shared-gram
    count. Benchmark = the injected exact-dup rows (doc_id % 67 == 66), so
    every dup SOURCE doc is genuinely contaminated and the check is
    non-vacuous. Same hash-prefilter + exact verify as the text variant,
    over comma-joined token-id grams."""
    from jsonschema_spark.operators.dedup import contaminated_docs

    df = _token_corpus(spark)
    is_bench = F.pmod(F.col("doc_id"), F.lit(67)) == 66
    bench = df.filter(is_bench)
    return contaminated_docs(
        df.filter(~is_bench), "doc_id", "tokens", bench,
        bench_text_col="tokens", n=5,
        elements=F.col("tokens"), bench_elements=F.col("tokens"),
        shingle_sep=",",
    )


def q_ntok_quantiles(spark, sf_dir):
    """Exact quantiles of the n_chars distribution (stats-profile
    building block; exact `percentile`, not the approx sketch, so the SQL
    twin is quantile_cont)."""
    df = _t(spark, sf_dir, "documents")
    qs = F.percentile("n_chars", F.array(*[F.lit(x) for x in (0.25, 0.5, 0.75, 0.99)]))
    return df.agg(
        *[
            F.round(F.element_at(qs, i + 1), 6).alias(name)
            for i, name in enumerate(["p25", "p50", "p75", "p99"])
        ]
    )


def q_packed_stats_validate(spark, sf_dir):
    """Zone-map (metadata-only) validation pass over the packed layout of
    the 50k corpus: per-check fail counts computed WITHOUT reading the
    token payload (sources/packed.py). The oracle recomputes every check
    from the same packed parquet's metadata columns; stamp-vs-payload
    consistency is separately proven in tests/test_packed.py."""
    import os

    from jsonschema_spark.sources.corpus import MAX_TOKENS, VOCAB_SIZE, corpus
    from jsonschema_spark.sources.packed import (
        TOKEN_BYTES,
        _corpus_checks_from,
        pack_corpus,
    )

    src = _corpus_oracle_path()
    if not os.path.isdir(src):
        corpus(spark, 50_000, seed=42).write.mode("overwrite").parquet(src)
    packed = pack_corpus(spark, src, src.removesuffix(".parquet") + "_packed.parquet")
    df = spark.read.parquet(packed)
    bounds_ok = (
        (F.col("n_bytes") >= TOKEN_BYTES)
        & (F.col("tok_min") >= 0)
        & (F.col("tok_max") <= VOCAB_SIZE - 1)
    )
    annotated = _corpus_checks_from(
        df, bounds_ok, F.col("n_bytes"), F.col("n_bytes").isNotNull(), MAX_TOKENS
    )
    checks = [c for c in annotated.columns if c.startswith("chk_")]
    return annotated.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("_valid").cast("long")).alias("n_valid"),
        *[
            F.sum((~F.col(c)).cast("long")).alias(f"fail_{c.removeprefix('chk_')}")
            for c in checks
        ],
    )


def q_lang_id_counts(spark, sf_dir):
    """Stopword-ratio language ID, aggregated to per-language doc counts."""
    from jsonschema_spark.functions.text import lang_id

    df = _t(spark, sf_dir, "documents")
    return (
        df.select(lang_id(F.col("text")).alias("lang_pred"))
        .groupBy("lang_pred")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def q_quality_score(spark, sf_dir):
    """Composite text-quality heuristic per document."""
    from jsonschema_spark.functions.text import quality_score

    df = _t(spark, sf_dir, "documents")
    return df.select(
        "doc_id", F.round(quality_score(F.col("text")), 6).alias("quality")
    )


def q_token_stats(spark, sf_dir):
    """Whitespace + BPE-ish token counts per document."""
    from jsonschema_spark.functions.text import bpe_ish_token_count, token_count

    df = _t(spark, sf_dir, "documents")
    return df.select(
        "doc_id",
        token_count(F.col("text")).alias("n_ws_tokens"),
        bpe_ish_token_count(F.col("text")).cast("long").alias("n_bpe_tokens"),
    )


def q_tokenizer_fertility(spark, sf_dir):
    """Per-source tokenizer fertility / compression QA gate: subword
    tokens per whitespace word (BPE-ish regex tokenizer), chars per
    subword token, share of high-fertility docs, and a pass/fail verdict
    per source — the pre-tokenization health check that catches
    vocabulary/data mismatch (wrong language, mojibake) before compute is
    spent. One projection + one groupBy on the source key."""
    from jsonschema_spark.operators.stats import tokenizer_fertility_qa

    df = _t(spark, sf_dir, "documents")
    return tokenizer_fertility_qa(
        df, text_col="text", group_col="source",
        fertility_gate=1.2, max_high_rate=0.25,
    )


def q_doc_fingerprint(spark, sf_dir):
    """Normalized content fingerprint (md5) per document."""
    from jsonschema_spark.functions.text import fingerprint

    df = _t(spark, sf_dir, "documents")
    return df.select("doc_id", fingerprint(F.col("text")).alias("fingerprint"))


def _vec0(spark, sf_dir):
    return (
        _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") == 0).first().embedding
    )


def q_embedding_topk(spark, sf_dir):
    """Brute-force cosine top-10 (native zip_with/aggregate dot product,
    TakeOrderedAndProject physical plan)."""
    from jsonschema_spark.operators.similarity import cosine_topk

    df = _t(spark, sf_dir, "embeddings")
    return cosine_topk(df, "embedding", _vec0(spark, sf_dir), 10)


def q_embedding_topk_kernel(spark, sf_dir):
    """Same top-10 via the Arrow-batched numpy kernel (the wide-vector
    scale path) — must agree with the native expression AND the oracle."""
    from jsonschema_spark.operators.similarity import cosine_topk_kernel

    df = _t(spark, sf_dir, "embeddings")
    return cosine_topk_kernel(df, "embedding", _vec0(spark, sf_dir), 10)


def q_incremental_embedding_dedup(spark, sf_dir):
    """Continuous-ingestion embedding near-dedup (the embedding twin of
    incremental_near_dup): the embeddings table split into an incoming
    batch (vec_id % 4 == 0) and a 'seen' snapshot (the rest — at scale, a
    persisted (id, bucket) sign-LSH index). Returns the verified matches
    (id_new, id_seen, cosine >= 0.3) — blocking recall is the seeded
    sign-LSH collision curve, replayed exactly by the DuckDB oracle (same
    plane literals), so the output is deterministic and oracle-checkable;
    6 planes keep the blocked candidate set non-vacuous at this scale (25
    verified matches at sf0.01)."""
    from jsonschema_spark.operators.similarity import incremental_embedding_matches

    df = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    is_batch = F.pmod(F.col("vec_id"), F.lit(4)) == 0
    return incremental_embedding_matches(
        df.filter(is_batch), df.filter(~is_batch),
        threshold=0.3, n_planes=6, seed=13,
    )


def q_embedding_near_dup(spark, sf_dir):
    """Exact pairwise embedding cosine pairs >= 0.3 (oracle baseline for
    the LSH-blocked variant, which is rows-only). Pair-dense, so the
    cosine runs in the Arrow einsum kernel, not the interpreted HOF."""
    from jsonschema_spark.operators.similarity import _make_pair_cosine_kernel

    kernel = _make_pair_cosine_kernel()
    df = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    a, b = df.alias("a"), df.alias("b")
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            F.round(
                kernel(F.col("a.embedding"), F.col("b.embedding")), 6
            ).alias("score"),
        )
        .filter(F.col("score") >= 0.3)
    )


def q_ann_topk(spark, sf_dir):
    """Hyperplane-LSH ANN top-10 with multi-probe + exact rerank. The
    seeded planes are literals, so the DuckDB oracle replays the identical
    bucket filter (query bucket + Hamming-1 probes) and rerank; recall vs
    brute force additionally asserted in tests."""
    from jsonschema_spark.operators.similarity import ann_topk

    df = _t(spark, sf_dir, "embeddings")
    return ann_topk(df, "embedding", _vec0(spark, sf_dir), 10)


def q_ivf_topk(spark, sf_dir):
    """IVF ANN: spherical k-means trained with DataFrame aggs (deterministic
    portable-hash init), nearest-list probing + exact rerank. The DuckDB
    oracle replays the ENTIRE training run (init ordering, 2 Lloyd
    iterations, probe selection) in SQL; recall vs brute force additionally
    asserted in tests."""
    from jsonschema_spark.operators.similarity import ivf_topk, ivf_train

    df = _t(spark, sf_dir, "embeddings")
    centroids = ivf_train(df, "embedding", n_lists=8, iters=2)
    return ivf_topk(df, "embedding", _vec0(spark, sf_dir), 10, centroids, n_probe=3)


def q_semdedup(spark, sf_dir):
    """SemDeDup (Abbas et al. 2023): k-means-cluster the embeddings (the
    same seeded 8-list/2-iter run the ivf_topk oracle replays), then report
    members whose cosine to a smaller-id member of the same cluster clears
    the threshold — semantic duplicates under keep-first. Clustering bounds
    the pair space to O(sum c_i^2); the oracle replays training + the
    within-cluster pair join end to end. Threshold 0.4 (not the paper's
    ~0.99) because the synthetic embeddings are near-orthogonal (max
    pairwise cosine ~0.51 at sf0.01) — same operator, non-vacuous rows."""
    from jsonschema_spark.operators.similarity import ivf_train, semdedup

    df = _t(spark, sf_dir, "embeddings")
    centroids = ivf_train(df, "embedding", n_lists=8, iters=2)
    return semdedup(df, "embedding", centroids, threshold=0.4)


def q_blob_stats(spark, sf_dir):
    """Multimodal blob profile over deterministic fake payloads."""
    from jsonschema_spark.operators.multimodal import attach_fake_blob, blob_stats

    df = attach_fake_blob(_t(spark, sf_dir, "documents"), "text")
    return blob_stats(df)


def q_frame_sample_counts(spark, sf_dir):
    """Frame sampling (every 4th 16-byte frame) — per-doc kept-frame counts,
    checked against the closed form ceil(floor(bytes/16)/4)."""
    from jsonschema_spark.operators.multimodal import attach_fake_blob, frame_sample

    df = attach_fake_blob(_t(spark, sf_dir, "documents"), "text")
    return (
        frame_sample(df, frame_bytes=16, every_n=4)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_frames"))
    )


def _minhash_pairs(spark, sf_dir):
    from jsonschema_spark.operators.dedup import minhash_near_dup

    df = _t(spark, sf_dir, "documents")
    return minhash_near_dup(df, "doc_id", "text", n=3, threshold=0.8)


def q_dup_components(spark, sf_dir):
    """Near-dup clusters: connected components (alternating large-star /
    small-star, O(log n) rounds) over the exactly-verified minhash pair
    set — (id, component) with component = min doc_id in the cluster.
    Oracle: recursive-CTE transitive closure over the exact 3-gram
    Jaccard pair set."""
    from jsonschema_spark.operators.components import connected_components

    return connected_components(_minhash_pairs(spark, sf_dir))


def q_component_purity(spark, sf_dir):
    """Transitive-chaining audit of the near-dup clusters: per-component
    edge density (verified pairs / possible pairs). density 1.0 = a
    genuine clique; low density on a big cluster = LSH daisy-chaining
    collapsing barely-related docs — review before keep-one deletes
    distinct content. One CC run + two component-keyed aggregates."""
    from jsonschema_spark.operators.components import component_purity

    return component_purity(_minhash_pairs(spark, sf_dir))


def q_leakage_safe_split(spark, sf_dir):
    """Contamination-safe train/holdout split: every near-dup cluster is
    assigned atomically via its representative's portable hash bucket, so
    no near-dup pair straddles the boundary. Oracle: the same recursive-CTE
    closure as dup_components, left-joined to the corpus with the identical
    md5 bucket arithmetic."""
    from jsonschema_spark.operators.components import leakage_safe_split

    df = _t(spark, sf_dir, "documents")
    return leakage_safe_split(df, "doc_id", _minhash_pairs(spark, sf_dir))


def q_quality_survivors(spark, sf_dir):
    """Quality-aware canonical selection: per near-dup cluster, keep the
    highest-n_chars member (ties -> min id) instead of the min id — the
    keep-the-best-capture policy. Returns the (component, keep_id,
    n_docs) survivor map; oracle replays the recursive-CTE closure plus
    the identical rank."""
    from jsonschema_spark.operators.components import quality_survivor_map

    df = _t(spark, sf_dir, "documents")
    return quality_survivor_map(
        df, "doc_id", _minhash_pairs(spark, sf_dir), "n_chars"
    )


def q_near_dedup_count(spark, sf_dir):
    """Keep-one-per-cluster near-dedup: corpus size before/after dropping
    every doc whose cluster representative (min id) is another doc."""
    from jsonschema_spark.operators.components import near_dedup_survivors

    df = _t(spark, sf_dir, "documents")
    kept = near_dedup_survivors(df, "doc_id", _minhash_pairs(spark, sf_dir))
    return kept.agg(F.count(F.lit(1)).alias("n_kept")).crossJoin(
        df.agg(F.count(F.lit(1)).alias("n_docs"))
    )


def q_ks_drift(spark, sf_dir):
    """Two-sample Kolmogorov–Smirnov statistic on the n_chars distribution,
    lang='en' docs vs the whole corpus (the same current-vs-baseline split
    psi_terms uses). Exact: the integer-valued histogram IS the empirical
    CDF; the windowed cumulative sums run over <= distinct-values rows."""
    from jsonschema_spark.operators.drift import ks_statistic

    df = _t(spark, sf_dir, "documents")
    cur = df.filter(F.col("lang") == "en").groupBy(
        F.col("n_chars").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    base = df.groupBy(F.col("n_chars").alias("bucket")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return ks_statistic(cur, base)


def q_emd_drift(spark, sf_dir):
    """Exact 1-Wasserstein distance on the n_chars distribution, lang='en'
    docs vs the whole corpus (same split as ks_drift). The
    magnitude-aware complement of KS: reports how FAR the mass moved in
    value units, so a systematic +k length shift scores k where KS
    saturates near zero on wide support."""
    from jsonschema_spark.operators.drift import emd_statistic

    df = _t(spark, sf_dir, "documents")
    cur = df.filter(F.col("lang") == "en").groupBy(
        F.col("n_chars").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    base = df.groupBy(F.col("n_chars").alias("bucket")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return emd_statistic(cur, base)


def q_chi2_drift(spark, sf_dir):
    """Per-bucket Pearson chi-square contributions, English subset vs the
    whole corpus over the same 12-bucket n_chars histogram psi_terms uses —
    chi-square as oracle-checkable DataFrame ops, not driver math."""
    from jsonschema_spark.operators.stats import histogram
    from jsonschema_spark.operators.drift import chi_square_terms

    df = _t(spark, sf_dir, "documents")
    current = histogram(df.filter(F.col("lang") == "en"), "n_chars", 12, 0, 600)
    baseline = histogram(df, "n_chars", 12, 0, 600)
    return chi_square_terms(current, baseline)


def q_token_entropy(spark, sf_dir):
    """Unigram-diversity quality signal: per-doc Shannon entropy (nats) of
    the word distribution; sorted-order fold for cross-engine float
    parity."""
    from jsonschema_spark.functions.text import token_entropy

    df = _t(spark, sf_dir, "documents")
    return df.select(
        "doc_id", F.round(token_entropy(F.col("text")), 6).alias("entropy")
    )


def q_hash_sample(spark, sf_dir):
    """Deterministic 5% content-addressed sample: portable md5 hash bucket
    of doc_id < 5 of 100. Stable under any partitioning / cluster size —
    unlike df.sample(), whose per-partition RNG changes with file layout."""
    from jsonschema_spark.operators.sampling import hash_sample

    df = _t(spark, sf_dir, "documents")
    return hash_sample(df, "doc_id", rate=0.05, buckets=100).select("doc_id")


def q_source_cap(spark, sf_dir):
    """Per-source document cap (mixture rebalancing): keep at most 30 docs
    per source ordered by doc_id; output per-source kept counts."""
    from jsonschema_spark.operators.sampling import cap_per_group

    df = _t(spark, sf_dir, "documents")
    return (
        cap_per_group(df, "source", k=30, order_col="doc_id")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )


def q_repetition_score(spark, sf_dir):
    """Gopher-style repetition filter signal: per-doc fraction of word
    3-grams that repeat an earlier 3-gram (1 - distinct/total)."""
    from jsonschema_spark.functions.text import repetition_ratio

    df = _t(spark, sf_dir, "documents")
    return df.select(
        "doc_id", F.round(repetition_ratio(F.col("text"), 3), 6).alias("rep_ratio")
    )


def _pii_corpus_path() -> str:
    import os

    cache = os.environ.get("BENCH_CACHE_DIR", "/tmp/jsonschema_spark_bench")
    return os.path.join(cache, "pii_corpus_2k_seed9.parquet")


def _line_corpus_path() -> str:
    import os

    cache = os.environ.get("BENCH_CACHE_DIR", "/tmp/jsonschema_spark_bench")
    return os.path.join(cache, "line_corpus_1k_seed7.parquet")


def _line_corpus(spark):
    import os

    from jsonschema_spark.sources.corpus import line_corpus

    path = _line_corpus_path()
    if not os.path.isdir(path):
        line_corpus(spark, 1_000, seed=7).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def q_boilerplate_lines(spark, sf_dir):
    """Line-level boilerplate detection (C4/CCNet-style cleaning): lines
    occurring in >= 100 distinct documents of a 1k multi-line corpus with
    three injected boilerplate lines (doc frequencies ~334/200/143 by
    construction; content lines are unique per doc). distinct-(doc, line)
    then map-side-combined count — no hot reducer key."""
    from jsonschema_spark.operators.cleaning import boilerplate_lines

    return boilerplate_lines(_line_corpus(spark), "doc_id", "text", min_docs=100)


def q_boilerplate_strip(spark, sf_dir):
    """Boilerplate removal: every document rebuilt without its boilerplate
    lines (order preserved; broadcast anti-join on the line set). Returns
    the per-doc surviving line count and an md5 fingerprint of the
    rebuilt text so the oracle compares full content compactly."""
    from jsonschema_spark.operators.cleaning import strip_boilerplate

    out = strip_boilerplate(_line_corpus(spark), "doc_id", "text", min_docs=100)
    return out.select(
        "id", "n_kept", F.md5("text_clean").alias("clean_fp")
    )


def _zipf_corpus_path() -> str:
    import os

    cache = os.environ.get("BENCH_CACHE_DIR", "/tmp/jsonschema_spark_bench")
    return os.path.join(cache, "zipf_corpus_2k_seed11.parquet")


def q_rare_token_rate(spark, sf_dir):
    """Rare-token (OOV-ish) rate per document over a Zipf-skewed token
    corpus: fraction of tokens whose global frequency is < 5. The
    vocabulary-bounded frequency table broadcasts; the only shuffles are
    the two map-side-combined aggs."""
    import os

    from jsonschema_spark.operators.stats import rare_token_rate
    from jsonschema_spark.sources.corpus import zipf_token_corpus

    path = _zipf_corpus_path()
    if not os.path.isdir(path):
        zipf_token_corpus(spark, 2_000, seed=11).write.mode("overwrite").parquet(path)
    return rare_token_rate(spark.read.parquet(path), "doc_id", "tokens", min_count=5)


def q_pii_scan(spark, sf_dir):
    """PII pattern scan over a deterministic synthetic corpus with injected
    emails / SSN-shaped ids / long digit runs (testdata documents contain
    none — the corpus is materialized once and both engines read the same
    parquet). Per-pattern totals, all native regexp_count."""
    import os

    from jsonschema_spark.sources.corpus import pii_corpus

    path = _pii_corpus_path()
    if not os.path.isdir(path):
        pii_corpus(spark, 2_000, seed=9).write.mode("overwrite").parquet(path)
    df = spark.read.parquet(path)
    email, ssn, digits = PII_PATTERNS
    return df.agg(
        F.sum(F.regexp_count("text", F.lit(email))).cast("long").alias("n_email"),
        F.sum(F.regexp_count("text", F.lit(ssn))).cast("long").alias("n_ssn"),
        F.sum(F.regexp_count("text", F.lit(digits))).cast("long").alias("n_digit_runs"),
        F.count(F.when(F.regexp_count("text", F.lit(email)) > 0, 1)).alias("n_email_docs"),
        F.count(F.lit(1)).alias("n_docs"),
    )


PII_PATTERNS = (
    r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",  # email
    r"[0-9]{3}-[0-9]{2}-[0-9]{4}",  # SSN-shaped
    r"[0-9]{9,}",  # long digit run (account-number shape)
)


def _jsonl_path() -> str:
    """One canonical cache file: the Spark query materializes it on first
    run (from whichever sf_dir that was) and BOTH engines then read this
    exact file, so the comparison is always over identical bytes — the
    ingest semantics under test don't depend on the corpus size."""
    import os

    cache = os.environ.get("BENCH_CACHE_DIR", "/tmp/jsonschema_spark_bench")
    return os.path.join(cache, "events_jsonl_oracle.jsonl")


def q_jsonl_ingest(spark, sf_dir):
    """Schema-first JSONL ingest with malformed-line capture: events
    re-serialized as JSON lines (1 corrupt line injected per 1000), read
    back with an explicit schema in PERMISSIVE mode; aggregate over the
    well-formed rows only — which is exactly what the DuckDB oracle's
    ignore_errors read sees, so corrupt-line handling is oracle-checked by
    construction. Integer aggregates (no float-order sensitivity)."""
    import json as _json
    import os

    import pyarrow.parquet as _pq

    from jsonschema_spark.sources.jsonl import ingest_verdicts, read_jsonl

    path = _jsonl_path()
    if not os.path.exists(path):
        tbl = _pq.read_table(
            f"{sf_dir}/events.parquet",
            columns=["event_id", "user_id", "event_type", "value"],
        ).to_pylist()
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            for i, row in enumerate(tbl):
                if i % 1000 == 999:
                    f.write("{this line is not json\n")
                f.write(_json.dumps(row) + "\n")
        os.replace(tmp, path)

    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    df = ingest_verdicts(read_jsonl(spark, path, schema))
    # the event_id predicate is redundant (every valid event has one) but
    # keeps a DATA column referenced even when a downstream .count() prunes
    # the aggregate outputs — else SPARK-21610 rejects the corrupt-only scan
    return df.filter(F.col("wellformed") & F.col("event_id").isNotNull()).agg(
        F.count(F.lit(1)).alias("n_valid"),
        F.sum("user_id").cast("long").alias("sum_user"),
        F.countDistinct("event_type").alias("n_types"),
    )


def q_source_violation_rates(spark, sf_dir):
    """Per-source violation rate with Wilson 95% bounds (the acceptance
    gate for per-source quality: one threshold on wilson_hi works across
    sources of very different sizes). Violation here: n_chars > 450."""
    from jsonschema_spark.operators.checks import wilson_rates

    df = _t(spark, sf_dir, "documents")
    return wilson_rates(df, "source", F.col("n_chars") > 450)


def q_ntok_iqr_outliers(spark, sf_dir):
    """Per-source Tukey-fence outlier summary on the n_chars length
    distribution: exact per-group quartiles (one shuffle), bounds
    broadcast back for the flagging pass."""
    from jsonschema_spark.operators.checks import iqr_outlier_counts

    df = _t(spark, sf_dir, "documents")
    return iqr_outlier_counts(df, "n_chars", "source")


def q_monotonic_check(spark, sf_dir):
    """Sequence-regression check: within each user's event stream (total
    order = event_id), count adjacent pairs where `value` decreases.
    One window shuffle on user_id; lag state is one value per key."""
    from jsonschema_spark.operators.checks import monotonic_violations

    df = _t(spark, sf_dir, "events")
    return monotonic_violations(df, "user_id", "event_id", "value")


def q_embedding_drift(spark, sf_dir):
    """Embedding-distribution drift: cosine + L2 between the mean vector
    of the label<5 slice and the full corpus (posexplode + partial avg —
    dim x partitions shuffle rows, never raw vectors)."""
    from jsonschema_spark.operators.drift import embedding_mean_drift

    df = _t(spark, sf_dir, "embeddings")
    return embedding_mean_drift(df.filter(F.col("label") < 5), df)


def q_sequence_packing(spark, sf_dir):
    """Greedy sequence packing of documents into 2000-char training
    windows across 8 hash-routed streams — per-pack summary (fill
    ratio, oversize flag). The assignment is a pure function of row
    content, so the DuckDB recursive-CTE oracle replays the walk
    exactly."""
    from jsonschema_spark.operators.packing import pack_summary

    df = _t(spark, sf_dir, "documents")
    return pack_summary(df, "doc_id", "n_chars", budget=2000, streams=8)


def q_tfidf_top_terms(spark, sf_dir):
    """Top-3 TF-IDF terms per document (smoothed idf, deterministic
    term-asc tie-break): the canonical explode -> tf agg -> df agg ->
    join-back -> window-top-k plan."""
    from jsonschema_spark.operators.relevance import tfidf_top_terms

    df = _t(spark, sf_dir, "documents")
    return tfidf_top_terms(df, "doc_id", "text", k=3)


def q_source_divergence(spark, sf_dir):
    """Pairwise Jensen-Shannon divergence between per-source token
    distributions over the global top-200 vocabulary — which sources are
    most unlike each other (the mixture-design companion to drift)."""
    from jsonschema_spark.operators.relevance import pairwise_js_divergence

    df = _t(spark, sf_dir, "documents")
    return pairwise_js_divergence(df, "source", "text", top_v=200)


def q_dsir_select(spark, sf_dir):
    """DSIR importance selection (Xie et al. 2023): the 20 raw-pool
    documents whose hashed-unigram distribution is most like the 'src0'
    target exemplars — weight = sum over tokens of the Laplace-smoothed
    target/raw bucket log-likelihood ratio. Deterministic
    (weight desc, doc_id) order; portable md5 bucket hash, so the DuckDB
    oracle reproduces every score."""
    from pyspark.sql import functions as F

    from jsonschema_spark.operators.relevance import dsir_select

    df = _t(spark, sf_dir, "documents")
    return dsir_select(
        df, F.col("source") == "src0", k=20, buckets=1024, smoothing=1.0
    )


def q_unigram_ppl(spark, sf_dir):
    """CCNet-style LM quality scoring (Wenzek et al. 2020): hashed-unigram
    LM trained on the 'src0' reference slice; every other document scored
    by cross-entropy/perplexity under it, then ntile(3) head/middle/tail
    assignment (tile 1 = most reference-like). Portable md5 buckets +
    deterministic (ppl, doc_id) tile order, so the DuckDB oracle
    reproduces every score and tile bit-for-bit."""
    from pyspark.sql import functions as F

    from jsonschema_spark.operators.relevance import perplexity_buckets

    df = _t(spark, sf_dir, "documents")
    out = perplexity_buckets(
        df, F.col("source") == "src0", n_buckets=3, buckets=1024, smoothing=1.0
    )
    return out.select(
        "doc_id", "n_tok", "xent", "ppl", F.col("tile").cast("int").alias("tile")
    )


def q_infer_spec(spark, sf_dir):
    """Spec inference surfaced as profile rows: one row per documents
    column with the inferred JSON type, numeric-or-length bounds,
    required flag, and enum (when exact cardinality <= 20). The engine
    computes this in ONE aggregation pass (plans/infer.py); the oracle
    recomputes the identical profile in SQL. The approximate (HLL)
    uniqueness nomination is deliberately excluded — it is not
    SQL-reproducible and the salted uniqueness check proves it instead."""
    from pyspark.sql import types as T

    from jsonschema_spark.plans.infer import infer_table_spec

    df = _t(spark, sf_dir, "documents")
    spec = infer_table_spec(df)
    rows = []
    for col in df.columns:
        c = spec["columns"][col]
        if c["type"] in ("integer", "number"):
            lo, hi = float(c["minimum"]), float(c["maximum"])
        else:
            lo, hi = float(c["minLength"]), float(c["maxLength"])
        rows.append(
            (
                col,
                c["type"],
                lo,
                hi,
                col in spec["required"],
                ",".join(c["enum"]) if "enum" in c else None,
            )
        )
    schema = T.StructType(
        [
            T.StructField("col", T.StringType()),
            T.StructField("jtype", T.StringType()),
            T.StructField("lo", T.DoubleType()),
            T.StructField("hi", T.DoubleType()),
            T.StructField("is_required", T.BooleanType()),
            T.StructField("enum_vals", T.StringType()),
        ]
    )
    return spark.createDataFrame(rows, schema)


def q_ngram_novelty(spark, sf_dir):
    """Per-document n-gram novelty: the fraction of each doc's distinct
    5-grams that no other document contains (cross-doc complement of the
    within-doc repetition score). Gram identity = portable md5 hash, which
    the DuckDB oracle replays, so scores agree bit-for-bit."""
    from jsonschema_spark.operators.dedup import ngram_novelty

    df = _t(spark, sf_dir, "documents")
    return ngram_novelty(df, "doc_id", "text", n=5)


def q_diverse_sample(spark, sf_dir):
    """Embedding-space diversity sample: at most 2 vectors per
    hyperplane-LSH bucket (8 seeded planes), survivors = smallest md5
    hashes of the id within each bucket — exact membership reproduced by
    the DuckDB oracle replaying the plane literals."""
    from jsonschema_spark.operators.similarity import diverse_sample

    df = _t(spark, sf_dir, "embeddings")
    return diverse_sample(df, "embedding", "vec_id", m=2, n_planes=8, seed=13)


def q_shared_ngram_pairs(spark, sf_dir):
    """Within-corpus repeated-text pairs: documents sharing >= 1 exact
    13-word gram, with the count of distinct shared grams (the fixed-n
    form of substring dedup a la Lee et al. 2022 — a shared run of >= 13
    words always contains a shared 13-gram). Gram-hash prefilter + exact
    string verification, so the output is exact and the O(n^2) step only
    ever sees colliding positions. max_doc_freq=50 caps per-gram fan-out:
    a template gram in k docs would emit O(k^2) candidate pairs, so grams
    above the ceiling are boilerplate (cleaning.py's territory), excluded
    from pairing AND counting."""
    from jsonschema_spark.operators.dedup import shared_ngram_pairs

    df = _t(spark, sf_dir, "documents")
    return shared_ngram_pairs(df, "doc_id", "text", n=13, max_doc_freq=50)


def q_longest_shared_run(spark, sf_dir):
    """Variable-length substring dedup (Lee et al. 2022): for every
    near-dup candidate pair, the length in tokens of the longest shared
    run (>= 13) — the cut-point signal, vs shared_ngram_pairs' membership
    signal. Candidates come from the ceiling-capped 13-gram prefilter;
    the longest run is the longest diagonal chain of positional gram
    matches + 12 (a run of L tokens holds exactly L-12 aligned grams)."""
    from jsonschema_spark.operators.dedup import longest_shared_run

    df = _t(spark, sf_dir, "documents")
    return longest_shared_run(df, "doc_id", "text", n=13, max_doc_freq=50)


def q_dup_spans(spark, sf_dir):
    """Exact-substring dedup, span form (Lee et al. 2022 ExactSubstr):
    maximal 1-based token intervals covered by 13-grams occurring >= 2x
    corpus-wide, with each gram's globally-first occurrence exempted
    (keep_first=True) so cutting the returned spans leaves exactly one
    copy of every duplicated substring. The actionable complement of
    shared_ngram_pairs (pairs) and longest_shared_run (lengths)."""
    from jsonschema_spark.operators.dedup import dup_spans

    df = _t(spark, sf_dir, "documents")
    return dup_spans(df, "doc_id", "text", n=13, keep_first=True)


def q_periodic_sequences(spark, sf_dir):
    """Decoding-loop detector: sequences that are EXACTLY a short phrase
    cycled (min period <= 32). Loops are injected deterministically —
    every 97th token-corpus row is rewritten as its first 5 tokens
    repeated — so detection is non-vacuous; honest random rows (500-id
    vocab, >= 40 tokens) are never periodic by chance. Possible smaller
    sub-periods (period 1 when all 5 prefix tokens collide) are decided
    identically by both engines."""
    from jsonschema_spark.operators.stats import periodic_sequences

    df = _token_corpus(spark)
    looped = df.select(
        "doc_id",
        F.when(
            F.pmod("doc_id", F.lit(97)) == 96,
            F.transform(
                F.sequence(F.lit(1), F.size("tokens")),
                lambda i: F.element_at(
                    F.col("tokens"), ((i - 1) % F.lit(5)) + 1
                ),
            ),
        )
        .otherwise(F.col("tokens"))
        .alias("tokens"),
    )
    return periodic_sequences(looped, "doc_id", "tokens", max_period=32)


def q_token_dup_spans(spark, sf_dir):
    """Exact-substring dup spans on PRE-TOKENIZED sequences (no
    detokenization): maximal token-index ranges covered by token-id
    13-grams occurring >= 2x across the corpus — the token-native
    ExactSubstr cut list (the form Lee et al. actually run: over token
    ids, not words)."""
    from jsonschema_spark.operators.dedup import dup_spans

    df = _token_corpus(spark)
    return dup_spans(
        df, "doc_id", "tokens", n=13, elements=F.col("tokens"), shingle_sep=","
    )


def q_ingest_dedup_trend(spark, sf_dir):
    """Ingest-health trend: per 100-doc ingestion bucket (ids as arrival
    order), the fraction of docs exactly duplicating an EARLIER doc —
    keep-first, so the canonical copy never counts and a clean corpus is
    all zeros; a re-crawl loop spikes one bucket."""
    from jsonschema_spark.operators.dedup import ingest_dedup_trend

    df = _t(spark, sf_dir, "documents")
    return ingest_dedup_trend(df, "doc_id", "text", bucket_size=100)


def q_effective_tokens(spark, sf_dir):
    """Per-source UNIQUE token mass: total words minus keep-first dup-span
    words — the scaling-law denominator (raw counts double-count
    boilerplate; a source's signal is its effective tokens)."""
    from jsonschema_spark.operators.dedup import effective_token_mass

    df = _t(spark, sf_dir, "documents")
    return effective_token_mass(df, "doc_id", "text", "source", n=13)


def q_dup_loss_mask(spark, sf_dir):
    """Spans made trainer-ready: the per-token 0/1 loss mask implied by
    the keep-first dup spans — mask[i] = 1 iff token i is repeated text
    whose canonical copy lives elsewhere (zero its loss instead of
    dropping the doc). Every document reports; no-span docs are all
    zeros. The raw ARRAY<int> mask is the library artifact
    (span_token_mask); the gate row carries its md5 fingerprint instead —
    list cells are unsortable by the driver's pandas canonicalizer
    (CORRECTNESS_r04 err)."""
    from jsonschema_spark.operators.dedup import dup_spans, span_token_mask

    df = _t(spark, sf_dir, "documents")
    spans = dup_spans(df, "doc_id", "text", n=13, keep_first=True)
    out = span_token_mask(df, "doc_id", spans, text_col="text")
    return out.select(
        "doc_id",
        "n_tok",
        "n_masked",
        F.md5(F.array_join(F.col("mask").cast("array<string>"), ",")).alias(
            "mask_fp"
        ),
    )


def q_dup_span_stats(spark, sf_dir):
    """Per-document corpus-repetition scorecard: fraction of each doc's
    tokens inside duplicated (>= 2 occurrences corpus-wide, all
    occurrences marked) 13-gram spans — near 1.0 means the document
    exists elsewhere wholesale; small fractions mean cut, don't drop."""
    from jsonschema_spark.operators.dedup import dup_span_stats

    df = _t(spark, sf_dir, "documents")
    return dup_span_stats(df, "doc_id", "text", n=13)


def q_source_mix(spark, sf_dir):
    """Deterministic source re-mixing: the exact membership of a
    50/30/20 src0/src1/src2 mixture at the largest total the corpus can
    supply — every keep/drop decision is a pure function of md5(doc_id),
    so the DuckDB oracle reproduces the identical sample."""
    from jsonschema_spark.operators.sampling import mix_to_proportions

    df = _t(spark, sf_dir, "documents")
    return mix_to_proportions(
        df, "source", "doc_id", {"src0": 0.5, "src1": 0.3, "src2": 0.2}
    ).select("doc_id", "source")


def q_global_shuffle(spark, sf_dir):
    """Deterministic global training order: each document's 1-based
    position under the seed-7 content-addressed shuffle — computed with
    NO global sort (order-preserving hash buckets + per-bucket
    row_number), reproducible on any partitioning or engine."""
    from jsonschema_spark.operators.sampling import global_shuffle_order

    df = _t(spark, sf_dir, "documents")
    return global_shuffle_order(df, "doc_id", seed=7, num_buckets=64)


def q_weighted_sample(spark, sf_dir):
    """Deterministic A-ES weighted sample: 50 documents drawn with
    probability proportional to n_chars via content-addressed keys
    u^(1/w) — byte-identical selection in any engine / partitioning."""
    from jsonschema_spark.operators.sampling import weighted_sample

    df = _t(spark, sf_dir, "documents")
    return weighted_sample(df, "doc_id", "n_chars", k=50)


def q_windowed_drift(spark, sf_dir):
    """Time-sliced drift: per-day PSI of the events value histogram vs
    the whole-range baseline — which day's distribution shifted. One
    (window, bucket) aggregation of the raw rows; baseline re-aggregated
    from that small table."""
    from jsonschema_spark.operators.drift import windowed_psi

    df = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    return windowed_psi(df, "ts", "value", "1 day", bins=10, lo=0.0, hi=200.0)


def _parity_corpus_path() -> str:
    """Perturbed twin of the token corpus for the token_parity check —
    materialized once, read by both engines (same pattern as
    _token_corpus_path)."""
    import os

    cache = os.environ.get("BENCH_CACHE_DIR", "/tmp/jsonschema_spark_bench")
    return os.path.join(cache, "token_parity_current_seed5.parquet")


def _parity_corpus(spark):
    """Deterministically perturbed 'current' snapshot of the token corpus:
    docs %97==3 dropped (missing_current), %89==5 get token 999 at pos 1
    (token_mismatch at 1; vocab is 0..499 so never a no-op), %83==11 lose
    their last token (strict prefix -> diverges at len(shorter)+1), and
    %79==2 are re-emitted under doc_id+100000 (missing_golden)."""
    import os

    path = _parity_corpus_path()
    if not os.path.isdir(path):
        g = _token_corpus(spark)
        t = F.col("tokens")
        did = F.col("doc_id")
        perturbed = (
            g.filter(F.pmod(did, F.lit(97)) != 3)
            .select(
                "doc_id",
                F.when(
                    F.pmod(did, F.lit(89)) == 5,
                    F.concat(
                        F.array(F.lit(999).cast("int")),
                        F.slice(t, 2, F.size(t) - 1),
                    ),
                )
                .when(F.pmod(did, F.lit(83)) == 11, F.slice(t, 1, F.size(t) - 1))
                .otherwise(t)
                .alias("tokens"),
            )
            .unionByName(
                g.filter(F.pmod(did, F.lit(79)) == 2).select(
                    (did + 100000).alias("doc_id"), "tokens"
                )
            )
        )
        perturbed.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def q_token_parity(spark, sf_dir):
    """The engine's per-row invariant (token-array equality, SURVEY §2.2
    jsonequal) as a cross-snapshot validation: the deterministically
    perturbed 'current' snapshot vs the golden token corpus; returns only
    the violation rows (missing/extra/diverged docs with the 1-based first
    divergent position)."""
    from jsonschema_spark.operators.checks import token_parity

    return token_parity(_parity_corpus(spark), _token_corpus(spark))


def q_snapshot_churn(spark, sf_dir):
    """Ops summary over the parity fixture pair: how many docs were
    added / removed / changed / unchanged between the golden token corpus
    and its perturbed 'current' snapshot — the single alert number where
    token_parity gives the per-row detail."""
    from jsonschema_spark.operators.checks import snapshot_churn
    from jsonschema_spark.operators.dedup import token_content_hash

    return snapshot_churn(
        _parity_corpus(spark),
        _token_corpus(spark),
        "doc_id",
        token_content_hash(F.col("tokens")),
    )


def _embedding_parity_paths() -> tuple[str, str]:
    import os

    cache = os.environ.get("BENCH_CACHE_DIR", "/tmp/jsonschema_spark_bench")
    return (
        os.path.join(cache, "emb_parity_golden_seed9.parquet"),
        os.path.join(cache, "emb_parity_current_seed9.parquet"),
    )


def _embedding_parity_frames(spark):
    """Deterministic 800x16 float embedding snapshot + perturbed twin
    (drop %97==3, +1e-3 on dim 1 for %89==5, last dim truncated for
    %83==11, re-emit %79==2 under id+100000) — both materialized once,
    read by both engines."""
    import os

    gp, cp = _embedding_parity_paths()
    if not (os.path.isdir(gp) and os.path.isdir(cp)):
        dims = list(range(1, 17))
        vec = F.array(
            *[
                (
                    F.pmod(F.xxhash64(F.col("id"), F.lit(d)), F.lit(1000))
                    / F.lit(1000.0)
                ).cast("float")
                for d in dims
            ]
        )
        g = spark.range(800).select(
            F.col("id").alias("vec_id"), vec.alias("embedding")
        )
        g.repartition(4).write.mode("overwrite").parquet(gp)
        vid = F.col("vec_id")
        e = F.col("embedding")
        cur = (
            g.filter(F.pmod(vid, F.lit(97)) != 3)
            .select(
                "vec_id",
                F.when(
                    F.pmod(vid, F.lit(89)) == 5,
                    F.concat(
                        F.array(
                            (F.element_at(e, 1).cast("double") + F.lit(1e-3))
                            .cast("float")
                        ),
                        F.slice(e, 2, F.size(e) - 1),
                    ),
                )
                .when(F.pmod(vid, F.lit(83)) == 11, F.slice(e, 1, F.size(e) - 1))
                .otherwise(e)
                .alias("embedding"),
            )
            .unionByName(
                g.filter(F.pmod(vid, F.lit(79)) == 2).select(
                    (vid + F.lit(100000)).alias("vec_id"), "embedding"
                )
            )
        )
        cur.repartition(4).write.mode("overwrite").parquet(cp)
    return spark.read.parquet(cp), spark.read.parquet(gp)


def q_embedding_parity(spark, sf_dir):
    """Vector sibling of token_parity: per-row embedding equality within
    atol=1e-6 between a golden snapshot and its deterministically damaged
    twin — missing/extra vectors, a +1e-3 bump on dim 1, and a truncated
    dimension all report with the first divergent dim and the max
    per-dim deviation."""
    from jsonschema_spark.operators.checks import embedding_parity

    cur, gold = _embedding_parity_frames(spark)
    return embedding_parity(cur, gold)


def q_vocab_churn(spark, sf_dir):
    """Tokenizer-skew QA: distinct-token-id set difference between the
    perturbed 'current' snapshot and the golden token corpus — the
    injected out-of-vocab token 999 reports as new; the drop/truncation
    perturbations can retire rare ids."""
    from jsonschema_spark.operators.stats import vocab_churn

    return vocab_churn(_parity_corpus(spark), _token_corpus(spark))


def q_lang_mismatch(spark, sf_dir):
    """Metadata-vs-content QA: per source, the Wilson-bounded rate of
    documents whose CLAIMED lang tag disagrees with the n-gram language
    id of the text — a mislabeled-source detector built by composing
    lang_id with the generic wilson_rates check."""
    from jsonschema_spark.functions.text import lang_id
    from jsonschema_spark.operators.checks import wilson_rates

    df = _t(spark, sf_dir, "documents")
    return wilson_rates(df, "source", lang_id(F.col("text")) != F.col("lang"))


def q_token_sketch_drift(spark, sf_dir):
    """North rule: PSI on token-frequency sketches vs a baseline snapshot —
    the leading slice (doc_id < 500) of the tokenized corpus vs the whole
    corpus, each collapsed to a 64-bucket hashed frequency vector before
    the O(buckets) compare. Buckets are portable_hash60-derived so the
    DuckDB twin reproduces every bucket id exactly."""
    from jsonschema_spark.operators.drift import token_sketch_psi

    df = _token_corpus(spark)
    return token_sketch_psi(
        df.filter(F.col("doc_id") < 500), df, "tokens", buckets=64
    )


def q_ntok_chi2_drift(spark, sf_dir):
    """North rule: chi-square on the n_tok distribution vs a baseline
    snapshot — exact integer-valued sequence-length histograms of the
    leading slice (doc_id < 500) vs the whole tokenized corpus, compared
    per-bucket by chi_square_terms."""
    from jsonschema_spark.operators.drift import chi_square_terms

    df = _token_corpus(spark).select(
        "doc_id", F.size("tokens").cast("long").alias("n_tok")
    )
    cur = df.filter(F.col("doc_id") < 500).groupBy(
        F.col("n_tok").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    base = df.groupBy(F.col("n_tok").alias("bucket")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return chi_square_terms(cur, base)


def q_gopher_quality(spark, sf_dir):
    """Gopher-style quality rule bundle (Rae et al. 2021 §A1.1): per-doc
    word count, mean word length, alphabetic-word ratio, top-2-gram
    fraction, duplicate-3-gram fraction, and a single pass verdict."""
    from jsonschema_spark.operators.cleaning import gopher_quality

    df = _t(spark, sf_dir, "documents")
    out = gopher_quality(df, "doc_id", "text", min_words=10)
    return out.select(
        "doc_id", "n_words", "mean_word_len", "alpha_ratio",
        "top2gram_frac", "dup3gram_frac",
        F.col("passes").cast("int").alias("passes"),
    )


def q_c4_clean(spark, sf_dir):
    """C4 line/page cleaning rules (Raffel et al. 2020 §2.2): keep lines
    ending in terminal punctuation with >= 5 words and no 'javascript';
    flag lorem-ipsum / curly-brace pages; passes = >= 3 surviving lines
    and no page flag. The testdata documents are single-line with no
    punctuation, which would leave every rule's keep-path untested — so
    the query first builds a deterministic multi-line page per doc with
    the same string ops on both engines (split at ' the ' boundaries ->
    lines ending '.', terminal '.' only for even doc_id, javascript /
    lorem-ipsum / brace lines injected on doc_id % 5/13/11), giving every
    line and page rule both positive and negative cases. The oracle
    rebuilds the page and the kept list with the same expressions."""
    from jsonschema_spark.operators.cleaning import c4_clean

    df = _t(spark, sf_dir, "documents")
    page = F.concat(
        F.regexp_replace(F.col("text"), " the ", ".\nthe "),
        F.when(F.col("doc_id") % 2 == 0, F.lit(".")).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 13 == 0,
            F.lit("\nlorem ipsum dolor sit amet consectetur."),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 11 == 0, F.lit("\nfunction f() { return 1 }")
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.lit("\nenable javascript to view this page now."),
        ).otherwise(F.lit("")),
    )
    out = c4_clean(df.select("doc_id", page.alias("text")), "doc_id", "text")
    return out.select(
        F.col("id").alias("doc_id"),
        "n_lines",
        "n_kept",
        F.col("has_lorem").cast("int").alias("has_lorem"),
        F.col("has_brace").cast("int").alias("has_brace"),
        "text_clean",
        F.col("passes").cast("int").alias("passes"),
    )


def q_chunk_dedup(spark, sf_dir):
    """Sub-document dedup signal: fraction of each document's fixed-width
    20-word chunks that occur more than once anywhere in the corpus."""
    from jsonschema_spark.operators.dedup import chunk_duplicate_fraction

    df = _t(spark, sf_dir, "documents")
    return chunk_duplicate_fraction(df, "doc_id", "text", chunk_words=20)


def q_semantic_decontam(spark, sf_dir):
    """Embedding-space benchmark decontamination: label-0 vectors act as
    the held-out benchmark; every other vector reports its nearest
    benchmark neighbor by cosine and a contaminated verdict."""
    from jsonschema_spark.operators.similarity import semantic_decontaminate

    emb = _t(spark, sf_dir, "embeddings")
    bench = emb.filter(F.col("label") == 0)
    corpus = emb.filter(F.col("label") != 0)
    out = semantic_decontaminate(corpus, bench, threshold=0.3)
    return out.select(
        F.col("id"), "best_bench_id", "best_cos",
        F.col("contaminated").cast("int").alias("contaminated"),
    )


def q_spec_diff(spark, sf_dir):
    """Schema-evolution check: infer the TableSpec of a golden snapshot
    (doc_id >= 10, lang <> 'de') and of the full table, then report every
    constraint whose value drifted, classified by direction (widened =
    new data escapes the golden contract). Metadata-sized output; the
    required-flip arm yields no rows on this corpus (no nulls) and the
    HLL uniqueness nomination is excluded (same contract as infer_spec)."""
    from pyspark.sql import types as T

    from jsonschema_spark.plans.infer import infer_table_spec, spec_diff

    df = _t(spark, sf_dir, "documents")
    golden = infer_table_spec(
        df.filter((F.col("doc_id") >= 10) & (F.col("lang") != "de"))
    )
    candidate = infer_table_spec(df)
    rows = spec_diff(golden, candidate, columns=df.columns)
    schema = T.StructType(
        [
            T.StructField("column", T.StringType()),
            T.StructField("constraint", T.StringType()),
            T.StructField("golden", T.StringType()),
            T.StructField("candidate", T.StringType()),
            T.StructField("change", T.StringType()),
        ]
    )
    return spark.createDataFrame(rows, schema)


def q_image_decode(spark, sf_dir):
    """REAL image decode (no codec library): deterministic 24-bit BMPs are
    synthesized per doc_id (dims and pixel values are closed-form in
    doc_id — multimodal.make_bmp), decoded back by the real header+numpy
    parser (multimodal.decode_bmp), statistics via exact integer sums. The
    DuckDB oracle computes the SAME statistics closed-form from doc_id
    alone — an independent cross-engine check on the decoder, not a
    roundtrip through the writer. Padding bytes in the BMP row stride are
    nonzero-excluded by construction (w=5,6,9,10 rows carry stride pad)."""
    from jsonschema_spark.operators.multimodal import (
        attach_synth_blob,
        decode_images,
        make_bmp,
    )

    df = attach_synth_blob(_t(spark, sf_dir, "documents"), "doc_id", make_bmp)
    return decode_images(df).select(
        "doc_id",
        "height",
        "width",
        "channels",
        F.round("mean_pixel", 6).alias("mean_pixel"),
    )


def q_audio_decode(spark, sf_dir):
    """REAL audio decode: deterministic 16-bit PCM WAVs synthesized per
    doc_id (multimodal.make_wav), decoded by the real RIFF-chunk-walking
    parser (multimodal.decode_wav); RMS from an exact int64
    sum-of-squares. Oracle recomputes sample_rate/channels/n_frames/rms
    closed-form from doc_id."""
    from jsonschema_spark.operators.multimodal import (
        attach_synth_blob,
        decode_audio,
        make_wav,
    )

    df = attach_synth_blob(_t(spark, sf_dir, "documents"), "doc_id", make_wav)
    return decode_audio(df).select(
        "doc_id",
        "sample_rate",
        "channels",
        "n_frames",
        F.round("rms", 6).alias("rms"),
    )


def q_image_ahash_near_dup(spark, sf_dir):
    """Perceptual-hash (aHash) image near-dup: synthesize the closed-form
    BMPs, hash each onto a fixed 4x8 grid binarized against the global
    mean (multimodal.ahash_bmp — exact integer comparison, no float
    threshold), then emit Hamming<=1 pairs via pigeonhole chunk buckets +
    bit_count verify (multimodal.phash_near_dup — same scale shape as
    simhash_near_dup: candidates from bucket self-join, never all pairs).
    The DuckDB oracle recomputes the 32-bit hash closed-form from doc_id
    with nested list comprehensions and brute-force joins — an
    independent re-derivation of both the decoder-side hash and the
    blocking correctness (the blocked pair set must equal the exhaustive
    Hamming<=1 pair set)."""
    from jsonschema_spark.operators.multimodal import (
        attach_synth_blob,
        make_bmp,
        perceptual_hashes,
        phash_near_dup,
    )

    df = attach_synth_blob(_t(spark, sf_dir, "documents"), "doc_id", make_bmp)
    hashes = perceptual_hashes(df, "doc_id", "blob")
    return phash_near_dup(hashes, max_hamming=1, hash_bits=32)


def q_image_ahash_groups(spark, sf_dir):
    """Exact perceptual-dup groups over the image aHash: (phash, n_docs,
    keep_id) for hashes shared by more than one image, keep-first. One
    groupBy on a 32-bit integer key — dedup_exact's scale shape applied
    to decoded-image identity instead of byte identity."""
    from jsonschema_spark.operators.multimodal import (
        attach_synth_blob,
        make_bmp,
        perceptual_hashes,
        phash_dup_groups,
    )

    df = attach_synth_blob(_t(spark, sf_dir, "documents"), "doc_id", make_bmp)
    return phash_dup_groups(perceptual_hashes(df, "doc_id", "blob"))


def q_audio_fingerprint_groups(spark, sf_dir):
    """Audio near-copy groups via the sign-of-first-difference
    fingerprint (multimodal.fingerprint_wav): bit i = sample[i+1] >
    sample[i] over the first 32 deltas — gain/DC-invariant, exact in
    integers, recomputable closed-form by the oracle from make_wav's
    sample formula. Grouping shape identical to phash_dup_groups."""
    from jsonschema_spark.operators.multimodal import (
        attach_synth_blob,
        fingerprint_wav,
        make_wav,
        perceptual_hashes,
        phash_dup_groups,
    )

    df = attach_synth_blob(_t(spark, sf_dir, "documents"), "doc_id", make_wav)
    hashes = perceptual_hashes(df, "doc_id", "blob", hasher=fingerprint_wav)
    return phash_dup_groups(hashes)


def q_url_dedup_groups(spark, sf_dir):
    """URL-level dedup after canonicalization (RefinedWeb keeps one doc
    per canonical URL): messy URLs are synthesized closed-form from
    doc_id (functions/url.py::synth_url — scheme/case/port/www/utm/
    slash/fragment variants on residues), normalized by the pure-Column
    canonicalizer (url_normalize), and grouped. The DuckDB oracle
    rebuilds the same messy strings from doc_id and replays every
    normalization rule with the same RE2-safe regexes — an end-to-end
    cross-engine check on the canonicalizer, no URL column needed in the
    test data. Pure codegen projection + one groupBy; scales like
    dedup_exact."""
    from jsonschema_spark.functions.url import synth_url, url_normalize

    df = _t(spark, sf_dir, "documents")
    return (
        df.select(
            F.col("doc_id"),
            url_normalize(synth_url(F.col("doc_id"))).alias("url"),
        )
        .groupBy("url")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("keep_id"))
        .filter(F.col("n_docs") > 1)
    )


def q_url_content_conflicts(spark, sf_dir):
    """Crawl QA: canonical URLs whose documents disagree in CONTENT (same
    page fetched with different payloads — staleness, soft-404s, A/B
    shells): per conflicting URL, doc count, distinct content
    fingerprints, and the keeper. Same synthesized-URL canonicalizer
    contract as url_dedup_groups; fingerprint = md5 of the normalized
    text."""
    from jsonschema_spark.functions.text import fingerprint
    from jsonschema_spark.functions.url import synth_url, url_normalize

    df = _t(spark, sf_dir, "documents")
    return (
        df.select(
            "doc_id",
            url_normalize(synth_url(F.col("doc_id"))).alias("url"),
            fingerprint(F.col("text")).alias("fp"),
        )
        .groupBy("url")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("fp").alias("n_variants"),
            F.min("doc_id").alias("keep_id"),
        )
        .filter(F.col("n_variants") > 1)
    )


def q_key_skew_profile(spark, sf_dir):
    """Pre-flight skew check for a join/groupBy key: rows-per-key
    distribution of lineitem.l_orderkey (the engine's salting decisions
    start here — skew_ratio near 1 means plain hash partitioning
    balances)."""
    from jsonschema_spark.operators.checks import key_skew_profile

    df = _t(spark, sf_dir, "lineitem")
    return key_skew_profile(df, "l_orderkey")


def q_domain_cap(spark, sf_dir):
    """Per-registered-domain document cap (k=3, ordered by doc_id) — the
    host-share bound every crawl mixture applies so one domain cannot
    swamp training. Domain comes from the canonicalized host
    (functions/url.py::url_domain, two-label rule); the cap reuses
    sampling.cap_per_group (one shuffle on the domain key, row_number
    window). Returns the kept (domain, doc_id) rows; the oracle replays
    the same window."""
    from jsonschema_spark.functions.url import synth_url, url_domain
    from jsonschema_spark.operators.sampling import cap_per_group

    df = _t(spark, sf_dir, "documents").select(
        "doc_id", url_domain(synth_url(F.col("doc_id"))).alias("domain")
    )
    return cap_per_group(df, "domain", k=3, order_col="doc_id").select(
        "domain", "doc_id"
    )


def _manifest_corpus_path() -> str:
    """Stable multi-file parquet fixture for the shard-manifest check —
    written once by Spark (4 hash-partitioned shards), read by both
    engines (same pattern as _token_corpus_path)."""
    import os

    cache = os.environ.get("BENCH_CACHE_DIR", "/tmp/jsonschema_spark_bench")
    return os.path.join(cache, "manifest_corpus_2k_seed3.parquet")


def _manifest_corpus(spark):
    import os

    path = _manifest_corpus_path()
    if not os.path.isdir(path):
        df = spark.range(2000).select(
            F.col("id").alias("doc_id"),
            F.md5(F.concat(F.lit("3:"), F.col("id").cast("string"))).alias(
                "payload"
            ),
            F.pmod(F.col("id"), F.lit(7)).alias("grp"),
        )
        df.repartition(4, "grp").write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def _manifest_corpus_b_path() -> str:
    import os

    cache = os.environ.get("BENCH_CACHE_DIR", "/tmp/jsonschema_spark_bench")
    return os.path.join(cache, "manifest_corpus_2k_seed3_corrupt.parquet")


def _manifest_corpus_b(spark):
    """The manifest fixture with doc 7's payload silently corrupted —
    same 4-way grp-hash partitioning, so per-shard id ranges are stable
    and min_id identifies shards across the two independent writes."""
    import os

    path = _manifest_corpus_b_path()
    if not os.path.isdir(path):
        df = spark.range(2000).select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") == 7, F.lit("CORRUPT"))
            .otherwise(
                F.md5(F.concat(F.lit("3:"), F.col("id").cast("string")))
            )
            .alias("payload"),
            F.pmod(F.col("id"), F.lit(7)).alias("grp"),
        )
        df.repartition(4, "grp").write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def q_manifest_diff(spark, sf_dir):
    """Backup/sync integrity audit: diff the shard manifest of a corpus
    against a rewrite with one silently corrupted row — keyed by min_id
    (stable id ranges across independent writes); exactly the shard
    holding doc 7 reports 'changed', the rest 'ok'."""
    from jsonschema_spark.operators.checks import manifest_diff, shard_manifest

    cur = shard_manifest(_manifest_corpus_b(spark), "doc_id")
    base = shard_manifest(_manifest_corpus(spark), "doc_id")
    return manifest_diff(cur, base, key="min_id")


def q_classifier_eval(spark, sf_dir):
    """Filter-QA gate: exact tie-corrected AUC + Brier + accuracy of a
    length-based score (least(n_chars/600, 1), rounded 6) predicting
    lang='en' — integer-derived scores exercise the tie correction.
    AUC computes over the DISTINCT-score histogram, never a global
    sort."""
    from jsonschema_spark.operators.checks import classifier_eval

    df = _t(spark, sf_dir, "documents").select(
        F.round(
            F.least(F.col("n_chars") / F.lit(600.0), F.lit(1.0)), 6
        ).alias("score"),
        (F.col("lang") == "en").cast("int").alias("label"),
    )
    return classifier_eval(df, "score", "label", threshold=0.5)


def q_shard_manifest(spark, sf_dir):
    """Content-addressed shard manifest: per physical parquet file, row
    count, id range, and an order-invariant XOR content checksum — the
    file-integrity check that localizes a corrupted / truncated /
    re-encoded shard without re-reading healthy ones. Oracle reads the
    same files with filename=true and replays the identical hash."""
    from jsonschema_spark.operators.checks import shard_manifest

    df = _manifest_corpus(spark)
    return shard_manifest(df, "doc_id")


def q_id_gap_audit(spark, sf_dir):
    """Per-source id-completeness audit (checks.id_gap_audit): sources
    stride doc_id by 20 in the testdata; deterministic drops are injected
    (doc_id % 97 == 5 removed — a 'lost batch') so every source reports
    real breaks and missing counts. The oracle replays the lag-window
    stride inference and gap accounting."""
    from jsonschema_spark.operators.checks import id_gap_audit

    df = _t(spark, sf_dir, "documents").filter(F.pmod(F.col("doc_id"), 97) != 5)
    return id_gap_audit(df, "doc_id", "source")


def _decorated_text() -> Column:
    """documents.text with deterministic multi-script / mojibake
    decorations keyed on doc_id residues, so every script bucket and
    damage signal has positive AND negative coverage in the driver gate
    (the synthetic corpus itself is pure ASCII) — same synthesize-in-the-
    query pattern as q_c4_clean."""
    did = F.col("doc_id")
    return F.concat(
        F.col("text"),
        F.when(F.pmod(did, F.lit(3)) == 0, F.lit(" привет мир")).otherwise(F.lit("")),
        F.when(F.pmod(did, F.lit(5)) == 0, F.lit(" 你好世界")).otherwise(F.lit("")),
        F.when(F.pmod(did, F.lit(7)) == 0, F.lit(" κόσμος")).otherwise(F.lit("")),
        F.when(F.pmod(did, F.lit(11)) == 0, F.lit(" �\x07")).otherwise(F.lit("")),
        F.when(F.pmod(did, F.lit(13)) == 0, F.lit(" 한국어")).otherwise(F.lit("")),
        F.when(F.pmod(did, F.lit(17)) == 0, F.lit(" مرحبا")).otherwise(F.lit("")),
    )


def q_script_mojibake(spark, sf_dir):
    """Per-document Unicode script profile + encoding-damage signals
    (replacement chars U+FFFD, C0 controls, non-ASCII ratio) — the
    mojibake/script QA pass every web-crawl pipeline runs before language
    routing. Pure scan-stage char-class counting, zero shuffle; explicit
    code-point ranges so Java regex and DuckDB RE2 read the identical
    pattern."""
    from jsonschema_spark.functions.text import (
        CONTROL_CLASS,
        NON_ASCII_CLASS,
        REPLACEMENT_CLASS,
        SCRIPT_RANGES,
        char_class_count,
        dominant_script,
    )

    df = _t(spark, sf_dir, "documents").select("doc_id", _decorated_text().alias("t"))
    t = F.col("t")
    return df.select(
        "doc_id",
        *[
            char_class_count(t, pat).alias(name)
            for name, pat in sorted(SCRIPT_RANGES.items())
        ],
        char_class_count(t, REPLACEMENT_CLASS).alias("replacement_chars"),
        char_class_count(t, CONTROL_CLASS).alias("control_chars"),
        F.when(
            F.length(t) > 0,
            F.round(char_class_count(t, NON_ASCII_CLASS) / F.length(t), 6),
        ).alias("non_ascii_ratio"),
        dominant_script(t).alias("dominant_script"),
    )


def q_classifier_score(spark, sf_dir):
    """fastText-style hashed-bag-of-words linear classifier scoring (the
    serving pass of the standard quality/toxicity classifier stage) with
    the frozen hash-derived surrogate weight table — fully deterministic,
    reproduced closed-form by the DuckDB oracle."""
    from jsonschema_spark.functions.text import hashed_classifier_score

    df = _t(spark, sf_dir, "documents")
    return df.select(
        "doc_id", hashed_classifier_score(F.col("text")).alias("clf_score")
    )


def q_corpus_overlap(spark, sf_dir):
    """Corpus-level content overlap between a snapshot slice (doc_id % 3
    != 0) and the full corpus: MinHash-signature Jaccard estimate
    (Broder 1997; one O(n_perm)-state agg per side) next to the exact
    distinct-fingerprint Jaccard — the content-drift axis PSI/chi-square
    histograms cannot see (a refresh that swaps documents but keeps the
    token distribution is invisible to PSI, fully visible here)."""
    from jsonschema_spark.operators.drift import corpus_minhash_overlap

    df = _t(spark, sf_dir, "documents")
    current = df.filter(F.pmod(F.col("doc_id"), F.lit(3)) != 0)
    return corpus_minhash_overlap(current, df, n_perm=64)


def q_token_ngram_diversity(spark, sf_dir):
    """Distinct-bigram fraction directly on the pre-tokenized sequences
    (token-native repetition signal — Rae et al. 2021 §A1.1 duplicate-
    n-gram family without detokenizing). Exact comma-joined grams, zero
    shuffle, zero Python."""
    from jsonschema_spark.operators.stats import token_ngram_diversity

    return token_ngram_diversity(_token_corpus(spark), n=2)


def _decorated_tokens() -> Column:
    """Token-corpus decoration for the structure-validation queries: the
    raw corpus has no special tokens, so this synthesizes the full truth
    table deterministically on doc_id residues (same pattern as
    q_script_mojibake): base ids shift to [10, 509] (clear of specials),
    BOS dropped at %7, EOS dropped at %5, an interior PAD injected at %13,
    an out-of-vocab id at %11. Mirrored verbatim in the DuckDB oracles."""
    did = F.col("doc_id")
    empty = F.array().cast("array<int>")

    def _maybe(cond, val):
        return F.when(cond, F.array(F.lit(val).cast("int"))).otherwise(empty)

    return F.concat(
        _maybe(F.pmod(did, F.lit(7)) != 0, 1),
        F.transform(F.col("tokens"), lambda t: t + F.lit(10)),
        _maybe(F.pmod(did, F.lit(13)) == 0, 0),
        _maybe(F.pmod(did, F.lit(11)) == 0, 99999),
        _maybe(F.pmod(did, F.lit(5)) != 0, 2),
    )


def q_sequence_structure(spark, sf_dir):
    """Per-sequence structural validation (BOS/EOS placement, interior
    special tokens, vocab range) — the token-payload accept/reject walk
    over the residue-decorated corpus (see _decorated_tokens)."""
    from jsonschema_spark.operators.checks import sequence_structure

    df = _token_corpus(spark)
    return sequence_structure(
        df.select("doc_id", _decorated_tokens().alias("tokens")),
        vocab_size=32_000,
    )


def q_repair_sequences(spark, sf_dir):
    """Fix-mode twin of q_sequence_structure over the same decorated
    corpus: strip misplaced markers, remap OOV to unk, re-frame with
    BOS/EOS; the repaired output passes sequence_structure by construction
    (property-pinned in tests). Every repaired array fingerprint-verified
    by the oracle."""
    from jsonschema_spark.operators.checks import repair_sequences
    from jsonschema_spark.operators.dedup import token_content_hash

    df = _token_corpus(spark)
    out = repair_sequences(
        df.select("doc_id", _decorated_tokens().alias("tokens")),
        vocab_size=32_000,
    )
    return out.select(
        "doc_id",
        token_content_hash(F.col("tokens")).alias("repaired_fp"),
        "n_stripped",
        "n_remapped",
        "changed",
    )


def q_zipf_slope(spark, sf_dir):
    """Per-source Zipf fit (OLS of ln freq ~ ln rank over the top-200
    token ids) — the one-number distributional fingerprint per source;
    slope drift flags sources gone unnaturally uniform or template-heavy.
    Sources derived as doc_id mod 3 (the token corpus has no source
    column; the derivation is mirrored in the oracle)."""
    from jsonschema_spark.operators.stats import zipf_slope

    df = _token_corpus(spark).withColumn(
        "source", F.pmod(F.col("doc_id"), F.lit(3)).cast("string")
    )
    return zipf_slope(df, group_col="source", top_v=200)


def q_token_prefix_dups(spark, sf_dir):
    """Shared-prefix duplicate groups (identical first 16 tokens) — the
    truncation-artifact detector exact dedup and shingle-Jaccard both
    miss; n_distinct_full separates exact copies from truncation/extension
    variants. One groupBy on a uniform md5 key."""
    from jsonschema_spark.operators.dedup import token_prefix_dups

    return token_prefix_dups(_token_corpus(spark), k=16)


def q_pii_redact(spark, sf_dir):
    """Span-level PII redaction over the injected-PII corpus — the rewrite
    stage after pii_scan's detection pass; typed placeholders, counts from
    the original text. Chain of native regexp_replace in one scan-stage
    projection."""
    import os

    from jsonschema_spark.operators.cleaning import pii_redact
    from jsonschema_spark.sources.corpus import pii_corpus

    path = _pii_corpus_path()
    if not os.path.isdir(path):
        pii_corpus(spark, 2_000, seed=9).write.mode("overwrite").parquet(path)
    return pii_redact(spark.read.parquet(path))


def q_cross_source_dups(spark, sf_dir):
    """Cross-source duplication matrix over the token corpus (sources
    derived as doc_id mod 3, mirrored in the oracle): distinct content
    fingerprints shared by each unordered source pair. collect_set is
    bounded by the source registry, never by duplicate count."""
    from jsonschema_spark.operators.dedup import (
        cross_source_dups,
        token_content_hash,
    )

    df = _token_corpus(spark).withColumn(
        "source", F.pmod(F.col("doc_id"), F.lit(3)).cast("string")
    )
    return cross_source_dups(
        df, fingerprint=token_content_hash(F.col("tokens"))
    )


def q_vocab_prune(spark, sf_dir):
    """Min-count vocabulary pruning with dense frequency-rank re-ids
    applied scan-stage through a guarded map literal; output is the
    remapped-array fingerprint + per-doc OOV count so the oracle verifies
    every position of every rewritten sequence."""
    from jsonschema_spark.operators.dedup import token_content_hash
    from jsonschema_spark.operators.vocab import prune_vocab

    out = prune_vocab(_token_corpus(spark), min_count=150)
    return out.select(
        "doc_id",
        token_content_hash(F.col("tokens")).alias("remap_fp"),
        "n_oov",
    )


def q_chunk_sequences(spark, sf_dir):
    """Sliding context-window chunking (max 48, stride 32) of the token
    corpus — the windowing transform every trainer applies to over-length
    documents; every chunk's content is fingerprint-verified by the
    oracle, which replays the window arithmetic in SQL."""
    from jsonschema_spark.operators.dedup import token_content_hash
    from jsonschema_spark.operators.packing import chunk_sequences

    out = chunk_sequences(_token_corpus(spark), max_len=48, stride=32)
    return out.select(
        "id",
        "chunk_idx",
        token_content_hash(F.col("tokens")).alias("chunk_fp"),
        "n_tok",
    )


def q_dup_gram_scale(spark, sf_dir):
    """Dyadic longest-duplicated-n-gram bracket per sequence — the
    severity axis of the duplicate-n-gram family (how LONG the repeats
    run, not just how much repeats); pure scan-stage probes."""
    from jsonschema_spark.operators.stats import dup_gram_scale

    return dup_gram_scale(_token_corpus(spark))


def q_bigram_ppl(spark, sf_dir):
    """Bigram-LM perplexity of every non-reference sequence against the
    add-k conditionals trained on the doc_id%5==0 reference slice — the
    model-order step from unigram toward CCNet's KenLM, token-native."""
    from jsonschema_spark.operators.relevance import bigram_perplexity

    df = _token_corpus(spark)
    return bigram_perplexity(df, F.pmod(F.col("doc_id"), F.lit(5)) == 0)


def q_trigram_sbo(spark, sf_dir):
    """Stupid-Backoff trigram scoring (Brants et al. 2007) of every
    non-reference sequence against raw trigram/bigram/unigram counts from
    the doc_id%5==0 reference slice — the web-scale LM ranker (pure
    counting, fixed backoff penalty, no discount tuning), one model order
    above bigram_ppl. Reports backoff-tier hit counts alongside the mean
    negative log score."""
    from jsonschema_spark.operators.relevance import trigram_stupid_backoff

    df = _token_corpus(spark)
    return trigram_stupid_backoff(df, F.pmod(F.col("doc_id"), F.lit(5)) == 0)


def q_stratified_split(spark, sf_dir):
    """Exact-quota stratified train/val/test split of documents by source
    (80/10/10): within every source, docs ordered by portable id hash,
    first 80% to train — every stratum within one row of target
    proportions, byte-identical across partitionings and engines."""
    from jsonschema_spark.operators.sampling import stratified_split

    df = _t(spark, sf_dir, "documents")
    return stratified_split(df, "source", "doc_id", 80, 10)


def q_vocab_richness(spark, sf_dir):
    """Good-Turing coverage + bias-corrected Chao1 unseen-vocabulary
    estimate from the frequency-of-frequencies spectrum of the token
    corpus — the 'is more crawl still buying vocabulary?' one-row
    planning answer."""
    from jsonschema_spark.operators.stats import vocab_richness

    return vocab_richness(_token_corpus(spark))


def q_vocab_diversity(spark, sf_dir):
    """Per-source Hill-number diversity ladder (vocab, exp-Shannon,
    inverse-Simpson) over the token corpus with a 4-way pseudo-source —
    the effective-vocabulary fingerprint for comparing mixture
    components; hill2 is an exact integer ratio for cross-engine parity."""
    from jsonschema_spark.operators.stats import vocab_diversity

    df = _token_corpus(spark).select(
        F.pmod(F.col("doc_id"), F.lit(4)).cast("string").alias("src4"),
        "tokens",
    )
    return vocab_diversity(df, "src4")


def q_embedding_quant_qa(spark, sf_dir):
    """Per-dimension int8 linear-quantization QA over the embeddings
    table: min/max calibration, scale, and round-trip reconstruction
    error per dimension — the audit before switching a 10^12-vector
    index to int8 storage. No explode: two map-side-combined aggs of
    2·dim element_at expressions each."""
    from jsonschema_spark.operators.similarity import embedding_quant_qa

    return embedding_quant_qa(_t(spark, sf_dir, "embeddings"), "embedding")


def q_split_leakage_audit(spark, sf_dir):
    """Cross-split near-duplicate leakage audit — the check a corpus owner
    runs BEFORE training to see why naive hash splitting is not enough:
    exact-verified MinHash near-dup pairs (token 3-gram Jaccard >= 0.8)
    joined against a zero-shuffle 80/10/10 hash split, aggregated to the
    (split, split) pair matrix. Off-diagonal rows are train/eval
    contamination that leakage_safe_split (which routes whole duplicate
    components to one split) would eliminate. AQE broadcasts the small
    pair table against the split assignment."""
    from jsonschema_spark.operators.dedup import minhash_near_dup
    from jsonschema_spark.operators.sampling import stratified_split

    df = _token_corpus(spark)
    pairs = minhash_near_dup(
        df, "doc_id", "tokens", threshold=0.8,
        elements=F.col("tokens"), shingle_sep=",",
    )
    splits = stratified_split(
        df.withColumn("_one", F.lit("all")), "_one", "doc_id",
        80, 10, exact=False,
    )
    sa = splits.select(F.col("doc_id").alias("id_a"), F.col("split").alias("sa"))
    sb = splits.select(F.col("doc_id").alias("id_b"), F.col("split").alias("sb"))
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            F.least("sa", "sb").alias("split_a"),
            F.greatest("sa", "sb").alias("split_b"),
        )
        .groupBy("split_a", "split_b")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


def q_unimax_alloc(spark, sf_dir):
    """UniMax epoch-capped uniform budget allocation (Chung et al. 2023)
    over the same skewed 3-way pseudo-source derivation temperature_mix
    uses (doc_id%7 → 4/7, 2/7, 1/7): budget 600 docs, 2-epoch cap — the
    small source caps out, its refused budget spills uniformly onto the
    other two. Integer-exact waterfilling."""
    from jsonschema_spark.operators.sampling import unimax_alloc

    df = _t(spark, sf_dir, "documents").select(
        F.when(F.pmod(F.col("doc_id"), 7) < 4, F.lit("a"))
        .when(F.pmod(F.col("doc_id"), 7) < 6, F.lit("b"))
        .otherwise(F.lit("c"))
        .alias("src3")
    )
    return unimax_alloc(df, "src3", budget=600, epoch_cap=2)


def q_padding_waste(spark, sf_dir):
    """Length-bucketed padding-waste decision table over the token corpus
    (max_len 96, bucket width 16): pad tokens burned by pad-to-max vs
    pad-to-bucket-longest per bucket — the planning report a trainer reads
    before choosing padding, bucketing, or packing. Reads only sequence
    lengths; one tiny groupBy."""
    from jsonschema_spark.operators.packing import padding_waste

    df = _token_corpus(spark).select(F.size("tokens").alias("n_tok"))
    return padding_waste(df, "n_tok", max_len=96, bucket_width=16)


def q_vocab_coverage(spark, sf_dir):
    """Token-mass coverage of the top-k vocabulary ids (k = 10/50/200)
    over the token corpus — the vocab-size headroom curve; ranking and
    cumulative sums run over ≤ |vocab| rows, never the corpus."""
    from jsonschema_spark.operators.stats import vocab_coverage

    return vocab_coverage(_token_corpus(spark), ks=(10, 50, 200))


def q_embedding_norm_qa(spark, sf_dir):
    """Per-vector embedding QA (NaN/zero/ragged-dimension detection) —
    the gate every similarity/ANN pass needs before trusting cosine.
    The testdata vectors are clean, so damage is injected deterministically
    on vec_id residues (zero vector at %13, truncated dim at %17, NaN
    first element at %19), mirrored in the oracle."""
    from jsonschema_spark.operators.similarity import embedding_norm_qa

    df = _t(spark, sf_dir, "embeddings")
    vid = F.col("vec_id")
    v = F.col("embedding")
    damaged = (
        F.when(F.pmod(vid, F.lit(13)) == 0, F.transform(v, lambda x: F.lit(0.0).cast("float")))
        .when(F.pmod(vid, F.lit(17)) == 0, F.slice(v, 1, 63))
        .when(
            F.pmod(vid, F.lit(19)) == 0,
            F.concat(
                F.array(F.lit(float("nan")).cast("float")), F.slice(v, 2, 63)
            ),
        )
        .otherwise(v)
    )
    return embedding_norm_qa(
        df.select("vec_id", damaged.alias("embedding")), expected_dim=64
    )


def q_structure_scorecard(spark, sf_dir):
    """Per-source structure-violation scorecard: sequence_structure
    verdicts rolled up through Wilson confidence bounds (source derived as
    doc_id mod 3) — the acceptance-gate view a corpus owner actually
    reads; composition of two already-proven operators."""
    from jsonschema_spark.operators.checks import (
        sequence_structure,
        wilson_rates,
    )

    df = _token_corpus(spark)
    verdicts = sequence_structure(
        df.select("doc_id", _decorated_tokens().alias("tokens")),
        vocab_size=32_000,
    ).withColumn("source", F.pmod(F.col("doc_id"), F.lit(3)).cast("string"))
    return wilson_rates(verdicts, "source", ~F.col("structure_ok"))


def q_winnow_dups(spark, sf_dir):
    """Winnowing-fingerprint near-copy pairs (Schleimer et al. MOSS
    sketch) over documents — verbatim-passage overlap below any Jaccard
    threshold. Fingerprints come from the vectorized Arrow kernel
    (dedup.winnow_fingerprint_rows): a polynomial rolling k-gram hash
    over unicode codepoints, mod 2^64 then masked to 60 bits, so the
    DuckDB oracle replays every window minimum with plain hugeint
    arithmetic; doc-frequency ceiling keeps template fingerprints out of
    the pair join."""
    from jsonschema_spark.operators.dedup import winnow_near_dup

    df = _t(spark, sf_dir, "documents")
    return winnow_near_dup(df, k=12, window=8, min_shared=3, max_doc_freq=64)


def q_temperature_mix(spark, sf_dir):
    """Temperature-based source re-mixing (p_g ∝ count_g^0.5) over a
    deterministically skewed 4:2:1 source derivation — the multilingual
    up/down-sampling rule; membership is content-addressed, so the oracle
    recomputes the identical sample from the same counts."""
    from jsonschema_spark.operators.sampling import temperature_mix

    df = _t(spark, sf_dir, "documents").withColumn(
        "src3",
        F.when(F.pmod(F.col("doc_id"), F.lit(7)) < 4, F.lit("a"))
        .when(F.pmod(F.col("doc_id"), F.lit(7)) < 6, F.lit("b"))
        .otherwise(F.lit("c")),
    )
    return temperature_mix(df, "src3", "doc_id", alpha=0.5).select(
        "doc_id", "src3"
    )


def q_positional_entropy(spark, sf_dir):
    """Per-position token entropy over the first 32 positions of the
    token corpus with an injected 3-token template header — the frozen-
    prefix detector (cross-document signal at a fixed position that
    within-document repetition metrics cannot see): positions 1-3 read
    entropy 0, the organic tail reads ~ln(vocab-coverage).

    decimals=4, not the repo-default 6: entropy sums up to vocab-sized
    count sets per position, and Spark's vs DuckDB's FP summation order
    disagrees in the 6th decimal at the driver's sf0.01
    (CORRECTNESS_r04 hash mismatch)."""
    from jsonschema_spark.operators.stats import positional_entropy

    df = _token_corpus(spark).select(
        "doc_id",
        F.concat(
            F.array(F.lit(7).cast("int"), F.lit(8).cast("int"),
                    F.lit(9).cast("int")),
            F.col("tokens"),
        ).alias("tokens"),
    )
    return positional_entropy(df, max_pos=32, decimals=4)


def q_bigram_pmi(spark, sf_dir):
    """Top token-bigram collocations by PMI over the token corpus — the
    segmentation/merge-candidate signal BPE merges maximize; counts are
    exact, ranking totally ordered (rounded pmi desc, tok_a, tok_b) so the
    top-k cut is engine-stable."""
    from jsonschema_spark.operators.stats import bigram_pmi

    return bigram_pmi(_token_corpus(spark), min_count=3, top_k=50)


def q_component_size_hist(spark, sf_dir):
    """Near-dup cluster-size distribution — the dedup-policy dial: a
    heavy-tailed histogram (one mega-component) means keep-one-per-cluster
    is about to delete a corpus slice through boilerplate, a cleaning
    problem. Oracle: the dup_components recursive-CTE closure + two
    GROUP BYs."""
    from jsonschema_spark.operators.components import component_size_histogram

    return component_size_histogram(_minhash_pairs(spark, sf_dir))


def q_containment_dups(spark, sf_dir):
    """Asymmetric (containment) near-dup pairs: C = shared 5-grams /
    min-side gram count >= 0.8 — the wrapper/superset duplicates symmetric
    Jaccard misses (A ⊂ B at 4x length is J=0.25 but C=1.0; Broder 1997).
    Integer threshold arithmetic (10*shared >= 8*min) so the boundary is
    engine-exact. Oracle: unnest-join candidate prefilter + list_intersect
    over candidates only."""
    from jsonschema_spark.operators.dedup import containment_pairs

    df = _t(spark, sf_dir, "documents")
    return containment_pairs(df, "doc_id", "text", n=5, threshold_tenths=8)


def q_token_burstiness(spark, sf_dir):
    """Variance-to-mean ratio (Church & Gale burstiness) of per-doc counts
    for the 20 head tokens: VMR ≈ 1 is Poisson-ish (function words),
    VMR >> 1 is bursty (topical/template) — a template-dominated head is a
    cleaning signal marginal frequencies can't show. Zeros handled in
    closed form (mean = total/N, var = Σc²/N − mean²), so only occurrences
    ever materialize."""
    from jsonschema_spark.operators.stats import token_burstiness

    return token_burstiness(
        _t(spark, sf_dir, "documents"), "text", "doc_id", top_k=20
    )


def q_doremi_weights(spark, sf_dir):
    """One DoReMi-style (Xie et al. 2023) mixture-reweighting step over
    sources: w_s ∝ share_s * exp(avg_score_s / T) with score =
    ln(1 + n_chars) as the stand-in per-doc signal, T=1. Corpus reduces to
    |sources| rows in one agg; both normalizations are 1-row broadcast
    cross-joins."""
    from jsonschema_spark.operators.sampling import doremi_weights

    df = _t(spark, sf_dir, "documents").withColumn(
        "score", F.log(F.lit(1.0) + F.col("n_chars").cast("double"))
    )
    return doremi_weights(df, "source", "score", temperature=1.0)


def _rollout_specs() -> tuple[dict, dict]:
    """v1 = the flagship corpus contract's row-level checks; v2 = the
    next contract revision: n_tok ceiling tightened 2048 → 1024 and the
    len-consistency row check dropped (the new ingest recomputes n_tok
    itself) — a tighten + a loosen, so every transition cell is
    exercised."""
    from jsonschema_spark.sources.corpus import MAX_TOKENS, VOCAB_SIZE

    v1 = {
        "columns": {
            "doc_id": {"type": "string", "pattern": "^doc-[0-9]{12}$"},
            "tokens": {
                "type": "array",
                "minItems": 1,
                "items": {
                    "type": "integer",
                    "minimum": 0,
                    "maximum": VOCAB_SIZE - 1,
                },
            },
            "n_tok": {"type": "integer", "minimum": 1, "maximum": MAX_TOKENS},
        },
        "required": ["doc_id", "tokens", "n_tok", "source"],
        "row_checks": {"len_consistent": "n_tok = size(tokens)"},
    }
    v2 = {
        "columns": {
            "doc_id": v1["columns"]["doc_id"],
            "tokens": v1["columns"]["tokens"],
            "n_tok": {"type": "integer", "minimum": 1, "maximum": 1024},
        },
        "required": v1["required"],
    }
    return v1, v2


def _materialized_corpus(spark):
    import os

    from jsonschema_spark.sources.corpus import corpus

    path = _corpus_oracle_path()
    if not os.path.isdir(path):
        corpus(spark, 50_000, seed=42).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def _rollout_check_sql() -> dict:
    """DuckDB twins of the v1 row-level checks, keyed by the compiler's
    check names (same expressions as _corpus_validate_oracle_sql)."""
    from jsonschema_spark.sources.corpus import MAX_TOKENS, VOCAB_SIZE

    return {
        "col_doc_id": (
            "(doc_id IS NULL OR regexp_matches(doc_id, '^doc-[0-9]{12}$'))"
        ),
        "col_tokens": (
            "(tokens IS NULL OR (len(tokens) >= 1 AND len(list_filter(tokens,"
            f" t -> t < 0 OR t > {VOCAB_SIZE - 1})) = 0))"
        ),
        "col_n_tok": f"(n_tok IS NULL OR (n_tok >= 1 AND n_tok <= {MAX_TOKENS}))",
        "required_doc_id": "(doc_id IS NOT NULL)",
        "required_tokens": "(tokens IS NOT NULL)",
        "required_n_tok": "(n_tok IS NOT NULL)",
        "required_source": "(source IS NOT NULL)",
        "row_len_consistent": "(n_tok = len(tokens))",
    }


def _spec_rollout_oracle_sql() -> str:
    ok = _rollout_check_sql()
    tbl = f"read_parquet('{_corpus_oracle_path()}/*.parquet')"
    v1 = " AND ".join(ok.values())
    v2 = " AND ".join(
        "(n_tok IS NULL OR (n_tok >= 1 AND n_tok <= 1024))"
        if name == "col_n_tok"
        else expr
        for name, expr in ok.items()
        if name != "row_len_consistent"
    )
    return (
        f"WITH t AS (SELECT source, {v1} AS v1, {v2} AS v2 FROM {tbl})"
        ' SELECT source AS "group", count(*) AS n,'
        " count(*) FILTER (WHERE v1 AND v2) AS pass_pass,"
        " count(*) FILTER (WHERE v1 AND NOT v2) AS pass_fail,"
        " count(*) FILTER (WHERE NOT v1 AND v2) AS fail_pass,"
        " count(*) FILTER (WHERE NOT v1 AND NOT v2) AS fail_fail,"
        " round(count(*) FILTER (WHERE v1 AND NOT v2)"
        "   / CAST(count(*) AS DOUBLE), 6) AS break_rate"
        " FROM t GROUP BY source"
    )


def _violation_cooccur_oracle_sql() -> str:
    from jsonschema_spark.sources.corpus import VOCAB_SIZE

    ok = _rollout_check_sql()
    ok["col_tokens"] = (
        "(tokens IS NULL OR (len(tokens) >= 1 AND len(tokens) <= 2000"
        " AND len(list_filter(tokens,"
        f" t -> t < 0 OR t > {VOCAB_SIZE - 1})) = 0))"
    )
    tbl = f"read_parquet('{_corpus_oracle_path()}/*.parquet')"
    cases = ", ".join(
        f"CASE WHEN NOT {expr} THEN '{name}' END" for name, expr in ok.items()
    )
    return (
        f"WITH f AS (SELECT list_filter([{cases}], x -> x IS NOT NULL)"
        f"  AS fl FROM {tbl}),"
        " g AS (SELECT fl FROM f WHERE len(fl) >= 2),"
        " p AS (SELECT a.u AS check_a, b.u AS check_b"
        "  FROM g, unnest(g.fl) AS a(u), unnest(g.fl) AS b(u)"
        "  WHERE a.u < b.u)"
        " SELECT check_a, check_b, count(*) AS n_docs"
        " FROM p GROUP BY check_a, check_b"
    )


def q_spec_rollout(spark, sf_dir):
    """Pre-rollout audit of a contract change: validate the corpus against
    spec v1 AND v2 in ONE scan (both compiled to native Columns in the
    same codegen projection) and emit the per-source pass/fail transition
    matrix — pass_fail is the rollout blast radius, fail_pass the checks
    the revision silently loosened. Shuffle is O(sources)."""
    from jsonschema_spark.plans.plan import TableSpec, compile_table_spec
    from jsonschema_spark.plans.rollout import spec_rollout_audit

    df = _materialized_corpus(spark)
    v1, v2 = _rollout_specs()
    p1 = compile_table_spec(TableSpec.from_dict(v1), df.schema)
    p2 = compile_table_spec(TableSpec.from_dict(v2), df.schema)
    return spec_rollout_audit(df, p1, p2, group_col="source")


def q_violation_cooccur(spark, sf_dir):
    """Root-cause view of a validation run: which checks fail TOGETHER
    (injected bad-n_tok rows co-fire col_n_tok + len_consistent; overlong
    token arrays co-fire col_tokens with whichever injection hits the same
    row). Failing rows are filtered inside the scan stage; the pair
    fan-out is a HOF over a ≤|checks| array, aggregate keys ≤ checks²."""
    from jsonschema_spark.plans.plan import TableSpec, compile_table_spec
    from jsonschema_spark.plans.rollout import violation_cooccurrence

    df = _materialized_corpus(spark)
    v1, _ = _rollout_specs()
    v1 = {**v1, "columns": {**v1["columns"], "tokens": {
        **v1["columns"]["tokens"], "maxItems": 2000,
    }}}
    plan = compile_table_spec(TableSpec.from_dict(v1), df.schema)
    return violation_cooccurrence(plan.annotate(df))


def _check_activation_oracle_sql() -> str:
    # NULL verdicts count as failures on both sides: the engine's row
    # checks coalesce NULL -> False (plans/plan.py), so the oracle wraps
    # every predicate in coalesce(expr, FALSE) for the same truth table
    from jsonschema_spark.sources.corpus import VOCAB_SIZE

    ok = _rollout_check_sql()
    ok["col_tokens"] = (
        "(tokens IS NULL OR (len(tokens) >= 1 AND len(tokens) <= 2000"
        " AND len(list_filter(tokens,"
        f" t -> t < 0 OR t > {VOCAB_SIZE - 1})) = 0))"
    )
    tbl = f"read_parquet('{_corpus_oracle_path()}/*.parquet')"
    parts = []
    for name, expr in ok.items():
        fail = f"count(*) FILTER (WHERE NOT coalesce({expr}, FALSE))"
        parts.append(
            f"SELECT '{name}' AS \"check\", count(*) AS n,"
            f" {fail} AS n_fail,"
            f" round({fail} / CAST(count(*) AS DOUBLE), 6) AS fail_rate,"
            f" CASE WHEN {fail} = 0 THEN 'dead'"
            f"  WHEN {fail} = count(*) THEN 'always'"
            f"  ELSE 'active' END AS status"
            f" FROM {tbl}"
        )
    return " UNION ALL ".join(parts)


def q_check_activation(spark, sf_dir):
    """Per-check fire-rate profile of the flagship contract over the
    corpus — the marginal complement of violation_cooccur: 'dead' checks
    (never fail) are removal candidates, 'always' checks mean the
    contract no longer matches the data. One map-side-combined aggregate;
    no data row shuffles (the agg emits a single row of per-check sums)."""
    from jsonschema_spark.plans.plan import TableSpec, compile_table_spec
    from jsonschema_spark.plans.rollout import check_activation_profile

    df = _materialized_corpus(spark)
    v1, _ = _rollout_specs()
    v1 = {**v1, "columns": {**v1["columns"], "tokens": {
        **v1["columns"]["tokens"], "maxItems": 2000,
    }}}
    plan = compile_table_spec(TableSpec.from_dict(v1), df.schema)
    return check_activation_profile(plan.annotate(df))


def q_repeat_value(spark, sf_dir):
    """Data-constrained scaling value of each source's raw mass
    (Muennighoff et al. 2023): implied epochs over the unique
    (dup-span-complement) token mass, the exponential-decay effective
    value of those repeats, and utilization = value/total — the number
    that decides whether a duplicated source is worth dedup or just
    down-weighting. Inherits the linear dup-span pass; the decay math
    runs over |sources| rows."""
    from jsonschema_spark.operators.dedup import repeated_epoch_value

    df = _t(spark, sf_dir, "documents")
    return repeated_epoch_value(df, "doc_id", "text", "source", n=13)


def q_epoch_order_audit(spark, sf_dir):
    """Audit of a two-epoch training order built by the seed-7 and
    seed-11 content-addressed shuffles: each epoch must be an exact
    permutation of the corpus (every doc exactly once, positions exactly
    1..N) and consecutive epochs must be decorrelated — positions are
    ranks, so corr(pos, prev_pos) IS Spearman's rho; a seed-reuse bug
    would report 1.0. Exact-distinct agg per epoch + one consecutive-
    epoch join on the uniform id key."""
    from jsonschema_spark.operators.sampling import (
        global_shuffle_order,
        training_order_audit,
    )

    df = _t(spark, sf_dir, "documents")
    orders = [
        global_shuffle_order(df, "doc_id", seed=s).withColumn(
            "epoch", F.lit(e)
        )
        for e, s in enumerate((7, 11))
    ]
    return training_order_audit(
        orders[0].unionByName(orders[1]),
        id_col="doc_id",
        epoch_col="epoch",
        pos_col="shuffle_pos",
    )


_ASOF_DIM_TYPES = ["click", "error", "purchase", "signup", "view"]
_ASOF_DIM_REVS = ["2024-01-02", "2024-01-09", "2024-01-16", "2024-01-23"]


def _asof_dim_rows() -> list[tuple[str, str, float]]:
    # deterministic per-type threshold revisions; day-1 events predate
    # every revision and must keep NULL payloads (left as-of semantics)
    return [
        (t, f"{r} 00:00:00", 10.0 + 3.0 * ti + 2.5 * ri)
        for ti, t in enumerate(_ASOF_DIM_TYPES)
        for ri, r in enumerate(_ASOF_DIM_REVS)
    ]


def q_asof_thresholds(spark, sf_dir):
    """As-of join (the SCD lookup Spark lacks as an operator): every
    event picks up the threshold from the LATEST revision at or before
    its timestamp for its event_type — implemented as a tag-union +
    one keyed shuffle + carry-forward window, so no range condition
    ever reaches a join planner (a BETWEEN-theta formulation plans
    into BroadcastNestedLoop at scale). Day-1 events predate every
    revision and report NULL."""
    import datetime as _dt

    from jsonschema_spark.operators.temporal import asof_join

    ev = _t(spark, sf_dir, "events").select(
        "event_id", "ts", "value", "event_type"
    )
    dim = spark.createDataFrame(
        [
            (t, _dt.datetime.strptime(ts, "%Y-%m-%d %H:%M:%S"), v)
            for t, ts, v in _asof_dim_rows()
        ],
        "event_type string, rev_ts timestamp, threshold double",
    )
    out = asof_join(
        ev,
        dim,
        key_col="event_type",
        ts_col="ts",
        dim_ts_col="rev_ts",
        payload_cols=["threshold"],
    )
    return out.select(
        "event_id",
        F.round("threshold", 6).alias("threshold"),
        (F.col("value") > F.col("threshold")).alias("exceeded"),
    )


_MAINT_WINDOWS = [
    ("w0", "2024-01-02 00:00:00", "2024-01-02 06:00:00"),
    ("w1", "2024-01-05 12:00:00", "2024-01-06 00:00:00"),
    ("w2", "2024-01-10 03:00:00", "2024-01-10 04:30:00"),
    ("w3", "2024-01-15 00:00:00", "2024-01-16 00:00:00"),
    ("w4", "2024-01-15 12:00:00", "2024-01-15 18:00:00"),  # overlaps w3
    ("w5", "2024-01-28 23:00:00", "2024-01-29 01:00:00"),
]


def q_maintenance_overlap(spark, sf_dir):
    """Interval containment join (range join as an equi-join): which
    events fall inside which maintenance windows — intervals explode to
    fixed-width time buckets, points compute their bucket, the exact
    BETWEEN runs as a residual on hash-join candidates. Candidate
    volume is |points| + interval replication, never the
    |points|×|intervals| nested loop. Overlapping windows (w3/w4) both
    match."""
    import datetime as _dt

    from jsonschema_spark.operators.temporal import interval_join

    ev = _t(spark, sf_dir, "events").select("event_id", "ts")
    win = spark.createDataFrame(
        [
            (
                w,
                _dt.datetime.strptime(s, "%Y-%m-%d %H:%M:%S"),
                _dt.datetime.strptime(e, "%Y-%m-%d %H:%M:%S"),
            )
            for w, s, e in _MAINT_WINDOWS
        ],
        "window_id string, start_ts timestamp, end_ts timestamp",
    )
    return interval_join(
        ev, win, "ts", "start_ts", "end_ts", bucket_seconds=21600
    ).select("event_id", "window_id")


def q_event_sessions(spark, sf_dir):
    """Gap-based sessionization of the event stream (2h inactivity gap,
    per-user): one shuffle on user_id; lag + running-sum windows and the
    session aggregate all reuse the same hash partitioning. Session
    bounds are exact epoch microseconds — integers, so no float
    timestamp formatting for two engines to disagree on."""
    from jsonschema_spark.operators.temporal import sessionize

    ev = _t(spark, sf_dir, "events")
    return sessionize(
        ev, "user_id", "ts", gap_seconds=7200, agg_value=F.col("value")
    )


def _violation_examples_oracle_sql() -> str:
    from jsonschema_spark.sources.corpus import VOCAB_SIZE

    ok = _rollout_check_sql()
    ok["col_tokens"] = (
        "(tokens IS NULL OR (len(tokens) >= 1 AND len(tokens) <= 2000"
        " AND len(list_filter(tokens,"
        f" t -> t < 0 OR t > {VOCAB_SIZE - 1})) = 0))"
    )
    tbl = f"read_parquet('{_corpus_oracle_path()}/*.parquet')"
    cases = ", ".join(
        f"CASE WHEN NOT coalesce({expr}, FALSE) THEN '{name}' END"
        for name, expr in ok.items()
    )
    prio = _hex60("concat('vx:', id)")
    return (
        f"WITH f AS (SELECT doc_id, list_filter([{cases}],"
        f"  x -> x IS NOT NULL) AS fl FROM {tbl}),"
        " e AS (SELECT u.x AS chk, CAST(doc_id AS VARCHAR) AS id"
        "  FROM f, unnest(f.fl) AS u(x)),"
        f" p AS (SELECT chk, id, {prio} AS prio FROM e),"
        " r AS (SELECT chk, id, prio, row_number() OVER"
        "  (PARTITION BY chk ORDER BY prio, id) AS rn FROM p)"
        ' SELECT chk AS "check", count(*) AS n_examples,'
        "  list(id ORDER BY prio, id) AS example_ids"
        " FROM r WHERE rn <= 5 GROUP BY 1"
    )


def q_violation_examples(spark, sf_dir):
    """Deterministic debug samples: the 5 content-addressed example rows
    per failing check (smallest portable hash of the id) — identical on
    any partitioning or engine, unlike a LIMIT k. Exact two-phase
    salted top-k, so a hot check never funnels through one reducer;
    output is ≤ |checks| rows."""
    from jsonschema_spark.plans.plan import TableSpec, compile_table_spec
    from jsonschema_spark.plans.rollout import violation_examples

    df = _materialized_corpus(spark)
    v1, _ = _rollout_specs()
    v1 = {**v1, "columns": {**v1["columns"], "tokens": {
        **v1["columns"]["tokens"], "maxItems": 2000,
    }}}
    plan = compile_table_spec(TableSpec.from_dict(v1), df.schema)
    return violation_examples(plan.annotate(df), id_col="doc_id", k=5)


def q_lsh_recall(spark, sf_dir):
    """Measured MinHash-LSH recall (16 bands x 2 rows at j>=0.5) vs
    exact-Jaccard ground truth on a deterministic CONSTANT-SIZE sample
    — the 256 documents with the smallest portable_hash60('lshqa:'+id),
    via TakeOrderedAndProject — with the Wilson lower bound: the
    pre-flight gate that says whether the banding config leaves
    duplicates behind on THIS corpus's similarity distribution. The
    k-smallest-hash sample replaces r4's sample_mod=2 rate filter
    (a 50%% sample whose truth join was quadratic in the corpus —
    VERDICT r4 item 3); the all-pairs truth is now a bounded O(k²)
    probe at any corpus size."""
    from jsonschema_spark.operators.dedup import lsh_recall_probe

    df = _t(spark, sf_dir, "documents")
    return lsh_recall_probe(
        df, "doc_id", "text", threshold=0.5, n=3,
        num_perms=32, rows_per_band=2, sample_k=256,
    )


def q_watermark_audit(spark, sf_dir):
    """Measured watermark: the exact lateness histogram of the event
    stream under a deterministic bounded-disorder arrival order (events
    permuted within 64-event ingest blocks — the real table arrives
    sorted, so disorder is synthesized reproducibly). lateness =
    running-max event time at arrival minus own event time; the
    histogram's tail IS the withWatermark setting, measured instead of
    guessed. Global running max runs as order-preserving range buckets
    + broadcast prefix maxima — no single-partition window."""
    from jsonschema_spark.functions.text import portable_hash60
    from jsonschema_spark.operators.temporal import watermark_audit
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events").select("event_id", "ts")
    blk = F.floor(F.col("event_id") / 64).cast("long")
    h = portable_hash60(
        F.concat(F.lit("wm:"), F.col("event_id").cast("string"))
    )
    wb = Window.partitionBy("_blk").orderBy("_h", "event_id")
    arrived = (
        ev.select("event_id", "ts", blk.alias("_blk"), h.alias("_h"))
        .select(
            "ts",
            (F.col("_blk") * 64 + F.row_number().over(wb)).alias("arrival"),
        )
    )
    return watermark_audit(arrived, "arrival", "ts", bucket_size=1024)


def q_event_rollup(spark, sf_dir):
    """Hypertable-style continuous aggregate: the day level is computed
    by MERGING the hour level's partial aggregates (count/sum/min/max
    re-aggregate; avg = merged sum / merged count) — raw events are
    scanned once; the oracle aggregates the raw table directly at day
    grain, so a PASS is the mergeability proof."""
    from jsonschema_spark.operators.temporal import rollup_from_partials

    ev = _t(spark, sf_dir, "events")
    return rollup_from_partials(ev, "ts", "value", fine="hour", coarse="day")


def q_trigram_kn_ppl(spark, sf_dir):
    """Interpolated Kneser-Ney trigram perplexity (Chen & Goodman 1999;
    KenLM order-3) of every non-reference sequence against the
    doc_id%5==0 reference slice — the top of the LM ladder. All model
    tables are aggregates over the one trigram count table or the bigram
    table (gram-type-bounded, no second corpus pass); scoring shuffles
    ~1 row per document."""
    from jsonschema_spark.operators.relevance import kn_trigram_perplexity

    df = _token_corpus(spark)
    return kn_trigram_perplexity(df, F.pmod(F.col("doc_id"), F.lit(5)) == 0)


def q_bigram_kn_ppl(spark, sf_dir):
    """Interpolated Kneser-Ney bigram perplexity of every non-reference
    sequence against the doc_id%5==0 reference slice — the smoothing
    KenLM ships (absolute discount + continuation-count backoff), one
    quality step above bigram_ppl's add-k. The model is the same bigram
    count table plus two vocab-bounded aggregates over it; scoring
    shuffles ~1 row per document."""
    from jsonschema_spark.operators.relevance import kn_bigram_perplexity

    df = _token_corpus(spark)
    return kn_bigram_perplexity(df, F.pmod(F.col("doc_id"), F.lit(5)) == 0)


def q_column_profile(spark, sf_dir):
    """Deequ-style single-pass multi-column profile (Schelter et al.
    VLDB 2018): completeness / distinctness / uniqueness / entropy /
    mode for four documents columns from ONE stacked scan — the
    discovery pass that seeds spec inference. doc_id profiles as a
    perfect key (uniqueness 1.0, entropy ln N); lang/source as
    low-cardinality categoricals."""
    from jsonschema_spark.operators.quality import column_profile

    df = _t(spark, sf_dir, "documents")
    return column_profile(df, ["doc_id", "lang", "source", "n_chars"])


def q_numeric_profile(spark, sf_dir):
    """Numeric sibling of column_profile: four lineitem measure columns
    profiled (count/null/min/max/mean/std/exact quantiles) in ONE
    stacked pass — the bounds-discovery input spec inference reads."""
    from jsonschema_spark.operators.quality import numeric_profile

    df = _t(spark, sf_dir, "lineitem")
    return numeric_profile(
        df, ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    )


def q_fd_audit(spark, sf_dir):
    """Approximate functional-dependency audit (TANE g3 error): does
    l_partkey determine l_suppkey in lineitem? The violation summary a
    constraint-suggestion pass thresholds on before emitting a
    dependency into an inferred spec."""
    from jsonschema_spark.operators.quality import fd_audit

    df = _t(spark, sf_dir, "lineitem")
    return fd_audit(df, "l_partkey", "l_suppkey")


def q_fd_audit_by(spark, sf_dir):
    """Conditional-FD discovery (Bohannon 2007): the l_partkey →
    l_suppkey dependency audited per l_returnflag slice — the slice
    whose fd_strength collapses is the one whose ingest broke."""
    from jsonschema_spark.operators.quality import fd_audit_by

    df = _t(spark, sf_dir, "lineitem")
    return fd_audit_by(df, "l_returnflag", "l_partkey", "l_suppkey")


def q_categorical_mi(spark, sf_dir):
    """Mutual information between documents.source and documents.lang
    (nats, plus geometric-mean NMI) — the association-strength check
    behind "is source informative about lang?" and redundant-column
    detection. Three keyless scalar aggregates over one joint-cell
    table."""
    from jsonschema_spark.operators.quality import categorical_mi

    df = _t(spark, sf_dir, "documents")
    return categorical_mi(df, "source", "lang")


def q_benford_digits(spark, sf_dir):
    """First-significant-digit distribution of l_extendedprice vs
    Benford's law (Hill 1995) with per-digit χ² contributions — the
    forensic plausibility test for amount-like columns. Digit
    extraction goes through exact integer cents (floor(value·100)) so
    it is engine-independent."""
    from jsonschema_spark.operators.quality import benford_first_digit

    df = _t(spark, sf_dir, "lineitem")
    return benford_first_digit(df, "l_extendedprice", scale=100)


_EXPECTATIONS = [
    {"name": "docs_nonempty", "metric": "n_rows", "column": None,
     "op": ">=", "threshold": 100.0},
    {"name": "lang_complete", "metric": "null_rate", "column": "lang",
     "op": "<=", "threshold": 0.0},
    {"name": "source_bounded", "metric": "n_distinct", "column": "source",
     "op": "<=", "threshold": 25.0},
    # intentionally failing: the corpus ships 5 langs
    {"name": "lang_trilingual", "metric": "n_distinct", "column": "lang",
     "op": "<=", "threshold": 3.0},
    {"name": "chars_floor", "metric": "min", "column": "n_chars",
     "op": ">=", "threshold": 1.0},
    {"name": "chars_mean_sane", "metric": "mean", "column": "n_chars",
     "op": "<=", "threshold": 100000.0},
]


def q_suggest_constraints(spark, sf_dir):
    """Constraint suggestion over documents: profile four columns once
    and nominate required/unique/enum/bounds expectations in exactly
    the vocabulary table_expectations consumes — the discovery →
    verification loop closed mechanically."""
    from jsonschema_spark.operators.quality import suggest_constraints

    df = _t(spark, sf_dir, "documents")
    return suggest_constraints(
        df,
        ["doc_id", "lang", "source", "n_chars"],
        numeric_cols=["doc_id", "n_chars"],
    )


def q_table_expectations(spark, sf_dir):
    """Deequ VerificationSuite analog: six declared table-level metric
    constraints on documents evaluated from ONE keyless aggregate pass —
    the capstone tying the discovery family back to the engine's
    verdict semantics (one expectation intentionally fails: the corpus
    has 5 langs, the suite asserts <= 3)."""
    from jsonschema_spark.operators.quality import evaluate_expectations

    df = _t(spark, sf_dir, "documents")
    return evaluate_expectations(df, _EXPECTATIONS)


def q_join_cardinality(spark, sf_dir):
    """Pre-join fan-out audit between orders and lineitem on orderkey:
    exact inner-join output size, per-side max multiplicities, match
    rates, and the 1:1/1:N/N:1/N:M classification — computed from the
    two key histograms without running the join (the pre-flight check
    that catches an accidental N:M explosion before a 100-TB join)."""
    from jsonschema_spark.operators.quality import join_cardinality_profile

    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return join_cardinality_profile(o, "o_orderkey", li, "l_orderkey")


def q_inclusion_dependency(spark, sf_dir):
    """FK-candidate discovery: what fraction of distinct customer keys
    appear in orders.o_custkey (the reverse of the enforced FK — a
    containment below 1.0 measures customers with no orders, a
    containment of exactly 1.0 would nominate the column pair for a
    referential check)."""
    from jsonschema_spark.operators.quality import inclusion_audit

    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return inclusion_audit(c, "c_custkey", o, "o_custkey")


def q_freshness_audit(spark, sf_dir):
    """Per-event-type data-freshness profile of the events stream table:
    staleness vs the global high-water mark and sustained arrival rate —
    the stalled-feed detector (exact integer-microsecond time math)."""
    from jsonschema_spark.operators.quality import freshness_audit

    ev = _t(spark, sf_dir, "events")
    return freshness_audit(ev, "event_type", "ts").select(
        "group",
        "n_events",
        F.unix_micros(F.col("first_ts").cast("timestamp")).alias("first_us"),
        F.unix_micros(F.col("last_ts").cast("timestamp")).alias("last_us"),
        "staleness_us",
        "span_us",
        "events_per_day",
    )


def q_metric_anomaly(spark, sf_dir):
    """Deequ-style metrics-repository anomaly detection over a
    per-month metric history derived from orders (order_count +
    avg_price per month): each point scored against the trailing 6
    prior points of its own metric (z-score, plus the flat-history-jump
    case). The history a resumable validation job persists is exactly
    this (metric, ds, value) shape."""
    from jsonschema_spark.operators.quality import metric_anomaly

    o = _t(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_format(F.date_trunc("month", F.col("o_orderdate")), "yyyy-MM").alias(
            "ds"
        )
    ).agg(
        F.count(F.lit(1)).cast("double").alias("_cnt"),
        F.round(F.avg("o_totalprice"), 6).alias("_ap"),
    )
    hist = monthly.select(
        "ds",
        F.explode(
            F.array(
                F.struct(
                    F.lit("order_count").alias("metric"),
                    F.col("_cnt").alias("value"),
                ),
                F.struct(
                    F.lit("avg_price").alias("metric"),
                    F.col("_ap").alias("value"),
                ),
            )
        ).alias("_m"),
    ).select(F.col("_m.metric").alias("metric"), "ds", F.col("_m.value").alias("value"))
    return metric_anomaly(hist, window=6, min_periods=3, z_thresh=3.0)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
        # ORDER MATTERS: the driver correctness gate takes the FIRST 50
        # entries in insertion order. Round-5 rotation (VERDICT r4 "Next
        # round" #3): the 32 queries with no driver-green row in any
        # CORRECTNESS_r01-r04 go first (the r4-addition queue incl. the
        # temporal + Deequ families), then the two r4 driver-reds fixed
        # this round (dup_loss_mask, positional_entropy), then 16 spot
        # re-gates. After r5 every one of the 193 queries has been
        # driver-gated at least once.
    return {
        "emd_drift": q_emd_drift,
        "component_size_hist": q_component_size_hist,
        "containment_dups": q_containment_dups,
        "token_burstiness": q_token_burstiness,
        "doremi_weights": q_doremi_weights,
        "spec_rollout": q_spec_rollout,
        "violation_cooccur": q_violation_cooccur,
        "check_activation": q_check_activation,
        "bigram_kn_ppl": q_bigram_kn_ppl,
        "repeat_value": q_repeat_value,
        "epoch_order_audit": q_epoch_order_audit,
        "asof_thresholds": q_asof_thresholds,
        "maintenance_overlap": q_maintenance_overlap,
        "event_sessions": q_event_sessions,
        "watermark_audit": q_watermark_audit,
        "event_rollup": q_event_rollup,
        "lsh_recall": q_lsh_recall,
        "violation_examples": q_violation_examples,
        "component_purity": q_component_purity,
        "trigram_kn_ppl": q_trigram_kn_ppl,
        # Deequ-analog family (r4 additions, sweep-only until now)
        "column_profile": q_column_profile,
        "numeric_profile": q_numeric_profile,
        "fd_audit": q_fd_audit,
        "fd_audit_by": q_fd_audit_by,
        "table_expectations": q_table_expectations,
        "suggest_constraints": q_suggest_constraints,
        "categorical_mi": q_categorical_mi,
        "benford_digits": q_benford_digits,
        "metric_anomaly": q_metric_anomaly,
        "join_cardinality": q_join_cardinality,
        "inclusion_dependency": q_inclusion_dependency,
        "freshness_audit": q_freshness_audit,
        # re-gates: the two r4 driver-reds, fixed this round
        "dup_loss_mask": q_dup_loss_mask,
        "positional_entropy": q_positional_entropy,
        # slots 35-50: spot re-gates of ever-green queries
        "corpus_validate": q_corpus_validate,
        "exact_stats": q_exact_stats,
        "dup_keys": q_dup_keys,
        "orphans": q_orphans,
        "minhash_near_dup": q_minhash_near_dup,
        "simhash_near_dup": q_simhash_near_dup,
        "dup_components": q_dup_components,
        "incremental_near_dup": q_incremental_near_dup,
        "semdedup": q_semdedup,
        "global_shuffle": q_global_shuffle,
        "token_sketch_drift": q_token_sketch_drift,
        "ks_drift": q_ks_drift,
        "unigram_ppl": q_unigram_ppl,
        "sequence_packing": q_sequence_packing,
        # slots 49-50: round-5 NEW queries — gated immediately rather than
        # queueing more never-gated entries (tpch_q1 and image_decode, the
        # displaced spot re-gates, are ever-green and move below the window)
        "quarantine_rows": q_quarantine_rows,
        "sampled_gate": q_sampled_gate,
        # --- below slot 50: all have a driver-green CORRECTNESS row
        # (plus local sweep + pytest coverage every round) ---
        "tpch_q1": q_tpch_q1,
        "image_decode": q_image_decode,
        "chunk_sequences": q_chunk_sequences,
        "dup_gram_scale": q_dup_gram_scale,
        "repair_sequences": q_repair_sequences,
        "temperature_mix": q_temperature_mix,
        "bigram_ppl": q_bigram_ppl,
        "vocab_coverage": q_vocab_coverage,
        "embedding_norm_qa": q_embedding_norm_qa,
        "structure_scorecard": q_structure_scorecard,
        "winnow_dups": q_winnow_dups,
        "token_ngram_diversity": q_token_ngram_diversity,
        "bigram_pmi": q_bigram_pmi,
        "source_violation_rates": q_source_violation_rates,
        "ntok_iqr_outliers": q_ntok_iqr_outliers,
        "monotonic_check": q_monotonic_check,
        "embedding_drift": q_embedding_drift,
        "tfidf_top_terms": q_tfidf_top_terms,
        "source_divergence": q_source_divergence,
        "dsir_select": q_dsir_select,
        "source_mix": q_source_mix,
        "shared_ngram_pairs": q_shared_ngram_pairs,
        "longest_shared_run": q_longest_shared_run,
        "dup_spans": q_dup_spans,
        "dup_span_stats": q_dup_span_stats,
        "token_dup_spans": q_token_dup_spans,
        "decontam_spans": q_decontam_spans,
        "effective_tokens": q_effective_tokens,
        "ingest_dedup_trend": q_ingest_dedup_trend,
        "periodic_sequences": q_periodic_sequences,
        "diverse_sample": q_diverse_sample,
        "ngram_novelty": q_ngram_novelty,
        "infer_spec": q_infer_spec,
        "weighted_sample": q_weighted_sample,
        "windowed_drift": q_windowed_drift,
        "script_mojibake": q_script_mojibake,
        "classifier_score": q_classifier_score,
        "corpus_overlap": q_corpus_overlap,
        "trigram_sbo": q_trigram_sbo,
        "padding_waste": q_padding_waste,
        "stratified_split": q_stratified_split,
        "unimax_alloc": q_unimax_alloc,
        "split_leakage_audit": q_split_leakage_audit,
        "embedding_quant_qa": q_embedding_quant_qa,
        "vocab_richness": q_vocab_richness,
        "vocab_diversity": q_vocab_diversity,
        "quality_survivors": q_quality_survivors,
        "tokenizer_fertility": q_tokenizer_fertility,
        "incremental_embedding_dedup": q_incremental_embedding_dedup,
        "token_winnow_dups": q_token_winnow_dups,
        "image_ahash_near_dup": q_image_ahash_near_dup,
        "image_ahash_groups": q_image_ahash_groups,
        "audio_fingerprint_groups": q_audio_fingerprint_groups,
        "url_dedup_groups": q_url_dedup_groups,
        "domain_cap": q_domain_cap,
        "id_gap_audit": q_id_gap_audit,
        "shard_manifest": q_shard_manifest,
        "manifest_diff": q_manifest_diff,
        "classifier_eval": q_classifier_eval,
        "contam_attribution": q_contam_attribution,
        "neardup_threshold_curve": q_neardup_threshold_curve,
        "source_concentration": q_source_concentration,
        "source_relative_filter": q_source_relative_filter,
        "corpus_datasheet": q_corpus_datasheet,
        "url_content_conflicts": q_url_content_conflicts,
        "key_skew_profile": q_key_skew_profile,
        "snapshot_churn": q_snapshot_churn,
        "vocab_churn": q_vocab_churn,
        "lang_mismatch": q_lang_mismatch,
        "embedding_parity": q_embedding_parity,
        "token_parity": q_token_parity,
        "ntok_chi2_drift": q_ntok_chi2_drift,
        "audio_decode": q_audio_decode,
        "spec_diff": q_spec_diff,
        "gopher_quality": q_gopher_quality,
        "c4_clean": q_c4_clean,
        "chunk_dedup": q_chunk_dedup,
        "semantic_decontam": q_semantic_decontam,
        "json_schema_variant": q_json_schema_variant,
        "repetition_score": q_repetition_score,
        "pii_scan": q_pii_scan,
        "boilerplate_lines": q_boilerplate_lines,
        "boilerplate_strip": q_boilerplate_strip,
        "rare_token_rate": q_rare_token_rate,
        "jsonl_ingest": q_jsonl_ingest,
        "ntok_quantiles": q_ntok_quantiles,
        "packed_stats_validate": q_packed_stats_validate,
        "sequence_structure": q_sequence_structure,
        "zipf_slope": q_zipf_slope,
        "token_prefix_dups": q_token_prefix_dups,
        "pii_redact": q_pii_redact,
        "cross_source_dups": q_cross_source_dups,
        "vocab_prune": q_vocab_prune,
        "ann_topk": q_ann_topk,
        "ivf_topk": q_ivf_topk,
        "blob_stats": q_blob_stats,
        "embedding_near_dup": q_embedding_near_dup,
        "lang_id_counts": q_lang_id_counts,
        "quality_score": q_quality_score,
        "doc_fingerprint": q_doc_fingerprint,
        "token_stats": q_token_stats,
        "embedding_topk": q_embedding_topk,
        "embedding_topk_kernel": q_embedding_topk_kernel,
        "frame_sample_counts": q_frame_sample_counts,
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
        "histogram": q_histogram,
        "word_freq": q_word_freq,
        "psi_terms": q_psi_terms,
        "topk_per_group": q_topk_per_group,
        "join_agg": q_join_agg,
        "tuple_items": q_tuple_items,
        "map_object": q_map_object,
        "pattern_properties": q_pattern_properties,
        "windowed_counts": q_windowed_counts,
        "exact_dedup_groups": q_exact_dedup_groups,
        "dedup_count": q_dedup_count,
        "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
        "token_dedup_groups": q_token_dedup_groups,
        "token_minhash_near_dup": q_token_minhash_near_dup,
        "decontaminate": q_decontaminate,
        "token_decontaminate": q_token_decontaminate,
        "incremental_dedup": q_incremental_dedup,
        "leakage_safe_split": q_leakage_safe_split,
        "near_dedup_count": q_near_dedup_count,
        "chi2_drift": q_chi2_drift,
        "token_entropy": q_token_entropy,
        "hash_sample": q_hash_sample,
        "source_cap": q_source_cap,
    }


# Empty/whitespace-only guard: DuckDB string_split_regex('', '\s+') yields
# [''] (len 1) while the engine's words() helper returns [] — guard the
# oracle so empty docs agree on both sides (testdata has none today, but
# the sweep must not silently break if they appear).
_WS = (
    "(CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])"
    " ELSE string_split_regex(trim(lower(text)), '\\s+') END)"
)
_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"


def _hex60(expr: str) -> str:
    """DuckDB twin of functions.text.portable_hash60."""
    return f"CAST(concat('0x', substr(md5({expr}), 1, 15)) AS BIGINT)"


# DuckDB twin of q_script_mojibake's _decorated_text (identical residue
# decorations; chr(7) instead of an embedded literal control byte).
_DECOR = (
    "text"
    " || CASE WHEN doc_id % 3 = 0 THEN ' привет мир' ELSE '' END"
    " || CASE WHEN doc_id % 5 = 0 THEN ' 你好世界' ELSE '' END"
    " || CASE WHEN doc_id % 7 = 0 THEN ' κόσμος' ELSE '' END"
    " || CASE WHEN doc_id % 11 = 0 THEN ' �' || chr(7) ELSE '' END"
    " || CASE WHEN doc_id % 13 = 0 THEN ' 한국어' ELSE '' END"
    " || CASE WHEN doc_id % 17 = 0 THEN ' مرحبا' ELSE '' END"
)


_FP_PERM = "fp || ':' || p"


def _char_class_count_sql(char_class: str, alias: str) -> str:
    """DuckDB twin of functions.text.char_class_count over column t (cast
    to INT to match Spark's int length arithmetic)."""
    return (
        f"CAST(length(t) - length(regexp_replace(t, '{char_class}', '', 'g'))"
        f" AS INT) AS {alias}"
    )


def _dup_gram_scale_sql() -> str:
    """DuckDB twin of operators.stats.dup_gram_scale: the same dyadic
    duplicate-n-gram probes as a CASE cascade (largest scale first —
    mirrors the Spark when-chain's overwrite order)."""

    def _dup(n: int) -> str:
        grams = (
            f"list_transform(range(1, len(tokens) - {n} + 2),"
            f" i -> array_to_string(tokens[i:i + {n - 1}], ','))"
        )
        return f"len(list_distinct({grams})) < len({grams})"

    cases = " ".join(f"WHEN {_dup(n)} THEN {n}" for n in (32, 16, 8, 4, 2, 1))
    return (
        f"SELECT doc_id AS id, CASE {cases} ELSE 0 END AS max_dup_scale"
        f" FROM read_parquet('{_token_corpus_path()}/*.parquet')"
    )


def _simhash_oracle_sql() -> str:
    """Independent DuckDB recomputation of the full simhash pipeline:
    portable 60-bit word hashes -> per-bit majority vote (ties -> 1, empty
    docs -> 0, matching the Arrow kernel) -> pairwise Hamming join."""
    return (
        f"WITH wh AS (SELECT doc_id, list_transform({_WS},"
        f" w -> {_hex60('w')}) AS hs FROM documents),"
        " sim AS (SELECT doc_id, CASE WHEN len(hs) = 0 THEN 0 ELSE"
        "  CAST(list_sum(list_transform(range(60), bit ->"
        "   CASE WHEN 2 * len(list_filter(hs, h -> ((h >> bit) & 1) = 1)) >= len(hs)"
        "   THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END)) AS BIGINT) END AS sim"
        "  FROM wh)"
        " SELECT a.doc_id AS id_a, b.doc_id AS id_b,"
        "  bit_count(xor(a.sim, b.sim)) AS distance"
        " FROM sim a JOIN sim b ON a.doc_id < b.doc_id"
        " WHERE bit_count(xor(a.sim, b.sim)) <= 3"
    )


def _vec_lit(vec) -> str:
    return "[" + ", ".join(repr(float(x)) for x in vec) + "]"


def _incremental_embedding_oracle_sql(
    dim: int = 64, n_planes: int = 6, seed: int = 13, threshold: float = 0.3
) -> str:
    """DuckDB replay of the incremental embedding near-dedup: the seeded
    sign-LSH planes as literals (same machinery as _ann_oracle_sql), the
    batch/snapshot split on vec_id % 4, same-bucket blocking, exact cosine
    verify — bit-for-bit the operator's blocked-and-verified semantics."""
    from jsonschema_spark.operators.similarity import hyperplanes

    planes = hyperplanes(dim, n_planes, seed)
    terms = [
        f"(CASE WHEN list_dot_product(v, {_vec_lit(p)}) >= 0"
        f" THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes)
    ]
    bucket = "(" + " + ".join(terms) + ")"
    return (
        "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v"
        "   FROM embeddings),"
        f" b AS (SELECT vec_id, {bucket} AS bucket, v FROM e)"
        " SELECT id_new, id_seen, score FROM ("
        "  SELECT a.vec_id AS id_new, s.vec_id AS id_seen,"
        "   round(list_cosine_similarity(a.v, s.v), 6) AS score"
        "  FROM b a JOIN b s ON a.bucket = s.bucket"
        "   AND a.vec_id % 4 = 0 AND s.vec_id % 4 <> 0)"
        f" WHERE score >= {threshold}"
    )


def _ann_oracle_sql(dim: int = 64, n_planes: int = 8, seed: int = 13, k: int = 10) -> str:
    """DuckDB replay of hyperplane-LSH ANN: the seeded planes are embedded
    as literals, the bucket filter is (query bucket) OR (Hamming distance 1
    in bucket bits) — identical to similarity._probe_buckets — then exact
    cosine rerank."""
    from jsonschema_spark.operators.similarity import hyperplanes

    planes = hyperplanes(dim, n_planes, seed)

    def bucket(vexpr: str) -> str:
        terms = [
            f"(CASE WHEN list_dot_product({vexpr}, {_vec_lit(p)}) >= 0"
            f" THEN {1 << i} ELSE 0 END)"
            for i, p in enumerate(planes)
        ]
        return "(" + " + ".join(terms) + ")"

    return (
        "WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv"
        "  FROM embeddings WHERE vec_id = 0),"
        " e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),"
        f" b AS (SELECT vec_id, v, {bucket('v')} AS bucket FROM e),"
        f" qb AS (SELECT {bucket('qv')} AS qbucket, qv FROM q)"
        " SELECT vec_id, round(list_cosine_similarity(v, qv), 6) AS score"
        " FROM b, qb"
        " WHERE bucket = qbucket"
        "  OR bit_count(xor(CAST(bucket AS BIGINT), CAST(qbucket AS BIGINT))) = 1"
        f" ORDER BY score DESC, vec_id LIMIT {k}"
    )


def _diverse_sample_oracle_sql(
    dim: int = 64, n_planes: int = 8, seed: int = 13, m: int = 2
) -> str:
    """DuckDB replay of the LSH diversity sample: same seeded plane
    literals as _ann_oracle_sql, per-bucket row_number over the portable
    md5 id hash."""
    from jsonschema_spark.operators.similarity import hyperplanes

    planes = hyperplanes(dim, n_planes, seed)
    terms = [
        f"(CASE WHEN list_dot_product(v, {_vec_lit(p)}) >= 0"
        f" THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes)
    ]
    bucket = "(" + " + ".join(terms) + ")"
    return (
        "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v"
        "   FROM embeddings),"
        f" b AS (SELECT vec_id, CAST({bucket} AS BIGINT) AS bucket FROM e),"
        " r AS (SELECT vec_id, bucket, row_number() OVER ("
        "   PARTITION BY bucket ORDER BY"
        "   CAST(concat('0x', substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))"
        "    AS BIGINT)) AS rn FROM b)"
        f" SELECT vec_id, bucket FROM r WHERE rn <= {m}"
    )


def _ivf_train_ctes(
    n_lists: int = 8, iters: int = 2, seed: int = 29, dim: int = 64,
) -> list[str]:
    """Shared DuckDB CTE prefix replaying similarity.ivf_train end to end:
    portable-hash init ordering, `iters` Lloyd iterations (assign = argmax
    cosine with smallest-centroid tiebreak; update = per-dimension mean,
    empty clusters keep their centroid), ending with `af` = the final
    per-vector cluster assignment. Used by both the ivf_topk and semdedup
    oracles so the two queries replay the identical training run."""
    h = _hex60(f"CAST(vec_id AS VARCHAR) || '#{seed}'")
    parts = [
        "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),",
        " c0 AS (SELECT row_number() OVER (ORDER BY h, vec_id) - 1 AS cid, v AS cv"
        f"  FROM (SELECT vec_id, v, {h} AS h FROM e) ORDER BY h, vec_id LIMIT {n_lists}),",
    ]
    prev = "c0"
    for it in range(1, iters + 1):
        parts.append(
            f" a{it} AS (SELECT vec_id, v, cid FROM ("
            f"  SELECT e.vec_id, e.v, c.cid, row_number() OVER ("
            "   PARTITION BY e.vec_id"
            "   ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.cid) AS rn"
            f"  FROM e, {prev} c) WHERE rn = 1),"
        )
        parts.append(
            f" u{it} AS (SELECT cid, d, avg(x) AS mu FROM ("
            f"  SELECT cid, unnest(v) AS x, unnest(range({dim})) AS d FROM a{it})"
            "  GROUP BY cid, d),"
        )
        parts.append(
            f" c{it} AS (SELECT c.cid, coalesce(n.nv, c.cv) AS cv FROM {prev} c"
            f"  LEFT JOIN (SELECT cid, list(mu ORDER BY d) AS nv FROM u{it}"
            "   GROUP BY cid) n ON c.cid = n.cid),"
        )
        prev = f"c{it}"
    parts.append(
        " af AS (SELECT vec_id, v, cid FROM ("
        "  SELECT e.vec_id, e.v, c.cid, row_number() OVER ("
        "   PARTITION BY e.vec_id"
        "   ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.cid) AS rn"
        f"  FROM e, {prev} c) WHERE rn = 1)"
    )
    return parts


def _ivf_oracle_sql(
    n_lists: int = 8, iters: int = 2, n_probe: int = 3, seed: int = 29,
    dim: int = 64, k: int = 10,
) -> str:
    """DuckDB replay of the ENTIRE IVF pipeline: the shared training CTEs
    (_ivf_train_ctes), probe selection (top n_probe centroids by query
    cosine, reversed-argsort tiebreak = larger cid first), then exact
    rerank within the probed lists."""
    parts = _ivf_train_ctes(n_lists, iters, seed, dim)
    parts.append(", q AS (SELECT v AS qv FROM e WHERE vec_id = 0),")
    parts.append(
        f" probes AS (SELECT cid FROM c{iters}, q"
        f"  ORDER BY list_cosine_similarity(cv, qv) DESC, cid DESC LIMIT {n_probe})"
    )
    parts.append(
        " SELECT vec_id, round(list_cosine_similarity(v, qv), 6) AS score"
        " FROM af, q WHERE cid IN (SELECT cid FROM probes)"
        f" ORDER BY score DESC, vec_id LIMIT {k}"
    )
    return "".join(parts)


def _semdedup_oracle_sql(
    n_lists: int = 8, iters: int = 2, seed: int = 29, dim: int = 64,
    threshold: float = 0.99,
) -> str:
    """DuckDB replay of SemDeDup over the same k-means run as the IVF
    oracle: within-cluster smaller-id pair cosines, thresholded on the
    ROUNDED score (the operator's boundary contract)."""
    parts = _ivf_train_ctes(n_lists, iters, seed, dim)
    parts.append(
        ", p AS (SELECT a.vec_id AS vec_id, CAST(a.cid AS BIGINT) AS cid,"
        "   round(list_cosine_similarity(a.v, b.v), 6) AS s"
        "  FROM af a JOIN af b"
        "   ON a.cid = b.cid AND b.vec_id < a.vec_id)"
    )
    parts.append(
        " SELECT vec_id, cid, count(*) AS n_dups, max(s) AS score"
        f" FROM p WHERE s >= {threshold} GROUP BY 1, 2"
    )
    return "".join(parts)


def _corpus_check_exprs() -> dict:
    """DuckDB twins of every corpus check (shared by the corpus_validate
    and sampled_gate oracles)."""
    from jsonschema_spark.sources.corpus import MAX_TOKENS, SOURCES, VOCAB_SIZE

    srcs = ", ".join(f"'{s}'" for s in SOURCES)
    return {
        "col_doc_id": "(doc_id IS NULL OR regexp_matches(doc_id, '^doc-[0-9]{12}$'))",
        "col_tokens": (
            "(tokens IS NULL OR (len(tokens) >= 1 AND len(list_filter(tokens,"
            f" t -> t < 0 OR t > {VOCAB_SIZE - 1})) = 0))"
        ),
        "col_n_tok": f"(n_tok IS NULL OR (n_tok >= 1 AND n_tok <= {MAX_TOKENS}))",
        "required_doc_id": "(doc_id IS NOT NULL)",
        "required_tokens": "(tokens IS NOT NULL)",
        "required_n_tok": "(n_tok IS NOT NULL)",
        "required_source": "(source IS NOT NULL)",
        "row_len_consistent": "(n_tok = len(tokens))",
        "ref_source": f"(source IS NULL OR source IN ({srcs}))",
    }


def _corpus_validate_oracle_sql() -> str:
    """DuckDB recomputation of every corpus check over the SAME materialized
    parquet the Spark query validates (see _corpus_oracle_path)."""
    tbl = f"read_parquet('{_corpus_oracle_path()}/*.parquet')"
    ok = _corpus_check_exprs()
    valid = " AND ".join(ok.values())
    fails = ", ".join(
        f"count(*) FILTER (WHERE NOT {expr}) AS fail_{name}"
        for name, expr in ok.items()
    )
    return (
        f"SELECT count(*) AS n_rows, count(*) FILTER (WHERE {valid}) AS n_valid,"
        f" {fails} FROM {tbl}"
    )


def _quarantine_rows_oracle_sql() -> str:
    """DuckDB twin of q_quarantine_rows: per-row failed-check names
    (same sorted comma-joined label), failing rows only."""
    tbl = f"read_parquet('{_corpus_oracle_path()}/*.parquet')"
    cases = ", ".join(
        f"CASE WHEN NOT {expr} THEN '{name}' END"
        for name, expr in _corpus_check_exprs().items()
    )
    return (
        f"WITH f AS (SELECT doc_id, source,"
        f"  list_sort(list_filter([{cases}], x -> x IS NOT NULL)) AS fl"
        f"  FROM {tbl})"
        f" SELECT doc_id, source, CAST(len(fl) AS INT) AS n_failed,"
        f"  array_to_string(fl, ',') AS failed_checks"
        f" FROM f WHERE len(fl) > 0"
    )


def _sampled_gate_oracle_sql() -> str:
    """DuckDB twin of q_sampled_gate: the same k-smallest-hash sample
    (ORDER BY portable hash + id LIMIT k = TakeOrderedAndProject), the
    same per-row checks, the same Wilson upper bound, verdict on the
    rounded bound vs the 3% budget."""
    tbl = f"read_parquet('{_corpus_oracle_path()}/*.parquet')"
    valid = " AND ".join(_corpus_check_exprs().values())
    h = _hex60("concat('vgate:', doc_id)")
    z = "CAST(1.96 AS DOUBLE)"
    z2 = f"({z} * {z})"
    p = "(n_fail / CAST(n_sampled AS DOUBLE))"
    n = "CAST(n_sampled AS DOUBLE)"
    hi = (
        f"(({p} + {z2} / (CAST(2.0 AS DOUBLE) * {n}))"
        f" + {z} * sqrt({p} * (CAST(1.0 AS DOUBLE) - {p}) / {n}"
        f"  + {z2} / (CAST(4.0 AS DOUBLE) * {n} * {n})))"
        f" / (CAST(1.0 AS DOUBLE) + {z2} / {n})"
    )
    return (
        f"WITH s AS (SELECT * FROM {tbl} ORDER BY {h}, doc_id LIMIT 500),"
        f" a AS (SELECT count(*) AS n_sampled,"
        f"  count(*) FILTER (WHERE NOT ({valid})) AS n_fail FROM s)"
        f" SELECT n_sampled, n_fail,"
        f"  round({p}, 6) AS fail_rate,"
        f"  round({hi}, 6) AS wilson_hi,"
        f"  round({hi}, 6) <= CAST(0.03 AS DOUBLE) AS within_budget"
        f" FROM a"
    )


def _packed_stats_oracle_sql() -> str:
    """DuckDB recomputation of the zone-map validation pass from the SAME
    packed parquet's metadata columns (tok_min/tok_max/n_bytes)."""
    from jsonschema_spark.sources.corpus import MAX_TOKENS, SOURCES, VOCAB_SIZE

    packed = _corpus_oracle_path().removesuffix(".parquet") + "_packed.parquet"
    tbl = f"read_parquet('{packed}/*.parquet')"
    srcs = ", ".join(f"'{s}'" for s in SOURCES)
    ok = {
        "col_doc_id": "(doc_id IS NOT NULL AND regexp_matches(doc_id, '^doc-[0-9]{12}$'))",
        "col_tokens": (
            "(n_bytes IS NOT NULL AND n_bytes >= 4 AND tok_min >= 0"
            f" AND tok_max <= {VOCAB_SIZE - 1})"
        ),
        "col_n_tok": f"(n_tok IS NOT NULL AND n_tok >= 1 AND n_tok <= {MAX_TOKENS})",
        "required_doc_id": "(doc_id IS NOT NULL)",
        "required_tokens": "(n_bytes IS NOT NULL)",
        "required_n_tok": "(n_tok IS NOT NULL)",
        "required_source": "(source IS NOT NULL)",
        "row_len_consistent": (
            "(n_tok IS NOT NULL AND n_bytes IS NOT NULL AND n_tok * 4 = n_bytes)"
        ),
        "ref_source": f"(source IS NULL OR source IN ({srcs}))",
    }
    valid = " AND ".join(ok.values())
    fails = ", ".join(
        f"count(*) FILTER (WHERE NOT {expr}) AS fail_{name}"
        for name, expr in ok.items()
    )
    return (
        f"SELECT count(*) AS n_rows, count(*) FILTER (WHERE {valid}) AS n_valid,"
        f" {fails} FROM {tbl}"
    )


def _stoplist(lang: str) -> str:
    from jsonschema_spark.functions.text import STOPWORDS

    items = STOPWORDS[lang] if lang != "*" else [
        w for lst in STOPWORDS.values() for w in lst
    ]
    return "[" + ", ".join(f"'{w}'" for w in items) + "]"


_AHASH_CTE = (
    # Closed-form 4x8-grid aHash from make_bmp's pixel contract: gray(j) is
    # the 3-byte channel sum at logical pixel j, cell(j) the fixed-grid
    # target, bit k set iff cell_sum*n > tot*cell_count (division-free
    # "cell mean > global mean"). Independent re-derivation of
    # multimodal.ahash_bmp from doc_id alone — no bytes round-trip.
    "WITH dims AS (SELECT doc_id AS d, CAST(4 + doc_id % 5 AS BIGINT) AS h,"
    "  CAST(4 + doc_id % 7 AS BIGINT) AS w FROM documents),"
    " g AS (SELECT d, h, w, h*w AS n,"
    "  [((d*31+3*j)%256)+((d*31+3*j+1)%256)+((d*31+3*j+2)%256)"
    "   for j in range(h*w)] AS gray FROM dims),"
    " cells AS (SELECT d, n, gray, list_sum(gray) AS tot,"
    "  [((j//w)*4//h)*8 + ((j%w)*8//w) for j in range(n)] AS cell FROM g),"
    " hashes AS (SELECT d, CAST(list_sum(["
    "  CASE WHEN list_sum([CASE WHEN cell[j+1]=k THEN gray[j+1] ELSE 0 END"
    "        for j in range(n)]) * n"
    "      > tot * list_sum([CASE WHEN cell[j+1]=k THEN 1 ELSE 0 END"
    "        for j in range(n)])"
    "  THEN (CAST(1 AS BIGINT) << k) ELSE 0 END"
    "  for k in range(32)]) AS BIGINT) AS phash FROM cells)"
)

_AUDIO_FP_CTE = (
    # Sign-of-first-difference fingerprint from make_wav's sample formula
    # sample(i) = (d*131 + i*7919) % 4096 - 2048; the -2048 cancels in the
    # comparison. n_frames = 32 + d%17, so the delta range is
    # min(n_frames-1, 32).
    "WITH fp AS (SELECT doc_id AS d, CAST(32 + doc_id % 17 AS BIGINT) AS n"
    "  FROM documents),"
    " hashes AS (SELECT d, CAST(list_sum(["
    "  CASE WHEN ((d*131+(i+1)*7919)%4096) > ((d*131+i*7919)%4096)"
    "  THEN (CAST(1 AS BIGINT) << i) ELSE 0 END"
    "  for i in range(least(n-1, 32))]) AS BIGINT) AS phash FROM fp)"
)


_URL_CTE = (
    # Rebuild synth_url's messy string from doc_id, then replay every
    # url_normalize rule with the same RE2-safe regexes.
    "WITH raw AS (SELECT doc_id,"
    " (CASE WHEN m%8=0 THEN 'http' ELSE 'https' END) || '://' ||"
    " (CASE WHEN doc_id%10=0 THEN upper(h) ELSE lower(h) END) ||"
    " (CASE WHEN doc_id%11=0 THEN"
    "   (CASE WHEN m%8=0 THEN ':80' ELSE ':443' END) ELSE '' END) ||"
    " '/p/' || (m%4) ||"
    " (CASE WHEN doc_id%5=0 THEN '/' ELSE '' END) ||"
    " (CASE WHEN qs <> '' THEN '?' || qs ELSE '' END) ||"
    " (CASE WHEN doc_id%9=0 THEN '#sec' ELSE '' END) AS url"
    " FROM (SELECT doc_id, m,"
    "  (CASE WHEN doc_id%3=0 THEN 'WWW.' ELSE '' END) || 'site' ||"
    "  (m%10) || (CASE WHEN m%2=0 THEN '.com' ELSE '.org' END) AS h,"
    "  array_to_string(list_filter(["
    "   CASE WHEN doc_id%6=0 THEN 'utm_source=feed' ELSE '' END,"
    "   CASE WHEN m%3=0 THEN 'id=' || (m%4) ELSE '' END,"
    "   CASE WHEN doc_id%6=3 THEN 'utm_medium=email' ELSE '' END],"
    "   p -> p <> ''), '&') AS qs"
    "  FROM (SELECT doc_id, doc_id%120 AS m FROM documents))),"
    " parts AS (SELECT doc_id, url,"
    "  lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    "   AS scheme,"
    "  lower(regexp_extract(url,"
    "   '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)) AS hostport,"
    "  regexp_replace(regexp_extract(url,"
    "   '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)', 1), '/+$', '')"
    "   AS path,"
    "  regexp_extract(url, '\\?([^#]*)', 1) AS q FROM raw),"
    " norm AS (SELECT doc_id, scheme, path,"
    "  regexp_replace(CASE WHEN scheme = 'http' THEN"
    "    regexp_replace(hostport, ':80$', '')"
    "   WHEN scheme = 'https' THEN regexp_replace(hostport, ':443$', '')"
    "   ELSE hostport END, '^www\\.', '') AS host,"
    "  array_to_string(list_filter(string_split(q, '&'),"
    "   p -> p <> '' AND NOT starts_with(p, 'utm_')), '&') AS kept"
    "  FROM parts),"
    " canon AS (SELECT doc_id,"
    "  scheme || '://' || host || path ||"
    "  (CASE WHEN kept <> '' THEN '?' || kept ELSE '' END) AS url,"
    "  regexp_extract(host, '([^.]+\\.[^.]+)$', 1) AS domain FROM norm)"
)


def oracle_sql() -> dict[str, str]:
    out = {
        "url_dedup_groups": (
            _URL_CTE
            + " SELECT url, count(*) AS n_docs, min(doc_id) AS keep_id"
            " FROM canon GROUP BY url HAVING count(*) > 1"
        ),
        "domain_cap": (
            _URL_CTE
            + " SELECT domain, doc_id FROM (SELECT domain, doc_id,"
            "  row_number() OVER (PARTITION BY domain ORDER BY doc_id) AS rn"
            "  FROM canon) WHERE rn <= 3"
        ),
        "classifier_eval": (
            # exact tie-corrected Mann-Whitney AUC over the distinct-score
            # histogram; Brier + threshold accuracy as plain aggregates
            "WITH b AS (SELECT"
            "  round(least(n_chars / 600.0, 1.0), 6) AS s,"
            "  CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y"
            " FROM documents),"
            " t AS (SELECT CAST(sum(y) AS BIGINT) AS n_pos,"
            "  CAST(sum(1 - y) AS BIGINT) AS n_neg,"
            "  avg(pow(s - y, 2)) AS brier,"
            "  avg(CASE WHEN (CASE WHEN s >= 0.5 THEN 1 ELSE 0 END) = y"
            "   THEN 1.0 ELSE 0.0 END) AS acc FROM b),"
            " h AS (SELECT s, CAST(sum(y) AS DOUBLE) AS pos,"
            "   CAST(sum(1 - y) AS DOUBLE) AS neg FROM b GROUP BY s),"
            " n AS (SELECT sum(term) AS num FROM ("
            "  SELECT pos * (coalesce(sum(neg) OVER (ORDER BY s"
            "   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0)"
            "   + 0.5 * neg) AS term FROM h))"
            " SELECT n_pos, n_neg,"
            "  round(CASE WHEN n_pos > 0 AND n_neg > 0"
            "   THEN num / CAST(n_pos * n_neg AS DOUBLE) END, 6) AS auc,"
            "  round(brier, 6) AS brier, round(acc, 6) AS accuracy"
            " FROM t, n"
        ),
        "manifest_diff": (
            # two independent writes, shards keyed by min_id; same row
            # hash + XOR manifest on each side, then the status CASE
            "WITH ma AS (SELECT min(doc_id) AS min_id,"
            "  count(*) AS n_rows, bit_xor("
            + _hex60(
                "concat_ws('|', CAST(doc_id AS VARCHAR), payload,"
                " CAST(grp AS VARCHAR))"
            )
            + ") AS ck"
            f" FROM read_parquet('{_manifest_corpus_path()}/*.parquet',"
            " filename=true) GROUP BY filename),"
            " mb AS (SELECT min(doc_id) AS min_id,"
            "  count(*) AS n_rows, bit_xor("
            + _hex60(
                "concat_ws('|', CAST(doc_id AS VARCHAR), payload,"
                " CAST(grp AS VARCHAR))"
            )
            + ") AS ck"
            f" FROM read_parquet('{_manifest_corpus_b_path()}/*.parquet',"
            " filename=true) GROUP BY filename)"
            " SELECT coalesce(mb.min_id, ma.min_id) AS min_id,"
            "  CASE WHEN ma.ck IS NULL THEN 'added'"
            "   WHEN mb.ck IS NULL THEN 'removed'"
            "   WHEN mb.ck <> ma.ck OR mb.n_rows <> ma.n_rows"
            "    THEN 'changed' ELSE 'ok' END AS status,"
            "  CAST(coalesce(mb.n_rows, 0) AS BIGINT) AS n_rows_cur,"
            "  CAST(coalesce(ma.n_rows, 0) AS BIGINT) AS n_rows_base"
            " FROM mb FULL OUTER JOIN ma USING (min_id)"
        ),
        "shard_manifest": (
            # same files, filename=true; identical row hash and XOR
            "SELECT regexp_extract(filename, '([^/]+)$', 1) AS file_name,"
            " count(*) AS n_rows, min(doc_id) AS min_id,"
            " max(doc_id) AS max_id,"
            " bit_xor("
            + _hex60(
                "concat_ws('|', CAST(doc_id AS VARCHAR), payload,"
                " CAST(grp AS VARCHAR))"
            )
            + ") AS checksum"
            f" FROM read_parquet('{_manifest_corpus_path()}/*.parquet',"
            " filename=true)"
            " GROUP BY 1"
        ),
        "id_gap_audit": (
            "WITH d AS (SELECT source, doc_id,"
            "  doc_id - lag(doc_id) OVER (PARTITION BY source ORDER BY doc_id)"
            "   AS delta"
            " FROM documents WHERE doc_id % 97 <> 5),"
            " p AS (SELECT source, count(*) AS n_rows, min(doc_id) AS id_min,"
            "  max(doc_id) AS id_max,"
            "  coalesce(min(CASE WHEN delta > 0 THEN delta END), 0) AS stride"
            "  FROM d GROUP BY 1),"
            " b AS (SELECT d.source, count(*) AS n_breaks FROM d JOIN p"
            "  ON d.source = p.source"
            "  WHERE delta IS NOT NULL AND delta <> stride GROUP BY 1)"
            " SELECT p.source, n_rows, id_min, id_max, stride,"
            "  coalesce(n_breaks, 0) AS n_breaks,"
            "  CAST(CASE WHEN stride > 0 THEN"
            "   (id_max - id_min) / stride + 1 - n_rows ELSE 0 END"
            "   AS BIGINT) AS n_missing"
            " FROM p LEFT JOIN b ON p.source = b.source"
        ),
        "image_ahash_near_dup": (
            _AHASH_CTE
            + " SELECT a.d AS id_a, b.d AS id_b,"
            "  bit_count(xor(a.phash, b.phash)) AS distance"
            " FROM hashes a JOIN hashes b ON a.d < b.d"
            " WHERE bit_count(xor(a.phash, b.phash)) <= 1"
        ),
        "image_ahash_groups": (
            _AHASH_CTE
            + " SELECT phash, count(*) AS n_docs, min(d) AS keep_id"
            " FROM hashes GROUP BY phash HAVING count(*) > 1"
        ),
        "audio_fingerprint_groups": (
            _AUDIO_FP_CTE
            + " SELECT phash, count(*) AS n_docs, min(d) AS keep_id"
            " FROM hashes GROUP BY phash HAVING count(*) > 1"
        ),
        "snapshot_churn": (
            "WITH c AS (SELECT doc_id, md5(array_to_string(tokens, ',')) AS f"
            f"  FROM read_parquet('{_parity_corpus_path()}/*.parquet')),"
            " b AS (SELECT doc_id, md5(array_to_string(tokens, ',')) AS f"
            f"  FROM read_parquet('{_token_corpus_path()}/*.parquet')),"
            " j AS (SELECT c.f AS fc, b.f AS fb"
            "  FROM c FULL OUTER JOIN b ON c.doc_id = b.doc_id)"
            " SELECT CAST(sum(CASE WHEN fb IS NULL THEN 1 ELSE 0 END)"
            "   AS BIGINT) AS n_added,"
            "  CAST(sum(CASE WHEN fc IS NULL THEN 1 ELSE 0 END)"
            "   AS BIGINT) AS n_removed,"
            "  CAST(sum(CASE WHEN fc IS NOT NULL AND fb IS NOT NULL"
            "   AND fc <> fb THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,"
            "  CAST(sum(CASE WHEN fc = fb THEN 1 ELSE 0 END) AS BIGINT)"
            "   AS n_same FROM j"
        ),
        "embedding_parity": (
            # same full-outer probe: null-padded per-dim |diff|, first dim
            # over atol (list_position is NULL when absent = Spark's 0)
            "WITH c AS (SELECT vec_id, embedding FROM"
            f" read_parquet('{_embedding_parity_paths()[1]}/*.parquet')),"
            " g AS (SELECT vec_id, embedding FROM"
            f" read_parquet('{_embedding_parity_paths()[0]}/*.parquet')),"
            " j AS (SELECT coalesce(c.vec_id, g.vec_id) AS vec_id,"
            "   c.embedding AS cur, g.embedding AS gold"
            "  FROM c FULL OUTER JOIN g ON c.vec_id = g.vec_id),"
            " pr AS (SELECT vec_id, len(cur) AS dim_current,"
            "   len(gold) AS dim_golden,"
            "   list_transform(generate_series(1,"
            "     greatest(len(cur), len(gold))),"
            "    i -> abs(CAST(cur[i] AS DOUBLE) - CAST(gold[i] AS DOUBLE)))"
            "    AS d"
            "  FROM j WHERE cur IS NOT NULL AND gold IS NOT NULL),"
            " v AS (SELECT vec_id, 'vector_mismatch' AS status,"
            "   dim_current, dim_golden,"
            "   CAST(list_position(list_transform(d,"
            "    x -> coalesce(x <= 0.000001, false)), false) AS BIGINT)"
            "    AS first_diff_dim,"
            "   round(list_max(list_filter(d, x -> x IS NOT NULL)), 6)"
            "    AS max_abs_diff"
            "  FROM pr),"
            " miss AS (SELECT vec_id,"
            "   CASE WHEN cur IS NULL THEN 'missing_current'"
            "    ELSE 'missing_golden' END AS status,"
            "   len(cur) AS dim_current, len(gold) AS dim_golden,"
            "   CAST(NULL AS BIGINT) AS first_diff_dim,"
            "   CAST(NULL AS DOUBLE) AS max_abs_diff"
            "  FROM j WHERE cur IS NULL OR gold IS NULL)"
            " SELECT * FROM v WHERE first_diff_dim > 0"
            " UNION ALL SELECT * FROM miss"
        ),
        "vocab_churn": (
            "WITH c AS (SELECT DISTINCT unnest(tokens) AS t"
            f"  FROM read_parquet('{_parity_corpus_path()}/*.parquet')),"
            " b AS (SELECT DISTINCT unnest(tokens) AS t"
            f"  FROM read_parquet('{_token_corpus_path()}/*.parquet')),"
            " j AS (SELECT c.t AS tc, b.t AS tb"
            "  FROM c FULL OUTER JOIN b ON c.t = b.t)"
            " SELECT CAST(sum(CASE WHEN tb IS NULL THEN 1 ELSE 0 END)"
            "   AS BIGINT) AS n_new,"
            "  CAST(sum(CASE WHEN tc IS NULL THEN 1 ELSE 0 END)"
            "   AS BIGINT) AS n_gone,"
            "  CAST(sum(CASE WHEN tc IS NOT NULL AND tb IS NOT NULL"
            "   THEN 1 ELSE 0 END) AS BIGINT) AS n_shared FROM j"
        ),
        "lang_mismatch": (
            # per-doc lang_id CASE ladder (same twin as lang_id_counts),
            # then the wilson formula from source_violation_rates
            "WITH r AS (SELECT source, lang,"
            f"  len(list_filter(ws, w -> list_contains({_stoplist('de')}, w))) / CAST(len(ws) AS DOUBLE) AS r_de,"
            f"  len(list_filter(ws, w -> list_contains({_stoplist('en')}, w))) / CAST(len(ws) AS DOUBLE) AS r_en,"
            f"  len(list_filter(ws, w -> list_contains({_stoplist('es')}, w))) / CAST(len(ws) AS DOUBLE) AS r_es,"
            f"  len(list_filter(ws, w -> list_contains({_stoplist('fr')}, w))) / CAST(len(ws) AS DOUBLE) AS r_fr"
            f" FROM (SELECT source, lang, {_WS} AS ws FROM documents)),"
            " pred AS (SELECT source, lang,"
            "  CASE WHEN greatest(r_de, r_en, r_es, r_fr) <= 0 THEN 'und'"
            "   WHEN r_fr >= r_es AND r_fr >= r_en AND r_fr >= r_de THEN 'fr'"
            "   WHEN r_es >= r_en AND r_es >= r_de THEN 'es'"
            "   WHEN r_en >= r_de THEN 'en' ELSE 'de' END AS lang_pred"
            "  FROM r),"
            " agg AS (SELECT source, count(*) AS n,"
            "   CAST(count(*) FILTER (WHERE lang_pred <> lang) AS BIGINT)"
            "    AS fails FROM pred GROUP BY source),"
            " w AS (SELECT source, n, fails,"
            "   fails / CAST(n AS DOUBLE) AS p,"
            "   1.96 * 1.96 AS z2, CAST(n AS DOUBLE) AS nd FROM agg)"
            " SELECT source, n, fails, round(p, 6) AS rate,"
            "  round(greatest((p + z2 / (2 * nd)) / (1 + z2 / nd)"
            "   - 1.96 * sqrt(p * (1 - p) / nd + z2 / (4 * nd * nd))"
            "     / (1 + z2 / nd), 0.0), 6) AS wilson_lo,"
            "  round(least((p + z2 / (2 * nd)) / (1 + z2 / nd)"
            "   + 1.96 * sqrt(p * (1 - p) / nd + z2 / (4 * nd * nd))"
            "     / (1 + z2 / nd), 1.0), 6) AS wilson_hi"
            " FROM w"
        ),
        "token_parity": (
            "WITH c AS (SELECT doc_id, tokens AS cur"
            f"  FROM read_parquet('{_parity_corpus_path()}/*.parquet')),"
            " g AS (SELECT doc_id, tokens AS gold"
            f"  FROM read_parquet('{_token_corpus_path()}/*.parquet')),"
            " j AS (SELECT coalesce(c.doc_id, g.doc_id) AS doc_id, cur, gold"
            "  FROM c FULL OUTER JOIN g ON c.doc_id = g.doc_id),"
            " probe AS (SELECT doc_id, cur, gold,"
            "  CASE WHEN cur IS NULL THEN 'missing_current'"
            "       WHEN gold IS NULL THEN 'missing_golden'"
            "       ELSE 'token_mismatch' END AS status,"
            "  CAST(len(cur) AS INT) AS len_current,"
            "  CAST(len(gold) AS INT) AS len_golden,"
            "  coalesce(list_position(list_transform("
            "    range(1, greatest(coalesce(len(cur), 0), coalesce(len(gold), 0)) + 1),"
            "    i -> coalesce(cur[i] = gold[i], false)), false), 0) AS fd"
            "  FROM j)"
            " SELECT doc_id, status, len_current, len_golden,"
            "  CASE WHEN status = 'token_mismatch' THEN CAST(fd AS BIGINT) END"
            "   AS first_diff_pos"
            " FROM probe WHERE status != 'token_mismatch' OR fd > 0"
        ),
        "token_sketch_drift": (
            "WITH tok AS (SELECT doc_id, unnest(tokens) AS t"
            f"  FROM read_parquet('{_token_corpus_path()}/*.parquet')),"
            f" b AS (SELECT doc_id, {_hex60('CAST(t AS VARCHAR)')} % 64 AS bucket"
            "  FROM tok),"
            " hist AS (SELECT bucket, count(*) AS cnt_all,"
            "   count(*) FILTER (WHERE doc_id < 500) AS cnt_cur"
            "  FROM b GROUP BY 1),"
            " tot AS (SELECT sum(cnt_cur) AS n_cur, sum(cnt_all) AS n_base FROM hist)"
            " SELECT bucket, round((p - q) * ln(p / q), 6) AS psi_term FROM ("
            "  SELECT bucket, greatest(cnt_cur / CAST(n_cur AS DOUBLE), 1e-6) AS p,"
            "         greatest(cnt_all / CAST(n_base AS DOUBLE), 1e-6) AS q"
            "  FROM hist, tot)"
        ),
        "ntok_chi2_drift": (
            "WITH hist AS (SELECT len(tokens) AS bucket, count(*) AS cnt_all,"
            "   count(*) FILTER (WHERE doc_id < 500) AS cnt_cur"
            f"  FROM read_parquet('{_token_corpus_path()}/*.parquet') GROUP BY 1),"
            " tot AS (SELECT sum(cnt_cur) AS n_cur, sum(cnt_all) AS n_base FROM hist)"
            " SELECT bucket, round(pow(cnt_cur - e, 2) / e, 6) AS chi2_term FROM ("
            "  SELECT bucket, cnt_cur,"
            "   CAST(n_cur AS DOUBLE) * cnt_all / n_base AS e"
            "  FROM hist, tot WHERE cnt_all > 0)"
        ),
        "image_decode": (
            "SELECT doc_id,"
            " CAST(4 + doc_id % 5 AS INT) AS height,"
            " CAST(4 + doc_id % 7 AS INT) AS width,"
            " CAST(3 AS INT) AS channels,"
            " round(list_avg([CAST((doc_id * 31 + i) % 256 AS BIGINT)"
            "   for i in range((4 + doc_id % 5) * (4 + doc_id % 7) * 3)]), 6)"
            "  AS mean_pixel"
            " FROM documents"
        ),
        "audio_decode": (
            "SELECT doc_id,"
            " CAST(8000 AS INT) AS sample_rate,"
            " CAST(1 AS INT) AS channels,"
            " CAST(32 + doc_id % 17 AS INT) AS n_frames,"
            " round(sqrt(list_sum([CAST(((doc_id * 131 + i * 7919) % 4096"
            "   - 2048) AS BIGINT) ^ 2 for i in range(32 + doc_id % 17)])"
            "  / (32 + doc_id % 17)), 6) AS rms"
            " FROM documents"
        ),
        "spec_diff": (
            "WITH gsrc AS (SELECT * FROM documents"
            "  WHERE doc_id >= 10 AND lang <> 'de'),"
            " g AS (SELECT min(doc_id) dmin, max(doc_id) dmax,"
            "   min(n_chars) nmin, max(n_chars) nmax,"
            "   min(strlen(text)) tminl, max(strlen(text)) tmaxl,"
            "   min(strlen(lang)) lminl, max(strlen(lang)) lmaxl,"
            "   min(strlen(source)) sminl, max(strlen(source)) smaxl,"
            "   list_sort(list(DISTINCT lang)) lenum,"
            "   list_sort(list(DISTINCT source)) senum FROM gsrc),"
            " c AS (SELECT min(doc_id) dmin, max(doc_id) dmax,"
            "   min(n_chars) nmin, max(n_chars) nmax,"
            "   min(strlen(text)) tminl, max(strlen(text)) tmaxl,"
            "   min(strlen(lang)) lminl, max(strlen(lang)) lmaxl,"
            "   min(strlen(source)) sminl, max(strlen(source)) smaxl,"
            "   list_sort(list(DISTINCT lang)) lenum,"
            "   list_sort(list(DISTINCT source)) senum FROM documents)"
            " SELECT * FROM ("
            " SELECT 'doc_id' AS \"column\", 'minimum' AS \"constraint\","
            "   CAST(g.dmin AS VARCHAR) AS golden, CAST(c.dmin AS VARCHAR)"
            "   AS candidate, CASE WHEN c.dmin < g.dmin THEN 'widened'"
            "   ELSE 'narrowed' END AS change FROM g, c WHERE g.dmin <> c.dmin"
            " UNION ALL SELECT 'doc_id', 'maximum', CAST(g.dmax AS VARCHAR),"
            "   CAST(c.dmax AS VARCHAR), CASE WHEN c.dmax > g.dmax THEN"
            "   'widened' ELSE 'narrowed' END FROM g, c WHERE g.dmax <> c.dmax"
            " UNION ALL SELECT 'n_chars', 'minimum', CAST(g.nmin AS VARCHAR),"
            "   CAST(c.nmin AS VARCHAR), CASE WHEN c.nmin < g.nmin THEN"
            "   'widened' ELSE 'narrowed' END FROM g, c WHERE g.nmin <> c.nmin"
            " UNION ALL SELECT 'n_chars', 'maximum', CAST(g.nmax AS VARCHAR),"
            "   CAST(c.nmax AS VARCHAR), CASE WHEN c.nmax > g.nmax THEN"
            "   'widened' ELSE 'narrowed' END FROM g, c WHERE g.nmax <> c.nmax"
            " UNION ALL SELECT 'text', 'minLength', CAST(g.tminl AS VARCHAR),"
            "   CAST(c.tminl AS VARCHAR), CASE WHEN c.tminl < g.tminl THEN"
            "   'widened' ELSE 'narrowed' END FROM g, c WHERE g.tminl <> c.tminl"
            " UNION ALL SELECT 'text', 'maxLength', CAST(g.tmaxl AS VARCHAR),"
            "   CAST(c.tmaxl AS VARCHAR), CASE WHEN c.tmaxl > g.tmaxl THEN"
            "   'widened' ELSE 'narrowed' END FROM g, c WHERE g.tmaxl <> c.tmaxl"
            " UNION ALL SELECT 'lang', 'minLength', CAST(g.lminl AS VARCHAR),"
            "   CAST(c.lminl AS VARCHAR), CASE WHEN c.lminl < g.lminl THEN"
            "   'widened' ELSE 'narrowed' END FROM g, c WHERE g.lminl <> c.lminl"
            " UNION ALL SELECT 'lang', 'maxLength', CAST(g.lmaxl AS VARCHAR),"
            "   CAST(c.lmaxl AS VARCHAR), CASE WHEN c.lmaxl > g.lmaxl THEN"
            "   'widened' ELSE 'narrowed' END FROM g, c WHERE g.lmaxl <> c.lmaxl"
            " UNION ALL SELECT 'source', 'minLength', CAST(g.sminl AS VARCHAR),"
            "   CAST(c.sminl AS VARCHAR), CASE WHEN c.sminl < g.sminl THEN"
            "   'widened' ELSE 'narrowed' END FROM g, c WHERE g.sminl <> c.sminl"
            " UNION ALL SELECT 'source', 'maxLength', CAST(g.smaxl AS VARCHAR),"
            "   CAST(c.smaxl AS VARCHAR), CASE WHEN c.smaxl > g.smaxl THEN"
            "   'widened' ELSE 'narrowed' END FROM g, c WHERE g.smaxl <> c.smaxl"
            " UNION ALL SELECT 'lang', 'enum', array_to_string(g.lenum, ','),"
            "   array_to_string(c.lenum, ','),"
            "   CASE WHEN list_has_all(c.lenum, g.lenum)"
            "     AND NOT list_has_all(g.lenum, c.lenum) THEN 'widened'"
            "    WHEN list_has_all(g.lenum, c.lenum)"
            "     AND NOT list_has_all(c.lenum, g.lenum) THEN 'narrowed'"
            "    ELSE 'changed' END FROM g, c"
            "  WHERE len(g.lenum) <= 20 AND len(c.lenum) <= 20"
            "   AND array_to_string(g.lenum, ',') <> array_to_string(c.lenum, ',')"
            " UNION ALL SELECT 'source', 'enum', array_to_string(g.senum, ','),"
            "   array_to_string(c.senum, ','),"
            "   CASE WHEN list_has_all(c.senum, g.senum)"
            "     AND NOT list_has_all(g.senum, c.senum) THEN 'widened'"
            "    WHEN list_has_all(g.senum, c.senum)"
            "     AND NOT list_has_all(c.senum, g.senum) THEN 'narrowed'"
            "    ELSE 'changed' END FROM g, c"
            "  WHERE len(g.senum) <= 20 AND len(c.senum) <= 20"
            "   AND array_to_string(g.senum, ',') <> array_to_string(c.senum, ','))"
        ),
        "c4_clean": (
            "WITH page AS (SELECT doc_id,"
            "   replace(text, ' the ', '.' || chr(10) || 'the ')"
            "   || CASE WHEN doc_id % 2 = 0 THEN '.' ELSE '' END"
            "   || CASE WHEN doc_id % 13 = 0 THEN chr(10) ||"
            "     'lorem ipsum dolor sit amet consectetur.' ELSE '' END"
            "   || CASE WHEN doc_id % 11 = 0 THEN chr(10) ||"
            "     'function f() { return 1 }' ELSE '' END"
            "   || CASE WHEN doc_id % 5 = 0 THEN chr(10) ||"
            "     'enable javascript to view this page now.' ELSE '' END"
            "    AS text FROM documents),"
            " base AS (SELECT doc_id, text,"
            "   string_split(text, chr(10)) AS lines FROM page),"
            " filt AS (SELECT doc_id, text, lines,"
            "   [l for l in lines if"
            "     regexp_matches(rtrim(l), '[.!?\"]$')"
            "     and len(CASE WHEN trim(lower(l)) = ''"
            "       THEN CAST([] AS VARCHAR[])"
            "       ELSE string_split_regex(trim(lower(l)), '\\s+') END) >= 5"
            "     and not contains(lower(l), 'javascript')] AS kept"
            "  FROM base)"
            " SELECT doc_id,"
            "  CAST(len(lines) AS INT) AS n_lines,"
            "  CAST(len(kept) AS INT) AS n_kept,"
            "  CAST(contains(lower(text), 'lorem ipsum') AS INT) AS has_lorem,"
            "  CAST(contains(text, '{') AS INT) AS has_brace,"
            "  COALESCE(array_to_string(kept, chr(10)), '') AS text_clean,"
            "  CAST(len(kept) >= 3"
            "   AND NOT contains(lower(text), 'lorem ipsum')"
            "   AND NOT contains(text, '{') AS INT) AS passes"
            " FROM filt"
        ),
        "gopher_quality": (
            "SELECT doc_id, n_words, mean_word_len, alpha_ratio,"
            " top2gram_frac, dup3gram_frac,"
            " CAST(n_words >= 10 AND n_words <= 100000"
            "  AND mean_word_len >= 3.0 AND mean_word_len <= 10.0"
            "  AND alpha_ratio >= 0.8 AND top2gram_frac <= 0.2"
            "  AND dup3gram_frac <= 0.3 AS INT) AS passes"
            " FROM (SELECT doc_id, len(ws) AS n_words,"
            "  round(CASE WHEN len(ws) = 0 THEN 0.0"
            "   ELSE list_sum(list_transform(ws, w -> length(w)))"
            "    / CAST(len(ws) AS DOUBLE) END, 6) AS mean_word_len,"
            "  round(CASE WHEN len(ws) = 0 THEN 0.0"
            "   ELSE len(list_filter(ws, w -> regexp_matches(w, '[a-z]')))"
            "    / CAST(len(ws) AS DOUBLE) END, 6) AS alpha_ratio,"
            "  round(CASE WHEN len(ws) - 1 < 1 THEN 0.0"
            "   ELSE list_max(list_transform(list_distinct(g2),"
            "     d -> len(list_filter(g2, x -> x = d))))"
            "    / CAST(len(g2) AS DOUBLE) END, 6) AS top2gram_frac,"
            "  round(CASE WHEN len(g3) = 0 THEN 0.0"
            "   ELSE 1.0 - len(list_distinct(g3)) / CAST(len(g3) AS DOUBLE)"
            "   END, 6) AS dup3gram_frac"
            " FROM (SELECT doc_id, ws,"
            "   list_transform(generate_series(1, greatest(len(ws)-1, 0)),"
            "    i -> ws[i] || ' ' || ws[i+1]) AS g2,"
            "   list_transform(generate_series(1, greatest(len(ws)-2, 0)),"
            "    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) AS g3"
            f"  FROM (SELECT doc_id, {_WS} AS ws FROM documents)))"
        ),
        "chunk_dedup": (
            "WITH c AS (SELECT doc_id, unnest(list_transform("
            "   generate_series(1, CAST(ceil(len(ws)/20.0) AS INT)),"
            "   i -> md5(array_to_string(list_slice(ws, (i-1)*20+1, i*20),"
            "    ' ')))) AS chunk_hash"
            f"  FROM (SELECT doc_id, {_WS} AS ws FROM documents)),"
            " h AS (SELECT chunk_hash, count(*) AS n_occ FROM c"
            "  GROUP BY chunk_hash),"
            " d AS (SELECT c.doc_id, count(*) AS n_chunks,"
            "   CAST(count(*) FILTER (WHERE h.n_occ >= 2) AS BIGINT) AS n_dup"
            "  FROM c JOIN h USING (chunk_hash) GROUP BY c.doc_id)"
            " SELECT docs.doc_id AS id,"
            "  CAST(coalesce(d.n_chunks, 0) AS BIGINT) AS n_chunks,"
            "  CAST(coalesce(d.n_dup, 0) AS BIGINT) AS n_dup_chunks,"
            "  round(CASE WHEN coalesce(d.n_chunks, 0) = 0 THEN 0.0"
            "   ELSE d.n_dup / CAST(d.n_chunks AS DOUBLE) END, 6) AS dup_frac"
            " FROM documents docs LEFT JOIN d ON docs.doc_id = d.doc_id"
        ),
        "semantic_decontam": (
            "WITH bench AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e"
            "  FROM embeddings WHERE label = 0),"
            " corpus AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e"
            "  FROM embeddings WHERE label <> 0),"
            " s AS (SELECT c.vec_id AS id, b.vec_id AS bid,"
            "   list_cosine_similarity(c.e, b.e) AS cos"
            "  FROM corpus c CROSS JOIN bench b),"
            " r AS (SELECT id, bid, cos, row_number() OVER ("
            "   PARTITION BY id ORDER BY cos DESC, bid) AS rn FROM s)"
            " SELECT id, bid AS best_bench_id, round(cos, 6) AS best_cos,"
            "  CAST(cos >= 0.3 AS INT) AS contaminated FROM r WHERE rn = 1"
        ),
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
        "json_schema_variant": (
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
        "corpus_validate": _corpus_validate_oracle_sql(),
        "sampled_gate": _sampled_gate_oracle_sql(),
        "quarantine_rows": _quarantine_rows_oracle_sql(),
        "packed_stats_validate": _packed_stats_oracle_sql(),
        "decontaminate": (
            "WITH cg AS (SELECT doc_id, list_distinct(list_transform("
            "   generate_series(1, greatest(len(ws)-4, 0)),"
            "   i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' ||"
            "        ws[i+3] || ' ' || ws[i+4])) AS gs"
            f"  FROM (SELECT doc_id, {_WS} AS ws FROM documents)),"
            " bg AS (SELECT DISTINCT unnest(gs) AS g FROM cg WHERE doc_id < 10),"
            " hits AS (SELECT doc_id, unnest(gs) AS g FROM cg)"
            " SELECT doc_id AS id, count(*) AS n_hits"
            " FROM hits JOIN bg USING (g) GROUP BY doc_id"
        ),
        "neardup_threshold_curve": (
            # brute-force exact-Jaccard pairs at the 0.5 floor (size-ratio
            # prefilter *2), expanded per threshold; the LSH side is
            # recall-exact at this floor (64 bands of 2)
            "WITH sh AS (SELECT doc_id, list_sort(list_distinct(list_transform("
            "   generate_series(1, greatest(len(ws)-2, 0)),"
            "   i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS g"
            f"  FROM (SELECT doc_id, {_WS} AS ws FROM documents)),"
            " pairs AS (SELECT id_a, id_b, j FROM ("
            "  SELECT a.doc_id AS id_a, b.doc_id AS id_b,"
            "   round(CASE WHEN len(list_distinct(a.g || b.g)) = 0 THEN 0.0"
            "    ELSE len(list_intersect(a.g, b.g))"
            "     / CAST(len(list_distinct(a.g || b.g)) AS DOUBLE) END, 6) AS j"
            "  FROM sh a JOIN sh b ON a.doc_id < b.doc_id"
            "   AND len(a.g) * 2 >= len(b.g) AND len(b.g) * 2 >= len(a.g))"
            "  WHERE j >= 0.5),"
            " t AS (SELECT CAST(unnest([0.5, 0.6, 0.7, 0.8, 0.9]) AS DOUBLE)"
            "   AS threshold),"
            " f AS (SELECT t.threshold, p.id_a, p.id_b FROM pairs p"
            "   JOIN t ON p.j >= t.threshold),"
            " cp AS (SELECT threshold, count(*) AS n_pairs FROM f GROUP BY 1),"
            " cd AS (SELECT threshold, count(DISTINCT id) AS n_docs FROM ("
            "   SELECT threshold, unnest([id_a, id_b]) AS id FROM f)"
            "  GROUP BY 1)"
            " SELECT cp.threshold, CAST(cp.n_pairs AS BIGINT) AS n_pairs,"
            "  CAST(cd.n_docs AS BIGINT) AS n_docs"
            " FROM cp JOIN cd USING (threshold)"
        ),
        "contam_attribution": (
            # per-doc-distinct 5-gram hashes on both sides; benchmarks =
            # docs 0-9; count per (doc, benchmark)
            "WITH cg AS (SELECT doc_id, unnest(list_distinct(list_transform("
            "   generate_series(1, greatest(len(ws)-4, 0)),"
            "   i -> " + _hex60("array_to_string(ws[i:i+4], ' ')") + "))) AS g"
            f"  FROM (SELECT doc_id, {_WS} AS ws FROM documents)),"
            " bg AS (SELECT DISTINCT doc_id AS bench_id, g FROM cg"
            "   WHERE doc_id < 10)"
            " SELECT c.doc_id AS id, b.bench_id, count(*) AS n_shared"
            " FROM cg c JOIN bg b USING (g) GROUP BY 1, 2"
        ),
        "url_content_conflicts": (
            _URL_CTE
            + " SELECT c.url, count(*) AS n_docs,"
            f"  count(DISTINCT md5({_NORM})) AS n_variants,"
            "  min(c.doc_id) AS keep_id"
            " FROM canon c JOIN documents d ON d.doc_id = c.doc_id"
            " GROUP BY c.url"
            f" HAVING count(DISTINCT md5({_NORM})) > 1"
        ),
        "key_skew_profile": (
            "WITH c AS (SELECT l_orderkey, count(*) AS c FROM lineitem"
            "  GROUP BY 1)"
            " SELECT CAST(count(*) AS BIGINT) AS n_keys,"
            "  CAST(sum(c) AS BIGINT) AS n_rows,"
            "  CAST(max(c) AS BIGINT) AS max_count,"
            "  round(quantile_cont(CAST(c AS DOUBLE), 0.99), 6) AS p99_count,"
            "  round(avg(c), 6) AS avg_count,"
            "  round(CAST(max(c) AS DOUBLE) / avg(c), 6) AS skew_ratio"
            " FROM c"
        ),
        "source_relative_filter": (
            "WITH th AS (SELECT source,"
            "  round(quantile_cont(CAST(n_chars AS DOUBLE), 0.4), 6) AS cut"
            "  FROM documents GROUP BY 1)"
            " SELECT d.doc_id, d.source,"
            "  CAST(d.n_chars AS DOUBLE) AS score, th.cut"
            " FROM documents d JOIN th USING (source)"
            " WHERE CAST(d.n_chars AS DOUBLE) >= th.cut"
        ),
        "corpus_datasheet": (
            # per-doc quality rounded to 6 BEFORE the avg (summation-order
            # parity); fingerprint = md5 of normalized text
            "WITH raw AS (SELECT doc_id, source, n_chars, text, "
            + _WS
            + " AS ws FROM documents),"
            " per AS (SELECT doc_id, source, n_chars, len(ws) AS nw,"
            f"  md5({_NORM}) AS fp,"
            "  round(CASE WHEN len(ws) = 0 THEN 0.0 ELSE"
            "   (least(len(ws) / 100.0, 1.0)"
            "    + len(list_distinct(ws)) / CAST(len(ws) AS DOUBLE)"
            "    + least(len(list_filter(ws, w -> list_contains("
            + _stoplist("*")
            + ", w))) / (len(ws) * 0.4), 1.0)"
            "    + (1.0 - least(abs(list_sum(list_transform(ws,"
            "       w -> length(w))) / CAST(len(ws) AS DOUBLE) - 5.0)"
            "      / 5.0, 1.0))"
            "   ) / 4.0 END, 6) AS q"
            "  FROM raw),"
            " m AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,"
            "   CAST(sum(nw) AS BIGINT) AS total_words,"
            "   round(quantile_cont(CAST(n_chars AS DOUBLE), 0.5), 6)"
            "    AS p50_chars,"
            "   count(DISTINCT fp) AS uniq,"
            "   round(avg(q), 6) AS mean_quality FROM per),"
            " s AS (SELECT CAST(count(*) AS BIGINT) AS n_sources,"
            "   round(sum(c * c) / (sum(c) * sum(c)), 6) AS source_hhi"
            "  FROM (SELECT CAST(count(*) AS DOUBLE) AS c FROM per"
            "   GROUP BY source))"
            " SELECT n_docs, total_words, p50_chars,"
            "  round(1.0 - uniq / CAST(n_docs AS DOUBLE), 6)"
            "   AS exact_dup_rate,"
            "  mean_quality, n_sources, source_hhi FROM m, s"
        ),
        "source_concentration": (
            "WITH c AS (SELECT source, CAST(sum(n_chars) AS DOUBLE) AS w"
            "  FROM documents GROUP BY 1),"
            " t AS (SELECT sum(w) AS tot FROM c),"
            " s AS (SELECT w / tot AS p FROM c, t)"
            " SELECT CAST(count(*) AS BIGINT) AS n_sources,"
            "  round(max(p), 6) AS top_share,"
            "  round(sum(p * p), 6) AS hhi,"
            "  round(-sum(CASE WHEN p > 0 THEN p * ln(p) ELSE 0 END), 6)"
            "   AS entropy"
            " FROM s"
        ),
        "decontam_spans": (
            # positional 5-grams; benchmark (doc_id < 10) gram set; hits
            # merge via the same gaps-and-islands as dup_spans (e = s + 4)
            "WITH d AS (SELECT doc_id, " + _WS + " AS ws FROM documents),"
            " g AS (SELECT doc_id, pg.s AS s, pg.g AS g FROM ("
            "   SELECT doc_id, unnest(list_transform("
            "    generate_series(1, greatest(len(ws)-4, 0)),"
            "    i -> {'s': i, 'g': array_to_string(ws[i:i+4], ' ')}"
            "   )) AS pg FROM d)),"
            " bg AS (SELECT DISTINCT g FROM g WHERE doc_id < 10),"
            " hits AS (SELECT doc_id, s, s + 4 AS e FROM g JOIN bg USING (g)),"
            " pe AS (SELECT doc_id, s, e,"
            "    max(e) OVER (PARTITION BY doc_id ORDER BY s"
            "      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_e"
            "   FROM hits),"
            " isl AS (SELECT doc_id, s, e,"
            "    sum(CASE WHEN prev_e IS NULL OR s > prev_e + 1"
            "      THEN 1 ELSE 0 END)"
            "      OVER (PARTITION BY doc_id ORDER BY s) AS isl FROM pe)"
            " SELECT doc_id, CAST(min(s) AS BIGINT) AS span_start,"
            "  CAST(max(e) - min(s) + 1 AS BIGINT) AS span_len"
            " FROM isl GROUP BY doc_id, isl"
        ),
        "token_decontaminate": (
            "WITH cg AS (SELECT doc_id, list_distinct(list_transform("
            "   generate_series(1, greatest(len(tokens)-4, 0)),"
            "   i -> CAST(tokens[i] AS VARCHAR) || ',' ||"
            "        CAST(tokens[i+1] AS VARCHAR) || ',' ||"
            "        CAST(tokens[i+2] AS VARCHAR) || ',' ||"
            "        CAST(tokens[i+3] AS VARCHAR) || ',' ||"
            "        CAST(tokens[i+4] AS VARCHAR))) AS gs"
            f"  FROM read_parquet('{_token_corpus_path()}/*.parquet')),"
            " bg AS (SELECT DISTINCT unnest(gs) AS g FROM cg WHERE doc_id % 67 = 66),"
            " hits AS (SELECT doc_id, unnest(gs) AS g FROM cg WHERE doc_id % 67 <> 66)"
            " SELECT doc_id AS id, count(*) AS n_hits"
            " FROM hits JOIN bg USING (g) GROUP BY doc_id"
        ),
        "dup_components": (
            "WITH RECURSIVE sh AS (SELECT doc_id, list_sort(list_distinct(list_transform("
            "   generate_series(1, greatest(len(ws)-2, 0)),"
            "   i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS g"
            f"  FROM (SELECT doc_id, {_WS} AS ws FROM documents)),"
            " pairs AS (SELECT id_a, id_b FROM ("
            "  SELECT a.doc_id AS id_a, b.doc_id AS id_b,"
            "   CASE WHEN len(list_distinct(a.g || b.g)) = 0 THEN 0.0"
            "    ELSE len(list_intersect(a.g, b.g))"
            "     / CAST(len(list_distinct(a.g || b.g)) AS DOUBLE) END AS j"
            "  FROM sh a JOIN sh b ON a.doc_id < b.doc_id"
            "   AND len(a.g) * 5 >= len(b.g) * 4 AND len(b.g) * 5 >= len(a.g) * 4) WHERE j >= 0.8),"
            " edges AS (SELECT id_a AS src, id_b AS dst FROM pairs"
            "  UNION ALL SELECT id_b, id_a FROM pairs),"
            " nodes AS (SELECT DISTINCT src AS id FROM edges),"
            " reach(id, r) AS ("
            "  SELECT id, id FROM nodes"
            "  UNION"
            "  SELECT e.dst, re.r FROM reach re JOIN edges e ON e.src = re.id)"
            " SELECT id, min(r) AS component FROM reach GROUP BY id"
        ),
        "quality_survivors": (
            # same recursive-CTE closure as dup_components, then keep the
            # highest-n_chars member per component (ties -> min id)
            "WITH RECURSIVE sh AS (SELECT doc_id, list_sort(list_distinct(list_transform("
            "   generate_series(1, greatest(len(ws)-2, 0)),"
            "   i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS g"
            f"  FROM (SELECT doc_id, {_WS} AS ws FROM documents)),"
            " pairs AS (SELECT id_a, id_b FROM ("
            "  SELECT a.doc_id AS id_a, b.doc_id AS id_b,"
            "   CASE WHEN len(list_distinct(a.g || b.g)) = 0 THEN 0.0"
            "    ELSE len(list_intersect(a.g, b.g))"
            "     / CAST(len(list_distinct(a.g || b.g)) AS DOUBLE) END AS j"
            "  FROM sh a JOIN sh b ON a.doc_id < b.doc_id"
            "   AND len(a.g) * 5 >= len(b.g) * 4 AND len(b.g) * 5 >= len(a.g) * 4) WHERE j >= 0.8),"
            " edges AS (SELECT id_a AS src, id_b AS dst FROM pairs"
            "  UNION ALL SELECT id_b, id_a FROM pairs),"
            " nodes AS (SELECT DISTINCT src AS id FROM edges),"
            " reach(id, r) AS ("
            "  SELECT id, id FROM nodes"
            "  UNION"
            "  SELECT e.dst, re.r FROM reach re JOIN edges e ON e.src = re.id),"
            " comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id)"
            " SELECT component, keep_id, n_docs FROM ("
            "  SELECT c.component, c.id AS keep_id,"
            "   CAST(count(*) OVER (PARTITION BY c.component) AS BIGINT)"
            "    AS n_docs,"
            "   row_number() OVER (PARTITION BY c.component"
            "    ORDER BY d.n_chars DESC, c.id ASC) AS rn"
            "  FROM comp c JOIN documents d ON d.doc_id = c.id)"
            " WHERE rn = 1"
        ),
        "near_dedup_count": (
            "WITH RECURSIVE sh AS (SELECT doc_id, list_sort(list_distinct(list_transform("
            "   generate_series(1, greatest(len(ws)-2, 0)),"
            "   i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS g"
            f"  FROM (SELECT doc_id, {_WS} AS ws FROM documents)),"
            " pairs AS (SELECT id_a, id_b FROM ("
            "  SELECT a.doc_id AS id_a, b.doc_id AS id_b,"
            "   CASE WHEN len(list_distinct(a.g || b.g)) = 0 THEN 0.0"
            "    ELSE len(list_intersect(a.g, b.g))"
            "     / CAST(len(list_distinct(a.g || b.g)) AS DOUBLE) END AS j"
            "  FROM sh a JOIN sh b ON a.doc_id < b.doc_id"
            "   AND len(a.g) * 5 >= len(b.g) * 4 AND len(b.g) * 5 >= len(a.g) * 4) WHERE j >= 0.8),"
            " edges AS (SELECT id_a AS src, id_b AS dst FROM pairs"
            "  UNION ALL SELECT id_b, id_a FROM pairs),"
            " nodes AS (SELECT DISTINCT src AS id FROM edges),"
            " reach(id, r) AS ("
            "  SELECT id, id FROM nodes"
            "  UNION"
            "  SELECT e.dst, re.r FROM reach re JOIN edges e ON e.src = re.id),"
            " comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id)"
            " SELECT (SELECT count(*) FROM documents)"
            "   - (SELECT count(*) FROM comp WHERE id <> component) AS n_kept,"
            "  (SELECT count(*) FROM documents) AS n_docs"
        ),
        "leakage_safe_split": (
            "WITH RECURSIVE sh AS (SELECT doc_id, list_sort(list_distinct(list_transform("
            "   generate_series(1, greatest(len(ws)-2, 0)),"
            "   i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS g"
            f"  FROM (SELECT doc_id, {_WS} AS ws FROM documents)),"
            " pairs AS (SELECT id_a, id_b FROM ("
            "  SELECT a.doc_id AS id_a, b.doc_id AS id_b,"
            "   CASE WHEN len(list_distinct(a.g || b.g)) = 0 THEN 0.0"
            "    ELSE len(list_intersect(a.g, b.g))"
            "     / CAST(len(list_distinct(a.g || b.g)) AS DOUBLE) END AS j"
            "  FROM sh a JOIN sh b ON a.doc_id < b.doc_id"
            "   AND len(a.g) * 5 >= len(b.g) * 4 AND len(b.g) * 5 >= len(a.g) * 4) WHERE j >= 0.8),"
            " edges AS (SELECT id_a AS src, id_b AS dst FROM pairs"
            "  UNION ALL SELECT id_b, id_a FROM pairs),"
            " nodes AS (SELECT DISTINCT src AS id FROM edges),"
            " reach(id, r) AS ("
            "  SELECT id, id FROM nodes"
            "  UNION"
            "  SELECT e.dst, re.r FROM reach re JOIN edges e ON e.src = re.id),"
            " comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id)"
            " SELECT d.doc_id AS id,"
            "  coalesce(c.component, d.doc_id) AS representative,"
            "  CASE WHEN "
            + _hex60("CAST(coalesce(c.component, d.doc_id) AS VARCHAR)")
            + "   % 10 < 8 THEN 'train' ELSE 'holdout' END AS split"
            " FROM documents d LEFT JOIN comp c ON d.doc_id = c.id"
        ),
        "ks_drift": (
            "WITH cur AS (SELECT n_chars AS k, count(*) AS c FROM documents"
            "  WHERE lang = 'en' GROUP BY 1),"
            " base AS (SELECT n_chars AS k, count(*) AS c FROM documents GROUP BY 1),"
            " j AS (SELECT coalesce(cur.k, base.k) AS k,"
            "   coalesce(cur.c, 0) AS cur, coalesce(base.c, 0) AS base"
            "  FROM cur FULL OUTER JOIN base ON cur.k = base.k),"
            " t AS (SELECT sum(cur) AS n_cur, sum(base) AS n_base FROM j),"
            " c AS (SELECT sum(cur) OVER (ORDER BY k) / CAST(n_cur AS DOUBLE) AS cdf_cur,"
            "   sum(base) OVER (ORDER BY k) / CAST(n_base AS DOUBLE) AS cdf_base"
            "  FROM j, t)"
            " SELECT round(max(abs(cdf_cur - cdf_base)), 6) AS ks FROM c"
        ),
        "emd_drift": (
            "WITH cur AS (SELECT n_chars AS k, count(*) AS c FROM documents"
            "  WHERE lang = 'en' GROUP BY 1),"
            " base AS (SELECT n_chars AS k, count(*) AS c FROM documents GROUP BY 1),"
            " j AS (SELECT coalesce(cur.k, base.k) AS k,"
            "   coalesce(cur.c, 0) AS cur, coalesce(base.c, 0) AS base"
            "  FROM cur FULL OUTER JOIN base ON cur.k = base.k),"
            " t AS (SELECT sum(cur) AS n_cur, sum(base) AS n_base FROM j),"
            " c AS (SELECT sum(cur) OVER (ORDER BY k) / CAST(n_cur AS DOUBLE) AS cdf_cur,"
            "   sum(base) OVER (ORDER BY k) / CAST(n_base AS DOUBLE) AS cdf_base,"
            "   lead(k) OVER (ORDER BY k) - k AS gap"
            "  FROM j, t)"
            " SELECT round(sum(abs(cdf_cur - cdf_base) * gap), 6) AS emd"
            " FROM c WHERE gap IS NOT NULL"
        ),
        "chi2_drift": (
            "WITH hist AS (SELECT CASE WHEN n_chars < 0 THEN -1 WHEN n_chars >= 600 THEN 12"
            "   ELSE CAST(floor(n_chars / 50.0) AS INT) END AS bucket,"
            "   count(*) AS cnt_all,"
            "   count(*) FILTER (WHERE lang = 'en') AS cnt_en"
            "  FROM documents GROUP BY 1),"
            " tot AS (SELECT sum(cnt_en) AS n_cur, sum(cnt_all) AS n_base FROM hist)"
            " SELECT bucket, round(pow(cnt_en - e, 2) / e, 6) AS chi2_term FROM ("
            "  SELECT bucket, cnt_en,"
            "   CAST(n_cur AS DOUBLE) * cnt_all / n_base AS e"
            "  FROM hist, tot WHERE cnt_all > 0)"
        ),
        "token_entropy": (
            "SELECT doc_id, round(CASE WHEN len(ws) = 0 THEN 0.0 ELSE"
            "  -list_sum(list_transform(list_sort(list_distinct(ws)),"
            "    w -> (len(list_filter(ws, x -> x = w)) / CAST(len(ws) AS DOUBLE))"
            "      * ln(len(list_filter(ws, x -> x = w)) / CAST(len(ws) AS DOUBLE))))"
            "  END, 6) AS entropy"
            f" FROM (SELECT doc_id, {_WS} AS ws FROM documents)"
        ),
        "hash_sample": (
            "SELECT doc_id FROM documents WHERE "
            + _hex60("CAST(doc_id AS VARCHAR)")
            + " % 100 < 5"
        ),
        "source_cap": (
            "SELECT source, count(*) AS n_kept FROM ("
            " SELECT source, row_number() OVER ("
            "  PARTITION BY source ORDER BY doc_id) AS rn"
            " FROM documents) WHERE rn <= 30 GROUP BY source"
        ),
        "repetition_score": (
            "SELECT doc_id, round(CASE WHEN len(g) = 0 THEN 0.0"
            "  ELSE 1.0 - len(list_distinct(g)) / CAST(len(g) AS DOUBLE) END, 6)"
            "  AS rep_ratio"
            " FROM (SELECT doc_id, list_transform("
            "   generate_series(1, greatest(len(ws)-2, 0)),"
            "   i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) AS g"
            f"  FROM (SELECT doc_id, {_WS} AS ws FROM documents))"
        ),
        "pii_scan": (
            "SELECT CAST(sum(len(regexp_extract_all(text, '"
            + PII_PATTERNS[0]
            + "'))) AS BIGINT) AS n_email,"
            " CAST(sum(len(regexp_extract_all(text, '"
            + PII_PATTERNS[1]
            + "'))) AS BIGINT) AS n_ssn,"
            " CAST(sum(len(regexp_extract_all(text, '"
            + PII_PATTERNS[2]
            + "'))) AS BIGINT) AS n_digit_runs,"
            " count(*) FILTER (WHERE regexp_matches(text, '"
            + PII_PATTERNS[0]
            + "')) AS n_email_docs,"
            " count(*) AS n_docs"
            " FROM read_parquet('" + _pii_corpus_path() + "/*.parquet')"
        ),
        "boilerplate_lines": (
            "SELECT line, count(*) AS n_docs FROM ("
            " SELECT DISTINCT doc_id, unnest(string_split(text, chr(10))) AS line"
            f" FROM read_parquet('{_line_corpus_path()}/*.parquet'))"
            " GROUP BY line HAVING count(*) >= 100"
        ),
        "boilerplate_strip": (
            "WITH docs AS (SELECT doc_id, string_split(text, chr(10)) AS ls"
            f" FROM read_parquet('{_line_corpus_path()}/*.parquet')),"
            " pairs AS (SELECT DISTINCT doc_id, unnest(ls) AS line FROM docs),"
            " bp AS (SELECT coalesce(list(line), []) AS bpl FROM ("
            "  SELECT line FROM pairs GROUP BY line HAVING count(*) >= 100)),"
            " clean AS (SELECT doc_id,"
            "  list_filter(ls, x -> NOT list_contains(bpl, x)) AS kept"
            "  FROM docs, bp)"
            " SELECT doc_id AS id, CAST(len(kept) AS BIGINT) AS n_kept,"
            "  md5(array_to_string(kept, chr(10))) AS clean_fp FROM clean"
        ),
        "rare_token_rate": (
            "WITH t AS (SELECT doc_id, unnest(tokens) AS tok"
            f" FROM read_parquet('{_zipf_corpus_path()}/*.parquet')),"
            " f AS (SELECT tok, count(*) AS cnt FROM t GROUP BY tok),"
            " d AS (SELECT t.doc_id, count(*) AS n_tok,"
            "  sum(CASE WHEN f.cnt < 5 THEN 1 ELSE 0 END) AS n_rare"
            "  FROM t JOIN f USING (tok) GROUP BY t.doc_id)"
            " SELECT doc_id AS id, CAST(n_tok AS BIGINT) AS n_tok,"
            "  CAST(n_rare AS BIGINT) AS n_rare,"
            "  round(n_rare / CAST(n_tok AS DOUBLE), 6) AS rare_rate FROM d"
        ),
        "jsonl_ingest": (
            "SELECT count(*) AS n_valid,"
            " CAST(sum(user_id) AS BIGINT) AS sum_user,"
            " count(DISTINCT event_type) AS n_types"
            " FROM read_json('" + _jsonl_path() + "',"
            " format = 'newline_delimited', ignore_errors = true,"
            " columns = {event_id: 'BIGINT', user_id: 'BIGINT',"
            "  event_type: 'VARCHAR', value: 'DOUBLE'})"
            # ignore_errors yields an all-NULL row (not a skip) per corrupt
            # line; valid events always carry event_id, so this is the
            # corrupt-row filter on the DuckDB side
            " WHERE event_id IS NOT NULL"
        ),
        "ntok_quantiles": (
            "SELECT round(quantile_cont(n_chars, 0.25), 6) AS p25,"
            " round(quantile_cont(n_chars, 0.50), 6) AS p50,"
            " round(quantile_cont(n_chars, 0.75), 6) AS p75,"
            " round(quantile_cont(n_chars, 0.99), 6) AS p99"
            " FROM documents"
        ),
        "tuple_items": (
            "SELECT count(*) FILTER (WHERE p_size >= 10 AND p_retailprice <= 1500)"
            " AS n_pass, count(*) AS n_rows FROM part"
        ),
        "map_object": (
            "SELECT count(*) FILTER (WHERE json_valid(props)"
            " AND json_type(json(props)) = 'OBJECT'"
            " AND list_contains(json_keys(json(props)), 'k')"
            " AND len(json_keys(json(props))) BETWEEN 1 AND 2) AS n_pass,"
            " count(*) AS n_rows FROM events"
        ),
        "windowed_counts": (
            "SELECT strftime(time_bucket(INTERVAL 6 HOUR, ts),"
            " '%Y-%m-%d %H:%M:%S') AS window_start,"
            " count(*) AS n_events,"
            " count(*) FILTER (WHERE value >= 100) AS n_high"
            " FROM events GROUP BY 1"
        ),
        "pattern_properties": (
            "SELECT count(*) FILTER (WHERE json_valid(props)"
            " AND json_type(json(props)) = 'OBJECT'"
            " AND len(list_filter(json_keys(json(props)),"
            "   k -> NOT regexp_matches(k, '^[a-z]$')"
            "    OR NOT regexp_matches(json_extract_string(props, '$.' || k),"
            "         '^[0-9]$'))) = 0) AS n_pass,"
            " count(*) AS n_rows FROM events"
        ),
        "exact_dedup_groups": (
            f"SELECT md5({_NORM}) AS fingerprint, count(*) AS n_docs,"
            " min(doc_id) AS keep_id FROM documents"
            " GROUP BY 1 HAVING count(*) > 1"
        ),
        "dedup_count": (
            f"SELECT count(DISTINCT md5({_NORM})) AS n_kept,"
            " count(*) AS n_docs FROM documents"
        ),
        "ngram_jaccard_pairs": (
            "WITH sh AS (SELECT doc_id, list_sort(list_distinct(list_transform("
            "   generate_series(1, greatest(len(ws)-2, 0)),"
            "   i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS g"
            f"  FROM (SELECT doc_id, {_WS} AS ws FROM documents))"
            " SELECT id_a, id_b, jaccard FROM ("
            "  SELECT a.doc_id AS id_a, b.doc_id AS id_b,"
            "   round(CASE WHEN len(list_distinct(a.g || b.g)) = 0 THEN 0.0"
            "    ELSE len(list_intersect(a.g, b.g))"
            "     / CAST(len(list_distinct(a.g || b.g)) AS DOUBLE) END, 6) AS jaccard"
            "  FROM sh a JOIN sh b ON a.doc_id < b.doc_id"
            "   AND len(a.g) * 5 >= len(b.g) * 4 AND len(b.g) * 5 >= len(a.g) * 4)"
            " WHERE jaccard >= 0.8"
        ),
        # minhash's exact-Jaccard verification (zero false positives) plus
        # banding recall (1-j^4)^32 <= 5e-8 per pair at j >= 0.8 means its
        # output IS the exact pair set — same oracle as the brute-force query
        "minhash_near_dup": (
            "WITH sh AS (SELECT doc_id, list_sort(list_distinct(list_transform("
            "   generate_series(1, greatest(len(ws)-2, 0)),"
            "   i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS g"
            f"  FROM (SELECT doc_id, {_WS} AS ws FROM documents))"
            " SELECT id_a, id_b, jaccard FROM ("
            "  SELECT a.doc_id AS id_a, b.doc_id AS id_b,"
            "   round(CASE WHEN len(list_distinct(a.g || b.g)) = 0 THEN 0.0"
            "    ELSE len(list_intersect(a.g, b.g))"
            "     / CAST(len(list_distinct(a.g || b.g)) AS DOUBLE) END, 6) AS jaccard"
            "  FROM sh a JOIN sh b ON a.doc_id < b.doc_id"
            "   AND len(a.g) * 5 >= len(b.g) * 4 AND len(b.g) * 5 >= len(a.g) * 4)"
            " WHERE jaccard >= 0.8"
        ),
        "simhash_near_dup": _simhash_oracle_sql(),
        "token_dedup_groups": (
            "SELECT md5(array_to_string(tokens, ',')) AS fingerprint,"
            " count(*) AS n_docs, min(doc_id) AS keep_id"
            f" FROM read_parquet('{_token_corpus_path()}/*.parquet')"
            " GROUP BY 1 HAVING count(*) > 1"
        ),
        "incremental_dedup": (
            "WITH fp AS (SELECT doc_id, md5(array_to_string(tokens, ',')) AS fingerprint"
            f" FROM read_parquet('{_token_corpus_path()}/*.parquet')),"
            " fresh AS (SELECT * FROM fp WHERE doc_id >= 736 AND fingerprint NOT IN"
            "  (SELECT fingerprint FROM fp WHERE doc_id < 736))"
            " SELECT min(doc_id) AS doc_id, fingerprint FROM fresh GROUP BY fingerprint"
        ),
        # LSH recall at j >= 0.8 is 1 - 5e-8 per pair (see minhash_near_dup
        # note) and the verify stage is exact, so survivors = batch docs
        # with no brute-force Jaccard >= 0.8 snapshot match
        "incremental_near_dup": (
            "WITH sh AS (SELECT doc_id, len(tokens) AS n_tok,"
            "  list_sort(list_distinct(list_transform("
            "   generate_series(1, greatest(len(tokens)-2, 0)),"
            "   i -> CAST(tokens[i] AS VARCHAR) || ',' ||"
            "        CAST(tokens[i+1] AS VARCHAR) || ',' ||"
            "        CAST(tokens[i+2] AS VARCHAR)))) AS g,"
            "   is_batch FROM (SELECT doc_id, tokens,"
            "    (doc_id % 67 = 66 OR doc_id % 41 = 40 OR doc_id % 13 = 0)"
            "     AS is_batch"
            f"   FROM read_parquet('{_token_corpus_path()}/*.parquet'))),"
            " m AS (SELECT DISTINCT b.doc_id FROM sh b JOIN sh s"
            "   ON b.is_batch AND NOT s.is_batch"
            "   AND len(b.g) * 5 >= len(s.g) * 4 AND len(s.g) * 5 >= len(b.g) * 4"
            "  WHERE round(CASE WHEN len(list_distinct(b.g || s.g)) = 0 THEN 0.0"
            "   ELSE len(list_intersect(b.g, s.g))"
            "    / CAST(len(list_distinct(b.g || s.g)) AS DOUBLE) END, 6) >= 0.8)"
            " SELECT doc_id, n_tok FROM sh WHERE is_batch"
            "  AND doc_id NOT IN (SELECT doc_id FROM m)"
        ),
        "token_minhash_near_dup": (
            "WITH sh AS (SELECT doc_id, list_sort(list_distinct(list_transform("
            "   generate_series(1, greatest(len(tokens)-2, 0)),"
            "   i -> CAST(tokens[i] AS VARCHAR) || ',' ||"
            "        CAST(tokens[i+1] AS VARCHAR) || ',' ||"
            "        CAST(tokens[i+2] AS VARCHAR)))) AS g"
            f"  FROM read_parquet('{_token_corpus_path()}/*.parquet'))"
            " SELECT id_a, id_b, jaccard FROM ("
            "  SELECT a.doc_id AS id_a, b.doc_id AS id_b,"
            "   round(CASE WHEN len(list_distinct(a.g || b.g)) = 0 THEN 0.0"
            "    ELSE len(list_intersect(a.g, b.g))"
            "     / CAST(len(list_distinct(a.g || b.g)) AS DOUBLE) END, 6) AS jaccard"
            "  FROM sh a JOIN sh b ON a.doc_id < b.doc_id"
            "   AND len(a.g) * 5 >= len(b.g) * 4 AND len(b.g) * 5 >= len(a.g) * 4)"
            " WHERE jaccard >= 0.8"
        ),
        "ann_topk": _ann_oracle_sql(),
        "ivf_topk": _ivf_oracle_sql(),
        "semdedup": _semdedup_oracle_sql(threshold=0.4),
        "diverse_sample": _diverse_sample_oracle_sql(),
        "lang_id_counts": (
            "WITH r AS (SELECT"
            f"  len(list_filter(ws, w -> list_contains({_stoplist('de')}, w))) / CAST(len(ws) AS DOUBLE) AS r_de,"
            f"  len(list_filter(ws, w -> list_contains({_stoplist('en')}, w))) / CAST(len(ws) AS DOUBLE) AS r_en,"
            f"  len(list_filter(ws, w -> list_contains({_stoplist('es')}, w))) / CAST(len(ws) AS DOUBLE) AS r_es,"
            f"  len(list_filter(ws, w -> list_contains({_stoplist('fr')}, w))) / CAST(len(ws) AS DOUBLE) AS r_fr"
            f" FROM (SELECT {_WS} AS ws FROM documents))"
            " SELECT CASE WHEN greatest(r_de, r_en, r_es, r_fr) <= 0 THEN 'und'"
            "  WHEN r_fr >= r_es AND r_fr >= r_en AND r_fr >= r_de THEN 'fr'"
            "  WHEN r_es >= r_en AND r_es >= r_de THEN 'es'"
            "  WHEN r_en >= r_de THEN 'en' ELSE 'de' END AS lang_pred,"
            " count(*) AS n_docs FROM r GROUP BY 1"
        ),
        "quality_score": (
            "SELECT doc_id, round(CASE WHEN n = 0 THEN 0.0 ELSE"
            "  (least(n / 100.0, 1.0)"
            "   + nd / CAST(n AS DOUBLE)"
            "   + least(hits / (n * 0.4), 1.0)"
            "   + (1.0 - least(abs(tc / CAST(n AS DOUBLE) - 5.0) / 5.0, 1.0))"
            "  ) / 4.0 END, 6) AS quality"
            " FROM (SELECT doc_id, len(ws) AS n, len(list_distinct(ws)) AS nd,"
            f"  len(list_filter(ws, w -> list_contains({_stoplist('*')}, w))) AS hits,"
            "  list_sum(list_transform(ws, w -> length(w))) AS tc"
            f" FROM (SELECT doc_id, {_WS} AS ws FROM documents))"
        ),
        "token_stats": (
            "SELECT doc_id,"
            " (CASE WHEN trim(text) = '' THEN 0"
            "  ELSE len(string_split_regex(trim(text), '\\s+')) END) AS n_ws_tokens,"
            " CAST(list_sum(list_transform("
            "  regexp_extract_all(text, '([A-Za-z]+|[0-9]+|[^\\sA-Za-z0-9])'),"
            "  p -> ceil(length(p) / 6.0))) AS BIGINT) AS n_bpe_tokens"
            " FROM documents"
        ),
        "tokenizer_fertility": (
            "WITH t AS (SELECT source,"
            " (CASE WHEN trim(text) = '' THEN 0"
            "  ELSE len(string_split_regex(trim(text), '\\s+')) END) AS ws,"
            " coalesce(CAST(list_sum(list_transform("
            "  regexp_extract_all(text, '([A-Za-z]+|[0-9]+|[^\\sA-Za-z0-9])'),"
            "  p -> ceil(length(p) / 6.0))) AS BIGINT), 0) AS bpe,"
            " length(text) AS chars FROM documents)"
            " SELECT source, count(*) AS n_docs,"
            " round(avg(CASE WHEN ws > 0 THEN bpe / CAST(ws AS DOUBLE) END), 6)"
            "  AS mean_fertility,"
            " round(avg(CASE WHEN bpe > 0 THEN chars / CAST(bpe AS DOUBLE) END), 6)"
            "  AS mean_chars_per_token,"
            " round(avg(CASE WHEN ws > 0 AND bpe / CAST(ws AS DOUBLE) >= 1.2"
            "  THEN 1 ELSE 0 END), 6) AS high_fertility_rate,"
            " CASE WHEN round(avg(CASE WHEN ws > 0 AND bpe / CAST(ws AS DOUBLE)"
            "  >= 1.2 THEN 1 ELSE 0 END), 6) <= 0.25 THEN 'pass' ELSE 'fail'"
            "  END AS verdict"
            " FROM t GROUP BY source"
        ),
        "doc_fingerprint": (
            f"SELECT doc_id, md5({_NORM}) AS fingerprint FROM documents"
        ),
        "embedding_topk": (
            "SELECT vec_id, round(list_cosine_similarity("
            "  CAST(embedding AS DOUBLE[]),"
            "  (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)"
            " ), 6) AS score"
            " FROM embeddings ORDER BY score DESC, vec_id LIMIT 10"
        ),
        "embedding_topk_kernel": (
            "SELECT vec_id, round(list_cosine_similarity("
            "  CAST(embedding AS DOUBLE[]),"
            "  (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)"
            " ), 6) AS score"
            " FROM embeddings ORDER BY score DESC, vec_id LIMIT 10"
        ),
        "incremental_embedding_dedup": _incremental_embedding_oracle_sql(),
        "embedding_near_dup": (
            "SELECT id_a, id_b, score FROM ("
            " SELECT a.vec_id AS id_a, b.vec_id AS id_b,"
            "  round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),"
            "   CAST(b.embedding AS DOUBLE[])), 6) AS score"
            " FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)"
            " WHERE score >= 0.3"
        ),
        "blob_stats": (
            "SELECT count(*) AS n_blobs,"
            " CAST(sum(strlen(text)) AS BIGINT) AS total_bytes,"
            " round(avg(strlen(text)), 3) AS avg_bytes,"
            " CAST(max(strlen(text)) AS BIGINT) AS max_bytes,"
            " count(DISTINCT md5(text)) AS distinct_payloads"
            " FROM documents"
        ),
        "frame_sample_counts": (
            "SELECT doc_id, CAST(floor((floor(strlen(text) / 16) + 3) / 4)"
            "  AS BIGINT) AS n_frames"
            " FROM documents WHERE strlen(text) >= 16"
        ),
        "source_violation_rates": (
            "WITH agg AS (SELECT source, count(*) AS n,"
            "   CAST(count(*) FILTER (WHERE n_chars > 450) AS BIGINT) AS fails"
            "  FROM documents GROUP BY source),"
            " w AS (SELECT source, n, fails,"
            "   fails / CAST(n AS DOUBLE) AS p,"
            "   1.96 * 1.96 AS z2, CAST(n AS DOUBLE) AS nd FROM agg)"
            " SELECT source, n, fails, round(p, 6) AS rate,"
            "  round(greatest((p + z2 / (2 * nd)) / (1 + z2 / nd)"
            "   - 1.96 * sqrt(p * (1 - p) / nd + z2 / (4 * nd * nd))"
            "     / (1 + z2 / nd), 0.0), 6) AS wilson_lo,"
            "  round(least((p + z2 / (2 * nd)) / (1 + z2 / nd)"
            "   + 1.96 * sqrt(p * (1 - p) / nd + z2 / (4 * nd * nd))"
            "     / (1 + z2 / nd), 1.0), 6) AS wilson_hi"
            " FROM w"
        ),
        "ntok_iqr_outliers": (
            "WITH b AS (SELECT source,"
            "   quantile_cont(n_chars, 0.25) AS q1,"
            "   quantile_cont(n_chars, 0.75) AS q3"
            "  FROM documents GROUP BY source),"
            " f AS (SELECT source, q1, q3,"
            "   q1 - 1.5 * (q3 - q1) AS lo, q3 + 1.5 * (q3 - q1) AS hi FROM b)"
            " SELECT d.source, round(f.q1, 6) AS q1, round(f.q3, 6) AS q3,"
            "  round(f.lo, 6) AS lo, round(f.hi, 6) AS hi,"
            "  count(*) AS n,"
            "  CAST(count(*) FILTER (WHERE CAST(d.n_chars AS DOUBLE) < f.lo"
            "    OR CAST(d.n_chars AS DOUBLE) > f.hi) AS BIGINT) AS n_outliers"
            " FROM documents d JOIN f ON d.source = f.source"
            " GROUP BY d.source, f.q1, f.q3, f.lo, f.hi"
        ),
        "monotonic_check": (
            "SELECT count(*) FILTER (WHERE pv IS NOT NULL) AS n_pairs,"
            "  CAST(coalesce(sum(CASE WHEN value < pv THEN 1 ELSE 0 END), 0)"
            "   AS BIGINT) AS n_violations"
            " FROM (SELECT value, lag(value) OVER ("
            "   PARTITION BY user_id ORDER BY event_id) AS pv FROM events)"
        ),
        "embedding_drift": (
            "WITH cur AS (SELECT dim, avg(v) AS mc FROM ("
            "   SELECT generate_subscripts(embedding, 1) AS dim,"
            "    CAST(unnest(embedding) AS DOUBLE) AS v"
            "   FROM embeddings WHERE label < 5) GROUP BY dim),"
            " base AS (SELECT dim, avg(v) AS mb FROM ("
            "   SELECT generate_subscripts(embedding, 1) AS dim,"
            "    CAST(unnest(embedding) AS DOUBLE) AS v"
            "   FROM embeddings) GROUP BY dim),"
            " s AS (SELECT sum(mc * mb) AS dot, sum(mc * mc) AS nc,"
            "   sum(mb * mb) AS nb, sum(pow(mc - mb, 2)) AS sq"
            "  FROM cur JOIN base USING (dim))"
            " SELECT round(dot / (sqrt(nc) * sqrt(nb)), 6) AS mean_cosine,"
            "  round(sqrt(sq), 6) AS l2_shift FROM s"
        ),
        "sequence_packing": (
            "WITH RECURSIVE ordered AS ("
            "  SELECT doc_id AS id, CAST(n_chars AS BIGINT) AS n_tok,"
            f"   CAST({_hex60('CAST(doc_id AS VARCHAR)')} % 8 AS INT) AS stream,"
            f"   {_hex60('CAST(doc_id AS VARCHAR)')} AS h,"
            "   row_number() OVER ("
            f"    PARTITION BY ({_hex60('CAST(doc_id AS VARCHAR)')} % 8)"
            f"    ORDER BY {_hex60('CAST(doc_id AS VARCHAR)')}, doc_id) AS rn"
            "  FROM documents),"
            " walk AS ("
            "  SELECT stream, rn, id, n_tok, n_tok AS acc,"
            "    CAST(0 AS BIGINT) AS pack_id"
            "   FROM ordered WHERE rn = 1"
            "  UNION ALL"
            "  SELECT o.stream, o.rn, o.id, o.n_tok,"
            "    CASE WHEN w.acc + o.n_tok <= 2000 THEN w.acc + o.n_tok"
            "     ELSE o.n_tok END,"
            "    CASE WHEN w.acc + o.n_tok <= 2000 THEN w.pack_id"
            "     ELSE w.pack_id + 1 END"
            "   FROM walk w JOIN ordered o"
            "    ON o.stream = w.stream AND o.rn = w.rn + 1)"
            " SELECT stream, pack_id, count(*) AS n_docs,"
            "  CAST(sum(n_tok) AS BIGINT) AS pack_tokens,"
            "  round(least(sum(n_tok) / 2000.0, 1.0), 6) AS fill_ratio,"
            "  sum(n_tok) > 2000 AS oversize"
            " FROM walk GROUP BY 1, 2"
        ),
        "tfidf_top_terms": (
            f"WITH toks AS (SELECT doc_id, unnest({_WS}) AS term FROM documents),"
            " tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),"
            " dfreq AS (SELECT term, count(*) AS doc_freq FROM tf GROUP BY 1),"
            " n AS (SELECT count(*) AS n_docs FROM documents),"
            " scored AS (SELECT doc_id, term, tf, doc_freq,"
            "   tf * ln((1.0 + n_docs) / (1.0 + doc_freq)) AS s"
            "  FROM tf JOIN dfreq USING (term) CROSS JOIN n),"
            " ranked AS (SELECT doc_id, term, tf, doc_freq, s,"
            "   row_number() OVER (PARTITION BY doc_id ORDER BY s DESC, term)"
            "    AS rnk FROM scored)"
            " SELECT doc_id, term, tf, doc_freq, round(s, 6) AS tfidf,"
            "  CAST(rnk AS BIGINT) AS rank FROM ranked WHERE rnk <= 3"
        ),
        "unigram_ppl": (
            f"WITH toks AS (SELECT doc_id, source = 'src0' AS is_ref,"
            f"   unnest({_WS}) AS term FROM documents),"
            " bucketed AS (SELECT doc_id, is_ref,"
            "   CAST(concat('0x', substr(md5(term), 1, 15)) AS BIGINT) % 1024"
            "    AS bucket FROM toks),"
            " model AS (SELECT bucket, count(*) AS ref_cnt FROM bucketed"
            "  WHERE is_ref GROUP BY bucket),"
            " total AS (SELECT sum(ref_cnt) AS ref_tot FROM model),"
            " scored AS (SELECT doc_id,"
            "   ln((COALESCE(ref_cnt, 0) + 1.0) / (ref_tot + 1.0 * 1024))"
            "    AS logp"
            "  FROM bucketed LEFT JOIN model USING (bucket) CROSS JOIN total"
            "  WHERE NOT is_ref),"
            " ppl AS (SELECT doc_id, count(*) AS n_tok,"
            "   round(-avg(logp), 6) AS xent,"
            "   round(exp(-avg(logp)), 6) AS ppl"
            "  FROM scored GROUP BY doc_id)"
            " SELECT doc_id, n_tok, xent, ppl,"
            "  CAST(ntile(3) OVER (ORDER BY ppl ASC, doc_id ASC) AS INT)"
            "   AS tile"
            " FROM ppl"
        ),
        "dsir_select": (
            f"WITH toks AS (SELECT doc_id, source = 'src0' AS is_t,"
            f"   unnest({_WS}) AS term FROM documents),"
            " bucketed AS (SELECT doc_id, is_t,"
            "   CAST(concat('0x', substr(md5(term), 1, 15)) AS BIGINT) % 1024"
            "    AS bucket FROM toks),"
            " models AS (SELECT bucket,"
            "   sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS t_cnt,"
            "   sum(CASE WHEN is_t THEN 0 ELSE 1 END) AS r_cnt"
            "  FROM bucketed GROUP BY bucket),"
            " totals AS (SELECT sum(t_cnt) AS t_tot, sum(r_cnt) AS r_tot"
            "  FROM models),"
            " ratios AS (SELECT bucket,"
            "   ln((t_cnt + 1.0) / (t_tot + 1.0 * 1024))"
            "   - ln((r_cnt + 1.0) / (r_tot + 1.0 * 1024)) AS log_ratio"
            "  FROM models CROSS JOIN totals),"
            " weights AS (SELECT doc_id, count(*) AS n_tok,"
            "   round(sum(log_ratio), 6) AS weight"
            "  FROM bucketed JOIN ratios USING (bucket)"
            "  WHERE NOT is_t GROUP BY doc_id)"
            " SELECT doc_id, n_tok, weight FROM weights"
            " ORDER BY weight DESC, doc_id ASC LIMIT 20"
        ),
        "infer_spec": (
            "WITH prof AS ("
            " SELECT 'doc_id' AS col, 'integer' AS jtype,"
            "  CAST(min(doc_id) AS DOUBLE) AS lo, CAST(max(doc_id) AS DOUBLE) AS hi,"
            "  count(*) FILTER (WHERE doc_id IS NULL) = 0 AS is_required,"
            "  CAST(NULL AS VARCHAR) AS enum_vals FROM documents"
            " UNION ALL SELECT 'text', 'string',"
            "  CAST(min(strlen(text)) AS DOUBLE), CAST(max(strlen(text)) AS DOUBLE),"
            "  count(*) FILTER (WHERE text IS NULL) = 0,"
            "  CASE WHEN count(DISTINCT text) <= 20"
            "   THEN array_to_string(list_sort(list(DISTINCT text)), ',') END"
            "  FROM documents"
            " UNION ALL SELECT 'lang', 'string',"
            "  CAST(min(strlen(lang)) AS DOUBLE), CAST(max(strlen(lang)) AS DOUBLE),"
            "  count(*) FILTER (WHERE lang IS NULL) = 0,"
            "  CASE WHEN count(DISTINCT lang) <= 20"
            "   THEN array_to_string(list_sort(list(DISTINCT lang)), ',') END"
            "  FROM documents"
            " UNION ALL SELECT 'source', 'string',"
            "  CAST(min(strlen(source)) AS DOUBLE), CAST(max(strlen(source)) AS DOUBLE),"
            "  count(*) FILTER (WHERE source IS NULL) = 0,"
            "  CASE WHEN count(DISTINCT source) <= 20"
            "   THEN array_to_string(list_sort(list(DISTINCT source)), ',') END"
            "  FROM documents"
            " UNION ALL SELECT 'n_chars', 'integer',"
            "  CAST(min(n_chars) AS DOUBLE), CAST(max(n_chars) AS DOUBLE),"
            "  count(*) FILTER (WHERE n_chars IS NULL) = 0,"
            "  CAST(NULL AS VARCHAR) FROM documents)"
            " SELECT col, jtype, lo, hi, is_required, enum_vals FROM prof"
        ),
        "ngram_novelty": (
            "WITH g AS (SELECT doc_id, list_distinct(list_transform("
            "   generate_series(1, greatest(len(ws)-4, 0)),"
            "   i -> CAST(concat('0x', substr(md5(array_to_string(ws[i:i+4],"
            "     ' ')), 1, 15)) AS BIGINT))) AS gs"
            f"  FROM (SELECT doc_id, {_WS} AS ws FROM documents)),"
            " pos AS (SELECT doc_id, unnest(gs) AS gh FROM g),"
            " hot AS (SELECT gh FROM pos GROUP BY gh"
            "   HAVING min(doc_id) <> max(doc_id)),"
            " agg AS (SELECT p.doc_id, count(*) AS n_grams,"
            "   count(h.gh) AS n_shared"
            "  FROM pos p LEFT JOIN hot h USING (gh) GROUP BY p.doc_id)"
            " SELECT d.doc_id, coalesce(a.n_grams, 0) AS n_grams,"
            "  coalesce(a.n_shared, 0) AS n_shared,"
            "  round(CASE WHEN coalesce(a.n_grams, 0) = 0"
            "   THEN CAST(1.0 AS DOUBLE)"
            "   ELSE CAST(1.0 AS DOUBLE) - a.n_shared / CAST(a.n_grams AS DOUBLE)"
            "   END, 6) AS novelty"
            " FROM documents d LEFT JOIN agg a USING (doc_id)"
        ),
        "shared_ngram_pairs": (
            # per-gram doc-frequency ceiling 50 mirrors the engine's
            # max_doc_freq: grams above it are boilerplate, excluded from
            # pairing and counting alike
            "WITH sh AS (SELECT doc_id, unnest(list_distinct(list_transform("
            "   generate_series(1, greatest(len(ws)-12, 0)),"
            "   i -> array_to_string(ws[i:i+12], ' ')))) AS g"
            f"  FROM (SELECT doc_id, {_WS} AS ws FROM documents)),"
            " keep AS (SELECT g FROM sh GROUP BY g"
            "   HAVING count(*) BETWEEN 2 AND 50),"
            " kept AS (SELECT doc_id, g FROM sh JOIN keep USING (g))"
            " SELECT a.doc_id AS id_a, b.doc_id AS id_b,"
            "  count(*) AS n_shared"
            " FROM kept a JOIN kept b ON a.g = b.g AND a.doc_id < b.doc_id"
            " GROUP BY a.doc_id, b.doc_id"
        ),
        "longest_shared_run": (
            # positional 13-grams; candidate pairs via the same df-ceiling
            # gram filter as shared_ngram_pairs; longest diagonal chain of
            # aligned gram matches (gaps-and-islands on i - row_number) + 12
            "WITH d AS (SELECT doc_id, " + _WS + " AS ws FROM documents),"
            " g AS (SELECT doc_id, pg.pos AS pos, pg.gram AS gram FROM ("
            "   SELECT doc_id, unnest(list_transform("
            "    generate_series(1, greatest(len(ws)-12, 0)),"
            "    i -> {'pos': i, 'gram': array_to_string(ws[i:i+12], ' ')}"
            "   )) AS pg FROM d)),"
            " dg AS (SELECT DISTINCT doc_id, gram FROM g),"
            " keep AS (SELECT gram FROM dg GROUP BY gram"
            "   HAVING count(*) BETWEEN 2 AND 50),"
            " kept AS (SELECT doc_id, gram FROM dg JOIN keep USING (gram)),"
            " cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b"
            "   FROM kept a JOIN kept b"
            "   ON a.gram = b.gram AND a.doc_id < b.doc_id),"
            " m AS (SELECT c.id_a, c.id_b, ga.pos AS i,"
            "    ga.pos - gb.pos AS diag"
            "   FROM cand c JOIN g ga ON ga.doc_id = c.id_a"
            "   JOIN g gb ON gb.doc_id = c.id_b AND gb.gram = ga.gram),"
            " r AS (SELECT id_a, id_b, diag, i, row_number() OVER ("
            "    PARTITION BY id_a, id_b, diag ORDER BY i) AS rn FROM m),"
            " chains AS (SELECT id_a, id_b, count(*) AS chain FROM r"
            "   GROUP BY id_a, id_b, diag, i - rn)"
            " SELECT id_a, id_b, CAST(max(chain) + 12 AS BIGINT) AS run_tokens"
            " FROM chains GROUP BY id_a, id_b"
        ),
        "dup_spans": (
            # positional 13-gram hashes (portable_hash60 identity); grams
            # occurring >= 2x corpus-wide mark positions, each gram's
            # globally-first occurrence (by doc_id, pos) exempted
            # (keep_first=True); gaps-and-islands merge into maximal spans
            "WITH d AS (SELECT doc_id, " + _WS + " AS ws FROM documents),"
            " g AS (SELECT doc_id, pg.s AS s, pg.g AS g FROM ("
            "   SELECT doc_id, unnest(list_transform("
            "    generate_series(1, greatest(len(ws)-12, 0)),"
            "    i -> {'s': i, 'g': "
            + _hex60("array_to_string(ws[i:i+12], ' ')")
            + "})) AS pg FROM d)),"
            " r AS (SELECT doc_id, s,"
            "    count(*) OVER (PARTITION BY g) AS occ,"
            "    row_number() OVER (PARTITION BY g ORDER BY doc_id, s) AS rn"
            "   FROM g),"
            " hits AS (SELECT doc_id, s, s + 12 AS e FROM r"
            "   WHERE occ >= 2 AND rn > 1),"
            " pe AS (SELECT doc_id, s, e,"
            "    max(e) OVER (PARTITION BY doc_id ORDER BY s"
            "      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_e"
            "   FROM hits),"
            " isl AS (SELECT doc_id, s, e,"
            "    sum(CASE WHEN prev_e IS NULL OR s > prev_e + 1"
            "      THEN 1 ELSE 0 END)"
            "      OVER (PARTITION BY doc_id ORDER BY s) AS isl FROM pe)"
            " SELECT doc_id, CAST(min(s) AS BIGINT) AS span_start,"
            "  CAST(max(e) - min(s) + 1 AS BIGINT) AS span_len"
            " FROM isl GROUP BY doc_id, isl"
        ),
        "periodic_sequences": (
            # replay the loop injection, then min p<=32 with full-cycle
            # equality; list_min of an empty candidate list is NULL
            "WITH d AS (SELECT doc_id,"
            "  CASE WHEN doc_id % 97 = 96 THEN"
            "   list_transform(generate_series(1, len(tokens)),"
            "    i -> tokens[((i-1) % 5) + 1])"
            "  ELSE tokens END AS t"
            f" FROM read_parquet('{_token_corpus_path()}/*.parquet')),"
            " p AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tok,"
            "   list_min(list_filter(generate_series(1, 32), p ->"
            "    p < len(t) AND len(list_filter("
            "     generate_series(1, len(t) - p),"
            "     i -> t[i + p] = t[i])) = len(t) - p)) AS period"
            "  FROM d)"
            " SELECT doc_id AS id, n_tok, CAST(period AS BIGINT) AS period"
            " FROM p WHERE period IS NOT NULL"
        ),
        "token_dup_spans": (
            # token-native: positional 13-grams of comma-joined token ids
            "WITH d AS (SELECT doc_id, tokens FROM"
            f" read_parquet('{_token_corpus_path()}/*.parquet')),"
            " g AS (SELECT doc_id, pg.s AS s, pg.g AS g FROM ("
            "   SELECT doc_id, unnest(list_transform("
            "    generate_series(1, greatest(len(tokens)-12, 0)),"
            "    i -> {'s': i, 'g': "
            + _hex60("array_to_string(tokens[i:i+12], ',')")
            + "})) AS pg FROM d)),"
            " r AS (SELECT doc_id, s,"
            "    count(*) OVER (PARTITION BY g) AS occ FROM g),"
            " hits AS (SELECT doc_id, s, s + 12 AS e FROM r WHERE occ >= 2),"
            " pe AS (SELECT doc_id, s, e,"
            "    max(e) OVER (PARTITION BY doc_id ORDER BY s"
            "      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_e"
            "   FROM hits),"
            " isl AS (SELECT doc_id, s, e,"
            "    sum(CASE WHEN prev_e IS NULL OR s > prev_e + 1"
            "      THEN 1 ELSE 0 END)"
            "      OVER (PARTITION BY doc_id ORDER BY s) AS isl FROM pe)"
            " SELECT doc_id, CAST(min(s) AS BIGINT) AS span_start,"
            "  CAST(max(e) - min(s) + 1 AS BIGINT) AS span_len"
            " FROM isl GROUP BY doc_id, isl"
        ),
        "ingest_dedup_trend": (
            # fingerprint = md5 of normalized text (functions/text.py);
            # keep-first: min-id copy never counts
            f"WITH f AS (SELECT doc_id, md5({_NORM}) AS fp FROM documents),"
            " m AS (SELECT fp, min(doc_id) AS first_id FROM f GROUP BY 1)"
            " SELECT CAST(floor(f.doc_id / 100) AS BIGINT) AS bucket,"
            "  count(*) AS n_docs,"
            "  CAST(sum(CASE WHEN f.doc_id > m.first_id THEN 1 ELSE 0 END)"
            "   AS BIGINT) AS n_dup_of_earlier,"
            "  round(sum(CASE WHEN f.doc_id > m.first_id THEN 1 ELSE 0 END)"
            "   / CAST(count(*) AS DOUBLE), 6) AS dup_rate"
            " FROM f JOIN m USING (fp) GROUP BY 1"
        ),
        "effective_tokens": (
            # keep-first dup spans (same CTE as dup_spans) -> per-doc
            # masked-token sums -> per-source rollup
            "WITH d AS (SELECT doc_id, source, " + _WS + " AS ws"
            "  FROM documents),"
            " g AS (SELECT doc_id, pg.s AS s, pg.g AS g FROM ("
            "   SELECT doc_id, unnest(list_transform("
            "    generate_series(1, greatest(len(ws)-12, 0)),"
            "    i -> {'s': i, 'g': "
            + _hex60("array_to_string(ws[i:i+12], ' ')")
            + "})) AS pg FROM d)),"
            " r AS (SELECT doc_id, s,"
            "    count(*) OVER (PARTITION BY g) AS occ,"
            "    row_number() OVER (PARTITION BY g ORDER BY doc_id, s) AS rn"
            "   FROM g),"
            " hits AS (SELECT doc_id, s, s + 12 AS e FROM r"
            "   WHERE occ >= 2 AND rn > 1),"
            " pe AS (SELECT doc_id, s, e,"
            "    max(e) OVER (PARTITION BY doc_id ORDER BY s"
            "      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_e"
            "   FROM hits),"
            " isl AS (SELECT doc_id, s, e,"
            "    sum(CASE WHEN prev_e IS NULL OR s > prev_e + 1"
            "      THEN 1 ELSE 0 END)"
            "      OVER (PARTITION BY doc_id ORDER BY s) AS isl FROM pe),"
            " sp AS (SELECT doc_id, max(e) - min(s) + 1 AS sl"
            "   FROM isl GROUP BY doc_id, isl),"
            " agg AS (SELECT doc_id, sum(sl) AS dup FROM sp GROUP BY doc_id)"
            " SELECT d.source, CAST(sum(len(d.ws)) AS BIGINT) AS total_tokens,"
            "  CAST(sum(coalesce(a.dup, 0)) AS BIGINT) AS dup_tokens,"
            "  CAST(sum(len(d.ws)) - sum(coalesce(a.dup, 0)) AS BIGINT)"
            "   AS effective_tokens,"
            "  round(CASE WHEN sum(len(d.ws)) > 0 THEN"
            "   sum(coalesce(a.dup, 0)) / CAST(sum(len(d.ws)) AS DOUBLE)"
            "   ELSE 0.0 END, 6) AS dup_rate"
            " FROM d LEFT JOIN agg a USING (doc_id) GROUP BY d.source"
        ),
        "dup_loss_mask": (
            # keep-first dup spans (same CTE as dup_spans) -> struct list
            # per doc -> per-position membership mask
            "WITH d AS (SELECT doc_id, " + _WS + " AS ws FROM documents),"
            " g AS (SELECT doc_id, pg.s AS s, pg.g AS g FROM ("
            "   SELECT doc_id, unnest(list_transform("
            "    generate_series(1, greatest(len(ws)-12, 0)),"
            "    i -> {'s': i, 'g': "
            + _hex60("array_to_string(ws[i:i+12], ' ')")
            + "})) AS pg FROM d)),"
            " r AS (SELECT doc_id, s,"
            "    count(*) OVER (PARTITION BY g) AS occ,"
            "    row_number() OVER (PARTITION BY g ORDER BY doc_id, s) AS rn"
            "   FROM g),"
            " hits AS (SELECT doc_id, s, s + 12 AS e FROM r"
            "   WHERE occ >= 2 AND rn > 1),"
            " pe AS (SELECT doc_id, s, e,"
            "    max(e) OVER (PARTITION BY doc_id ORDER BY s"
            "      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_e"
            "   FROM hits),"
            " isl AS (SELECT doc_id, s, e,"
            "    sum(CASE WHEN prev_e IS NULL OR s > prev_e + 1"
            "      THEN 1 ELSE 0 END)"
            "      OVER (PARTITION BY doc_id ORDER BY s) AS isl FROM pe),"
            " sp AS (SELECT doc_id, min(s) AS ss, max(e) AS ee"
            "   FROM isl GROUP BY doc_id, isl),"
            " spl AS (SELECT doc_id, list({'s': ss, 'e': ee}) AS sps"
            "   FROM sp GROUP BY doc_id)"
            " SELECT d.doc_id, CAST(len(d.ws) AS BIGINT) AS n_tok,"
            "  CAST(coalesce(list_sum(list_transform(spl.sps,"
            "    x -> x.e - x.s + 1)), 0) AS BIGINT) AS n_masked,"
            "  md5(array_to_string(list_transform("
            "   generate_series(1, len(d.ws)), i ->"
            "   CASE WHEN spl.sps IS NOT NULL AND len(list_filter(spl.sps,"
            "    x -> i >= x.s AND i <= x.e)) > 0 THEN 1 ELSE 0 END), ','))"
            "   AS mask_fp"
            " FROM d LEFT JOIN spl USING (doc_id)"
        ),
        "dup_span_stats": (
            # same positional machinery, keep_first=False (every occurrence
            # marked); spans aggregate to a per-doc repetition scorecard
            "WITH d AS (SELECT doc_id, " + _WS + " AS ws FROM documents),"
            " g AS (SELECT doc_id, pg.s AS s, pg.g AS g FROM ("
            "   SELECT doc_id, unnest(list_transform("
            "    generate_series(1, greatest(len(ws)-12, 0)),"
            "    i -> {'s': i, 'g': "
            + _hex60("array_to_string(ws[i:i+12], ' ')")
            + "})) AS pg FROM d)),"
            " r AS (SELECT doc_id, s,"
            "    count(*) OVER (PARTITION BY g) AS occ FROM g),"
            " hits AS (SELECT doc_id, s, s + 12 AS e FROM r WHERE occ >= 2),"
            " pe AS (SELECT doc_id, s, e,"
            "    max(e) OVER (PARTITION BY doc_id ORDER BY s"
            "      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_e"
            "   FROM hits),"
            " isl AS (SELECT doc_id, s, e,"
            "    sum(CASE WHEN prev_e IS NULL OR s > prev_e + 1"
            "      THEN 1 ELSE 0 END)"
            "      OVER (PARTITION BY doc_id ORDER BY s) AS isl FROM pe),"
            " sp AS (SELECT doc_id, max(e) - min(s) + 1 AS sl"
            "   FROM isl GROUP BY doc_id, isl),"
            " agg AS (SELECT doc_id, count(*) AS n_spans,"
            "   sum(sl) AS dup_tokens FROM sp GROUP BY doc_id)"
            " SELECT d.doc_id, CAST(len(d.ws) AS BIGINT) AS n_tok,"
            "  CAST(coalesce(a.n_spans, 0) AS BIGINT) AS n_spans,"
            "  CAST(coalesce(a.dup_tokens, 0) AS BIGINT) AS dup_tokens,"
            "  round(CASE WHEN len(d.ws) <= 0 THEN CAST(0.0 AS DOUBLE)"
            "   ELSE coalesce(a.dup_tokens, 0) / CAST(len(d.ws) AS DOUBLE)"
            "   END, 6) AS dup_fraction"
            " FROM d LEFT JOIN agg a USING (doc_id)"
        ),
        "source_mix": (
            "WITH counts AS (SELECT source, count(*) AS cnt FROM documents"
            "   GROUP BY source),"
            " props AS (SELECT * FROM (VALUES"
            "   ('src0', CAST(0.5 AS DOUBLE)), ('src1', CAST(0.3 AS DOUBLE)),"
            "   ('src2', CAST(0.2 AS DOUBLE))) AS t(source, p)),"
            " joined AS (SELECT c.source, c.cnt, p.p"
            "   FROM counts c JOIN props p USING (source)),"
            " cap AS (SELECT min(floor(cnt / p)) AS total FROM joined),"
            " thr AS (SELECT source,"
            "   round(least(CAST(1.0 AS DOUBLE), total * p / cnt) * 10000)"
            "    AS keep FROM joined CROSS JOIN cap)"
            " SELECT d.doc_id, d.source FROM documents d JOIN thr USING (source)"
            " WHERE CAST(concat('0x', substr(md5(CAST(d.doc_id AS VARCHAR)),"
            "   1, 15)) AS BIGINT) % 10000 < keep"
        ),
        "source_divergence": (
            f"WITH toks AS (SELECT source AS grp, unnest({_WS}) AS term"
            "   FROM documents),"
            " counts AS (SELECT grp, term, count(*) AS cnt FROM toks"
            "   GROUP BY 1, 2),"
            " top_terms AS (SELECT term FROM ("
            "   SELECT term, sum(cnt) AS total FROM counts GROUP BY 1)"
            "  ORDER BY total DESC, term LIMIT 200),"
            " sup AS (SELECT c.grp, c.term, c.cnt FROM counts c"
            "   JOIN top_terms USING (term)),"
            " grid AS (SELECT g.grp, t.term, coalesce(s.cnt, 0) AS cnt"
            "  FROM (SELECT DISTINCT source AS grp FROM documents) g"
            "  CROSS JOIN top_terms t"
            "  LEFT JOIN sup s ON s.grp = g.grp AND s.term = t.term),"
            " gtot AS (SELECT grp, sum(cnt) AS g_total FROM grid GROUP BY 1),"
            " dist AS (SELECT grid.grp, grid.term,"
            "   grid.cnt / CAST(g_total AS DOUBLE) AS p"
            "  FROM grid JOIN gtot USING (grp)),"
            " pairs AS (SELECT a.grp AS grp_a, b.grp AS grp_b,"
            "   a.p AS pa, b.p AS pb"
            "  FROM dist a JOIN dist b ON a.term = b.term AND a.grp < b.grp)"
            " SELECT grp_a, grp_b, round("
            "  0.5 * sum(CASE WHEN pa > 0"
            "    THEN pa * ln(pa / ((pa + pb) / 2.0)) ELSE 0 END)"
            "  + 0.5 * sum(CASE WHEN pb > 0"
            "    THEN pb * ln(pb / ((pa + pb) / 2.0)) ELSE 0 END), 6) AS jsd"
            " FROM pairs GROUP BY 1, 2"
        ),
        "weighted_sample": (
            " SELECT doc_id, n_chars, round(k, 6) AS sample_key FROM ("
            "  SELECT doc_id, n_chars,"
            "   pow((CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)),"
            "     1, 15)) AS BIGINT) + 1) / 1152921504606846976.0,"
            "    1.0 / CAST(n_chars AS DOUBLE)) AS k"
            "  FROM documents WHERE n_chars > 0)"
            " ORDER BY k DESC, doc_id LIMIT 50"
        ),
        "global_shuffle": (
            # seed-7 content-addressed order; the oracle's global sort IS
            # the semantics the engine reproduces with bucket offsets +
            # per-bucket rank (no global sort on the Spark side)
            "SELECT doc_id, CAST(row_number() OVER (ORDER BY h, doc_id)"
            "  AS BIGINT) AS shuffle_pos FROM ("
            " SELECT doc_id, "
            + _hex60("concat('7:', CAST(doc_id AS VARCHAR))")
            + " AS h FROM documents)"
        ),
        "windowed_drift": (
            "WITH c AS (SELECT"
            "   strftime(time_bucket(INTERVAL '1 day', ts),"
            "    '%Y-%m-%d %H:%M:%S') AS ws,"
            "   CASE WHEN value < 0 THEN -1 WHEN value >= 200 THEN 10"
            "    ELSE CAST(floor(value / 20.0) AS INT) END AS bucket,"
            "   count(*) AS cnt"
            "  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),"
            " base AS (SELECT bucket, CAST(sum(cnt) AS BIGINT) AS base"
            "   FROM c GROUP BY 1),"
            " nb AS (SELECT CAST(sum(base) AS BIGINT) AS n_base FROM base),"
            " wt AS (SELECT ws, CAST(sum(cnt) AS BIGINT) AS n_cur"
            "   FROM c GROUP BY 1),"
            " grid AS (SELECT w.ws, b.bucket, coalesce(c.cnt, 0) AS cur"
            "  FROM (SELECT DISTINCT ws FROM c) w"
            "  CROSS JOIN (SELECT bucket FROM base) b"
            "  LEFT JOIN c ON c.ws = w.ws AND c.bucket = b.bucket),"
            " j AS (SELECT g.ws, wt.n_cur,"
            "   greatest(g.cur / CAST(wt.n_cur AS DOUBLE), 1e-6) AS p,"
            "   greatest(b.base / CAST(nb.n_base AS DOUBLE), 1e-6) AS q"
            "  FROM grid g JOIN base b USING (bucket)"
            "  JOIN wt ON wt.ws = g.ws CROSS JOIN nb)"
            " SELECT ws AS window_start, CAST(any_value(n_cur) AS BIGINT) AS n,"
            "  round(sum((p - q) * ln(p / q)), 6) AS psi"
            " FROM j GROUP BY 1"
        ),
        "script_mojibake": (
            "SELECT doc_id, arabic, cjk, cyrillic, greek, hangul, latin,"
            " replacement_chars, control_chars,"
            " CASE WHEN n > 0 THEN round(nonascii / CAST(n AS DOUBLE), 6)"
            "  END AS non_ascii_ratio,"
            " CASE WHEN greatest(arabic, cjk, cyrillic, greek, hangul, latin) = 0"
            "   THEN 'none'"
            "  WHEN latin >= greatest(arabic, cjk, cyrillic, greek, hangul)"
            "   THEN 'latin'"
            "  WHEN hangul >= greatest(arabic, cjk, cyrillic, greek) THEN 'hangul'"
            "  WHEN greek >= greatest(arabic, cjk, cyrillic) THEN 'greek'"
            "  WHEN cyrillic >= greatest(arabic, cjk) THEN 'cyrillic'"
            "  WHEN cjk >= arabic THEN 'cjk' ELSE 'arabic' END AS dominant_script"
            " FROM (SELECT doc_id,"
            f"  {_char_class_count_sql('[؀-ۿ]', 'arabic')},"
            f"  {_char_class_count_sql('[぀-ヿ一-鿿]', 'cjk')},"
            f"  {_char_class_count_sql('[Ѐ-ӿ]', 'cyrillic')},"
            f"  {_char_class_count_sql('[Ͱ-Ͽ]', 'greek')},"
            f"  {_char_class_count_sql('[가-힯]', 'hangul')},"
            f"  {_char_class_count_sql('[A-Za-zÀ-ɏ]', 'latin')},"
            f"  {_char_class_count_sql('[�]', 'replacement_chars')},"
            "  "
            + _char_class_count_sql(
                "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]", "control_chars"
            )
            + ","
            + _char_class_count_sql("[^\\x00-\\x7f]", "nonascii")
            + ","
            "  CAST(length(t) AS INT) AS n"
            f" FROM (SELECT doc_id, {_DECOR} AS t FROM documents))"
        ),
        "classifier_score": (
            "SELECT doc_id, round(1.0 / (1.0 + exp(-("
            " CASE WHEN len(ws) > 0 THEN list_sum(list_transform(ws,"
            f"  w -> (({_hex60('w')} % 1024) % 997) / 498.0 - 1.0)) / len(ws)"
            " ELSE 0.0 END))), 6) AS clf_score"
            f" FROM (SELECT doc_id, {_WS} AS ws FROM documents)"
        ),
        "corpus_overlap": (
            f"WITH fa AS (SELECT DISTINCT md5({_NORM}) AS fp"
            "   FROM documents WHERE doc_id % 3 <> 0),"
            f" fb AS (SELECT DISTINCT md5({_NORM}) AS fp FROM documents),"
            " perms AS (SELECT CAST(range AS INT) AS p FROM range(64)),"
            " ma AS (SELECT p,"
            f"  min({_hex60(_FP_PERM)}) AS m"
            "  FROM fa CROSS JOIN perms GROUP BY p),"
            " mb AS (SELECT p,"
            f"  min({_hex60(_FP_PERM)}) AS m"
            "  FROM fb CROSS JOIN perms GROUP BY p),"
            " est AS (SELECT count(*) FILTER (WHERE ma.m = mb.m) AS n_match"
            "  FROM ma JOIN mb USING (p)),"
            " ex AS (SELECT count(*) FILTER (WHERE a > 0 AND b > 0) AS n_inter,"
            "   count(*) AS n_union FROM ("
            "   SELECT fp, max(a) AS a, max(b) AS b FROM ("
            "    SELECT fp, 1 AS a, 0 AS b FROM fa"
            "    UNION ALL SELECT fp, 0 AS a, 1 AS b FROM fb) GROUP BY fp))"
            " SELECT 64 AS n_perm, round(n_match / 64.0, 6) AS est_jaccard,"
            "  round(n_inter / CAST(n_union AS DOUBLE), 6) AS exact_jaccard"
            " FROM est, ex"
        ),
        "token_ngram_diversity": (
            "SELECT doc_id AS id, CAST(len(g) AS INT) AS n_grams,"
            " CAST(len(list_distinct(g)) AS INT) AS n_distinct,"
            " CASE WHEN len(g) > 0 THEN"
            "  round(len(list_distinct(g)) / CAST(len(g) AS DOUBLE), 6)"
            "  END AS diversity"
            " FROM (SELECT doc_id, list_transform(range(1, len(tokens)),"
            "  i -> concat(tokens[i], ',', tokens[i + 1])) AS g"
            f" FROM read_parquet('{_token_corpus_path()}/*.parquet'))"
        ),
        # DuckDB twin of q_sequence_structure's residue decoration; lambda
        # index i is 1-based in DuckDB (0-based in Spark), hence i > 1 AND
        # i < n for "strictly interior".
        "sequence_structure": (
            "SELECT doc_id,"
            " n_oob = 0 AS vocab_ok,"
            " n >= 1 AND t[1] = 1 AS bos_ok,"
            " n >= 1 AND t[-1] = 2 AS eos_ok,"
            " CAST(interior AS INT) AS interior_special,"
            " CAST(n_oob AS INT) AS n_oob,"
            " n_oob = 0 AND n >= 1 AND t[1] = 1 AND t[-1] = 2"
            "  AND interior = 0 AS structure_ok"
            " FROM (SELECT doc_id, len(t) AS n,"
            "  len(list_filter(t, x -> x < 0 OR x >= 32000)) AS n_oob,"
            "  len(list_filter(t, (x, i) -> list_contains([1, 2, 0], x)"
            "   AND i > 1 AND i < len(t))) AS interior, t"
            " FROM (SELECT doc_id,"
            "  CASE WHEN doc_id % 7 <> 0 THEN [1] ELSE CAST([] AS INT[]) END"
            "  || list_transform(tokens, x -> x + 10)"
            "  || CASE WHEN doc_id % 13 = 0 THEN [0] ELSE CAST([] AS INT[]) END"
            "  || CASE WHEN doc_id % 11 = 0 THEN [99999] ELSE CAST([] AS INT[]) END"
            "  || CASE WHEN doc_id % 5 <> 0 THEN [2] ELSE CAST([] AS INT[]) END"
            "  AS t"
            f"  FROM read_parquet('{_token_corpus_path()}/*.parquet')))"
        ),
        "zipf_slope": (
            "WITH c AS (SELECT CAST(doc_id % 3 AS VARCHAR) AS source, tok,"
            "  count(*) AS freq FROM (SELECT doc_id, unnest(tokens) AS tok"
            f"  FROM read_parquet('{_token_corpus_path()}/*.parquet'))"
            "  GROUP BY 1, 2),"
            " f AS (SELECT source, ln(CAST(rank AS DOUBLE)) AS x,"
            "   ln(CAST(freq AS DOUBLE)) AS y"
            "  FROM (SELECT source, freq, row_number() OVER ("
            "   PARTITION BY source ORDER BY freq DESC, tok ASC) AS rank FROM c)"
            "  WHERE rank <= 200),"
            " a AS (SELECT source, count(*) AS n_terms, sum(x) AS sx,"
            "   sum(y) AS sy, sum(x * x) AS sxx, sum(x * y) AS sxy"
            "  FROM f GROUP BY 1)"
            " SELECT source, n_terms,"
            "  CASE WHEN n_terms * sxx - sx * sx > 0 THEN"
            "   round((n_terms * sxy - sx * sy) / (n_terms * sxx - sx * sx), 6)"
            "  END AS slope,"
            "  CASE WHEN n_terms * sxx - sx * sx > 0 THEN"
            "   round((sy - (n_terms * sxy - sx * sy) / (n_terms * sxx - sx * sx)"
            "    * sx) / n_terms, 6)"
            "  END AS intercept"
            " FROM a"
        ),
        "token_prefix_dups": (
            "SELECT md5(array_to_string(tokens[1:16], ',')) AS prefix_fp,"
            " count(*) AS n_docs,"
            " count(DISTINCT md5(array_to_string(tokens, ','))) AS n_distinct_full,"
            " min(doc_id) AS min_doc, max(doc_id) AS max_doc"
            f" FROM read_parquet('{_token_corpus_path()}/*.parquet')"
            " WHERE len(tokens) >= 16"
            " GROUP BY 1 HAVING count(*) > 1"
        ),
        "pii_redact": (
            "SELECT doc_id,"
            " regexp_replace(regexp_replace(regexp_replace(text,"
            "  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),"
            "  '[0-9]{3}-[0-9]{2}-[0-9]{4}', '<SSN>', 'g'),"
            "  '[0-9]{9,}', '<NUM>', 'g') AS text_redacted,"
            " CAST(len(regexp_extract_all(text,"
            "   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))"
            "  + len(regexp_extract_all(text, '[0-9]{3}-[0-9]{2}-[0-9]{4}'))"
            "  + len(regexp_extract_all(text, '[0-9]{9,}')) AS INT)"
            "  AS n_redacted"
            f" FROM read_parquet('{_pii_corpus_path()}/*.parquet')"
        ),
        "cross_source_dups": (
            "WITH d AS (SELECT DISTINCT md5(array_to_string(tokens, ',')) AS fp,"
            "  CAST(doc_id % 3 AS VARCHAR) AS src"
            f"  FROM read_parquet('{_token_corpus_path()}/*.parquet'))"
            " SELECT a.src AS source_a, b.src AS source_b, count(*) AS n_shared"
            " FROM d a JOIN d b ON a.fp = b.fp AND a.src < b.src"
            " GROUP BY 1, 2"
        ),
        "vocab_prune": (
            f"WITH t AS (SELECT * FROM read_parquet('{_token_corpus_path()}/*.parquet')),"
            " c AS (SELECT tok, count(*) AS freq FROM"
            "  (SELECT unnest(tokens) AS tok FROM t) GROUP BY 1),"
            " k AS (SELECT tok, row_number() OVER (ORDER BY freq DESC, tok ASC)"
            "   AS new_id FROM c WHERE freq >= 150),"
            " e AS (SELECT doc_id, unnest(tokens) AS tok,"
            "   unnest(range(1, len(tokens) + 1)) AS ord FROM t),"
            " r AS (SELECT e.doc_id, coalesce(k.new_id, 0) AS nid, e.ord,"
            "   CASE WHEN k.tok IS NULL THEN 1 ELSE 0 END AS oov"
            "  FROM e LEFT JOIN k ON e.tok = k.tok)"
            " SELECT doc_id,"
            "  md5(string_agg(CAST(nid AS VARCHAR), ',' ORDER BY ord)) AS remap_fp,"
            "  CAST(sum(oov) AS INT) AS n_oov"
            " FROM r GROUP BY 1"
        ),
        "vocab_coverage": (
            f"WITH t AS (SELECT * FROM read_parquet('{_token_corpus_path()}/*.parquet')),"
            " c AS (SELECT tok, count(*) AS cnt FROM"
            "  (SELECT unnest(tokens) AS tok FROM t) GROUP BY 1),"
            " r AS (SELECT row_number() OVER (ORDER BY cnt DESC, tok ASC)"
            "   AS rank, sum(cnt) OVER (ORDER BY cnt DESC, tok ASC"
            "    ROWS UNBOUNDED PRECEDING) AS cum FROM c),"
            " tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM c),"
            " ks AS (SELECT CAST(unnest([10, 50, 200]) AS INT) AS k),"
            " at_k AS (SELECT k, CAST(max(cum) AS BIGINT) AS covered"
            "  FROM r JOIN ks ON r.rank <= ks.k GROUP BY k)"
            " SELECT ks.k, coalesce(covered, 0) AS covered_tokens,"
            "  total AS total_tokens,"
            "  CASE WHEN total > 0 THEN round(coalesce(covered, 0)"
            "   / CAST(total AS DOUBLE), 6) END AS coverage"
            " FROM ks LEFT JOIN at_k USING (k) CROSS JOIN tot"
        ),
        "embedding_norm_qa": (
            "WITH d AS (SELECT vec_id,"
            "  CASE WHEN vec_id % 13 = 0 THEN"
            "    list_transform(embedding, x -> CAST(0.0 AS FLOAT))"
            "   WHEN vec_id % 17 = 0 THEN embedding[1:63]"
            "   WHEN vec_id % 19 = 0 THEN"
            "    [CAST('NaN' AS FLOAT)] || embedding[2:64]"
            "   ELSE embedding END AS v FROM embeddings)"
            " SELECT vec_id, CAST(len(v) AS INT) AS dim,"
            "  round(sqrt(coalesce(list_sum(list_transform("
            "   list_filter(v, x -> NOT isnan(x) AND x IS NOT NULL),"
            "   x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 0.0)), 6)"
            "   AS norm,"
            "  CAST(len(list_filter(v, x -> isnan(x))) AS INT) AS n_nan,"
            "  CAST(len(list_filter(v, x -> x IS NULL)) AS INT) AS n_null,"
            "  len(v) = 64 AS dim_ok,"
            "  (v IS NOT NULL AND len(v) = 64"
            "   AND len(list_filter(v, x -> isnan(x))) = 0"
            "   AND len(list_filter(v, x -> x IS NULL)) = 0"
            "   AND sqrt(coalesce(list_sum(list_transform("
            "    list_filter(v, x -> NOT isnan(x) AND x IS NOT NULL),"
            "    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 0.0)) > 0)"
            "   AS usable"
            " FROM d"
        ),
        "structure_scorecard": (
            "WITH d AS (SELECT doc_id,  CASE WHEN doc_id % 7 <> 0 THEN [1] ELSE CAST([] AS INT[]) END  || list_transform(tokens, x -> x + 10)  || CASE WHEN doc_id % 13 = 0 THEN [0] ELSE CAST([] AS INT[]) END  || CASE WHEN doc_id % 11 = 0 THEN [99999] ELSE CAST([] AS INT[]) END  || CASE WHEN doc_id % 5 <> 0 THEN [2] ELSE CAST([] AS INT[]) END  AS t"
            f"  FROM read_parquet('{_token_corpus_path()}/*.parquet')),"
            " s AS (SELECT CAST(doc_id % 3 AS VARCHAR) AS source,"
            "  NOT (len(list_filter(t, x -> x < 0 OR x >= 32000)) = 0"
            "   AND len(t) >= 1 AND t[1] = 1 AND t[-1] = 2"
            "   AND len(list_filter(t, (x, i) -> list_contains([1, 2, 0], x)"
            "    AND i > 1 AND i < len(t))) = 0) AS fail FROM d),"
            " agg AS (SELECT source, count(*) AS n,"
            "   CAST(count(*) FILTER (WHERE fail) AS BIGINT) AS fails"
            "  FROM s GROUP BY 1),"
            " w AS (SELECT source, n, fails, fails / CAST(n AS DOUBLE) AS p,"
            "   1.96 * 1.96 AS z2, CAST(n AS DOUBLE) AS nd FROM agg)"
            " SELECT source, n, fails, round(p, 6) AS rate,"
            "  round(greatest((p + z2 / (2 * nd)) / (1 + z2 / nd)"
            "   - 1.96 * sqrt(p * (1 - p) / nd + z2 / (4 * nd * nd))"
            "     / (1 + z2 / nd), 0.0), 6) AS wilson_lo,"
            "  round(least((p + z2 / (2 * nd)) / (1 + z2 / nd)"
            "   + 1.96 * sqrt(p * (1 - p) / nd + z2 / (4 * nd * nd))"
            "     / (1 + z2 / nd), 1.0), 6) AS wilson_hi"
            " FROM w"
        ),
        "winnow_dups": (
            # Replays the Arrow kernel's polynomial rolling hash exactly:
            # hash(g) = sum(codepoint[g+j] * B^(11-j)) mod 2^64 mod 2^60
            # with B = dedup.WINNOW_BASE; the power literals are reduced
            # mod 2^64 on both engines, HUGEINT keeps the 12-term sum
            # exact before the double mod.
            f"WITH n AS (SELECT doc_id, {_NORM} AS t FROM documents),"
            " cp AS (SELECT doc_id, [unicode(t[i+1])"
            "   for i in range(len(t))] AS c FROM n),"
            " h AS (SELECT doc_id, [CAST((" + " + ".join(
                f"c[g+{j + 1}]*{pow(1_000_003, 11 - j, 1 << 64)}::HUGEINT"
                for j in range(12)
            ) + ") % 18446744073709551616::HUGEINT"
            "   % 1152921504606846976::HUGEINT AS BIGINT)"
            "   for g in range(len(c) - 11)] AS hs FROM cp),"
            " wn AS (SELECT doc_id, list_sort(list_distinct("
            "   [list_min(hs[j:j + 7])"
            "    for j in range(1, len(hs) - 6)])) AS fps FROM h),"
            " e AS (SELECT DISTINCT doc_id AS id, unnest(fps) AS w FROM wn),"
            " el AS (SELECT w FROM e GROUP BY w"
            "   HAVING count(*) > 1 AND count(*) <= 64)"
            " SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_shared"
            " FROM e a JOIN el ON a.w = el.w JOIN e b"
            "  ON a.w = b.w AND a.id < b.id"
            " GROUP BY 1, 2 HAVING count(*) >= 3"
        ),
        "token_winnow_dups": (
            # Token-native winnow replay: hash(g) = sum(token[g+j] *
            # B^(7-j)) mod 2^64 mod 2^60 (B = dedup.WINNOW_BASE, k=8),
            # window minima over 6 hashes, distinct fingerprints per doc,
            # doc-frequency ceiling 64, pairs sharing >= 2.
            f"WITH t AS (SELECT doc_id, tokens"
            f" FROM read_parquet('{_token_corpus_path()}/*.parquet')),"
            " h AS (SELECT doc_id, [CAST((" + " + ".join(
                f"tokens[g+{j + 1}]*{pow(1_000_003, 7 - j, 1 << 64)}::HUGEINT"
                for j in range(8)
            ) + ") % 18446744073709551616::HUGEINT"
            "   % 1152921504606846976::HUGEINT AS BIGINT)"
            "   for g in range(len(tokens) - 7)] AS hs FROM t),"
            " wn AS (SELECT doc_id, list_sort(list_distinct("
            "   [list_min(hs[j:j + 5])"
            "    for j in range(1, len(hs) - 4)])) AS fps FROM h),"
            " e AS (SELECT DISTINCT doc_id AS id, unnest(fps) AS w FROM wn),"
            " el AS (SELECT w FROM e GROUP BY w"
            "   HAVING count(*) > 1 AND count(*) <= 64)"
            " SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_shared"
            " FROM e a JOIN el ON a.w = el.w JOIN e b"
            "  ON a.w = b.w AND a.id < b.id"
            " GROUP BY 1, 2 HAVING count(*) >= 2"
        ),
        "bigram_ppl": (
            f"WITH t AS (SELECT * FROM read_parquet('{_token_corpus_path()}/*.parquet')),"
            " ref AS (SELECT * FROM t WHERE doc_id % 5 = 0),"
            " rp AS (SELECT unnest(tokens[1:len(tokens) - 1]) AS a,"
            "   unnest(tokens[2:len(tokens)]) AS b FROM ref),"
            " bg AS (SELECT a, b, count(*) AS nb FROM rp GROUP BY 1, 2),"
            " h AS (SELECT a, count(*) AS na FROM rp GROUP BY 1),"
            " vt AS (SELECT count(DISTINCT tok) AS v FROM"
            "  (SELECT unnest(tokens) AS tok FROM ref)),"
            " sp AS (SELECT doc_id AS id,"
            "   unnest(tokens[1:len(tokens) - 1]) AS a,"
            "   unnest(tokens[2:len(tokens)]) AS b"
            "  FROM t WHERE doc_id % 5 <> 0),"
            " j AS (SELECT id, -ln((coalesce(nb, 0) + 0.5)"
            "   / (coalesce(na, 0) + 0.5 * v)) AS nll"
            "  FROM sp LEFT JOIN bg USING (a, b) LEFT JOIN h USING (a)"
            "  CROSS JOIN vt)"
            " SELECT id, count(*) AS n_bigrams, round(avg(nll), 6) AS xent,"
            "  round(exp(avg(nll)), 6) AS ppl FROM j GROUP BY 1"
        ),
        "trigram_sbo": (
            f"WITH t AS (SELECT * FROM read_parquet('{_token_corpus_path()}/*.parquet')),"
            " ref AS (SELECT * FROM t WHERE doc_id % 5 = 0),"
            " rt AS (SELECT unnest(tokens[1:len(tokens) - 2]) AS a,"
            "   unnest(tokens[2:len(tokens) - 1]) AS b,"
            "   unnest(tokens[3:len(tokens)]) AS c FROM ref),"
            " tg AS (SELECT a, b, c, count(*) AS nt FROM rt GROUP BY 1, 2, 3),"
            " rp AS (SELECT unnest(tokens[1:len(tokens) - 1]) AS a,"
            "   unnest(tokens[2:len(tokens)]) AS b FROM ref),"
            " bg AS (SELECT a, b, count(*) AS np FROM rp GROUP BY 1, 2),"
            " u AS (SELECT tok, count(*) AS nu FROM"
            "  (SELECT unnest(tokens) AS tok FROM ref) GROUP BY 1),"
            " tot AS (SELECT CAST(sum(nu) AS BIGINT) AS n, count(*) AS v FROM u),"
            " sp AS (SELECT doc_id AS id,"
            "   unnest(tokens[1:len(tokens) - 2]) AS a,"
            "   unnest(tokens[2:len(tokens) - 1]) AS b,"
            "   unnest(tokens[3:len(tokens)]) AS c"
            "  FROM t WHERE doc_id % 5 <> 0),"
            " j AS (SELECT id, coalesce(tg.nt, 0) AS nt, b2.np AS n_ab,"
            "   coalesce(b3.np, 0) AS n_bc, ub.nu AS n_b,"
            "   coalesce(uc.nu, 0) AS n_c"
            "  FROM sp LEFT JOIN tg USING (a, b, c)"
            "   LEFT JOIN bg b2 ON sp.a = b2.a AND sp.b = b2.b"
            "   LEFT JOIN bg b3 ON sp.b = b3.a AND sp.c = b3.b"
            "   LEFT JOIN u ub ON sp.b = ub.tok"
            "   LEFT JOIN u uc ON sp.c = uc.tok),"
            " s AS (SELECT id, nt, n_bc,"
            "   CASE WHEN nt > 0 THEN nt / n_ab"
            "    WHEN n_bc > 0 THEN (CAST(0.4 AS DOUBLE) * n_bc) / n_b"
            f"    ELSE (CAST({0.4 * 0.4!r} AS DOUBLE) * (n_c + 0.5))"
            "     / (n + 0.5 * v) END AS sc"
            "  FROM j CROSS JOIN tot)"
            " SELECT id, count(*) AS n_trigrams,"
            "  count(*) FILTER (WHERE nt > 0) AS n_hit3,"
            "  count(*) FILTER (WHERE nt = 0 AND n_bc > 0) AS n_hit2,"
            "  round(avg(-ln(sc)), 6) AS xent"
            " FROM s GROUP BY 1"
        ),
        "trigram_kn_ppl": (
            f"WITH t AS (SELECT * FROM read_parquet('{_token_corpus_path()}/*.parquet')),"
            " ref AS (SELECT * FROM t WHERE doc_id % 5 = 0),"
            " rt AS (SELECT unnest(tokens[1:len(tokens) - 2]) AS a,"
            "   unnest(tokens[2:len(tokens) - 1]) AS b,"
            "   unnest(tokens[3:len(tokens)]) AS c FROM ref),"
            " tg AS (SELECT a, b, c, count(*) AS nt FROM rt GROUP BY 1, 2, 3),"
            " h AS (SELECT a, b, CAST(sum(nt) AS BIGINT) AS n_ab,"
            "   count(*) AS n1f_ab FROM tg GROUP BY 1, 2),"
            " mc AS (SELECT b, c, count(*) AS m_bc FROM tg GROUP BY 1, 2),"
            " mh AS (SELECT b, CAST(sum(m_bc) AS BIGINT) AS m_b,"
            "   count(*) AS n1c_b FROM mc GROUP BY 1),"
            " rp AS (SELECT unnest(tokens[1:len(tokens) - 1]) AS a,"
            "   unnest(tokens[2:len(tokens)]) AS b FROM ref),"
            " bgt AS (SELECT a, b FROM rp GROUP BY 1, 2),"
            " cb AS (SELECT b AS c, count(*) AS n1b FROM bgt GROUP BY 1),"
            " tot AS (SELECT count(*) AS n1all FROM bgt),"
            " vt AS (SELECT count(DISTINCT tok) AS v FROM"
            "  (SELECT unnest(tokens) AS tok FROM ref)),"
            " sp AS (SELECT doc_id AS id,"
            "   unnest(tokens[1:len(tokens) - 2]) AS a,"
            "   unnest(tokens[2:len(tokens) - 1]) AS b,"
            "   unnest(tokens[3:len(tokens)]) AS c"
            "  FROM t WHERE doc_id % 5 <> 0),"
            " j AS (SELECT id, h.n_ab, h.n1f_ab, mh.m_b, mh.n1c_b,"
            "   coalesce(tg.nt, 0) AS nt, coalesce(mc.m_bc, 0) AS m_bc,"
            "   (coalesce(cb.n1b, 0) + CAST(0.5 AS DOUBLE))"
            "    / (tot.n1all + CAST(0.5 AS DOUBLE) * vt.v) AS p1"
            "  FROM sp LEFT JOIN tg USING (a, b, c)"
            "   LEFT JOIN h USING (a, b) LEFT JOIN mc USING (b, c)"
            "   LEFT JOIN mh USING (b) LEFT JOIN cb ON sp.c = cb.c"
            "   CROSS JOIN tot CROSS JOIN vt),"
            " s2 AS (SELECT id, n_ab, n1f_ab, nt,"
            "   CASE WHEN m_b IS NOT NULL THEN"
            "    greatest(m_bc - CAST(0.75 AS DOUBLE), CAST(0 AS DOUBLE))"
            "     / m_b + CAST(0.75 AS DOUBLE) * n1c_b / m_b * p1"
            "   ELSE p1 END AS p2 FROM j),"
            " s AS (SELECT id, n_ab IS NOT NULL AS seen,"
            "   CASE WHEN n_ab IS NOT NULL THEN"
            "    greatest(nt - CAST(0.75 AS DOUBLE), CAST(0 AS DOUBLE))"
            "     / n_ab + CAST(0.75 AS DOUBLE) * n1f_ab / n_ab * p2"
            "   ELSE p2 END AS p FROM s2)"
            " SELECT id, count(*) AS n_trigrams,"
            "  CAST(count(*) FILTER (WHERE seen) AS BIGINT) AS n_seen_hist,"
            "  round(avg(-ln(p)), 6) AS xent,"
            "  round(exp(avg(-ln(p))), 6) AS ppl"
            " FROM s GROUP BY 1"
        ),
        "vocab_richness": (
            f"WITH t AS (SELECT * FROM read_parquet('{_token_corpus_path()}/*.parquet')),"
            " c AS (SELECT tok, count(*) AS n FROM"
            "  (SELECT unnest(tokens) AS tok FROM t) GROUP BY 1),"
            " ff AS (SELECT n, count(*) AS fk FROM c GROUP BY 1),"
            " s AS (SELECT CAST(sum(n * fk) AS BIGINT) AS n_tokens,"
            "   CAST(sum(fk) AS BIGINT) AS vocab,"
            "   CAST(coalesce(sum(CASE WHEN n = 1 THEN fk END), 0)"
            "    AS BIGINT) AS f1,"
            "   CAST(coalesce(sum(CASE WHEN n = 2 THEN fk END), 0)"
            "    AS BIGINT) AS f2 FROM ff)"
            " SELECT n_tokens, vocab, f1, f2,"
            "  round(vocab + (f1 * (f1 - 1)) / (2 * (f2 + 1)), 6) AS chao1,"
            "  round(1.0 - f1 / n_tokens, 6) AS coverage FROM s"
        ),
        "vocab_diversity": (
            f"WITH t AS (SELECT * FROM read_parquet('{_token_corpus_path()}/*.parquet')),"
            " c AS (SELECT CAST(doc_id % 4 AS VARCHAR) AS src4, tok,"
            "   count(*) AS n FROM (SELECT doc_id, unnest(tokens) AS tok"
            "    FROM t) GROUP BY 1, 2)"
            " SELECT src4 AS source, CAST(sum(n) AS BIGINT) AS n_tokens,"
            "  count(*) AS vocab,"
            "  round(exp(ln(sum(n)) - sum(n * ln(n)) / sum(n)), 6) AS hill1,"
            "  round((sum(n) * sum(n)) / sum(n * n), 6) AS hill2"
            " FROM c GROUP BY 1"
        ),
        "embedding_quant_qa": (
            "WITH e AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings),"
            " x AS (SELECT CAST(d + 1 AS BIGINT) AS d, x FROM"
            "  (SELECT unnest(v) AS x, unnest(range(64)) AS d FROM e)),"
            " mm AS (SELECT d, min(x) AS lo, max(x) AS hi FROM x GROUP BY 1),"
            " er AS (SELECT x.d,"
            "   max(CASE WHEN hi = lo THEN 0.0 ELSE abs(x.x - (lo +"
            "    round((x.x - lo) / ((hi - lo) / 255.0))"
            "     * ((hi - lo) / 255.0))) END) AS mx,"
            "   avg(CASE WHEN hi = lo THEN 0.0 ELSE abs(x.x - (lo +"
            "    round((x.x - lo) / ((hi - lo) / 255.0))"
            "     * ((hi - lo) / 255.0))) END) AS mn"
            "  FROM x JOIN mm ON x.d = mm.d GROUP BY 1)"
            " SELECT er.d, round(lo, 6) AS lo, round(hi, 6) AS hi,"
            "  round((hi - lo) / 255.0, 6) AS scale,"
            "  round(mx, 6) AS max_abs_err, round(mn, 6) AS mean_abs_err"
            " FROM er JOIN mm ON er.d = mm.d"
        ),
        "split_leakage_audit": (
            f"WITH t AS (SELECT * FROM read_parquet('{_token_corpus_path()}/*.parquet')),"
            " sh AS (SELECT doc_id, list_sort(list_distinct(list_transform("
            "   generate_series(1, greatest(len(tokens)-2, 0)),"
            "   i -> CAST(tokens[i] AS VARCHAR) || ',' ||"
            "        CAST(tokens[i+1] AS VARCHAR) || ',' ||"
            "        CAST(tokens[i+2] AS VARCHAR)))) AS g FROM t),"
            " p AS (SELECT id_a, id_b FROM ("
            "  SELECT a.doc_id AS id_a, b.doc_id AS id_b,"
            "   round(CASE WHEN len(list_distinct(a.g || b.g)) = 0 THEN 0.0"
            "    ELSE len(list_intersect(a.g, b.g))"
            "     / CAST(len(list_distinct(a.g || b.g)) AS DOUBLE) END, 6)"
            "    AS jaccard"
            "  FROM sh a JOIN sh b ON a.doc_id < b.doc_id"
            "   AND len(a.g) * 5 >= len(b.g) * 4 AND len(b.g) * 5 >= len(a.g) * 4)"
            "  WHERE jaccard >= 0.8),"
            " sp AS (SELECT doc_id,"
            "   CASE WHEN hb < 8000 THEN 'train' WHEN hb < 9000 THEN 'val'"
            "    ELSE 'test' END AS split FROM (SELECT doc_id,"
            f"""   {_hex60("CAST(doc_id AS VARCHAR) || '#17'")} % 10000"""
            "     AS hb FROM t))"
            " SELECT least(sa.split, sb.split) AS split_a,"
            "  greatest(sa.split, sb.split) AS split_b,"
            "  count(*) AS n_pairs"
            " FROM p JOIN sp sa ON p.id_a = sa.doc_id"
            "  JOIN sp sb ON p.id_b = sb.doc_id"
            " GROUP BY 1, 2"
        ),
        "unimax_alloc": (
            "WITH src AS (SELECT CASE WHEN doc_id % 7 < 4 THEN 'a'"
            "   WHEN doc_id % 7 < 6 THEN 'b' ELSE 'c' END AS strata"
            "  FROM documents),"
            " c AS (SELECT strata, count(*) AS n_docs, count(*) * 2 AS cap"
            "  FROM src GROUP BY 1),"
            " w AS (SELECT strata, n_docs, cap,"
            "   sum(cap) OVER (ORDER BY cap, strata"
            "    ROWS UNBOUNDED PRECEDING) AS cum,"
            "   row_number() OVER (ORDER BY cap, strata) AS i,"
            "   count(*) OVER () AS m FROM c),"
            " f AS (SELECT *, (cap * (m - i) + cum) <= 600 AS capped FROM w),"
            " g AS (SELECT *,"
            "   sum(CASE WHEN capped THEN 1 ELSE 0 END) OVER () AS k,"
            "   coalesce(sum(CASE WHEN capped THEN cap END) OVER (), 0) AS cs"
            "  FROM f),"
            " q AS (SELECT strata, n_docs, cap,"
            "   CASE WHEN capped THEN cap ELSE least(cap,"
            "    CAST(floor((600 - cs) / greatest(m - k, 1)) AS BIGINT))"
            "    END AS quota FROM g)"
            " SELECT strata, n_docs, cap, quota,"
            "  round(quota / n_docs, 6) AS epochs FROM q"
        ),
        "stratified_split": (
            "WITH d AS (SELECT doc_id, source,"
            f"""  {_hex60("CAST(doc_id AS VARCHAR) || '#17'")} AS h FROM documents),"""
            " r AS (SELECT doc_id, source AS strata,"
            "   row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS rn,"
            "   count(*) OVER (PARTITION BY source) AS n FROM d)"
            " SELECT doc_id, strata,"
            "  CASE WHEN rn <= floor(n * (80 / CAST(100 AS DOUBLE))) THEN 'train'"
            "   WHEN rn <= floor(n * (90 / CAST(100 AS DOUBLE))) THEN 'val'"
            "   ELSE 'test' END AS split"
            " FROM r"
        ),
        "padding_waste": (
            f"WITH t AS (SELECT len(tokens) AS n FROM read_parquet('{_token_corpus_path()}/*.parquet')),"
            " e AS (SELECT CAST(least(n, 96) AS BIGINT) AS eff FROM t WHERE n >= 1),"
            " b AS (SELECT eff, CAST(floor((eff - 1) / 16) AS BIGINT) AS bucket_id FROM e),"
            " a AS (SELECT bucket_id, count(*) AS n_seqs,"
            "   CAST(sum(eff) AS BIGINT) AS sum_tok,"
            "   CAST(max(eff) AS BIGINT) AS max_tok FROM b GROUP BY 1)"
            " SELECT bucket_id, least((bucket_id + 1) * 16, 96) AS bucket_hi,"
            "  n_seqs, sum_tok, max_tok,"
            "  n_seqs * max_tok - sum_tok AS pad_bucketed,"
            "  n_seqs * 96 - sum_tok AS pad_fixed,"
            "  round((n_seqs * max_tok - sum_tok)"
            "   / (n_seqs * max_tok), 6) AS waste_bucketed,"
            "  round((n_seqs * 96 - sum_tok)"
            "   / (n_seqs * 96), 6) AS waste_fixed"
            " FROM a"
        ),
        "temperature_mix": (
            "WITH src AS (SELECT doc_id,"
            "   CASE WHEN doc_id % 7 < 4 THEN 'a'"
            "    WHEN doc_id % 7 < 6 THEN 'b' ELSE 'c' END AS src3"
            "  FROM documents),"
            " counts AS (SELECT src3, count(*) AS cnt FROM src GROUP BY 1),"
            " props AS (SELECT src3, cnt,"
            "   round(pow(cnt, 0.5) / sum(pow(cnt, 0.5)) OVER (), 6) AS p"
            "  FROM counts),"
            " cap AS (SELECT min(floor(cnt / p)) AS total FROM props),"
            " thr AS (SELECT src3,"
            "   round(least(CAST(1.0 AS DOUBLE), total * p / cnt) * 10000)"
            "    AS keep FROM props CROSS JOIN cap)"
            " SELECT s.doc_id, s.src3 FROM src s JOIN thr USING (src3)"
            " WHERE CAST(concat('0x', substr(md5(CAST(s.doc_id AS VARCHAR)),"
            "   1, 15)) AS BIGINT) % 10000 < keep"
        ),
        "positional_entropy": (
            "WITH t AS (SELECT [7, 8, 9] || tokens AS tokens"
            f"  FROM read_parquet('{_token_corpus_path()}/*.parquet')),"
            " e AS (SELECT unnest(tokens[1:32]) AS tok,"
            "   CAST(unnest(range(1, least(len(tokens), 32) + 1)) AS INT)"
            "    AS pos FROM t),"
            " c AS (SELECT pos, tok, count(*) AS cnt FROM e GROUP BY 1, 2)"
            " SELECT pos, sum(cnt) AS n_seqs, count(*) AS n_distinct,"
            "  round(ln(sum(cnt)) - sum(cnt * ln(cnt)) / sum(cnt), 4)"
            "   AS entropy"
            " FROM c GROUP BY 1"
        ),
        "bigram_pmi": (
            f"WITH t AS (SELECT * FROM read_parquet('{_token_corpus_path()}/*.parquet')),"
            " u AS (SELECT tok, count(*) AS n_uni FROM"
            "  (SELECT unnest(tokens) AS tok FROM t) GROUP BY 1),"
            " p AS (SELECT tok_a, tok_b, count(*) AS n_pair FROM"
            "  (SELECT unnest(tokens[1:len(tokens) - 1]) AS tok_a,"
            "    unnest(tokens[2:len(tokens)]) AS tok_b FROM t)"
            "  GROUP BY 1, 2 HAVING count(*) >= 3),"
            " tot AS (SELECT sum(n_uni) AS n_tokens FROM u),"
            " pt AS (SELECT sum(greatest(len(tokens) - 1, 0)) AS n_pairs_total"
            "  FROM t)"
            " SELECT tok_a, tok_b, n_pair,"
            "  round(ln((n_pair / CAST(n_pairs_total AS DOUBLE))"
            "   / ((ua.n_uni / CAST(n_tokens AS DOUBLE))"
            "    * (ub.n_uni / CAST(n_tokens AS DOUBLE)))), 6) AS pmi"
            " FROM p JOIN u ua ON p.tok_a = ua.tok"
            "  JOIN u ub ON p.tok_b = ub.tok, tot, pt"
            " ORDER BY pmi DESC, tok_a ASC, tok_b ASC LIMIT 50"
        ),
        "dup_gram_scale": _dup_gram_scale_sql(),
        "repair_sequences": (
            """WITH d AS (SELECT doc_id,  CASE WHEN doc_id % 7 <> 0 THEN [1] ELSE CAST([] AS INT[]) END  || list_transform(tokens, x -> x + 10)  || CASE WHEN doc_id % 13 = 0 THEN [0] ELSE CAST([] AS INT[]) END  || CASE WHEN doc_id % 11 = 0 THEN [99999] ELSE CAST([] AS INT[]) END  || CASE WHEN doc_id % 5 <> 0 THEN [2] ELSE CAST([] AS INT[]) END  AS t FROM read_parquet('{TOK}/*.parquet')), r AS (SELECT doc_id, t,  list_filter(t, x -> NOT list_contains([1, 2, 0], x)) AS core FROM d), f AS (SELECT doc_id, t, core,  [1] || list_transform(core, x -> CASE WHEN x >= 0 AND x < 32000   THEN x ELSE 3 END) || [2] AS fixed FROM r) SELECT doc_id, md5(array_to_string(fixed, ',')) AS repaired_fp,  CAST(len(t) - len(core) AS INT) AS n_stripped,  CAST(len(list_filter(core, x -> x < 0 OR x >= 32000)) AS INT)   AS n_remapped,  fixed <> t AS changed FROM f"""
            .replace("{TOK}", _token_corpus_path())
        ),
        "chunk_sequences": (
            f"WITH t AS (SELECT * FROM read_parquet('{_token_corpus_path()}/*.parquet')),"
            " k AS (SELECT doc_id, tokens, len(tokens) AS n,"
            "  CASE WHEN len(tokens) <= 0 THEN 0"
            "   WHEN len(tokens) <= 48 THEN 1"
            "   ELSE CAST(ceil((len(tokens) - 48) / CAST(32 AS DOUBLE)) AS INT) + 1"
            "  END AS n_chunks FROM t),"
            " e AS (SELECT doc_id, tokens, n,"
            "   CAST(unnest(range(n_chunks)) AS INT) AS chunk_idx FROM k)"
            " SELECT doc_id AS id, chunk_idx,"
            "  md5(array_to_string(tokens[1 + chunk_idx * 32 :"
            "   least(chunk_idx * 32 + 48, n)], ',')) AS chunk_fp,"
            "  CAST(least(chunk_idx * 32 + 48, n) - chunk_idx * 32 AS INT)"
            "   AS n_tok"
            " FROM e"
        ),
        "component_size_hist": (
            # dup_components' recursive-CTE closure + two GROUP BYs
            "WITH RECURSIVE sh AS (SELECT doc_id, list_sort(list_distinct(list_transform("
            "   generate_series(1, greatest(len(ws)-2, 0)),"
            "   i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS g"
            f"  FROM (SELECT doc_id, {_WS} AS ws FROM documents)),"
            " pairs AS (SELECT id_a, id_b FROM ("
            "  SELECT a.doc_id AS id_a, b.doc_id AS id_b,"
            "   CASE WHEN len(list_distinct(a.g || b.g)) = 0 THEN 0.0"
            "    ELSE len(list_intersect(a.g, b.g))"
            "     / CAST(len(list_distinct(a.g || b.g)) AS DOUBLE) END AS j"
            "  FROM sh a JOIN sh b ON a.doc_id < b.doc_id"
            "   AND len(a.g) * 5 >= len(b.g) * 4 AND len(b.g) * 5 >= len(a.g) * 4) WHERE j >= 0.8),"
            " edges AS (SELECT id_a AS src, id_b AS dst FROM pairs"
            "  UNION ALL SELECT id_b, id_a FROM pairs),"
            " nodes AS (SELECT DISTINCT src AS id FROM edges),"
            " reach(id, r) AS ("
            "  SELECT id, id FROM nodes"
            "  UNION"
            "  SELECT e.dst, re.r FROM reach re JOIN edges e ON e.src = re.id),"
            " comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id),"
            " cs AS (SELECT component, count(*) AS cluster_size FROM comp GROUP BY component)"
            " SELECT cluster_size, count(*) AS n_clusters FROM cs GROUP BY cluster_size"
        ),
        "containment_dups": (
            # candidate prefilter via unnest-join (same shape as the engine:
            # only gram-sharing pairs reach the intersection), exact
            # containment over per-doc DISTINCT 5-gram sets, INTEGER
            # threshold arithmetic (10*shared >= 8*min) on both sides
            "WITH g AS (SELECT doc_id, list_sort(list_distinct(list_transform("
            "   generate_series(1, greatest(len(ws)-4, 0)),"
            "   i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' ||"
            "    ws[i+3] || ' ' || ws[i+4]))) AS gs"
            f"  FROM (SELECT doc_id, {_WS} AS ws FROM documents)),"
            " e AS (SELECT doc_id, unnest(gs) AS gram FROM g),"
            " cand AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b FROM e a"
            "  JOIN e b ON a.gram = b.gram AND a.doc_id < b.doc_id GROUP BY 1, 2),"
            " j AS (SELECT id_a, id_b,"
            "   len(list_intersect(ga.gs, gb.gs)) AS n_shared,"
            "   least(len(ga.gs), len(gb.gs)) AS min_grams"
            "  FROM cand JOIN g ga ON ga.doc_id = cand.id_a"
            "   JOIN g gb ON gb.doc_id = cand.id_b)"
            " SELECT id_a, id_b, n_shared, min_grams,"
            "  round(n_shared / CAST(min_grams AS DOUBLE), 6) AS containment"
            " FROM j WHERE n_shared * 10 >= 8 * min_grams"
        ),
        "token_burstiness": (
            # zeros in closed form: mean = total/N over ALL docs, var =
            # sumsq/N - mean*mean (mean*mean, NOT pow(mean,2) — pow is not
            # ulp-identical across libm builds)
            "WITH w AS (SELECT doc_id, unnest(ws) AS token"
            f"  FROM (SELECT doc_id, {_WS} AS ws FROM documents)),"
            " pd AS (SELECT doc_id, token, count(*) AS c FROM w GROUP BY 1, 2),"
            " agg AS (SELECT token, sum(c) AS total, sum(c * c) AS sumsq"
            "  FROM pd GROUP BY token),"
            " n AS (SELECT CAST(count(*) AS DOUBLE) AS nd FROM documents),"
            " ranked AS (SELECT token, total, sumsq,"
            "   row_number() OVER (ORDER BY total DESC, token ASC) AS rn FROM agg),"
            " calc AS (SELECT token, total, sumsq, nd, total / nd AS mean"
            "  FROM ranked, n WHERE rn <= 20)"
            " SELECT token, total, round(mean, 6) AS mean_per_doc,"
            "  round((sumsq / nd - mean * mean) / mean, 6) AS vmr FROM calc"
        ),
        "doremi_weights": (
            "WITH agg AS (SELECT source, count(*) AS n,"
            "   avg(ln(1.0 + CAST(n_chars AS DOUBLE))) AS avg_score"
            "  FROM documents GROUP BY source),"
            " tot AS (SELECT CAST(sum(n) AS DOUBLE) AS t FROM agg),"
            " sh AS (SELECT source, avg_score, n / t AS share,"
            "   (n / t) * exp(avg_score / 1.0) AS tt FROM agg, tot),"
            " z AS (SELECT sum(tt) AS zz FROM sh)"
            " SELECT source, round(share, 6) AS share,"
            "  round(avg_score, 6) AS avg_score,"
            "  round(tt / zz, 6) AS weight FROM sh, z"
        ),
        "spec_rollout": _spec_rollout_oracle_sql(),
        "violation_cooccur": _violation_cooccur_oracle_sql(),
        "check_activation": _check_activation_oracle_sql(),
        "bigram_kn_ppl": (
            f"WITH t AS (SELECT * FROM read_parquet('{_token_corpus_path()}/*.parquet')),"
            " ref AS (SELECT * FROM t WHERE doc_id % 5 = 0),"
            " rp AS (SELECT unnest(tokens[1:len(tokens) - 1]) AS a,"
            "   unnest(tokens[2:len(tokens)]) AS b FROM ref),"
            " bg AS (SELECT a, b, count(*) AS nb FROM rp GROUP BY 1, 2),"
            " h AS (SELECT a, CAST(sum(nb) AS BIGINT) AS na,"
            "   count(*) AS n1f FROM bg GROUP BY 1),"
            " cb AS (SELECT b, count(*) AS n1b FROM bg GROUP BY 1),"
            " tot AS (SELECT count(*) AS n1all FROM bg),"
            " vt AS (SELECT count(DISTINCT tok) AS v FROM"
            "  (SELECT unnest(tokens) AS tok FROM ref)),"
            " sp AS (SELECT doc_id AS id,"
            "   unnest(tokens[1:len(tokens) - 1]) AS a,"
            "   unnest(tokens[2:len(tokens)]) AS b"
            "  FROM t WHERE doc_id % 5 <> 0),"
            " j AS (SELECT id, h.na IS NOT NULL AS seen,"
            "   (coalesce(cb.n1b, 0) + CAST(0.5 AS DOUBLE))"
            "    / (tot.n1all + CAST(0.5 AS DOUBLE) * vt.v) AS pc,"
            "   coalesce(bg.nb, 0) AS nb, h.na, h.n1f"
            "  FROM sp LEFT JOIN bg USING (a, b) LEFT JOIN h USING (a)"
            "   LEFT JOIN cb ON sp.b = cb.b CROSS JOIN tot CROSS JOIN vt),"
            " s AS (SELECT id, seen, CASE WHEN seen THEN"
            "    greatest(nb - CAST(0.75 AS DOUBLE), CAST(0 AS DOUBLE)) / na"
            "     + CAST(0.75 AS DOUBLE) * n1f / na * pc"
            "   ELSE pc END AS p FROM j)"
            " SELECT id, count(*) AS n_bigrams,"
            "  CAST(count(*) FILTER (WHERE seen) AS BIGINT) AS n_seen_hist,"
            "  round(avg(-ln(p)), 6) AS xent,"
            "  round(exp(avg(-ln(p))), 6) AS ppl"
            " FROM s GROUP BY 1"
        ),
    }
    # composed twins: built from other entries' SQL so the shared CTE
    # chains stay defined exactly once
    out["repeat_value"] = (
        "WITH eff AS (" + out["effective_tokens"] + "),"
        " v AS (SELECT source, total_tokens, effective_tokens,"
        "   CASE WHEN effective_tokens > 0 THEN"
        "    total_tokens / CAST(effective_tokens AS DOUBLE)"
        "    ELSE CAST(1.0 AS DOUBLE) END AS e FROM eff),"
        " w AS (SELECT source, total_tokens, effective_tokens, e,"
        "   CASE WHEN effective_tokens > 0 THEN"
        "    CAST(effective_tokens AS DOUBLE) * (CAST(1.0 AS DOUBLE)"
        "     + CAST(15.0 AS DOUBLE) * (CAST(1.0 AS DOUBLE)"
        "      - exp(-(e - CAST(1.0 AS DOUBLE)) / CAST(15.0 AS DOUBLE))))"
        "    ELSE CAST(0.0 AS DOUBLE) END AS value_d FROM v)"
        " SELECT source, total_tokens,"
        "  effective_tokens AS unique_tokens,"
        "  round(e, 6) AS epochs, round(value_d, 6) AS value_tokens,"
        "  round(CASE WHEN total_tokens > 0 THEN"
        "   value_d / CAST(total_tokens AS DOUBLE)"
        "   ELSE CAST(0.0 AS DOUBLE) END, 6) AS utilization"
        " FROM w"
    )
    dim_vals = ", ".join(
        f"('{t}', TIMESTAMP '{ts}', CAST({v!r} AS DOUBLE))"
        for t, ts, v in _asof_dim_rows()
    )
    out["asof_thresholds"] = (
        f"WITH dim AS (SELECT * FROM (VALUES {dim_vals})"
        "  AS d(event_type, rev_ts, threshold))"
        " SELECT e.event_id, round(d.threshold, 6) AS threshold,"
        "  e.value > d.threshold AS exceeded"
        " FROM events e ASOF LEFT JOIN dim d"
        "  ON e.event_type = d.event_type AND e.ts >= d.rev_ts"
    )
    win_vals = ", ".join(
        f"('{w}', TIMESTAMP '{s}', TIMESTAMP '{e}')"
        for w, s, e in _MAINT_WINDOWS
    )
    out["maintenance_overlap"] = (
        f"WITH win AS (SELECT * FROM (VALUES {win_vals})"
        "  AS w(window_id, start_ts, end_ts))"
        " SELECT e.event_id, w.window_id FROM events e JOIN win w"
        "  ON e.ts >= w.start_ts AND e.ts <= w.end_ts"
    )
    out["event_sessions"] = (
        "WITH b AS (SELECT user_id, epoch_us(ts) AS us, value"
        "  FROM events),"
        " fl AS (SELECT user_id, us, value,"
        "   CASE WHEN us - lag(us) OVER"
        "      (PARTITION BY user_id ORDER BY us) > 7200000000"
        "     THEN 1 ELSE 0 END AS brk FROM b),"
        " s AS (SELECT user_id, us, value,"
        "   1 + sum(brk) OVER (PARTITION BY user_id ORDER BY us"
        "      ROWS UNBOUNDED PRECEDING) AS session_seq"
        "  FROM fl)"
        " SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,"
        "  min(us) AS start_us, max(us) AS end_us,"
        "  count(*) AS n_events,"
        "  max(us) - min(us) AS duration_us,"
        "  round(sum(value), 6) AS value_sum"
        " FROM s GROUP BY 1, 2"
    )
    out["violation_examples"] = _violation_examples_oracle_sql()
    out["component_purity"] = (
        "WITH RECURSIVE sh AS (SELECT doc_id, list_sort(list_distinct(list_transform("
        "   generate_series(1, greatest(len(ws)-2, 0)),"
        "   i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS g"
        f"  FROM (SELECT doc_id, {_WS} AS ws FROM documents)),"
        " pairs AS (SELECT id_a, id_b FROM ("
        "  SELECT a.doc_id AS id_a, b.doc_id AS id_b,"
        "   CASE WHEN len(list_distinct(a.g || b.g)) = 0 THEN 0.0"
        "    ELSE len(list_intersect(a.g, b.g))"
        "     / CAST(len(list_distinct(a.g || b.g)) AS DOUBLE) END AS j"
        "  FROM sh a JOIN sh b ON a.doc_id < b.doc_id"
        "   AND len(a.g) * 5 >= len(b.g) * 4"
        "   AND len(b.g) * 5 >= len(a.g) * 4) WHERE j >= 0.8),"
        " edges AS (SELECT id_a AS src, id_b AS dst FROM pairs"
        "  UNION ALL SELECT id_b, id_a FROM pairs),"
        " nodes AS (SELECT DISTINCT src AS id FROM edges),"
        " reach(id, r) AS ("
        "  SELECT id, id FROM nodes"
        "  UNION"
        "  SELECT e.dst, re.r FROM reach re JOIN edges e ON e.src = re.id),"
        " comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id),"
        " sz AS (SELECT component, count(*) AS n_members FROM comp"
        "  GROUP BY 1),"
        " ec AS (SELECT c.component, count(*) AS n_edges FROM pairs p"
        "  JOIN comp c ON p.id_a = c.id GROUP BY 1)"
        " SELECT sz.component, sz.n_members,"
        "  CAST(coalesce(ec.n_edges, 0) AS BIGINT) AS n_edges,"
        "  round(coalesce(ec.n_edges, 0) / (CAST(sz.n_members AS DOUBLE)"
        "   * (CAST(sz.n_members AS DOUBLE) - CAST(1.0 AS DOUBLE))"
        "   / CAST(2.0 AS DOUBLE)), 6) AS density"
        " FROM sz LEFT JOIN ec ON ec.component = sz.component"
    )
    _lz = "CAST(1.96 AS DOUBLE)"
    _lz2 = f"({_lz} * {_lz})"
    _lp = "(n_det / CAST(n_true AS DOUBLE))"
    out["lsh_recall"] = (
        # k-smallest-hash constant-size sample (k=256): ORDER BY the
        # portable priority + id LIMIT k = DuckDB twin of Spark's
        # TakeOrderedAndProject sample in lsh_recall_probe
        "WITH d AS (SELECT doc_id, " + _WS + " AS ws FROM documents"
        "   ORDER BY " + _hex60("concat('lshqa:', CAST(doc_id AS VARCHAR))")
        + ", doc_id LIMIT 256),"
        " sh AS (SELECT doc_id, list_distinct(list_transform("
        "   generate_series(1, greatest(len(ws) - 2, 0)),"
        "   i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS g FROM d),"
        " ne AS (SELECT * FROM sh WHERE len(g) > 0),"
        " sg AS (SELECT doc_id, g, list_transform(generate_series(0, 31),"
        "   p -> list_min(list_transform(g, x -> "
        + _hex60("concat('lshp:', p, ':', x)")
        + "))) AS sig FROM ne),"
        " bk AS (SELECT doc_id, g, list_transform(generate_series(0, 15),"
        "   b -> array_to_string(list_transform(sig[b*2+1:b*2+2],"
        "    v -> CAST(v AS VARCHAR)), ',')) AS bands FROM sg),"
        " p AS (SELECT CASE WHEN len(list_distinct(a.g || b.g)) = 0"
        "    THEN 0.0 ELSE len(list_intersect(a.g, b.g))"
        "     / CAST(len(list_distinct(a.g || b.g)) AS DOUBLE) END AS j,"
        "   len(list_intersect(a.bands, b.bands)) > 0 AS caught"
        "  FROM bk a JOIN bk b ON a.doc_id < b.doc_id),"
        " s AS (SELECT count(*) FILTER (WHERE j >= 0.5) AS n_true,"
        "   count(*) FILTER (WHERE j >= 0.5 AND caught) AS n_det FROM p),"
        " c AS (SELECT count(*) AS n_docs FROM ne)"
        " SELECT c.n_docs, s.n_true AS n_true_pairs, s.n_det AS n_detected,"
        f"  round(CASE WHEN n_true > 0 THEN {_lp} END, 6) AS recall,"
        "  round(CASE WHEN n_true > 0 THEN"
        f"   (({_lp} + {_lz2} / (CAST(2.0 AS DOUBLE) * n_true))"
        f"    - {_lz} * sqrt({_lp} * (CAST(1.0 AS DOUBLE) - {_lp}) / n_true"
        f"       + {_lz2} / (CAST(4.0 AS DOUBLE) * n_true * n_true)))"
        f"   / (CAST(1.0 AS DOUBLE) + {_lz2} / n_true) END, 6) AS wilson_lo"
        " FROM s CROSS JOIN c"
    )
    out["watermark_audit"] = (
        "WITH b AS (SELECT event_id, ts,"
        "   CAST(floor(event_id / 64) AS BIGINT) AS blk, "
        + _hex60("concat('wm:', CAST(event_id AS VARCHAR))")
        + " AS h FROM events),"
        " a AS (SELECT ts, blk * 64 + row_number() OVER"
        "   (PARTITION BY blk ORDER BY h, event_id) AS arr FROM b),"
        " r AS (SELECT ts, max(ts) OVER (ORDER BY arr"
        "   ROWS UNBOUNDED PRECEDING) AS run FROM a)"
        " SELECT CAST(floor((epoch_us(run) - epoch_us(ts)) / 1000000)"
        "   AS BIGINT) AS lateness_sec, count(*) AS n_events"
        " FROM r GROUP BY 1"
    )
    out["event_rollup"] = (
        "SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS bucket,"
        " count(*) AS n_events, round(sum(value), 6) AS value_sum,"
        " round(min(value), 6) AS value_min,"
        " round(max(value), 6) AS value_max,"
        " round(sum(value) / count(*), 6) AS value_avg"
        " FROM events GROUP BY 1"
    )
    out["epoch_order_audit"] = (
        "WITH o AS ("
        " SELECT 0 AS epoch, doc_id,"
        "  CAST(row_number() OVER (ORDER BY h, doc_id) AS BIGINT) AS pos"
        " FROM (SELECT doc_id, "
        + _hex60("concat('7:', CAST(doc_id AS VARCHAR))")
        + " AS h FROM documents)"
        " UNION ALL"
        " SELECT 1 AS epoch, doc_id,"
        "  CAST(row_number() OVER (ORDER BY h, doc_id) AS BIGINT) AS pos"
        " FROM (SELECT doc_id, "
        + _hex60("concat('11:', CAST(doc_id AS VARCHAR))")
        + " AS h FROM documents)),"
        " s AS (SELECT epoch, count(*) AS n_rows,"
        "   count(DISTINCT doc_id) AS n_ids,"
        "   count(DISTINCT pos) AS n_pos,"
        "   min(pos) AS pos_min, max(pos) AS pos_max FROM o GROUP BY 1),"
        " r AS (SELECT a.epoch, round(corr(a.pos, b.pos), 6)"
        "   AS spearman_vs_prev FROM o a JOIN o b"
        "   ON b.epoch = a.epoch - 1 AND b.doc_id = a.doc_id GROUP BY 1)"
        " SELECT CAST(s.epoch AS BIGINT) AS epoch, n_rows, n_ids, n_pos,"
        "  pos_min, pos_max,"
        "  (n_ids = n_rows AND n_pos = n_rows AND pos_min = 1"
        "   AND pos_max = n_rows) AS is_permutation,"
        "  r.spearman_vs_prev"
        " FROM s LEFT JOIN r ON r.epoch = s.epoch"
    )
    _nn = "CAST(n_rows - n_null AS DOUBLE)"
    out["column_profile"] = (
        "WITH st AS ("
        "  SELECT 'doc_id' AS col, CAST(doc_id AS VARCHAR) AS value"
        "   FROM documents"
        "  UNION ALL SELECT 'lang', lang FROM documents"
        "  UNION ALL SELECT 'source', source FROM documents"
        "  UNION ALL SELECT 'n_chars', CAST(n_chars AS VARCHAR)"
        "   FROM documents),"
        " c AS (SELECT col, value, count(*) AS c FROM st GROUP BY 1, 2),"
        " a AS (SELECT col,"
        "   CAST(sum(c) AS BIGINT) AS n_rows,"
        "   CAST(coalesce(sum(c) FILTER (WHERE value IS NULL), 0)"
        "    AS BIGINT) AS n_null,"
        "   CAST(count(*) FILTER (WHERE value IS NOT NULL)"
        "    AS BIGINT) AS n_distinct,"
        "   CAST(count(*) FILTER (WHERE value IS NOT NULL AND c = 1)"
        "    AS BIGINT) AS n_unique,"
        "   coalesce(sum(c * ln(c)) FILTER (WHERE value IS NOT NULL),"
        "    0.0) AS clnc"
        "  FROM c GROUP BY 1),"
        " m AS (SELECT col, value AS mode_value,"
        "   CAST(c AS BIGINT) AS mode_count FROM ("
        "   SELECT col, value, c, row_number() OVER"
        "    (PARTITION BY col ORDER BY c DESC, value DESC) AS rn"
        "   FROM c WHERE value IS NOT NULL) WHERE rn = 1)"
        ' SELECT a.col AS "column", n_rows, n_null, n_distinct, n_unique,'
        f"  round(CASE WHEN n_rows - n_null > 0 THEN n_distinct / {_nn}"
        "   END, 6) AS distinctness,"
        f"  round(CASE WHEN n_rows - n_null > 0 THEN n_unique / {_nn}"
        "   END, 6) AS uniqueness,"
        f"  round(CASE WHEN n_rows - n_null > 0 THEN ln({_nn})"
        f"   - clnc / {_nn} END, 6) AS entropy,"
        "  m.mode_value, m.mode_count"
        " FROM a LEFT JOIN m ON m.col = a.col"
    )
    out["fd_audit"] = (
        "WITH p AS (SELECT l_partkey AS l, l_suppkey AS r,"
        "   count(*) AS c FROM lineitem"
        "  WHERE l_partkey IS NOT NULL AND l_suppkey IS NOT NULL"
        "  GROUP BY 1, 2),"
        " g AS (SELECT l, sum(c) AS rows_, max(c) AS maxc,"
        "   count(*) AS nr FROM p GROUP BY 1)"
        " SELECT CAST(count(*) AS BIGINT) AS n_groups,"
        "  CAST(sum(CASE WHEN nr > 1 THEN 1 ELSE 0 END) AS BIGINT)"
        "   AS n_violating_groups,"
        "  CAST(sum(rows_) AS BIGINT) AS n_rows,"
        "  CAST(coalesce(sum(rows_) FILTER (WHERE nr > 1), 0) AS BIGINT)"
        "   AS n_violating_rows,"
        "  CAST(sum(rows_ - maxc) AS BIGINT) AS g3_rows,"
        "  round(1.0 - sum(rows_ - maxc) / CAST(sum(rows_) AS DOUBLE), 6)"
        "   AS fd_strength"
        " FROM g"
    )
    _sc_cols = ["doc_id", "lang", "source", "n_chars"]
    _sc_nums = ["doc_id", "n_chars"]
    _sc_aggs = []
    for _i, _c in enumerate(_sc_cols):
        _sc_aggs += [
            f"CAST(count({_c}) AS DOUBLE) AS nn{_i}",
            f"avg(CASE WHEN {_c} IS NULL THEN 1 ELSE 0 END) AS nr{_i}",
            f"CAST(count(DISTINCT {_c}) AS DOUBLE) AS nd{_i}",
        ]
    for _j, _c in enumerate(_sc_nums):
        _sc_aggs += [
            f"CAST(min({_c}) AS DOUBLE) AS mn{_j}",
            f"CAST(max({_c}) AS DOUBLE) AS mx{_j}",
        ]

    def _sc_row(col, kind, metric, op, thr, obs, sugg):
        return (
            f" SELECT '{col}' AS \"column\", '{kind}' AS kind,"
            f" '{metric}' AS metric, '{op}' AS op, {thr} AS threshold,"
            f" {obs} AS observed, coalesce({sugg}, FALSE) AS suggested"
            " FROM m"
        )

    _sc_rows = []
    for _i, _c in enumerate(_sc_cols):
        _sc_rows.append(_sc_row(
            _c, "required", "null_rate", "<=", "CAST(0.0 AS DOUBLE)",
            f"round(nr{_i}, 6)", f"nr{_i} = 0"))
        _sc_rows.append(_sc_row(
            _c, "unique", "n_distinct", ">=", f"round(nd{_i}, 6)",
            f"round(nd{_i}, 6)", f"nd{_i} = nn{_i} AND nn{_i} > 0"))
        _sc_rows.append(_sc_row(
            _c, "enum_bounded", "n_distinct", "<=", f"round(nd{_i}, 6)",
            f"round(nd{_i}, 6)", f"nd{_i} <= 16 AND nn{_i} > 0"))
    for _j, _c in enumerate(_sc_nums):
        _sc_rows.append(_sc_row(
            _c, "min_bound", "min", ">=", f"round(mn{_j}, 6)",
            f"round(mn{_j}, 6)", f"mn{_j} IS NOT NULL"))
        _sc_rows.append(_sc_row(
            _c, "max_bound", "max", "<=", f"round(mx{_j}, 6)",
            f"round(mx{_j}, 6)", f"mx{_j} IS NOT NULL"))
    out["suggest_constraints"] = (
        "WITH m AS (SELECT " + ", ".join(_sc_aggs) + " FROM documents)"
        + " UNION ALL ".join(_sc_rows)
    )

    def _exp_sql_expr(metric: str, column: str) -> str:
        if metric == "n_rows":
            return "CAST(count(*) AS DOUBLE)"
        if metric == "null_rate":
            return f"avg(CASE WHEN {column} IS NULL THEN 1 ELSE 0 END)"
        if metric == "n_distinct":
            return f"CAST(count(DISTINCT {column}) AS DOUBLE)"
        if metric in ("min", "max"):
            return f"CAST({metric}({column}) AS DOUBLE)"
        return f"avg(CAST({column} AS DOUBLE))"  # mean

    _exp_parts = []
    for _i, _e in enumerate(_EXPECTATIONS):
        _exp_parts.append(
            f" SELECT '{_e['name']}' AS name, '{_e['metric']}' AS metric,"
            f" '{_e.get('column') or ''}' AS \"column\","
            f" round(m._x{_i}, 6) AS value, '{_e['op']}' AS op,"
            f" CAST({_e['threshold']} AS DOUBLE) AS threshold,"
            f" coalesce(round(m._x{_i}, 6) {_e['op']}"
            f" CAST({_e['threshold']} AS DOUBLE), FALSE) AS passed FROM m"
        )
    out["table_expectations"] = (
        "WITH m AS (SELECT "
        + ", ".join(
            f"{_exp_sql_expr(_e['metric'], _e.get('column'))} AS _x{_i}"
            for _i, _e in enumerate(_EXPECTATIONS)
        )
        + " FROM documents)"
        + " UNION ALL ".join(_exp_parts)
    )
    out["fd_audit_by"] = (
        "WITH p AS (SELECT l_returnflag AS cond, l_partkey AS l,"
        "   l_suppkey AS r, count(*) AS c FROM lineitem"
        "  WHERE l_returnflag IS NOT NULL AND l_partkey IS NOT NULL"
        "   AND l_suppkey IS NOT NULL"
        "  GROUP BY 1, 2, 3),"
        " g AS (SELECT cond, l, sum(c) AS rows_, max(c) AS maxc,"
        "   count(*) AS nr FROM p GROUP BY 1, 2)"
        " SELECT cond, CAST(count(*) AS BIGINT) AS n_groups,"
        "  CAST(sum(CASE WHEN nr > 1 THEN 1 ELSE 0 END) AS BIGINT)"
        "   AS n_violating_groups,"
        "  CAST(sum(rows_) AS BIGINT) AS n_rows,"
        "  CAST(coalesce(sum(rows_) FILTER (WHERE nr > 1), 0) AS BIGINT)"
        "   AS n_violating_rows,"
        "  CAST(sum(rows_ - maxc) AS BIGINT) AS g3_rows,"
        "  round(1.0 - sum(rows_ - maxc) / CAST(sum(rows_) AS DOUBLE), 6)"
        "   AS fd_strength"
        " FROM g GROUP BY 1"
    )
    _min = "(ln(CAST(n AS DOUBLE)) - sa / n)"
    _mib = "(ln(CAST(n AS DOUBLE)) - sb / n)"
    _miab = "(ln(CAST(n AS DOUBLE)) - sab / n)"
    _mival = f"({_min} + {_mib} - {_miab})"
    out["categorical_mi"] = (
        "WITH cells AS (SELECT source AS a, lang AS b, count(*) AS c"
        "  FROM documents WHERE source IS NOT NULL AND lang IS NOT NULL"
        "  GROUP BY 1, 2),"
        " sab AS (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS n,"
        "   coalesce(sum(c * ln(c)), 0.0) AS sab,"
        "   CAST(count(*) AS BIGINT) AS n_cells FROM cells),"
        " ma AS (SELECT a, sum(c) AS ca FROM cells GROUP BY 1),"
        " sa AS (SELECT coalesce(sum(ca * ln(ca)), 0.0) AS sa,"
        "   CAST(count(*) AS BIGINT) AS n_a FROM ma),"
        " mb AS (SELECT b, sum(c) AS cb FROM cells GROUP BY 1),"
        " sb AS (SELECT coalesce(sum(cb * ln(cb)), 0.0) AS sb,"
        "   CAST(count(*) AS BIGINT) AS n_b FROM mb)"
        " SELECT n AS n_rows, n_a, n_b, n_cells,"
        f"  round(CASE WHEN n > 0 THEN {_min} END, 6) AS h_a,"
        f"  round(CASE WHEN n > 0 THEN {_mib} END, 6) AS h_b,"
        f"  round(CASE WHEN n > 0 THEN {_miab} END, 6) AS h_ab,"
        f"  round(CASE WHEN n > 0 THEN {_mival} END, 6) AS mi,"
        f"  round(CASE WHEN n > 0 AND {_min} > 0 AND {_mib} > 0"
        f"   THEN {_mival} / sqrt({_min} * {_mib}) END, 6) AS nmi"
        " FROM sab CROSS JOIN sa CROSS JOIN sb"
    )
    _bexp = "(ln(1.0 + 1.0 / digit) / ln(10.0))"
    out["benford_digits"] = (
        # all nine rows always emitted: counts left-join the 1..9 digit
        # spine, absent digits coalesce to 0 (ADVICE r4 / operator twin)
        "WITH d AS (SELECT CAST(substr(CAST(u AS VARCHAR), 1, 1)"
        "   AS INTEGER) AS digit FROM ("
        "   SELECT CAST(floor(l_extendedprice * 100.0) AS BIGINT) AS u"
        "   FROM lineitem) WHERE u > 0),"
        " c0 AS (SELECT digit, count(*) AS n FROM d GROUP BY 1),"
        " c AS (SELECT sp.digit, coalesce(c0.n, 0) AS n"
        "   FROM (SELECT unnest(generate_series(1, 9)) AS digit) sp"
        "   LEFT JOIN c0 USING (digit)),"
        " t AS (SELECT CAST(sum(n) AS DOUBLE) AS nt FROM c)"
        " SELECT digit, CAST(n AS BIGINT) AS n,"
        "  round(n / nt, 6) AS rate,"
        f"  round({_bexp}, 6) AS expected,"
        f"  round((n - nt * {_bexp}) * (n - nt * {_bexp})"
        f"   / (nt * {_bexp}), 6) AS chi2_term"
        " FROM c CROSS JOIN t"
    )
    _jcm = "(cl IS NOT NULL AND cr IS NOT NULL)"
    out["join_cardinality"] = (
        "WITH lc AS (SELECT o_orderkey AS k, count(*) AS cl FROM orders"
        "  WHERE o_orderkey IS NOT NULL GROUP BY 1),"
        " rc AS (SELECT l_orderkey AS k, count(*) AS cr FROM lineitem"
        "  WHERE l_orderkey IS NOT NULL GROUP BY 1),"
        " j AS (SELECT cl, cr FROM lc FULL OUTER JOIN rc ON lc.k = rc.k),"
        " s AS (SELECT"
        "   CAST(coalesce(sum(cl), 0) AS BIGINT) AS n_left_rows,"
        "   CAST(coalesce(sum(cr), 0) AS BIGINT) AS n_right_rows,"
        "   CAST(count(cl) AS BIGINT) AS n_left_keys,"
        "   CAST(count(cr) AS BIGINT) AS n_right_keys,"
        f"   CAST(sum(CASE WHEN {_jcm} THEN 1 ELSE 0 END) AS BIGINT)"
        "    AS n_matched_keys,"
        "   CAST(sum(CASE WHEN cr IS NULL THEN 1 ELSE 0 END) AS BIGINT)"
        "    AS n_left_only_keys,"
        "   CAST(sum(CASE WHEN cl IS NULL THEN 1 ELSE 0 END) AS BIGINT)"
        "    AS n_right_only_keys,"
        "   CAST(max(coalesce(cl, 0)) AS BIGINT) AS max_left_per_key,"
        "   CAST(max(coalesce(cr, 0)) AS BIGINT) AS max_right_per_key,"
        f"   CAST(coalesce(max(CASE WHEN {_jcm} THEN cl * cr END), 0)"
        "    AS BIGINT) AS max_fanout,"
        f"   CAST(coalesce(sum(CASE WHEN {_jcm} THEN cl * cr END), 0)"
        "    AS BIGINT) AS join_rows,"
        f"   coalesce(sum(CASE WHEN {_jcm} THEN cl END), 0) AS ml,"
        f"   max(CASE WHEN {_jcm} THEN cl END) AS mml,"
        f"   max(CASE WHEN {_jcm} THEN cr END) AS mmr"
        "  FROM j)"
        " SELECT n_left_rows, n_right_rows, n_left_keys, n_right_keys,"
        "  n_matched_keys, n_left_only_keys, n_right_only_keys,"
        "  max_left_per_key, max_right_per_key, max_fanout, join_rows,"
        "  round(CASE WHEN n_left_rows > 0"
        "   THEN ml / CAST(n_left_rows AS DOUBLE) END, 6)"
        "   AS left_match_rate,"
        "  CASE WHEN n_matched_keys = 0 THEN 'disjoint'"
        "   WHEN mml <= 1 AND mmr <= 1 THEN '1:1'"
        "   WHEN mml <= 1 THEN '1:N'"
        "   WHEN mmr <= 1 THEN 'N:1'"
        "   ELSE 'N:M' END AS relationship"
        " FROM s"
    )
    _npq = (
        "SELECT '{c}' AS \"column\", CAST({c} AS DOUBLE) AS v FROM lineitem"
    )
    out["numeric_profile"] = (
        "WITH st AS ("
        + " UNION ALL ".join(
            _npq.format(c=c)
            for c in ("l_quantity", "l_extendedprice", "l_discount", "l_tax")
        )
        + ")"
        ' SELECT "column", CAST(count(*) AS BIGINT) AS n_rows,'
        "  CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT)"
        "   AS n_null,"
        "  round(min(v), 6) AS min, round(max(v), 6) AS max,"
        "  round(avg(v), 6) AS mean, round(stddev_samp(v), 6) AS std,"
        "  round(quantile_cont(v, 0.25), 6) AS p25,"
        "  round(quantile_cont(v, 0.5), 6) AS p50,"
        "  round(quantile_cont(v, 0.75), 6) AS p75,"
        "  round(quantile_cont(v, 0.95), 6) AS p95"
        ' FROM st GROUP BY "column"'
    )
    out["inclusion_dependency"] = (
        "WITH cv AS (SELECT DISTINCT c_custkey AS v FROM customer"
        "  WHERE c_custkey IS NOT NULL),"
        " pv AS (SELECT DISTINCT o_custkey AS v FROM orders"
        "  WHERE o_custkey IS NOT NULL),"
        " nc AS (SELECT CAST(count(*) AS BIGINT) AS n_child_values FROM cv),"
        " np AS (SELECT CAST(count(*) AS BIGINT) AS n_parent_values FROM pv),"
        " nm AS (SELECT CAST(count(*) AS BIGINT) AS n_missing_values"
        "  FROM cv WHERE v NOT IN (SELECT v FROM pv))"
        " SELECT n_child_values, n_parent_values, n_missing_values,"
        "  round(CASE WHEN n_child_values > 0 THEN 1.0"
        "   - n_missing_values / CAST(n_child_values AS DOUBLE) END, 6)"
        "   AS containment"
        " FROM nc CROSS JOIN np CROSS JOIN nm"
    )
    _fsp = "(epoch_us(last_ts) - epoch_us(first_ts))"
    out["freshness_audit"] = (
        "WITH per AS (SELECT event_type AS grp,"
        "   CAST(count(*) AS BIGINT) AS n_events,"
        "   min(ts) AS first_ts, max(ts) AS last_ts FROM events"
        "  GROUP BY 1),"
        " hw AS (SELECT max(ts) AS hw FROM events)"
        ' SELECT grp AS "group", n_events,'
        "  CAST(epoch_us(first_ts) AS BIGINT) AS first_us,"
        "  CAST(epoch_us(last_ts) AS BIGINT) AS last_us,"
        "  CAST(epoch_us(hw) - epoch_us(last_ts) AS BIGINT)"
        "   AS staleness_us,"
        f"  CAST({_fsp} AS BIGINT) AS span_us,"
        f"  round(CASE WHEN {_fsp} > 0 THEN"
        f"   n_events / ({_fsp} / 86400000000.0) END, 6)"
        "   AS events_per_day"
        " FROM per CROSS JOIN hw"
    )
    _maz = "((value - pm) / ps)"
    out["metric_anomaly"] = (
        "WITH m AS (SELECT strftime(date_trunc('month', o_orderdate),"
        "   '%Y-%m') AS ds, CAST(count(*) AS DOUBLE) AS cnt,"
        "   round(avg(o_totalprice), 6) AS ap FROM orders GROUP BY 1),"
        " h AS (SELECT 'order_count' AS metric, ds, cnt AS value FROM m"
        "  UNION ALL SELECT 'avg_price', ds, ap FROM m),"
        " s AS (SELECT metric, ds, value,"
        "   count(value) OVER w AS pn,"
        "   avg(value) OVER w AS pm,"
        "   stddev_samp(value) OVER w AS ps"
        "  FROM h WINDOW w AS (PARTITION BY metric ORDER BY ds"
        "   ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING))"
        " SELECT metric, ds, round(value, 6) AS value,"
        "  CAST(pn AS BIGINT) AS prior_n,"
        "  round(pm, 6) AS prior_mean, round(ps, 6) AS prior_std,"
        f"  round(CASE WHEN pn >= 3 AND ps > 0 THEN {_maz} END, 6) AS z,"
        f"  (coalesce(CASE WHEN pn >= 3 AND ps > 0 THEN abs({_maz}) > 3.0"
        "    END, FALSE)"
        "   OR (pn >= 3 AND ps = 0 AND value <> pm)) AS is_anomaly"
        " FROM s"
    )
    return out
