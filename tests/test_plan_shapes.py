"""Physical-plan shape assertions for the headline queries — the
properties that decide 100 TB behavior, pinned so a refactor can't
silently regress them:

- filters reach the parquet scan (PushedFilters), unused columns are
  pruned (ReadSchema)
- small dimensions broadcast (BroadcastHashJoin, never SortMergeJoin)
- top-k uses TakeOrderedAndProject (no full sort of the corpus)
- deterministic sampling is a scan-stage filter (zero exchanges)
- the validation hot path contains no row-at-a-time Python
  (BatchEvalPython); only Arrow-batched kernels (ArrowEvalPython) appear
"""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_tpch_q1_pushdown_and_pruning(spark):
    plan = _plan(entry_mod.queries()["tpch_q1"](spark, SF_DIR))
    assert "PushedFilters: [" in plan and "l_shipdate" in plan.split("PushedFilters")[1][:200]
    # projection pruning: the scan schema must not drag unused wide columns
    read = plan.split("ReadSchema")[1][:400]
    assert "l_comment" not in read and "l_shipinstruct" not in read


def test_join_agg_broadcasts_dim(spark):
    plan = _plan(entry_mod.queries()["join_agg"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_orphans_broadcast_no_fact_shuffle(spark):
    plan = _plan(entry_mod.queries()["orphans"](spark, SF_DIR))
    assert "SortMergeJoin" not in plan


def test_embedding_topk_no_full_sort(spark):
    plan = _plan(entry_mod.queries()["embedding_topk"](spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan


def test_hash_sample_is_scan_stage_filter(spark):
    plan = _plan(entry_mod.queries()["hash_sample"](spark, SF_DIR))
    assert "Exchange" not in plan  # pure filter: no shuffle anywhere


def test_validation_hot_path_has_no_row_python(spark):
    from jsonschema_spark.plans.plan import TableSpec, compile_table_spec
    from jsonschema_spark.plans.job import ValidationJob

    df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan_c = compile_table_spec(TableSpec.from_dict(entry_mod.DOCS_SPEC), df.schema)
    annotated = ValidationJob(plan_c, id_column="doc_id").annotate(df)
    plan = _plan(annotated)
    assert "BatchEvalPython" not in plan  # row-at-a-time Python forbidden


def test_repetition_score_single_projection(spark):
    # pure per-row expression: one scan, no exchange, no python
    plan = _plan(entry_mod.queries()["repetition_score"](spark, SF_DIR))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_weighted_sample_no_full_sort(spark):
    plan = _plan(entry_mod.queries()["weighted_sample"](spark, SF_DIR))
    # global top-k by key must be per-partition heaps, not a corpus sort
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_tfidf_broadcasts_doc_count(spark):
    plan = _plan(entry_mod.queries()["tfidf_top_terms"](spark, SF_DIR))
    # the 1-row N aggregate joins in as a broadcast, and no pair of
    # corpus-sized tables meets in a nested-loop
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_iqr_outliers_broadcast_bounds(spark):
    plan = _plan(entry_mod.queries()["ntok_iqr_outliers"](spark, SF_DIR))
    # bounds table joins back via broadcast — the raw table is never
    # sort-merge-shuffled for the flagging pass
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_minhash_band_join_is_bucket_equijoin(spark):
    from jsonschema_spark.operators.dedup import minhash_candidates

    df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _plan(minhash_candidates(df, "doc_id", "text"))
    # candidates come from an equi-join on (band, h) buckets - never a
    # cartesian/broadcast-nested-loop over doc pairs
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_dsir_select_shape(spark):
    plan = _plan(entry_mod.queries()["dsir_select"](spark, SF_DIR))
    # top-k by weight: per-partition heaps, never a corpus sort
    assert "TakeOrderedAndProject" in plan
    # bucket log-ratios and totals join in as broadcasts; the token rows
    # must never be sort-merge-joined
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # pure-expression pipeline: no Python anywhere
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_source_mix_broadcasts_thresholds(spark):
    plan = _plan(entry_mod.queries()["source_mix"](spark, SF_DIR))
    # the corpus side of the threshold join must stay in place
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_gopher_quality_single_projection(spark):
    # Gopher rule bundle is pure let-bound expressions in the scan stage:
    # 10^12 docs cost one codegen projection — no shuffle, no Python
    plan = _plan(entry_mod.queries()["gopher_quality"](spark, SF_DIR))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_chunk_dedup_equijoin_no_python(spark):
    plan = _plan(entry_mod.queries()["chunk_dedup"](spark, SF_DIR))
    # duplicated chunk hashes meet the chunk rows in an equi-join on the
    # uniform md5 key — never a cartesian or nested-loop pairing
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # whole pipeline is expression-only
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_semantic_decontam_no_shuffle(spark):
    # benchmark side is a bounded driver matrix in the kernel closure;
    # the corpus pays ONE Arrow-batched projection — no join, no shuffle
    plan = _plan(entry_mod.queries()["semantic_decontam"](spark, SF_DIR))
    assert "Exchange" not in plan
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan
    assert "Join" not in plan


def test_infer_pass1_has_no_collect_set(spark):
    """The profile's corpus-wide pass must use fixed-size sketch buffers
    only: Spark's collect_set has no per-partition cap, so one over a
    high-cardinality column (doc_id, text) accumulates every distinct
    value — the canonical runs-at-sf0.1-dies-at-100TB shape. Enum values
    are collected in a separate pass restricted to columns the HLL
    estimate already proved small (plans/infer.py)."""
    from jsonschema_spark.plans.infer import enum_nominees, pass1_aggs

    df = (
        spark.range(50_000)
        .select(
            F.concat(F.lit("doc-"), F.col("id").cast("string")).alias("hc"),
            (F.col("id") % 3).cast("string").alias("lc"),
        )
    )
    fields = {f.name: f.dataType for f in df.schema.fields}
    plan = _plan(df.agg(*pass1_aggs(fields, 0.01)))
    assert "collect_set" not in plan.lower()

    row = df.agg(*pass1_aggs(fields, 0.01)).collect()[0].asDict()
    # the high-cardinality column must never be nominated for collection
    assert enum_nominees(row, ["hc", "lc"], enum_max=20, rsd=0.01) == ["lc"]

    from jsonschema_spark.plans.infer import infer_table_spec

    spec = infer_table_spec(df)
    assert "enum" not in spec["columns"]["hc"]
    assert sorted(spec["columns"]["lc"]["enum"]) == ["0", "1", "2"]


def test_sequence_structure_single_projection_single_eval(spark):
    """The structure verdict is a zero-shuffle scan-stage projection, and
    the interpreted HOF filters must be evaluated once per row: the struct
    lives in its own projection below the field-extraction one (multiple
    refs to a non-cheap expr block CollapseProject), so the plan carries
    exactly one `filter(` per check, not one per referencing column."""
    plan = _plan(entry_mod.queries()["sequence_structure"](spark, SF_DIR))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # n_oob's filter feeds vocab_ok, n_oob, and structure_ok; interior's
    # feeds interior_special and structure_ok. One evaluation each (plus
    # the decorating query's own exprs — count the validator's lambda var)
    assert plan.count("namedlambdavariable()") <= 4  # 2 filters x (arg+use)


def test_zipf_slope_one_shuffle_then_bounded_window(spark):
    """explode -> one hash shuffle on (group, token) with map-side partial
    aggregation; the rank window and OLS reduce run over <= vocab rows per
    group. No Python anywhere."""
    plan = _plan(entry_mod.queries()["zipf_slope"](spark, SF_DIR))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "partial_count" in plan  # map-side combine before the shuffle
    assert "Generate explode" in plan


def test_token_prefix_dups_uniform_key_groupby(spark):
    plan = _plan(entry_mod.queries()["token_prefix_dups"](spark, SF_DIR))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # keep-first state is bounded scalars: no collect_list/collect_set
    assert "collect_" not in plan.lower()
    assert "SortMergeJoin" not in plan  # single-table agg, no join at all


def test_pii_redact_single_projection(spark):
    plan = _plan(entry_mod.queries()["pii_redact"](spark, SF_DIR))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_chunk_sequences_no_shuffle(spark):
    plan = _plan(entry_mod.queries()["chunk_sequences"](spark, SF_DIR))
    assert "Exchange" not in plan
    assert "Generate posexplode" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_cross_source_dups_bounded_state(spark):
    # collect_set is over SOURCES (bounded registry), and pair expansion
    # is a Generate over that tiny array — no join anywhere in the plan
    plan = _plan(entry_mod.queries()["cross_source_dups"](spark, SF_DIR))
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_bigram_pmi_broadcast_unigrams_topk(spark):
    plan = _plan(entry_mod.queries()["bigram_pmi"](spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan


def test_dup_gram_scale_no_shuffle(spark):
    plan = _plan(entry_mod.queries()["dup_gram_scale"](spark, SF_DIR))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_repair_sequences_no_shuffle(spark):
    plan = _plan(entry_mod.queries()["repair_sequences"](spark, SF_DIR))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_padding_waste_prunes_to_length_only(spark):
    """The analysis needs only sequence lengths: on the demo corpus that
    means the scan reads just `tokens` (for size()) with doc_id pruned —
    on the north-rule table, which carries n_tok, the arrays stay
    unscanned. One partial->final agg shuffle, no Python."""
    plan = _plan(entry_mod.queries()["padding_waste"](spark, SF_DIR))
    read = plan.split("ReadSchema")[1][:300]
    assert "doc_id" not in read
    assert plan.count("Exchange") <= 2  # partial agg -> final agg
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # given an n_tok column, the token arrays are never scanned
    import tempfile

    from jsonschema_spark.operators.packing import padding_waste

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [(5, [1, 2])], "n_tok int, tokens array<int>"
        ).write.mode("overwrite").parquet(f"{d}/t")
        plan2 = _plan(
            padding_waste(
                spark.read.parquet(f"{d}/t"), "n_tok", max_len=8, bucket_width=4
            )
        )
        assert "tokens" not in plan2.split("ReadSchema")[1][:200]


def test_stratified_split_exact_one_window_shuffle(spark):
    plan = _plan(entry_mod.queries()["stratified_split"](spark, SF_DIR))
    # one hash exchange for the per-stratum window, nothing else
    assert plan.count("Exchange hashpartitioning") == 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_trigram_sbo_broadcast_unigrams_no_cartesian(spark):
    plan = _plan(entry_mod.queries()["trigram_sbo"](spark, SF_DIR))
    # vocab-bounded unigram tables broadcast; no cartesian anywhere
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_semdedup_single_cluster_shuffle_arrow_only(spark):
    """Vectors move ONCE (groupBy cluster id -> applyInPandas); the only
    Python is the Arrow assignment kernel + the per-cluster matmul —
    no pair join, no row-at-a-time Python."""
    plan = _plan(entry_mod.queries()["semdedup"](spark, SF_DIR))
    assert "FlatMapGroupsInPandas" in plan or "FlatMapGroupsInArrow" in plan
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan


def test_token_winnow_single_bounded_collect_shuffle(spark):
    """Winnow pair-gen (shared _winnow_pairs tail): fingerprints go into
    ONE groupBy(w).collect_set shuffle (sets bounded in code by the
    max_doc_freq ceiling), pairs expand through native Generates — no
    join, no checkpoint materialization, no row-at-a-time Python."""
    plan = _plan(entry_mod.queries()["token_winnow_dups"](spark, SF_DIR))
    assert "Join" not in plan
    assert "Generate" in plan  # native double-explode pair expansion
    assert "BatchEvalPython" not in plan
    assert "InMemoryTableScan" not in plan


def test_lsh_band_index_single_arrow_kernel_stage(spark):
    """The persistable band index is scan -> JVM shingle-hash projection ->
    ONE MapInPandas kernel; no row-at-a-time Python and no shuffle beyond
    the deliberate ensure_parallelism repartition guard."""
    from jsonschema_spark.operators.dedup import lsh_band_index

    df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _plan(lsh_band_index(df, "doc_id", "text"))
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan
    # at most the parallelism-guard exchange; the kernel output itself is
    # never shuffled by the index build
    assert plan.count("Exchange") <= 1


def test_incremental_near_dup_no_cartesian_no_row_python(spark):
    """History near-dedup tail (candidates/verify stages sit behind lazy
    localCheckpoints): the survivor anti-join must stay an equi-join —
    no cartesian/nested-loop anywhere, no row-at-a-time Python."""
    plan = _plan(entry_mod.queries()["incremental_near_dup"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan


def test_band_index_bucketed_join_shuffles_only_the_batch(spark):
    """The 100-TB history-dedup join shape: with the band index persisted
    via write_band_index_bucketed, the candidate join is a SortMergeJoin
    whose ONLY Exchange is the (tiny) batch side hashed into the bucket
    count — the index FileScan is bucket-aligned (Bucketed: true), never
    shuffled, never re-sorted."""
    from jsonschema_spark.operators.dedup import (
        lsh_band_index,
        write_band_index_bucketed,
    )
    from jsonschema_spark.sources.corpus import token_neardup_corpus

    df = token_neardup_corpus(spark, 500, seed=5)
    snap = df.filter(F.pmod("doc_id", F.lit(13)) != 0)
    batch = df.filter(F.pmod("doc_id", F.lit(13)) == 0)
    idx = lsh_band_index(snap, "doc_id", "tokens", elements=F.col("tokens"))
    table = "t_plan_band_index"
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold", None)
    try:
        write_band_index_bucketed(idx, table, num_buckets=8)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        bidx = spark.table(table).alias("sb")
        bb = lsh_band_index(
            batch, "doc_id", "tokens", elements=F.col("tokens")
        ).alias("nb")
        j = bb.join(
            bidx,
            (F.col("nb.band") == F.col("sb.band"))
            & (F.col("nb.h") == F.col("sb.h")),
        )
        plan = _plan(j)
        assert "SortMergeJoin" in plan
        assert plan.count("Exchange") == 1  # batch side only
        assert "Bucketed: true" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        if old_aqe is not None:
            spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", old_aqe)
        else:
            # restore "unset" — leaving -1 would flip join strategies in
            # every later test on the session-scoped fixture
            spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_dup_spans_linear_no_pair_join(spark):
    """Exact-substring span extraction is LINEAR in the corpus: positions
    explode once and join back to the dup-gram set exactly once — no pair
    self-join anywhere (boilerplate grams mark positions, they never pair),
    no row-at-a-time Python, no collect_set; interval merging is a window
    partitioned by doc."""
    plan = _plan(entry_mod.queries()["dup_spans"](spark, SF_DIR))
    joins = (
        plan.count("SortMergeJoin")
        + plan.count("BroadcastHashJoin")
        + plan.count("ShuffledHashJoin")
        + plan.count("CartesianProduct")
        + plan.count("BroadcastNestedLoopJoin")
    )
    assert joins == 1, plan
    assert "BatchEvalPython" not in plan
    assert "collect_set" not in plan and "collect_list" not in plan
    assert "Window" in plan


def test_global_shuffle_no_global_sort(spark):
    """The training-order shuffle never funnels the corpus through one
    partition: no SinglePartition exchange, no range-partitioned global
    sort — rank is a window per hash bucket plus a broadcast offset
    join."""
    plan = _plan(entry_mod.queries()["global_shuffle"](spark, SF_DIR))
    assert "SinglePartition" not in plan, plan
    assert "rangepartitioning" not in plan.lower(), plan
    assert "BroadcastHashJoin" in plan
    assert "Window" in plan
    assert "BatchEvalPython" not in plan


def test_periodic_sequences_zero_shuffle(spark):
    """The decoding-loop probe is one scan-stage projection + filter:
    no exchange, no Python anywhere."""
    plan = _plan(entry_mod.queries()["periodic_sequences"](spark, SF_DIR))
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_decontam_spans_broadcast_semi_join(spark):
    """Surgical decontamination: the benchmark gram set broadcasts into a
    LeftSemi join against the corpus positions — no pair join, no
    SortMergeJoin, no row Python."""
    plan = _plan(entry_mod.queries()["decontam_spans"](spark, SF_DIR))
    assert "LeftSemi" in plan, plan
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan


def test_shard_manifest_single_agg(spark):
    """Manifest = one aggregation keyed by file name: exactly one
    exchange (the final agg), no joins, no Python."""
    plan = _plan(entry_mod.queries()["shard_manifest"](spark, SF_DIR))
    assert plan.count("Exchange") <= 2, plan  # partial+final agg exchange
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan


def test_plan_audit_api(spark):
    """The public audit API sees what the pinned tests see: a clean
    scan-stage query reports no hazards; a crossJoin and a row-Python UDF
    are caught by name."""
    import pytest
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    from jsonschema_spark.plans.audit import assert_plan, plan_report

    clean = entry_mod.queries()["hash_sample"](spark, SF_DIR)
    rep = assert_plan(clean, no_single_partition=True, max_exchanges=0)
    assert not rep["cartesian"] and not rep["row_python"]

    df = spark.range(10)
    cart = df.crossJoin(spark.range(3))
    with pytest.raises(AssertionError, match="cartesian"):
        assert_plan(cart)
    assert plan_report(cart)["cartesian"]

    # the sanctioned scalar-normalization shape is NOT a cartesian: a
    # crossJoin whose build side is a grouping-keyless aggregate is
    # provably 1 row and reported separately — even through a cache
    scalar = spark.range(100).selectExpr("sum(id) AS total")
    rep2 = plan_report(df.crossJoin(scalar))
    assert not rep2["cartesian"] and rep2["scalar_nested_loop"] == 1
    cached = scalar.persist()
    try:
        cached.count()
        rep3 = plan_report(df.crossJoin(cached))
        assert not rep3["cartesian"] and rep3["scalar_nested_loop"] == 1
    finally:
        cached.unpersist()

    slow = df.select(F.udf(lambda x: x + 1, LongType())("id"))
    with pytest.raises(AssertionError, match="row-at-a-time"):
        assert_plan(slow)

    # the engine's own global_shuffle passes the strictest gate
    gs = entry_mod.queries()["global_shuffle"](spark, SF_DIR)
    assert_plan(gs, no_single_partition=True)


def test_effective_tokens_linear_no_pair_join(spark):
    """Effective token mass inherits dup-spans' linear shape: no
    cartesian, no row Python, and only equi-joins (span join-back +
    strata pickup) — never a pair self-join."""
    plan = _plan(entry_mod.queries()["effective_tokens"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan


def test_vocab_churn_bounded_join(spark):
    """Vocab churn joins two vocab-bounded distinct sets: exactly one
    join, no Python."""
    plan = _plan(entry_mod.queries()["vocab_churn"](spark, SF_DIR))
    joins = (
        plan.count("SortMergeJoin")
        + plan.count("BroadcastHashJoin")
        + plan.count("ShuffledHashJoin")
    )
    assert joins == 1, plan
    assert "BatchEvalPython" not in plan


def test_snapshot_churn_single_join_single_agg(spark):
    plan = _plan(entry_mod.queries()["snapshot_churn"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert "collect_set" not in plan and "collect_list" not in plan


def test_survivor_antijoin_degrades_to_shuffle_when_losers_large(spark):
    """The survivor family's anti-join is size-guarded, not
    force-broadcast: on a high-dup-rate corpus (50%+ losers — routine on
    a raw web crawl) the loser set exceeds the broadcast ceiling and the
    plan must degrade to a shuffle anti-join (SortMergeJoin LeftAnti
    under AQE) instead of forcing a driver-OOM broadcast — and the
    survivor set must be identical on both paths."""
    from jsonschema_spark.operators.components import near_dedup_survivors

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(1, 201)], "doc_id: long, text: string"
    )
    # 100 disjoint pairs -> 100 losers (50% of the corpus)
    pairs = spark.createDataFrame(
        [(2 * i - 1, 2 * i) for i in range(1, 101)], "id_a: long, id_b: long"
    )
    guarded = near_dedup_survivors(docs, "doc_id", pairs, broadcast_max_rows=10)
    plan = _plan(guarded)
    assert "LeftAnti" in plan, plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
    assert "BroadcastHashJoin" not in plan, plan
    kept_guarded = sorted(r["doc_id"] for r in guarded.collect())
    kept_broadcast = sorted(
        r["doc_id"]
        for r in near_dedup_survivors(docs, "doc_id", pairs).collect()
    )
    assert kept_guarded == kept_broadcast == sorted(range(1, 201, 2))


def test_guarded_broadcast_decision_boundary(spark):
    """guarded_broadcast hints exactly at the ceiling: n <= max_rows
    broadcasts, n > max_rows returns the table unhinted (AQE decides)."""
    from jsonschema_spark.operators.joins import guarded_broadcast

    small = spark.range(10).withColumnRenamed("id", "k")
    stats: dict = {}
    guarded_broadcast(small, max_rows=10, stats=stats)
    assert stats == {"rows": 10, "broadcast": True}
    stats = {}
    guarded_broadcast(small, max_rows=9, stats=stats)
    assert stats == {"rows": 10, "broadcast": False}


def test_sampled_gate_topk_sample_no_row_python(spark):
    """The pre-flight gate's corpus-sized stage must be a
    TakeOrderedAndProject (distributed top-k, no global Sort of the
    corpus) and the whole plan must stay free of row-at-a-time Python —
    the properties that keep it a constant-cost gate at 10^12 rows."""
    plan = _plan(entry_mod.queries()["sampled_gate"](spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_quarantine_rows_zero_exchange_scan_stage(spark):
    """Verdict routing is a filter over ONE annotated scan projection:
    no exchange, no join, no row Python anywhere in the quarantined
    side's plan — the split must cost nothing beyond the scan."""
    plan = _plan(entry_mod.queries()["quarantine_rows"](spark, SF_DIR))
    assert "Exchange" not in plan
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan
