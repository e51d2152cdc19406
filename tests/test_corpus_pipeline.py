"""End-to-end tests of the tokenized-corpus validation pipeline (the north
rule's flagship): synthetic corpus → TableSpec → one-pass verdicts →
violations / uniqueness / referential / stats / drift → lineage + resume."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jsonschema_spark.sources import corpus as corpus_mod
from jsonschema_spark.sources.corpus import (
    DUP_MOD, LEN_MOD, NTOK_MOD, SRC_MOD, MAX_TOKENS, SOURCES, VOCAB_SIZE,
    corpus, dim_source,
)
from jsonschema_spark.plans.plan import TableSpec, compile_table_spec
from jsonschema_spark.plans.job import ValidationJob

N = 20_000

CORPUS_SPEC = {
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
    "drift": {"n_tok": {"bins": 64, "lo": 0, "hi": 2560}, "token_freq": True},
}


@pytest.fixture(scope="module")
def corpus_df(spark, tmp_path_factory):
    """Materialized to parquet once — downstream actions scan bytes instead
    of re-running the hash-based generator expression chain per action."""
    path = str(tmp_path_factory.mktemp("corpus") / "dirty")
    corpus(spark, N, seed=42).write.parquet(path)
    return spark.read.parquet(path)


@pytest.fixture(scope="module")
def job(spark, corpus_df, tmp_path_factory):
    plan = compile_table_spec(TableSpec.from_dict(CORPUS_SPEC), corpus_df.schema)
    clean_path = str(tmp_path_factory.mktemp("corpus") / "clean")
    corpus(spark, N, seed=7, inject_violations=False).write.parquet(clean_path)
    clean = spark.read.parquet(clean_path)
    from jsonschema_spark.operators import stats as stats_ops

    baselines = {
        "n_tok": stats_ops.histogram(clean, "n_tok", 64, 0, 2560),
        "token_freq": stats_ops.token_frequencies(clean),
    }
    return ValidationJob(plan, dims={"dim_source": dim_source(spark)}, baselines=baselines)


def _expected(mods_hit: str) -> set:
    """Row ids whose *first-matching* injection rule is `mods_hit` (mirrors
    the when-chain precedence in the generator)."""
    out = set()
    for i in range(N):
        if i % NTOK_MOD == NTOK_MOD - 1:
            kind = "ntok"
        elif i % LEN_MOD == LEN_MOD - 1:
            kind = "len"
        else:
            kind = None
        if mods_hit == "ntok" and kind == "ntok":
            out.add(i)
        elif mods_hit == "len" and kind == "len":
            out.add(i)
        elif mods_hit == "src" and i % SRC_MOD == SRC_MOD - 1:
            out.add(i)
        elif mods_hit == "dup" and i % DUP_MOD == DUP_MOD - 1:
            out.add(i)
    return out


def test_generator_is_deterministic_across_parallelism(spark):
    a = corpus(spark, 2000, seed=42, num_partitions=2).orderBy("doc_id").collect()
    b = corpus(spark, 2000, seed=42, num_partitions=16).orderBy("doc_id").collect()
    assert a == b


def test_generator_shape_and_rates(corpus_df):
    row = corpus_df.agg(
        F.count(F.lit(1)).alias("n"),
        F.min(F.array_min("tokens")).alias("tmin"),
        F.max(F.array_max("tokens")).alias("tmax"),
    ).collect()[0]
    assert row.n == N
    assert 0 <= row.tmin and row.tmax < VOCAB_SIZE
    assert [f.name for f in corpus_df.schema.fields] == ["doc_id", "tokens", "n_tok", "source"]


def test_row_verdicts_match_injection(job, corpus_df):
    annotated = job.annotate(corpus_df)
    agg = annotated.agg(
        F.sum((~F.col("chk_col_n_tok")).cast("long")).alias("bad_ntok"),
        F.sum((~F.col("chk_row_len_consistent")).cast("long")).alias("bad_len"),
        F.sum((~F.col("chk_ref_source")).cast("long")).alias("bad_src"),
        F.sum((~F.col("_valid")).cast("long")).alias("invalid"),
        F.sum((~F.col("chk_col_doc_id")).cast("long")).alias("bad_docid"),
        F.sum((~F.col("chk_col_tokens")).cast("long")).alias("bad_tokens"),
    ).collect()[0]
    exp_ntok = _expected("ntok")
    exp_len = _expected("len")
    exp_src = _expected("src")
    # n_tok out-of-bounds rows: injected 0 or 4096 — both violate [1, 2048]
    assert agg.bad_ntok == len(exp_ntok)
    # len mismatch: n_tok+1 (plus every bad-ntok row also mismatches size)
    assert agg.bad_len == len(exp_len) + len(exp_ntok)
    assert agg.bad_src == len(exp_src)
    assert agg.bad_docid == 0 and agg.bad_tokens == 0
    assert agg.invalid == len(exp_ntok | exp_len | exp_src)


def test_quarantine_split(job, corpus_df):
    """accepted/quarantined partition the corpus exactly; accepted drops
    every check/_valid column (clean payload schema for downstream);
    quarantined carries the sorted failed-check label matching the
    injection closed form."""
    annotated = job.annotate(corpus_df)
    accepted, quarantined = job.quarantine(annotated)
    n_acc, n_quar = accepted.count(), quarantined.count()
    invalid = _expected("ntok") | _expected("len") | _expected("src")
    assert n_quar == len(invalid)
    assert n_acc + n_quar == N
    assert [f.name for f in accepted.schema.fields] == [
        "doc_id", "tokens", "n_tok", "source",
    ]
    # an injected ntok row fails both the bound and the length check
    labels = {
        r.doc_id: r.failed_checks
        for r in quarantined.select("doc_id", "failed_checks").collect()
        if r.doc_id is not None
    }
    ntok_id = f"doc-{min(_expected('ntok')):012d}"
    assert labels[ntok_id] == "col_n_tok,row_len_consistent"
    src_id = f"doc-{min(_expected('src')):012d}"
    assert labels[src_id] == "ref_source"


def test_violation_rows(job, corpus_df):
    v = job.violations(job.annotate(corpus_df))
    counts = {r.check: r.cnt for r in v.groupBy("check").agg(F.count("*").alias("cnt")).collect()}
    assert counts["ref_source"] == len(_expected("src"))
    assert counts["col_n_tok"] == len(_expected("ntok"))


def test_uniqueness_salted(job, corpus_df):
    dups = job.uniqueness(corpus_df)["doc_id"]
    rows = dups.collect()
    assert len(rows) == len(_expected("dup"))
    assert all(r.dup_count == 2 for r in rows)


def test_referential_orphans(job, corpus_df):
    orphans = job.referential(corpus_df)["source"].collect()
    assert len(orphans) == 1  # one unregistered source value
    assert orphans[0].n_rows == len(_expected("src"))


def test_drift_detects_shift(spark, job, corpus_df):
    reports = job.drift(corpus_df)
    # same generator family, different seed: distribution identical in shape
    assert reports["n_tok"]["psi"] < 0.05
    assert not reports["n_tok"]["drifted"]
    # force drift: halve the length distribution
    shifted = corpus_df.withColumn("n_tok", (F.col("n_tok") / 4 + 1).cast("int"))
    rep2 = job.drift(shifted)
    assert rep2["n_tok"]["psi"] > 0.25 and rep2["n_tok"]["drifted"]


def test_run_and_resume(tmp_path, spark, job, corpus_df):
    results = str(tmp_path / "results")
    summary = job.run(corpus_df, results)
    assert summary["n_rows"] == N
    assert summary["n_invalid"] == len(
        _expected("ntok") | _expected("len") | _expected("src")
    )
    assert summary["duplicates"]["doc_id"] == len(_expected("dup"))
    assert summary["orphans"]["source"] == len(_expected("src"))
    # resume: all units already completed -> zero new rows processed
    summary2 = job.run(corpus_df, results, resume=True)
    assert summary2["resumed_units_skipped"] > 0
    assert summary2["n_rows"] == N  # lineage total unchanged (append of empty)


def test_profile(spark, corpus_df):
    from jsonschema_spark.operators.stats import column_profile

    prof = {r.column: r for r in column_profile(corpus_df).collect()}
    assert prof["doc_id"].null_rate == 0.0
    assert prof["tokens"].min_len >= 1
    assert prof["n_tok"].n_rows == N


def test_violation_sampling(job, corpus_df):
    """Deterministic hash sampling of violation rows: reproducible subset,
    roughly proportional to the fraction."""
    ann = job.annotate(corpus_df)
    full = job.violations(ann).count()
    a = job.violations(ann, sample_fraction=0.25)
    b = job.violations(ann, sample_fraction=0.25)
    na, nb = a.count(), b.count()
    assert na == nb  # deterministic (hash, not rand)
    assert 0 < na < full
    assert abs(na / full - 0.25) < 0.15


def test_token_frequency_sketch(spark, corpus_df):
    from jsonschema_spark.operators.stats import (
        cms_estimate, token_frequencies, token_frequency_sketch,
    )

    sketch = token_frequency_sketch(corpus_df.limit(2000), eps=0.0001)
    exact = {
        r.token: r.cnt
        for r in token_frequencies(corpus_df.limit(2000)).orderBy(
            F.col("cnt").desc()
        ).limit(5).collect()
    }
    for token, cnt in exact.items():
        est = cms_estimate(spark, sketch, token)
        assert est >= cnt  # CMS overestimates only
        assert est <= cnt * 1.05 + 1000


def test_results_sink_parquet_mode(spark, tmp_path):
    from jsonschema_spark.sources.sink import ResultsSink, iceberg_available

    assert iceberg_available(spark) is False  # sandbox: no iceberg jar
    sink = ResultsSink(spark)
    assert sink.mode == "parquet"
    df = spark.range(10)
    target = str(tmp_path / "t")
    sink.write(df, target)
    assert sink.exists(target) and sink.read(target).count() == 10
    sink.write(df, target, append=True)
    assert sink.read(target).count() == 20


def test_partial_resume_processes_only_remainder(tmp_path, spark, job, corpus_df):
    """Resume with PARTIAL prior lineage: only not-yet-completed units are
    re-processed; totals converge to the full run."""
    results = str(tmp_path / "partial")
    full = job.run(corpus_df, results)
    lineage = spark.read.parquet(results + "/lineage")
    units = [r.unit for r in lineage.select("unit").distinct().collect()]
    assert len(units) > 1
    # rewrite lineage keeping only half the units -> simulates a crash
    keep = sorted(units)[: len(units) // 2]
    partial = lineage.filter(F.col("unit").isin(keep))
    kept_rows = partial.agg(F.sum("n_rows")).collect()[0][0]
    partial.write.mode("overwrite").parquet(str(tmp_path / "lineage_tmp"))
    spark.read.parquet(str(tmp_path / "lineage_tmp")).write.mode(
        "overwrite"
    ).parquet(results + "/lineage")

    resumed = job.run(corpus_df, results, resume=True)
    assert resumed["resumed_units_skipped"] == len(keep)
    # lineage total: kept rows + re-processed remainder = full corpus
    assert resumed["n_rows"] == full["n_rows"] == N
    final_units = {
        r.unit for r in spark.read.parquet(results + "/lineage").select("unit").distinct().collect()
    }
    assert final_units == set(units)


def test_json_columns_kernel_in_tablespec(spark):
    """TableSpec.json_columns: a free-form JSON text column validated by
    the Arrow kernel inside the same one-pass verdict projection as the
    native checks."""
    rows = [
        (1, '{"k": 5}'),
        (2, '{"k": -1}'),      # minimum violated
        (3, '{"nope": 1}'),    # required violated
        (4, 'not json'),       # malformed
        (5, None),             # null text
    ]
    df = spark.createDataFrame(rows, "id long, payload string")
    spec = TableSpec.from_dict(
        {
            "columns": {"id": {"type": "integer", "minimum": 0}},
            "json_columns": {
                "payload": {
                    "type": "object",
                    "required": ["k"],
                    "properties": {"k": {"type": "integer", "minimum": 0}},
                }
            },
        }
    )
    plan = compile_table_spec(spec, df.schema)
    ann = ValidationJob(plan, id_column="id").annotate(df)
    got = {r.id: r["chk_json_payload"] for r in ann.collect()}
    assert got == {1: True, 2: False, 3: False, 4: False, 5: False}


def test_domain_flag_large_dim_fallback(spark):
    """Above isin_max distinct keys, membership switches from a driver-side
    isin set to a (broadcast-eligible) left join — a huge dimension must
    never be collected to the driver (VERDICT r1 #8)."""
    from jsonschema_spark.operators.referential import domain_flag, domain_predicate

    fact = spark.createDataFrame(
        [(i,) for i in range(1000)] + [(None,)], "k: long"
    )
    big_dim = spark.range(50_000).select((F.col("id") * 2).alias("source_id"))

    out = domain_flag(fact, "k", big_dim, "source_id", "ok", isin_max=100)
    agg = out.agg(
        F.sum(F.col("ok").cast("long")).alias("n_ok"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    assert agg.n == 1001
    assert agg.n_ok == 501  # 500 even keys + the NULL row (not an orphan)

    # the isin fast path refuses to collect an oversized domain
    with pytest.raises(ValueError, match="exceeds 100 distinct keys"):
        domain_predicate(fact, "k", big_dim, "source_id", isin_max=100)

    # small dimension: isin path, identical semantics
    small = spark.range(10).select(F.col("id").alias("source_id"))
    out2 = domain_flag(fact, "k", small, "source_id", "ok")
    assert out2.filter("ok").count() == 11  # keys 0..9 + NULL


def test_resume_anti_joins_completed_units(tmp_path, spark, job, corpus_df):
    """Resume at unit = input-file scale: with a few thousand completed
    units the plan must anti-join the lineage table, never inline an isin
    literal list (millions of path strings at design scale)."""
    from jsonschema_spark.plans.job import drop_completed_units

    results = str(tmp_path / "many_units")
    full = job.run(corpus_df, results)
    lineage = spark.read.parquet(results + "/lineage")
    n_real = lineage.select("unit").distinct().count()

    # append 4000 synthetic completed units (zero-filled counts so totals
    # are unchanged) — simulates resuming a many-file run
    zeros = [F.lit(0).cast("long").alias(c) for c in lineage.columns if c != "unit"]
    spark.range(4000).select(
        F.concat(F.lit("file:///gone/part-"), F.col("id").cast("string")).alias("unit"),
        *zeros,
    ).write.mode("append").parquet(results + "/lineage")

    resumed = job.run(corpus_df, results, resume=True)
    assert resumed["resumed_units_skipped"] == n_real + 4000
    assert resumed["n_rows"] == full["n_rows"] == N

    # plan shape: broadcast left-anti join, no literal unit list
    done = spark.read.parquet(results + "/lineage").select("unit").distinct()
    plan = (
        drop_completed_units(job.annotate(corpus_df), done)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "LeftAnti" in plan and "BroadcastHashJoin" in plan
    assert "file:///gone/part-7" not in plan  # no inlined unit literals
