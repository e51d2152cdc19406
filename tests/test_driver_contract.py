"""Mimics the driver's correctness gate: run every ``queries()`` entry on
Spark and its ``oracle_sql()`` twin on DuckDB over the same parquet tables,
then compare row count, column names, and order-insensitive values."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _normalize(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                v = round(v, 6)
                if v == -0.0:
                    v = 0.0
            if isinstance(v, int) and not isinstance(v, bool):
                v = int(v)
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


@pytest.mark.parametrize("name", sorted(entry_mod.oracle_sql().keys()))
def test_query_matches_oracle(spark, duck, name):
    q = entry_mod.queries()[name]
    spark_df = q(spark, SF_DIR)
    spark_cols = [c.lower() for c in spark_df.columns]
    spark_rows = [tuple(r) for r in spark_df.collect()]

    res = duck.execute(entry_mod.oracle_sql()[name])
    duck_cols = [d[0].lower() for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    got = _normalize(spark_rows, spark_cols)
    want = _normalize(duck_rows, duck_cols)
    assert got == want, f"{name}: value mismatch\nspark={got[:5]}\nduck ={want[:5]}"


def test_queries_without_oracle_run(spark):
    oracles = entry_mod.oracle_sql()
    for name, q in entry_mod.queries().items():
        if name in oracles:
            continue
        df = q(spark, SF_DIR)
        assert df.count() >= 0 and df.schema is not None


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert set(df.columns) == {"check", "n_fail", "n_rows"}


def test_r4_gate_window_order_pinned():
    """The driver's correctness gate takes the FIRST 50 queries() entries.
    Round 4 rotated the 50 never-previously-gated queries into that
    window (VERDICT r3 'Next round' #1); this pin fails if a later edit
    inserts or reorders entries ahead of them, which would silently
    un-gate queries the rotation plan promised to cover."""
    import __spark_entry__ as entry_mod

    want_first_51 = [
        "chunk_sequences", "dup_gram_scale", "repair_sequences",
        "temperature_mix", "positional_entropy", "bigram_ppl",
        "vocab_coverage", "embedding_norm_qa", "structure_scorecard",
        "winnow_dups", "token_ngram_diversity", "bigram_pmi",
        "source_violation_rates", "ntok_iqr_outliers", "monotonic_check",
        "embedding_drift", "sequence_packing", "tfidf_top_terms",
        "source_divergence", "dsir_select", "source_mix",
        "shared_ngram_pairs", "longest_shared_run", "dup_spans",
        "dup_span_stats", "token_dup_spans", "decontam_spans",
        "dup_loss_mask", "effective_tokens", "ingest_dedup_trend",
        "periodic_sequences", "diverse_sample", "ngram_novelty",
        "infer_spec", "weighted_sample", "global_shuffle",
        "windowed_drift", "script_mojibake", "classifier_score",
        "corpus_overlap", "trigram_sbo", "semdedup", "padding_waste",
        "stratified_split", "unimax_alloc", "split_leakage_audit",
        "embedding_quant_qa", "vocab_richness", "vocab_diversity",
        "quality_survivors", "emd_drift",
    ]
    assert list(entry_mod.queries())[:51] == want_first_51


def test_every_query_has_oracle_twin_or_is_known_rows_only():
    """queries() and oracle_sql() stay in lockstep: every query has a
    DuckDB twin (the repo currently carries zero rows-only queries —
    adding one is a deliberate decision, not a forgotten entry)."""
    import __spark_entry__ as entry_mod

    q = set(entry_mod.queries())
    o = set(entry_mod.oracle_sql())
    assert o <= q, f"oracle entries without queries: {sorted(o - q)}"
    assert q == o, f"queries missing oracle twins: {sorted(q - o)}"
