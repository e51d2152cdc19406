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


def test_r5_gate_window_order_pinned():
    """The driver's correctness gate takes the FIRST 50 queries() entries.
    Round 5 rotated the 32 never-previously-gated queries into that
    window (VERDICT r4 'Next round' #3), followed by the two r4
    driver-reds fixed this round, 15 spot re-gates, and the round-5
    sampled_gate addition; this pin fails if a later edit inserts or
    reorders entries ahead of them, which would silently un-gate queries
    the rotation plan promised to cover."""
    import __spark_entry__ as entry_mod

    want_first_50 = [
        # 32 never gated in r1-r4 (r4-addition queue + Deequ family)
        "emd_drift", "component_size_hist", "containment_dups",
        "token_burstiness", "doremi_weights", "spec_rollout",
        "violation_cooccur", "check_activation", "bigram_kn_ppl",
        "repeat_value", "epoch_order_audit", "asof_thresholds",
        "maintenance_overlap", "event_sessions", "watermark_audit",
        "event_rollup", "lsh_recall", "violation_examples",
        "component_purity", "trigram_kn_ppl",
        "column_profile", "numeric_profile", "fd_audit", "fd_audit_by",
        "table_expectations", "suggest_constraints", "categorical_mi",
        "benford_digits", "metric_anomaly", "join_cardinality",
        "inclusion_dependency", "freshness_audit",
        # the two r4 driver-reds, fixed this round
        "dup_loss_mask", "positional_entropy",
        # spot re-gates + the round-5 addition in slot 50
        "corpus_validate", "exact_stats", "dup_keys", "orphans",
        "minhash_near_dup", "simhash_near_dup", "dup_components",
        "incremental_near_dup", "semdedup", "global_shuffle",
        "token_sketch_drift", "ks_drift", "unigram_ppl",
        "sequence_packing", "quarantine_rows", "sampled_gate",
    ]
    assert list(entry_mod.queries())[:50] == want_first_50


def test_every_query_has_oracle_twin_or_is_known_rows_only():
    """queries() and oracle_sql() stay in lockstep: every query has a
    DuckDB twin (the repo currently carries zero rows-only queries —
    adding one is a deliberate decision, not a forgotten entry)."""
    import __spark_entry__ as entry_mod

    q = set(entry_mod.queries())
    o = set(entry_mod.oracle_sql())
    assert o <= q, f"oracle entries without queries: {sorted(o - q)}"
    assert q == o, f"queries missing oracle twins: {sorted(q - o)}"
