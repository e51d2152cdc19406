"""Differential fuzz for the constraint-discovery operators: seeded
random small tables vs pure-Python reference implementations (Counter /
dict math), the same strategy tests/test_differential_fuzz.py applies to
the per-row keyword lowering.  Catches aggregation-identity mistakes
(the H = ln N − Σc·ln c/N rewrite, g3 accounting, null handling,
struct-max tie-breaks) that hand-picked cases can miss."""

from __future__ import annotations

import math
import random
from collections import Counter

import pytest

from jsonschema_spark.operators.quality import (
    categorical_mi,
    column_profile,
    fd_audit,
    fd_audit_by,
    join_cardinality_profile,
)

N_CASES = 12


def _rand_table(rng, n_rows, cards):
    """Random rows over small alphabets; ~10% nulls per column."""
    return [
        tuple(
            None if rng.random() < 0.1 else f"v{rng.randrange(card)}"
            for card in cards
        )
        for _ in range(n_rows)
    ]


def _entropy(counter):
    n = sum(counter.values())
    return sum(-(c / n) * math.log(c / n) for c in counter.values())


@pytest.mark.parametrize("seed", range(N_CASES))
def test_fd_audit_matches_python(spark, seed):
    rng = random.Random(1000 + seed)
    rows = _rand_table(rng, rng.randrange(5, 60), (4, 3))
    df = spark.createDataFrame(rows, "l string, r string")
    got = fd_audit(df, "l", "r").collect()[0]
    groups: dict = {}
    for l, r in rows:
        if l is not None and r is not None:
            groups.setdefault(l, Counter())[r] += 1
    n_rows = sum(sum(c.values()) for c in groups.values())
    g3 = sum(sum(c.values()) - max(c.values()) for c in groups.values())
    assert got["n_groups"] == len(groups)
    assert got["n_violating_groups"] == sum(1 for c in groups.values() if len(c) > 1)
    assert got["n_rows"] == n_rows
    assert got["n_violating_rows"] == sum(
        sum(c.values()) for c in groups.values() if len(c) > 1
    )
    assert got["g3_rows"] == g3
    if n_rows:
        assert got["fd_strength"] == pytest.approx(1 - g3 / n_rows, abs=1e-6)


@pytest.mark.parametrize("seed", range(N_CASES))
def test_fd_audit_by_matches_python(spark, seed):
    rng = random.Random(2000 + seed)
    rows = _rand_table(rng, rng.randrange(8, 60), (2, 4, 3))
    df = spark.createDataFrame(rows, "cond string, l string, r string")
    got = {r["cond"]: r for r in fd_audit_by(df, "cond", "l", "r").collect()}
    per_cond: dict = {}
    for cond, l, r in rows:
        if cond is not None and l is not None and r is not None:
            per_cond.setdefault(cond, {}).setdefault(l, Counter())[r] += 1
    assert set(got) == set(per_cond)
    for cond, groups in per_cond.items():
        n_rows = sum(sum(c.values()) for c in groups.values())
        g3 = sum(sum(c.values()) - max(c.values()) for c in groups.values())
        assert got[cond]["n_groups"] == len(groups)
        assert got[cond]["g3_rows"] == g3
        assert got[cond]["fd_strength"] == pytest.approx(
            1 - g3 / n_rows, abs=1e-6
        )


@pytest.mark.parametrize("seed", range(N_CASES))
def test_categorical_mi_matches_python(spark, seed):
    rng = random.Random(3000 + seed)
    rows = _rand_table(rng, rng.randrange(6, 80), (3, 3))
    df = spark.createDataFrame(rows, "a string, b string")
    kept = [(a, b) for a, b in rows if a is not None and b is not None]
    if not kept:
        return
    got = categorical_mi(df, "a", "b").collect()[0]
    ca = Counter(a for a, _ in kept)
    cb = Counter(b for _, b in kept)
    cab = Counter(kept)
    assert got["n_rows"] == len(kept) and got["n_cells"] == len(cab)
    assert got["h_a"] == pytest.approx(_entropy(ca), abs=1e-6)
    assert got["h_b"] == pytest.approx(_entropy(cb), abs=1e-6)
    assert got["h_ab"] == pytest.approx(_entropy(cab), abs=1e-6)
    mi = _entropy(ca) + _entropy(cb) - _entropy(cab)
    assert got["mi"] == pytest.approx(mi, abs=1e-6)
    # information inequality: 0 <= MI <= min(H(A), H(B)) (+rounding slack)
    assert -1e-6 <= got["mi"] <= min(got["h_a"], got["h_b"]) + 1e-6


@pytest.mark.parametrize("seed", range(N_CASES))
def test_column_profile_matches_python(spark, seed):
    rng = random.Random(4000 + seed)
    rows = _rand_table(rng, rng.randrange(5, 60), (5, 2))
    df = spark.createDataFrame(rows, "x string, y string")
    got = {r["column"]: r for r in column_profile(df, ["x", "y"]).collect()}
    for idx, col in enumerate(("x", "y")):
        vals = [r[idx] for r in rows]
        nn = [v for v in vals if v is not None]
        c = Counter(nn)
        r = got[col]
        assert r["n_rows"] == len(vals)
        assert r["n_null"] == len(vals) - len(nn)
        assert r["n_distinct"] == len(c)
        assert r["n_unique"] == sum(1 for v in c.values() if v == 1)
        if nn:
            assert r["entropy"] == pytest.approx(_entropy(c), abs=1e-6)
            best = max(c.items(), key=lambda kv: (kv[1], kv[0]))
            assert (r["mode_value"], r["mode_count"]) == best
        else:
            assert r["entropy"] is None and r["mode_value"] is None


@pytest.mark.parametrize("seed", range(N_CASES))
def test_join_cardinality_matches_python(spark, seed):
    rng = random.Random(5000 + seed)
    left = _rand_table(rng, rng.randrange(3, 40), (6,))
    right = _rand_table(rng, rng.randrange(3, 40), (6,))
    ldf = spark.createDataFrame(left, "k string")
    rdf = spark.createDataFrame(right, "k string")
    got = join_cardinality_profile(ldf, "k", rdf, "k").collect()[0]
    cl = Counter(k for (k,) in left if k is not None)
    cr = Counter(k for (k,) in right if k is not None)
    matched = set(cl) & set(cr)
    assert got["n_left_keys"] == len(cl) and got["n_right_keys"] == len(cr)
    assert got["n_matched_keys"] == len(matched)
    assert got["join_rows"] == sum(cl[k] * cr[k] for k in matched)
    assert got["max_fanout"] == max(
        (cl[k] * cr[k] for k in matched), default=0
    )
    # cross-check against Spark's actual inner join on the same data
    actual = ldf.dropna().join(rdf.dropna(), "k").count()
    assert got["join_rows"] == actual
