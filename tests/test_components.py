"""Connected-components clustering over near-dup pair sets.

Ground truth for the randomized case is an in-test union-find — the
classic sequential algorithm — so the distributed large-star/small-star
result is checked against an independent implementation, not itself.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from jsonschema_spark.operators.components import (
    connected_components,
    near_dedup_survivors,
)


def _assign(spark, pairs):
    df = spark.createDataFrame(pairs, "id_a: long, id_b: long")
    rows = connected_components(df).collect()
    return {r["id"]: r["component"] for r in rows}


def _union_find(pairs):
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical representative = min id per component
    comp: dict[int, int] = {}
    roots: dict[int, int] = {}
    for x in parent:
        r = find(x)
        roots[r] = min(roots.get(r, r), x)
    for x in parent:
        comp[x] = roots[find(x)]
    return comp


def test_chain_and_island(spark):
    got = _assign(spark, [(1, 2), (2, 3), (4, 5)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4}


def test_long_chain_converges_logarithmically(spark):
    # a 40-node path is the worst case for naive label propagation
    # (40 rounds); star-contraction must finish in far fewer
    pairs = [(i, i + 1) for i in range(1, 40)]
    got = _assign(spark, pairs)
    assert got == {i: 1 for i in range(1, 41)}


def test_duplicate_and_reversed_pairs_are_normalized(spark):
    got = _assign(spark, [(2, 1), (1, 2), (2, 3), (3, 2)])
    assert got == {1: 1, 2: 1, 3: 1}


def test_random_graph_matches_union_find(spark):
    rng = random.Random(11)
    nodes = list(range(1, 301))
    pairs = [
        (rng.choice(nodes), rng.choice(nodes))
        for _ in range(220)
    ]
    pairs = [(a, b) for a, b in pairs if a != b]
    assert _assign(spark, pairs) == _union_find(pairs)


def test_empty_pairs(spark):
    df = spark.createDataFrame([], "id_a: long, id_b: long")
    assert connected_components(df).count() == 0


def test_near_dedup_survivors(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(1, 7)], "doc_id: long, text: string"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5)], "id_a: long, id_b: long"
    )
    kept = sorted(
        r["doc_id"]
        for r in near_dedup_survivors(docs, "doc_id", pairs).collect()
    )
    # one survivor (the min id) per cluster, singletons untouched
    assert kept == [1, 4, 6]


def test_survivors_keep_all_columns(spark):
    docs = spark.createDataFrame(
        [(1, "a", 5), (2, "b", 6)], "doc_id: long, text: string, extra: long"
    )
    pairs = spark.createDataFrame([(1, 2)], "id_a: long, id_b: long")
    out = near_dedup_survivors(docs, "doc_id", pairs)
    assert out.columns == ["doc_id", "text", "extra"]
    assert [r["doc_id"] for r in out.collect()] == [1]


def test_leakage_safe_split_invariants(spark):
    """No near-dup pair straddles the split; every doc is assigned exactly
    once; unpaired docs are their own representative; the assignment is
    deterministic (re-run equality)."""
    from jsonschema_spark.operators.components import leakage_safe_split

    random.seed(13)
    nodes = list(range(200))
    pairs = [
        (a, b)
        for a, b in (sorted(random.sample(nodes, 2)) for _ in range(60))
    ]
    docs = spark.range(300).select(F.col("id").alias("doc_id"))
    pdf = spark.createDataFrame(pairs, "id_a: long, id_b: long")
    out = leakage_safe_split(docs, "doc_id", pdf).collect()
    assert len(out) == 300
    assign = {r["id"]: (r["representative"], r["split"]) for r in out}
    assert len(assign) == 300
    comp = _union_find(pairs)
    for a, b in pairs:
        assert assign[a][1] == assign[b][1], (a, b)
        assert assign[a][0] == assign[b][0] == comp[a]
    for i in range(200, 300):  # never mentioned in a pair
        assert assign[i][0] == i
    splits = {s for _, s in assign.values()}
    assert splits == {"train", "holdout"}
    again = leakage_safe_split(docs, "doc_id", pdf).collect()
    assert {r["id"]: (r["representative"], r["split"]) for r in again} == assign


def test_quality_survivor_map_and_survivors(spark):
    """Keep-best-per-cluster: the survivor map picks the max-score member
    (ties -> min id) of every component, and quality_survivors keeps
    exactly the winners plus all unpaired docs — verified against a
    union-find + argmax Python oracle on a random pair set."""
    import random

    from jsonschema_spark.operators.components import (
        quality_survivor_map,
        quality_survivors,
    )

    random.seed(29)
    nodes = list(range(150))
    pairs = sorted(
        {
            tuple(sorted(random.sample(nodes, 2)))
            for _ in range(50)
        }
    )
    # scores with deliberate ties: score = (doc_id * 7) % 40
    docs = spark.range(200).select(
        F.col("id").alias("doc_id"), ((F.col("id") * 7) % 40).alias("score")
    )
    pdf = spark.createDataFrame(pairs, "id_a: long, id_b: long")

    comp = _union_find(pairs)
    clusters = {}
    for n in {x for p in pairs for x in p}:
        clusters.setdefault(comp[n], []).append(n)
    expect = {
        c: (
            min(members, key=lambda i: (-((i * 7) % 40), i)),
            len(members),
        )
        for c, members in clusters.items()
    }

    got = {
        r.component: (r.keep_id, r.n_docs)
        for r in quality_survivor_map(docs, "doc_id", pdf, "score").collect()
    }
    assert got == expect

    kept = {
        r.doc_id
        for r in quality_survivors(docs, "doc_id", pdf, "score").collect()
    }
    losers = {
        m for ms in clusters.values() for m in ms
    } - {k for k, _ in expect.values()}
    assert kept == set(range(200)) - losers


def test_component_size_histogram(spark):
    """Histogram over CC sizes: chain of 4 (one 4-cluster), a pair, and a
    triangle (3-cluster) -> sizes {4:1, 3:1, 2:1}; singletons absent by
    construction."""
    from jsonschema_spark.operators.components import component_size_histogram

    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (20, 22)],
        "id_a long, id_b long",
    )
    got = {
        r.cluster_size: r.n_clusters
        for r in component_size_histogram(pairs).collect()
    }
    assert got == {4: 1, 3: 1, 2: 1}


def test_component_purity_detects_chaining(spark):
    from jsonschema_spark.operators.components import component_purity

    pairs = spark.createDataFrame(
        [
            # triangle 1-2-3: clique, density 1.0
            (1, 2), (2, 3), (1, 3),
            # chain 10-11-12-13: 3 edges of 6 possible -> 0.5
            (10, 11), (11, 12), (12, 13),
            # isolated pair
            (20, 21),
        ],
        "id_a long, id_b long",
    )
    out = {
        r["component"]: r for r in component_purity(pairs).collect()
    }
    assert set(out) == {1, 10, 20}
    assert (out[1]["n_members"], out[1]["n_edges"], out[1]["density"]) == (
        3, 3, 1.0,
    )
    assert (out[10]["n_members"], out[10]["n_edges"], out[10]["density"]) == (
        4, 3, 0.5,
    )
    assert (out[20]["n_members"], out[20]["density"]) == (2, 1.0)
