"""Connected components over near-duplicate pair sets — the clustering
stage that turns pairwise dedup output (minhash/simhash/exact pairs) into
keep-one-per-cluster decisions. Table-scope generalization of the
reference's per-document accept/reject: where ``uniqueItems``
(/root/reference/validate.go:320-370) rejects duplicate ELEMENTS inside
one array, this groups duplicate DOCUMENTS across the corpus so a
canonical survivor can be chosen per group.

Algorithm: alternating large-star / small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) — the standard
shuffle-bounded formulation:

- **large-star**: every node connects its LARGER neighbors to the minimum
  of its neighborhood (including itself).
- **small-star**: every node connects its smaller-or-equal neighbors (and
  itself) to the minimum of that set.

Both steps are one window-min pass + one re-emit per round — shuffle
volume O(|E|) per round, O(log n) rounds to convergence (each round at
least halves tree heights). No driver-side graph state: the driver loop only
compares a per-round (count, hash-sum) checksum, so a 10^12-edge pair set
never leaves the executors. Per-round ``localCheckpoint`` truncates the
lineage (an iterative plan otherwise doubles per round and overwhelms the
optimizer) and is released by the ContextCleaner when the result goes out
of scope, unlike ``persist`` which pins cache entries for the session.

Skew note: at convergence every component is a star centred on its
minimum id, so that hub's degree equals the component size. The window
partition on the hub node does concentrate its edges on one reducer per
round — the inherent hot partition of star contraction — but only as a
streamed min + row re-emit (no neighbor-set materialization), so a giant
component costs its size in scanned rows, not driver or executor memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jsonschema_spark.operators.joins import BROADCAST_MAX_ROWS, guarded_broadcast


def _canonical_edges(pairs: DataFrame, id_a: str, id_b: str) -> DataFrame:
    """Undirected pair set -> canonical directed edges (u > v, no self
    loops, distinct)."""
    u = F.greatest(F.col(id_a), F.col(id_b))
    v = F.least(F.col(id_a), F.col(id_b))
    return (
        pairs.select(u.alias("u"), v.alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect strictly-larger neighbors of every node to its neighborhood
    minimum. Input/output: directed (u, v) edge lists, u != v.

    The per-node minimum comes from a window aggregate (one shuffle on u,
    values streamed past each row) instead of groupBy+self-join (two
    shuffles of the symmetric edge list, no exchange reuse across the join
    aliases) — and never materializes a neighbor set, so a 10^9-member
    component's hub costs rows, not one giant in-memory array. Output is
    NOT deduplicated here; the small-star that always follows dedups, so
    each round pays one distinct, not two."""
    from pyspark.sql import Window

    sym = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    m = F.least(F.min("v").over(Window.partitionBy("u")), F.col("u"))
    return (
        sym.withColumn("m", m)
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Connect smaller neighbors (and the node itself) to the minimum of
    the smaller-neighborhood. Same window-aggregate shape as large-star."""
    from pyspark.sql import Window

    directed = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    )
    with_m = directed.withColumn(
        "m", F.min("v").over(Window.partitionBy("u"))
    )
    out = with_m.select(F.col("v").alias("u"), F.col("m").alias("v")).union(
        with_m.select(F.col("u"), F.col("m").alias("v"))
    )
    return out.filter(F.col("u") != F.col("v")).distinct()


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 50,
    stats: dict | None = None,
) -> DataFrame:
    """Resolve an undirected pair set into components.

    Returns ``(id, component)`` for every node that appears in ``pairs``,
    where ``component`` is the minimum id in the node's component (the
    conventional canonical representative). Nodes not mentioned in any
    pair are implicitly their own singleton components — callers join
    against this assignment with a left join and coalesce.

    Pass a dict as ``stats`` to receive ``{"rounds": k}`` — rounds are the
    inherently sequential part of the algorithm (graph diameter bound), so
    per-round wall time is the number that must scale with executors.
    """
    # lazy checkpoints: the per-round checksum action below materializes
    # them, so truncating lineage costs no extra job
    edges = _canonical_edges(pairs, id_a, id_b).localCheckpoint(eager=False)
    prev = None
    for rounds in range(1, max_iter + 1):
        edges = _small_star(_large_star(edges)).localCheckpoint(eager=False)
        # bit_xor: order-insensitive edge-set checksum with no overflow
        # (ANSI mode makes sum(xxhash64) throw on long overflow)
        state = edges.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.bit_xor(F.xxhash64("u", "v")), F.lit(0)).alias("h"),
        ).collect()[0]
        checksum = (state["n"], state["h"])
        if checksum == prev:
            if stats is not None:
                stats["rounds"] = rounds
            break
        prev = checksum
    else:  # pragma: no cover - max_iter is generous for log2(n) rounds
        raise RuntimeError(f"connected_components: no convergence in {max_iter} rounds")
    # at convergence the edge set is a star per component: (member, min)
    members = edges.select(F.col("u").alias("id"), F.col("v").alias("component"))
    roots = (
        edges.select(F.col("v").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
    )
    return members.union(roots).groupBy("id").agg(
        F.min("component").alias("component")
    )


def leakage_safe_split(
    df: DataFrame,
    id_col: str,
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    buckets: int = 10,
    train_buckets: int = 8,
    broadcast_max_rows: int = BROADCAST_MAX_ROWS,
) -> DataFrame:
    """(id, representative, split): train/holdout assignment that cannot
    leak near-duplicates across the boundary. The unit of assignment is the
    near-dup component — every member inherits its representative's (the
    component's min id's) hash bucket, so a near-dup pair lands in one
    split by construction; unpaired docs are their own representative.
    Content-addressed (portable md5 bucket, no RNG): the split is stable
    across reruns, partitionings, and engines, and growing the corpus
    never reassigns an existing component.

    Scale shape: the component table holds only docs that had a near-dup
    pair — but on a raw web crawl that is routinely 30-80% of the corpus,
    so it is SIZE-GUARDED, not force-broadcast: under
    ``broadcast_max_rows`` the left join broadcasts (corpus never
    shuffles, bucket expression stays in the scan-stage projection);
    above it the hint is dropped and AQE plans a shuffle join from the
    real runtime size."""
    from jsonschema_spark.operators.sampling import hash_bucket

    assign = guarded_broadcast(
        connected_components(pairs, id_a, id_b), broadcast_max_rows
    )
    joined = df.select(F.col(id_col).alias("id")).join(assign, "id", "left")
    rep = F.coalesce(F.col("component"), F.col("id"))
    return joined.select(
        "id",
        rep.alias("representative"),
        F.when(hash_bucket(rep, buckets) < train_buckets, F.lit("train"))
        .otherwise(F.lit("holdout"))
        .alias("split"),
    )


def near_dedup_survivors(
    df: DataFrame,
    id_col: str,
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    broadcast_max_rows: int = BROADCAST_MAX_ROWS,
) -> DataFrame:
    """Keep-one-per-cluster dedup: drop every document whose component
    representative (minimum id) is a different document; singletons and
    representatives survive. The loser set is corpus-proportional on a
    real crawl (dup losers are routinely 30-80% of raw web data), so the
    anti-join is SIZE-GUARDED: broadcast under ``broadcast_max_rows``,
    plain shuffle anti-join under AQE above it."""
    assign = connected_components(pairs, id_a, id_b)
    losers = guarded_broadcast(
        assign.filter(F.col("id") != F.col("component")).select("id"),
        broadcast_max_rows,
    )
    return df.join(losers, df[id_col] == losers["id"], "left_anti")


def quality_survivor_map(
    df: DataFrame,
    id_col: str,
    pairs: DataFrame,
    score_col: str,
    id_a: str = "id_a",
    id_b: str = "id_b",
    broadcast_max_rows: int = BROADCAST_MAX_ROWS,
) -> DataFrame:
    """(component, keep_id, n_docs): the highest-``score_col`` member of
    every near-dup cluster with more than one document, ties broken by
    minimum id. Quality-aware canonical selection — ``keep the best copy,
    not the first`` (the FineWeb/CCNet policy: among near-duplicate
    crawls keep the longest / highest-quality capture, since min-id keeps
    whichever the crawler happened to fetch first). ``score_col`` must be
    non-null (ranking order of nulls differs across engines).

    Scale shape: the component assignment covers only docs that had a
    pair — corpus-proportional on a real crawl — so the score pickup join
    is SIZE-GUARDED (broadcast under ``broadcast_max_rows``, AQE shuffle
    join above); ranking windows partition per component, so
    per-partition work is one cluster's members — the same bound star
    contraction already admits for its hub."""
    from pyspark.sql.window import Window

    assign = guarded_broadcast(
        connected_components(pairs, id_a, id_b), broadcast_max_rows
    )
    scored = df.select(F.col(id_col).alias("id"), F.col(score_col).alias("_s"))
    joined = scored.join(assign, "id")
    cw = Window.partitionBy("component")
    w = cw.orderBy(F.desc("_s"), F.asc("id"))
    return (
        joined.select(
            "component",
            "id",
            F.row_number().over(w).alias("_rn"),
            F.count(F.lit(1)).over(cw).alias("n_docs"),
        )
        .filter(F.col("_rn") == 1)
        .select("component", F.col("id").alias("keep_id"), "n_docs")
    )


def quality_survivors(
    df: DataFrame,
    id_col: str,
    pairs: DataFrame,
    score_col: str,
    id_a: str = "id_a",
    id_b: str = "id_b",
    broadcast_max_rows: int = BROADCAST_MAX_ROWS,
) -> DataFrame:
    """Corpus rows that survive quality-aware keep-best-per-cluster
    dedup: unpaired docs plus each cluster's ``quality_survivor_map``
    winner. Same SIZE-GUARDED anti-join shape as ``near_dedup_survivors``
    (losers broadcast only under ``broadcast_max_rows`` — they are
    corpus-proportional on a real crawl), different canonical choice."""
    from pyspark.sql.window import Window

    assign = guarded_broadcast(
        connected_components(pairs, id_a, id_b), broadcast_max_rows
    )
    scored = df.select(F.col(id_col).alias("id"), F.col(score_col).alias("_s"))
    joined = scored.join(assign, "id")
    w = Window.partitionBy("component").orderBy(F.desc("_s"), F.asc("id"))
    losers = guarded_broadcast(
        joined.select("id", F.row_number().over(w).alias("_rn"))
        .filter(F.col("_rn") > 1)
        .select("id"),
        broadcast_max_rows,
    )
    return df.join(losers, df[id_col] == losers["id"], "left_anti")


def component_purity(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    decimals: int = 6,
) -> DataFrame:
    """(component, n_members, n_edges, density): edge density of every
    near-dup cluster — the transitive-chaining audit. LSH dedup merges
    via connected components, so A~B and B~C collapse A,B,C into one
    cluster even when A and C share nothing ("semantic drift" chains on
    real crawls: template pages daisy-chain hundreds of barely-related
    docs into one mega-cluster and keep-one-per-cluster then deletes
    distinct content). density = verified_pairs / (k·(k−1)/2): 1.0 means
    a genuine clique of mutual near-dups; low density on a large
    component means chaining — route those clusters to review or a
    stricter second pass instead of blind keep-first.

    Scale shape: one CC run over the pair set (large-star/small-star,
    O(log n) rounds), then two aggregates keyed by component; the edge
    count joins the pair table to the assignment on the uniform id key
    (AQE-planned). Output is one row per multi-member component.
    """
    comp = connected_components(pairs, id_a, id_b)
    sizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).alias("n_members")
    )
    # both endpoints share a component by construction; joining id_a is
    # enough to attribute each verified edge
    edges = (
        pairs.select(F.col(id_a).alias("id"))
        .join(comp, "id")
        .groupBy("component")
        .agg(F.count(F.lit(1)).alias("n_edges"))
    )
    k = F.col("n_members").cast("double")
    return (
        sizes.join(edges, "component", "left")
        .select(
            "component",
            "n_members",
            F.coalesce(F.col("n_edges"), F.lit(0)).alias("n_edges"),
            F.round(
                F.coalesce(F.col("n_edges"), F.lit(0))
                / (k * (k - F.lit(1.0)) / F.lit(2.0)),
                decimals,
            ).alias("density"),
        )
        .orderBy("component")
    )


def component_size_histogram(
    pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b"
) -> DataFrame:
    """(cluster_size, n_clusters): the size distribution of near-dup
    components — the dedup-policy dial. Web-crawl dup clusters are heavy-
    tailed (a few boilerplate/mirror templates explode into giant
    components); this histogram is how a pipeline decides whether
    keep-one-per-cluster is about to delete 30% of the corpus through one
    mega-component (a cleaning problem, not a dedup problem) before running
    the irreversible survivor pass.

    Scale shape: :func:`connected_components` (O(log n) star-contraction
    rounds) plus two map-side-combined aggregates; the output is bounded by
    the number of DISTINCT cluster sizes (<= max component size, in
    practice tens of rows at any corpus scale), so nothing corpus-sized
    ever reaches the driver. Singleton docs never appear in ``pairs`` and
    are excluded by construction — size 1 would be corpus-sized and
    uninformative."""
    assign = connected_components(pairs, id_a, id_b)
    sizes = assign.groupBy("component").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return sizes.groupBy("cluster_size").agg(
        F.count(F.lit(1)).alias("n_clusters")
    )
