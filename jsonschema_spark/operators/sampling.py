"""Deterministic sampling / rebalancing operators for training-data
pipelines (new semantics per the north rule — the reference validates
documents one at a time and has no corpus-subsetting vocabulary;
SURVEY.md §2.3).

Design constraints at 10^12 rows:

- **Reproducible regardless of partitioning** — every decision is a pure
  function of row content (a portable hash of the id), never of
  partition/row position, so re-runs, resumed runs, and different cluster
  sizes select byte-identical samples. ``df.sample()`` does NOT have this
  property (seeded per-partition RNG → changes with the file layout),
  which is why it is not used.
- **One pass, no shuffle for the flat sample** — ``hash_sample`` is a
  filter, evaluated in the scan stage (predicate on a hash expression;
  Parquet row-group pruning obviously can't apply, but no exchange
  happens either).
- **One shuffle, bounded per group, for the per-group cap** — the
  canonical top-k-per-group shape (window row_number), same as the
  engine's topk_per_group query.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from jsonschema_spark.functions.text import portable_hash60


def hash_bucket(col: Column, buckets: int) -> Column:
    """Deterministic bucket in [0, buckets) from a portable 60-bit md5
    hash of the (stringified) column — identical in any SQL engine with
    md5, so oracle twins reproduce the exact sample."""
    return F.pmod(portable_hash60(col.cast("string")), F.lit(buckets))


def hash_sample(
    df: DataFrame, id_col: str, rate: float, buckets: int = 10_000
) -> DataFrame:
    """Keep a deterministic ~``rate`` fraction of rows: bucket the id hash
    into ``buckets`` and keep the first ``round(rate * buckets)`` buckets.
    Content-addressed → stable across partitioning, resumable, and
    composable (a 1% sample is a strict subset of a 10% sample)."""
    keep = int(round(rate * buckets))
    return df.filter(hash_bucket(F.col(id_col), buckets) < keep)


_2P60 = float(1 << 60)


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    decimals: int = 6,
) -> DataFrame:
    """Deterministic weighted sample without replacement (Efraimidis–
    Spirakis A-ES): each row gets key ``u^(1/w)`` where ``u ∈ (0, 1]`` is
    the portable hash of the id and ``w`` its weight; the ``k`` largest
    keys are the sample. Inclusion probability is proportional to weight,
    and — because u is content-addressed, not RNG — the selection is
    byte-identical across partitionings, re-runs, and engines (the oracle
    replays the same md5-derived u).

    Scale shape: one projection + global top-k, which Spark executes as
    TakeOrderedAndProject (per-partition heaps, no full sort, no shuffle
    of non-winners). Ties break by id for determinism.

    Weights must be positive: A-ES is undefined otherwise (w=0 gives
    u^(1/0)=u^inf → key 0, silently never sampled; w<0 gives keys > 1
    that would DOMINATE the top-k). Non-positive / null weights are
    filtered out — such rows have zero inclusion probability by
    definition of "proportional to weight".
    """
    u = (portable_hash60(F.col(id_col).cast("string")) + F.lit(1)).cast(
        "double"
    ) / F.lit(_2P60)
    key = F.pow(u, F.lit(1.0) / F.col(weight_col).cast("double"))
    return (
        df.filter(F.col(weight_col) > 0)
        .select(
            F.col(id_col),
            F.col(weight_col),
            key.alias("_key"),
        )
        .orderBy(F.desc("_key"), F.asc(id_col))
        .limit(k)
        .select(
            id_col, weight_col, F.round("_key", decimals).alias("sample_key")
        )
    )


def cap_per_group(
    df: DataFrame,
    group_col: str,
    k: int,
    order_col: str | None = None,
) -> DataFrame:
    """Keep at most ``k`` rows per group (source-rebalancing: a dominant
    crawl must not swamp the mixture). Order within a group is by
    ``order_col`` (default: portable hash of the group-ordering is the
    caller's id column — pass it explicitly), so selection is
    deterministic. One shuffle on the group key; the window never ranks
    past k per reducer after AQE skew split."""
    if order_col is None:
        raise ValueError("cap_per_group requires an explicit order_col")
    w = Window.partitionBy(group_col).orderBy(F.col(order_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def mix_to_proportions(
    df: DataFrame,
    group_col: str,
    id_col: str,
    proportions: dict[str, float],
    total: int | None = None,
    buckets: int = 10_000,
) -> DataFrame:
    """Re-mix a corpus to target group proportions (the training-data
    "source mixing" step: crawl 50%, code 30%, reference 20%) by keeping a
    deterministic hash sample of each group sized to ``total * p_g``.
    ``total=None`` uses the largest total the corpus can supply at those
    proportions, ``min_g floor(count_g / p_g)``. Groups absent from
    ``proportions`` are dropped. Sampling is bucket-quantized (resolution
    ``1/buckets``), so achieved counts are approximate — but exactly
    reproducible: every decision is content-addressed (portable md5 of the
    id), identical across partitionings, re-runs, and engines.

    Scale shape: per-group counts are one map-side-combined aggregation
    (≤ groups rows); the target-size arithmetic joins the proportion
    literals and the 1-row total back as broadcasts; the final filter is a
    broadcast semi-join of (group → keep-threshold) onto the corpus — the
    corpus itself is never shuffled.
    """
    spark = df.sparkSession
    props = spark.createDataFrame(
        [(g, float(p)) for g, p in sorted(proportions.items())],
        [group_col, "_p"],
    )
    counts = (
        df.groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .join(F.broadcast(props), on=group_col)
    )
    if total is None:
        cap = counts.agg(
            F.min(F.floor(F.col("_cnt") / F.col("_p"))).alias("_total")
        )
        counts = counts.crossJoin(F.broadcast(cap))
    else:
        counts = counts.withColumn("_total", F.lit(int(total)))
    thresholds = counts.select(
        group_col,
        F.round(
            F.least(
                F.lit(1.0),
                F.col("_total") * F.col("_p") / F.col("_cnt"),
            )
            * buckets
        ).alias("_keep"),
    )
    return (
        df.join(F.broadcast(thresholds), on=group_col)
        .filter(hash_bucket(F.col(id_col), buckets) < F.col("_keep"))
        .drop("_keep")
    )


def temperature_mix(
    df: DataFrame,
    group_col: str,
    id_col: str,
    alpha: float = 0.7,
    total: int | None = None,
    buckets: int = 10_000,
    decimals: int = 6,
) -> DataFrame:
    """Temperature-based source re-mixing: target proportions are the
    observed group shares raised to ``alpha`` and renormalized —
    ``p_g ∝ count_g^alpha`` — the standard multilingual/multisource
    up/down-sampling rule (alpha=1 keeps natural proportions, alpha=0
    flattens to uniform, alpha≈0.7 is the usual compromise that keeps
    head sources from drowning the tail). Delegates the selection to
    :func:`mix_to_proportions`, so every keep decision stays
    content-addressed and engine-replayable.

    The per-group counts collected to the driver are bounded by the
    source registry (the same contract as every mixing op here).
    """
    if alpha < 0:
        raise ValueError("alpha must be >= 0")
    counts = {
        r["g"]: r["c"]
        for r in df.groupBy(F.col(group_col).alias("g"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    powered = {g: float(c) ** alpha for g, c in counts.items()}
    z = sum(w for _, w in sorted(powered.items()))  # order-stable float sum
    # proportions rounded to `decimals` so an external engine replaying the
    # rule from the same counts lands on bit-identical doubles (libm pow
    # can differ by an ulp across engines; the round collapses that)
    proportions = {g: round(w / z, decimals) for g, w in powered.items()}
    return mix_to_proportions(
        df, group_col, id_col, proportions, total=total, buckets=buckets
    )


def stratified_split(
    df: DataFrame,
    strata_col: str = "source",
    id_col: str = "doc_id",
    train_pct: int = 80,
    val_pct: int = 10,
    seed: int = 17,
    exact: bool = True,
) -> DataFrame:
    """Per-stratum train/val/test split with EXACT quotas: inside every
    stratum, rows are ordered by a portable content hash of the id (plus
    the id as tiebreak) and the first ``floor(n * train_pct / 100)`` go
    to train, the next block to val, the remainder to test. Every stratum
    therefore lands within one row of the target proportions — the
    stratification guarantee a hash-threshold split only gives in
    expectation. Content-addressed order → the assignment is identical
    across partitionings, re-runs, and engines. Percents are integers so
    the quota boundary is a multiple of 1/100 — far from the double
    rounding error of the floor, on any engine.

    Returns ``(doc_id, strata, split)`` with split in
    {'train','val','test'}.

    Scale shape (exact=True): one shuffle — a rank window partitioned by
    the stratum (tens of strata, so AQE's skew split matters for hot
    strata; at 10^12 rows per stratum the window sort dominates).
    ``exact=False`` is the production alternative at that scale: pure
    hash thresholds in the scan stage, zero shuffle, proportions exact
    only in expectation (±0.01% at 10^8 rows/stratum) — same contract as
    :func:`hash_sample`. Splits from the two modes differ; pick one per
    corpus and pin it.

    Complements ``leakage_safe_split`` (components.py), which routes
    whole duplicate-groups to one split but does not stratify: run that
    first where near-dups exist, then this over the survivors.
    """
    h = portable_hash60(
        F.concat(F.col(id_col).cast("string"), F.lit(f"#{seed}"))
    )
    cut = F.lit(train_pct) / F.lit(100.0)
    cut2 = F.lit(train_pct + val_pct) / F.lit(100.0)
    if not exact:
        b = F.pmod(h, F.lit(10_000))
        split = (
            F.when(b < F.lit(train_pct * 100), F.lit("train"))
            .when(b < F.lit((train_pct + val_pct) * 100), F.lit("val"))
            .otherwise(F.lit("test"))
        )
        return df.select(
            F.col(id_col),
            F.col(strata_col).alias("strata"),
            split.alias("split"),
        )
    w = Window.partitionBy("strata").orderBy("_h", id_col)
    wn = Window.partitionBy("strata")
    ranked = df.select(
        F.col(id_col), F.col(strata_col).alias("strata"), h.alias("_h")
    ).select(
        F.col(id_col),
        "strata",
        F.row_number().over(w).alias("_r"),
        F.count(F.lit(1)).over(wn).alias("_n"),
    )
    split = (
        F.when(F.col("_r") <= F.floor(F.col("_n") * cut), F.lit("train"))
        .when(F.col("_r") <= F.floor(F.col("_n") * cut2), F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return ranked.select(F.col(id_col), "strata", split.alias("split"))


def unimax_alloc(
    df: DataFrame,
    strata_col: str = "source",
    budget: int = 1_000_000,
    epoch_cap: int = 2,
    decimals: int = 6,
) -> DataFrame:
    """UniMax allocation (Chung et al. 2023, "UniMax: Fairer and More
    Effective Language Sampling for Large-Scale Multilingual
    Pretraining"): spread a total training budget UNIFORMLY across
    sources, except no source may repeat more than ``epoch_cap`` epochs —
    the budget its cap refuses spills uniformly onto the remaining
    sources (water-filling). The fairness alternative to temperature
    mixing (`temperature_mix`): low-resource sources get an equal share
    up to their cap instead of a power-law-discounted one.

    Closed form, exact in integers: sort sources ascending by capacity
    ``cap_g = n_docs_g * epoch_cap``; source i is capped iff
    ``cap_i * (m - i) + cumsum(cap)_i <= budget`` (capped sources form a
    prefix of the sorted order); every uncapped source gets
    ``floor((budget - sum(capped caps)) / (m - k))`` docs. Up to m-1
    budget docs stay unassigned by the floor — documented, never
    redistributed, so the whole table is integer-exact on any engine
    (the only division is mirrored IEEE-double).

    Returns ``(strata, n_docs, cap, quota, epochs)`` with
    ``epochs = quota / n_docs`` rounded — the per-source repetition
    factor a trainer feeds its sampler.

    Scale shape: one map-side-combined groupBy count; every window runs
    over the ≤|source-registry| count table, never the corpus. The
    selection of actual docs is a separate concern: feed the quotas to
    ``stratified_split``-style hash-rank selection or ``source_cap``.
    """
    m_w = Window.partitionBy()
    ord_w = Window.orderBy("cap", "strata")
    cum_w = ord_w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counts = (
        df.groupBy(F.col(strata_col).alias("strata"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .select(
            "strata",
            "n_docs",
            (F.col("n_docs") * F.lit(epoch_cap)).alias("cap"),
        )
    )
    b = F.lit(budget)
    w = counts.select(
        "strata",
        "n_docs",
        "cap",
        F.sum("cap").over(cum_w).alias("cum"),
        F.row_number().over(ord_w).alias("i"),
        F.count(F.lit(1)).over(m_w).alias("m"),
    ).select(
        "*",
        (
            (F.col("cap") * (F.col("m") - F.col("i")) + F.col("cum")) <= b
        ).alias("capped"),
    )
    g = w.select(
        "*",
        F.sum(F.col("capped").cast("long")).over(m_w).alias("k"),
        F.coalesce(
            F.sum(F.when(F.col("capped"), F.col("cap"))).over(m_w), F.lit(0)
        ).alias("cs"),
    )
    quota = F.when(F.col("capped"), F.col("cap")).otherwise(
        F.least(
            F.col("cap"),
            F.floor(
                (b - F.col("cs"))
                / F.greatest(F.col("m") - F.col("k"), F.lit(1))
            ),
        )
    )
    return g.select(
        "strata",
        "n_docs",
        "cap",
        quota.alias("quota"),
        F.round(quota / F.col("n_docs"), decimals).alias("epochs"),
    )


def global_shuffle_order(
    df: DataFrame,
    id_col: str,
    seed: int = 0,
    num_buckets: int = 1024,
) -> DataFrame:
    """(id, shuffle_pos): a deterministic global training order —
    ``shuffle_pos`` is each row's 1-based position when the corpus is
    sorted by ``portable_hash60(seed ':' id)`` (id as tiebreak). The
    epoch-shuffle a trainer needs: content-addressed like every sampler
    here (reproducible on any partitioning / cluster size / engine — a
    new ``seed`` per epoch gives an independent order), unlike
    ``df.orderBy(rand())`` whose sample is partition-layout-dependent.

    Scale shape: NO global sort and NO single-partition window. Two-phase
    rank: the hash's top bits form ``num_buckets`` ORDER-PRESERVING
    buckets (bucket = hash >> shift is monotone in hash); one map-side-
    combined count per bucket (≤ num_buckets rows to the driver) turns
    into cumulative offsets joined back broadcast; row_number then runs
    per bucket — every window partition holds ~n/num_buckets rows, so
    pick num_buckets ≈ corpus_rows / 10^7 at scale (the uniform hash
    makes buckets even; no salting needed). Writing the corpus in this
    order is then ``repartitionByRange(shuffle_pos)`` +
    ``sortWithinPartitions`` — also global-sort-free.
    """
    if num_buckets & (num_buckets - 1):
        raise ValueError("num_buckets must be a power of two")
    shift = 60 - (num_buckets.bit_length() - 1)
    from jsonschema_spark.operators.dedup import ensure_parallelism

    base = (
        ensure_parallelism(df)
        .select(
            F.col(id_col).alias("id"),
            portable_hash60(
                F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))
            ).alias("_h"),
        )
        .select("id", "_h", F.shiftright("_h", shift).alias("_b"))
        .localCheckpoint(eager=False)
    )
    counts = base.groupBy("_b").agg(F.count(F.lit(1)).alias("_n")).collect()
    acc = 0
    offsets = []
    for r in sorted(counts, key=lambda r: r["_b"]):
        offsets.append((r["_b"], acc))
        acc += r["_n"]
    off = df.sparkSession.createDataFrame(offsets, "_b long, _off long")
    w = Window.partitionBy("_b").orderBy("_h", "id")
    return (
        base.join(F.broadcast(off), "_b")
        .select(
            F.col("id").alias(id_col),
            (F.col("_off") + F.row_number().over(w)).cast("long").alias(
                "shuffle_pos"
            ),
        )
    )


def training_order_audit(
    order: DataFrame,
    id_col: str = "id",
    epoch_col: str = "epoch",
    pos_col: str = "shuffle_pos",
    decimals: int = 6,
) -> DataFrame:
    """(epoch, n_rows, n_ids, n_pos, pos_min, pos_max, is_permutation,
    spearman_vs_prev): validates a multi-epoch training-order table the
    way the engine validates every other artifact it emits. Two gates:
    each epoch must be an exact permutation (every id exactly once,
    positions exactly 1..N), and consecutive epochs must be
    DECORRELATED — positions are ranks, so the Pearson correlation of
    matched positions IS Spearman's rho: near 0 means independent
    orders; near 1 means the "shuffle" is replaying the previous epoch
    (the classic seed-reuse bug that silently turns multi-epoch
    training into N identical passes).

    Scale shape: one exact-distinct aggregate keyed by epoch (two-phase
    partial agg over the uniform (epoch, id)/(epoch, pos) keys — the
    audit needs EXACT distincts, approx would wave through a single
    duplicated position) plus one consecutive-epoch self-join on the
    uniform (epoch, id) key; the order table is localCheckpointed so
    the self-join doesn't recompute its lineage twice (the repo's
    standing self-join rule). ``corr`` is a single-pass commutative
    aggregate; output is one row per epoch.
    """
    base = order.select(
        F.col(epoch_col).cast("long").alias("epoch"),
        F.col(id_col).alias("id"),
        F.col(pos_col).cast("long").alias("pos"),
    ).localCheckpoint(eager=False)
    stats = base.groupBy("epoch").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct("id").alias("n_ids"),
        F.count_distinct("pos").alias("n_pos"),
        F.min("pos").alias("pos_min"),
        F.max("pos").alias("pos_max"),
    )
    prev = base.select(
        (F.col("epoch") + 1).alias("epoch"),
        "id",
        F.col("pos").alias("_prev"),
    )
    rho = (
        base.join(prev, ["epoch", "id"])
        .groupBy("epoch")
        .agg(
            F.round(F.corr("pos", "_prev"), decimals).alias(
                "spearman_vs_prev"
            )
        )
    )
    return (
        stats.join(rho, "epoch", "left")
        .select(
            "epoch",
            "n_rows",
            "n_ids",
            "n_pos",
            "pos_min",
            "pos_max",
            (
                (F.col("n_ids") == F.col("n_rows"))
                & (F.col("n_pos") == F.col("n_rows"))
                & (F.col("pos_min") == 1)
                & (F.col("pos_max") == F.col("n_rows"))
            ).alias("is_permutation"),
            "spearman_vs_prev",
        )
        .orderBy("epoch")
    )


def source_relative_filter(
    df: DataFrame,
    id_col: str,
    score_col: str,
    strata_col: str = "source",
    keep_frac: float = 0.6,
    exact: bool = True,
    decimals: int = 6,
) -> DataFrame:
    """Keep each source's TOP ``keep_frac`` by score — per-source RELATIVE
    quality filtering: an absolute threshold keeps nearly all of a
    high-scoring source and nearly none of a low-scoring one, collapsing
    the mix; the relative form drops each source's own worst while
    preserving source proportions. Returns ``(id, strata, score, cut)``
    for kept rows, where ``cut`` is the source's exact
    ``1 - keep_frac`` quantile (linear interpolation; ties at the cut are
    kept, so the realized fraction can slightly exceed ``keep_frac`` —
    deterministic on any engine).

    Scale shape: one groupBy(strata) percentile aggregate (``exact=True``
    uses exact ``percentile`` for oracle parity — its per-group state is
    a value list, so at 10^12 rows pass ``exact=False`` for
    ``approx_percentile``, same plan shape); the registry-sized threshold
    table broadcasts back and the keep decision is a scan-stage
    comparison — the corpus is never sorted, windowed, or re-shuffled."""
    q = 1.0 - keep_frac
    s = F.col(score_col).cast("double")
    pct = (
        F.percentile(s, F.lit(q)) if exact else F.percentile_approx(s, F.lit(q))
    )
    cuts = df.groupBy(F.col(strata_col).alias("_st")).agg(
        F.round(pct, decimals).alias("cut")
    )
    return (
        df.join(
            F.broadcast(cuts), df[strata_col] == cuts["_st"]
        )
        .filter(s >= F.col("cut"))
        .select(
            F.col(id_col),
            F.col(strata_col),
            s.alias("score"),
            "cut",
        )
    )


def doremi_weights(
    df: DataFrame,
    source_col: str = "source",
    score_col: str = "score",
    temperature: float = 1.0,
) -> DataFrame:
    """(source, share, avg_score, weight): ONE exponentiated-gradient
    mixture-reweighting step in the shape of DoReMi (Xie et al. 2023,
    "DoReMi: Optimizing Data Mixtures Speeds Up Language Model
    Pretraining"): each source's current mass share is tilted by the
    exponential of its average per-document score (there: excess proxy
    loss; here: whatever the caller scores) and renormalized —
    ``w_s ∝ share_s * exp(avg_score_s / T)``. High-score (hard/
    informative) sources gain mass, low-score ones shrink; T flattens or
    sharpens the update.

    Scale shape: ONE map-side-combined aggregate reduces the corpus to
    |sources| rows (registry-bounded); the two normalizations (total mass,
    softmax denominator) are unpartitioned windows over that metadata-sized
    table — a deliberate SinglePartition over tens of rows, never the
    corpus, which is neither shuffled nor collected."""
    w = Window.partitionBy()
    agg = df.groupBy(F.col(source_col).alias("source")).agg(
        F.count(F.lit(1)).alias("_n"),
        F.avg(F.col(score_col)).alias("avg_score"),
    )
    shared = agg.select(
        "source",
        "avg_score",
        (F.col("_n") / F.sum("_n").over(w)).alias("share"),
    )
    tilted = shared.select(
        "source",
        "share",
        "avg_score",
        (F.col("share") * F.exp(F.col("avg_score") / F.lit(float(temperature)))).alias(
            "_t"
        ),
    )
    return tilted.select(
        "source",
        F.round("share", 6).alias("share"),
        F.round("avg_score", 6).alias("avg_score"),
        F.round(F.col("_t") / F.sum("_t").over(w), 6).alias("weight"),
    )
