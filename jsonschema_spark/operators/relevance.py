"""Corpus-relevance operators: per-document TF-IDF top terms and pairwise
source divergence over token distributions (new semantics per the north
rule — the reference validates single documents and has no corpus-level
vocabulary; SURVEY.md §2.3 extends validation to table scale, and these
are the standard "what characterizes this document / how different are
these sources" diagnostics a training-data pipeline runs next to drift).

Scale shapes:

Both operators guard the tokenize/explode stage with
``ensure_parallelism`` — a single-file parquet input would otherwise
serialize the whole tokenization onto one core (real corpora with
thousands of files never pay the extra shuffle).

- ``tfidf_top_terms``: the canonical four-stage TF-IDF plan — explode
  (no shuffle) → groupBy (doc, term) with map-side combine → groupBy term
  for document frequencies (vocab-sized) → join scores back on term →
  window top-k per doc. The document count joins in as a broadcast 1-row
  aggregate, never a driver round-trip inside the plan.
- ``pairwise_js_divergence``: restricts to the global top-V vocabulary
  first (the word_freq shape: vocab-sized agg + TakeOrdered), so the
  dense (group × term) distribution grid is ≤ groups·V rows; the
  pairwise compare is a self-join of that tiny grid. The grid is
  localCheckpoint'd before the self-join — Spark does not reuse
  exchanges across self-join aliases (CLAUDE.md rule #4), and without
  it the full corpus tokenization would run once per side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from jsonschema_spark.functions.text import portable_hash60, words
from jsonschema_spark.operators.dedup import ensure_parallelism


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    decimals: int = 6,
) -> DataFrame:
    """Top-``k`` terms per document by smoothed TF-IDF:
    ``tfidf = tf * ln((1 + N) / (1 + df))`` with N = total documents and
    df = documents containing the term. Returns
    ``(id, term, tf, doc_freq, tfidf, rank)``; ties break toward the
    lexicographically smaller term so the ranking is deterministic and
    reproducible in any engine (the oracle mirrors the tie-break).
    """
    toks = ensure_parallelism(df).select(
        F.col(id_col).alias("id"),
        F.explode(words(F.lower(F.col(text_col)))).alias("term"),
    )
    tf = toks.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("doc_freq"))
    n_docs = df.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, on="term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "_s",
            F.col("tf").cast("double")
            * F.log(
                (F.lit(1.0) + F.col("n_docs"))
                / (F.lit(1.0) + F.col("doc_freq"))
            ),
        )
    )
    w = Window.partitionBy("id").orderBy(F.desc("_s"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("id").alias(id_col),
            "term",
            "tf",
            "doc_freq",
            F.round("_s", decimals).alias("tfidf"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


def pairwise_js_divergence(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    top_v: int = 200,
    decimals: int = 6,
) -> DataFrame:
    """Jensen–Shannon divergence between every pair of groups' token
    distributions, restricted to the global top-``top_v`` terms (so the
    support is shared and the compare is O(groups² · V) over aggregated
    rows, never over raw text). Returns ``(grp_a, grp_b, jsd)`` for
    ``grp_a < grp_b``; jsd ∈ [0, ln 2], 0 = identical mixtures.

    Distributions are normalized over the shared top-V support; a term a
    group never uses contributes p = 0 (the 0·ln 0 = 0 convention — JS is
    finite without epsilon flooring, unlike KL/PSI).
    """
    toks = ensure_parallelism(df).select(
        F.col(group_col).alias("grp"),
        F.explode(words(F.lower(F.col(text_col)))).alias("term"),
    )
    counts = toks.groupBy("grp", "term").agg(F.count(F.lit(1)).alias("cnt"))
    top_terms = (
        counts.groupBy("term")
        .agg(F.sum("cnt").alias("total"))
        .orderBy(F.desc("total"), F.asc("term"))
        .limit(top_v)
        .select("term")
    )
    on_support = counts.join(F.broadcast(top_terms), on="term")
    # dense (group × term) grid so absent terms appear with p = 0 on both
    # sides of every pair (an inner self-join on sparse counts would drop
    # the asymmetric terms that carry most of the divergence)
    groups = df.select(F.col(group_col).alias("grp")).distinct()
    grid = (
        groups.crossJoin(F.broadcast(top_terms))
        .join(on_support, on=["grp", "term"], how="left")
        .select("grp", "term", F.coalesce("cnt", F.lit(0)).alias("cnt"))
    )
    gtot = grid.groupBy("grp").agg(F.sum("cnt").alias("g_total"))
    dist = (
        grid.join(F.broadcast(gtot), on="grp")
        .select(
            "grp", "term",
            (F.col("cnt") / F.col("g_total").cast("double")).alias("p"),
        )
        .localCheckpoint(eager=False)
    )
    a, b = dist.alias("a"), dist.alias("b")
    pa, pb = F.col("a.p"), F.col("b.p")
    m = (pa + pb) / F.lit(2.0)
    term_a = F.when(pa > 0, pa * F.log(pa / m)).otherwise(F.lit(0.0))
    term_b = F.when(pb > 0, pb * F.log(pb / m)).otherwise(F.lit(0.0))
    return (
        a.join(b, F.col("a.term") == F.col("b.term"))
        .filter(F.col("a.grp") < F.col("b.grp"))
        .groupBy(
            F.col("a.grp").alias("grp_a"), F.col("b.grp").alias("grp_b")
        )
        .agg(
            F.round(
                F.lit(0.5) * F.sum(term_a) + F.lit(0.5) * F.sum(term_b),
                decimals,
            ).alias("jsd")
        )
    )


def dsir_weights(
    df: DataFrame,
    is_target: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 1024,
    smoothing: float = 1.0,
    decimals: int = 6,
) -> DataFrame:
    """Data Selection with Importance Resampling (DSIR, Xie et al. 2023)
    over hashed unigram features: score every NON-target document by how
    target-like its token distribution is,
    ``weight = sum_tokens ln p_target(bucket) / p_raw(bucket)`` with
    Laplace-``smoothing`` bucket models estimated from the corpus itself
    (``is_target`` marks the in-domain exemplar rows; everything else is
    the raw pool being scored). Returns ``(id, n_tok, weight)`` for raw
    docs. New semantics per the north rule: the reference validates one
    document at a time and has no notion of corpus-level selection.

    Scale shape: explode (no shuffle) → ONE map-side-combined groupBy over
    ≤ ``buckets`` keys for both bucket models in the same pass (conditional
    sums) → totals join back as a broadcast 1-row aggregate (never a driver
    round-trip) → bucket log-ratios broadcast onto the token rows
    (map-side) → groupBy(id), whose partial aggregation collapses each
    doc's tokens within its own partition (explode preserves locality), so
    the only full shuffle moves ~1 row per document. Buckets use
    ``portable_hash60`` so an external SQL engine reproduces the scores
    bit-for-bit.
    """
    toks = ensure_parallelism(df).select(
        F.col(id_col).alias("id"),
        is_target.alias("is_t"),
        F.explode(words(F.lower(F.col(text_col)))).alias("term"),
    )
    bucketed = toks.select(
        "id", "is_t", F.pmod(portable_hash60(F.col("term")), F.lit(buckets)).alias("bucket")
    )
    models = bucketed.groupBy("bucket").agg(
        F.sum(F.when(F.col("is_t"), 1).otherwise(0)).alias("t_cnt"),
        F.sum(F.when(F.col("is_t"), 0).otherwise(1)).alias("r_cnt"),
    )
    totals = models.agg(
        F.sum("t_cnt").alias("t_tot"), F.sum("r_cnt").alias("r_tot")
    )
    s, b = F.lit(float(smoothing)), F.lit(float(buckets))
    ratios = (
        models.crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            (
                F.log((F.col("t_cnt") + s) / (F.col("t_tot") + s * b))
                - F.log((F.col("r_cnt") + s) / (F.col("r_tot") + s * b))
            ).alias("log_ratio"),
        )
    )
    return (
        bucketed.filter(~F.col("is_t"))
        .join(F.broadcast(ratios), on="bucket")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_tok"),
            F.round(F.sum("log_ratio"), decimals).alias("weight"),
        )
        .select(F.col("id").alias(id_col), "n_tok", "weight")
    )


def unigram_perplexity(
    df: DataFrame,
    is_reference: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 1024,
    smoothing: float = 1.0,
    decimals: int = 6,
) -> DataFrame:
    """CCNet-style language-model quality scoring (Wenzek et al. 2020):
    train a hashed-unigram LM with Laplace-``smoothing`` on the reference
    rows (``is_reference`` marks the "clean" exemplar slice, e.g. a
    Wikipedia-like source), then score every NON-reference document by
    cross-entropy ``xent = -(1/n) * sum_tokens ln p_ref(bucket)`` and
    ``ppl = exp(xent)``. Low perplexity = reference-like text; CCNet keeps
    the head of this ranking. Returns ``(id, n_tok, xent, ppl)``.

    New semantics per the north rule (the reference validates single
    documents; corpus-level LM filtering is table-scale validation).
    CCNet proper uses a 5-gram KenLM — a unigram model over hashed
    buckets is the engine-native analog: the plan shape (broadcast model,
    one shuffled row per doc) is what survives 100 TB, and swapping in
    richer per-token log-probs changes only the model table.

    Scale shape mirrors :func:`dsir_weights`: explode (no shuffle) → ONE
    map-side-combined groupBy over ≤ ``buckets`` keys for the model →
    1-row total broadcast → model left-broadcast-joined onto the scored
    token rows (buckets the reference never hit coalesce to count 0, so
    OOV mass is priced, not dropped) → groupBy(id) whose partial
    aggregation collapses each doc within its partition; the only full
    shuffle moves ~1 row per document. ``portable_hash60`` buckets let an
    external SQL engine reproduce every score bit-for-bit.
    """
    toks = ensure_parallelism(df).select(
        F.col(id_col).alias("id"),
        is_reference.alias("is_ref"),
        F.explode(words(F.lower(F.col(text_col)))).alias("term"),
    )
    bucketed = toks.select(
        "id",
        "is_ref",
        F.pmod(portable_hash60(F.col("term")), F.lit(buckets)).alias("bucket"),
    )
    model = (
        bucketed.filter(F.col("is_ref"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("ref_cnt"))
    )
    total = model.agg(F.sum("ref_cnt").alias("ref_tot"))
    s, b = F.lit(float(smoothing)), F.lit(float(buckets))
    logp = F.log(
        (F.coalesce(F.col("ref_cnt"), F.lit(0)) + s) / (F.col("ref_tot") + s * b)
    )
    return (
        bucketed.filter(~F.col("is_ref"))
        .join(F.broadcast(model), on="bucket", how="left")
        .crossJoin(F.broadcast(total))
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_tok"),
            F.round(-F.avg(logp), decimals).alias("xent"),
            F.round(F.exp(-F.avg(logp)), decimals).alias("ppl"),
        )
        .select(F.col("id").alias(id_col), "n_tok", "xent", "ppl")
    )


def perplexity_buckets(
    df: DataFrame,
    is_reference: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 3,
    buckets: int = 1024,
    smoothing: float = 1.0,
    decimals: int = 6,
) -> DataFrame:
    """CCNet head/middle/tail assignment: rank non-reference documents by
    unigram perplexity and split into ``n_buckets`` equal-size tiles
    (tile 1 = head = most reference-like). Deterministic order
    ``(rounded ppl asc, id asc)`` so any engine reproduces the tiling.

    Scale note: ntile is a global sort — but of the 1-row-per-document
    weights table (id, n_tok, ppl), never the corpus. At 10^12 docs,
    production would sample quantile thresholds from this table
    (percentile_approx) and assign by broadcast threshold instead; the
    exact tile is the oracle-checkable semantics, the thresholded variant
    is a filter in the same plan shape.
    """
    ppl = unigram_perplexity(
        df, is_reference, id_col, text_col, buckets, smoothing, decimals
    )
    w = Window.orderBy(F.asc("ppl"), F.asc(id_col))
    return ppl.withColumn("tile", F.ntile(n_buckets).over(w))


def dsir_select(
    df: DataFrame,
    is_target: Column,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 1024,
    smoothing: float = 1.0,
    decimals: int = 6,
) -> DataFrame:
    """Top-``k`` most target-like raw documents by DSIR weight
    (deterministic ``(weight desc, id asc)`` order so any engine
    reproduces the selection). orderBy+limit lowers to
    TakeOrderedAndProject — per-partition heaps, no global sort."""
    w = dsir_weights(
        df, is_target, id_col, text_col, buckets, smoothing, decimals
    )
    return w.orderBy(F.desc("weight"), F.asc(id_col)).limit(k)


def bigram_perplexity(
    df: DataFrame,
    is_reference: Column,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    smoothing: float = 0.5,
    decimals: int = 6,
) -> DataFrame:
    """Token-native bigram-LM quality scoring — the next model order up
    from :func:`unigram_perplexity` toward CCNet's 5-gram KenLM: train
    add-k-smoothed conditionals ``p(b|a) = (B(a,b)+k) / (H(a)+k·V)`` on
    the reference slice (``B`` = bigram counts, ``H`` = history counts =
    Σ_b B(a,b), ``V`` = distinct reference token ids, so unseen histories
    back off to the uniform 1/V), then score every non-reference sequence
    by mean negative log-likelihood over its adjacent pairs. Returns
    ``(id, n_bigrams, xent, ppl)`` for sequences with at least one bigram
    (a 0/1-token sequence has no conditional to price).

    Scale shape: reference counts are two map-side-combined aggs keyed by
    uniform token ids; ``V`` is one scalar. Scoring explodes adjacent
    pairs (no pre-shuffle), joins the bigram table on its uniform (a, b)
    key — AQE broadcasts it when it fits, shuffle-join otherwise — and
    broadcasts the ≤|vocab| history table; the final per-doc agg moves ~1
    row per document. Unseen bigrams/histories coalesce to count 0, so
    out-of-domain mass is priced, not dropped (same contract as the
    unigram model).
    """
    from ..functions.text import index_range

    toks = F.col(tokens_col)
    pairs_arr = F.transform(
        index_range(F.size(toks) - 1),
        lambda i: F.struct(
            F.element_at(toks, i).alias("a"),
            F.element_at(toks, i + 1).alias("b"),
        ),
    )
    ref = df.filter(is_reference)
    ref_pairs = ref.select(F.explode(pairs_arr).alias("p")).select("p.a", "p.b")
    bigrams = ref_pairs.groupBy("a", "b").agg(F.count(F.lit(1)).alias("nb"))
    hist = ref_pairs.groupBy("a").agg(F.count(F.lit(1)).alias("na"))
    v = (
        ref.select(F.explode(toks).alias("t"))
        .agg(F.count_distinct("t"))
        .collect()[0][0]
    )
    k = float(smoothing)
    scored = (
        df.filter(~is_reference)
        .select(F.col(id_col).alias("id"), F.explode(pairs_arr).alias("p"))
        .select("id", "p.a", "p.b")
    )
    p = (F.coalesce(F.col("nb"), F.lit(0)) + F.lit(k)) / (
        F.coalesce(F.col("na"), F.lit(0)) + F.lit(k * float(v))
    )
    return (
        scored.join(bigrams, on=["a", "b"], how="left")
        .join(F.broadcast(hist), on="a", how="left")
        .select("id", (-F.ln(p)).alias("nll"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_bigrams"), F.avg("nll").alias("_x"))
        .select(
            "id",
            "n_bigrams",
            F.round(F.col("_x"), decimals).alias("xent"),
            F.round(F.exp(F.col("_x")), decimals).alias("ppl"),
        )
    )


def kn_bigram_perplexity(
    df: DataFrame,
    is_reference: Column,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    discount: float = 0.75,
    smoothing: float = 0.5,
    decimals: int = 6,
) -> DataFrame:
    """Interpolated Kneser-Ney bigram perplexity (Kneser & Ney 1995;
    Chen & Goodman 1999) — the smoothing KenLM actually ships, one
    quality step above :func:`bigram_perplexity`'s add-k: instead of
    backing off to raw unigram frequency (which overprices tokens that
    are frequent but only in one context, e.g. the second half of a
    fixed collocation), the lower-order model is the CONTINUATION
    distribution ``Pc(b) ∝ N1+(·,b)`` = in how many distinct contexts
    ``b`` was seen. Seen history ``a``::

        P(b|a) = max(B(a,b) - d, 0) / H(a)  +  d·N1+(a,·)/H(a) · Pc(b)

    with ``B`` = bigram counts, ``H(a) = Σ_b B(a,b)``, ``N1+(a,·)`` =
    distinct continuations of ``a``, and absolute discount ``d``.
    Unseen histories score ``Pc(b)`` directly. ``Pc`` is add-k smoothed
    over the reference vocabulary (``(N1+(·,b)+k) / (N1+(··)+k·V)``) so
    unseen continuations are priced, not dropped — same contract as the
    unigram/bigram scorers. Returns ``(id, n_bigrams, n_seen_hist,
    xent, ppl)`` for non-reference sequences with ≥1 adjacent pair.

    Scale shape: identical to :func:`bigram_perplexity` — the model is
    the SAME map-side-combined bigram count table plus two vocab-bounded
    aggregates OVER it (distinct-continuation counts are a groupBy of
    the ≤|bigrams| count table, never a second corpus pass) and two
    scalars. Scoring joins the bigram table on its uniform (a, b) key
    (AQE broadcasts when it fits) and broadcasts the two ≤|vocab|
    per-token tables; the final per-doc agg moves ~1 row per document.
    """
    from ..functions.text import index_range

    toks = F.col(tokens_col)
    pairs_arr = F.transform(
        index_range(F.size(toks) - 1),
        lambda i: F.struct(
            F.element_at(toks, i).alias("a"),
            F.element_at(toks, i + 1).alias("b"),
        ),
    )
    ref = df.filter(is_reference)
    ref_pairs = ref.select(F.explode(pairs_arr).alias("p")).select(
        "p.a", "p.b"
    )
    bigrams = ref_pairs.groupBy("a", "b").agg(
        F.count(F.lit(1)).alias("nb")
    )
    # history totals + distinct-continuation fan-outs: aggregates over
    # the bigram COUNT table (≤ distinct bigrams rows), not the corpus
    hist = bigrams.groupBy("a").agg(
        F.sum("nb").alias("na"), F.count(F.lit(1)).alias("n1f")
    )
    cont = bigrams.groupBy("b").agg(F.count(F.lit(1)).alias("n1b"))
    n1_all = ref_pairs.agg(F.count_distinct("a", "b")).collect()[0][0]
    v = float(
        ref.select(F.explode(toks).alias("t"))
        .agg(F.count_distinct("t"))
        .collect()[0][0]
    )
    d = float(discount)
    k = float(smoothing)
    scored = (
        df.filter(~is_reference)
        .select(F.col(id_col).alias("id"), F.explode(pairs_arr).alias("p"))
        .select("id", "p.a", "p.b")
    )
    pc = (F.coalesce(F.col("n1b"), F.lit(0)) + F.lit(k)) / F.lit(
        float(n1_all) + k * v
    )
    seen = F.col("na").isNotNull()
    p = F.when(
        seen,
        F.greatest(F.coalesce(F.col("nb"), F.lit(0)) - F.lit(d), F.lit(0.0))
        / F.col("na")
        + F.lit(d) * F.col("n1f") / F.col("na") * pc,
    ).otherwise(pc)
    return (
        scored.join(bigrams, on=["a", "b"], how="left")
        .join(F.broadcast(hist), on="a", how="left")
        .join(F.broadcast(cont), on="b", how="left")
        .select("id", seen.cast("long").alias("_s"), (-F.ln(p)).alias("nll"))
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("_s").alias("n_seen_hist"),
            F.avg("nll").alias("_x"),
        )
        .select(
            "id",
            "n_bigrams",
            "n_seen_hist",
            F.round(F.col("_x"), decimals).alias("xent"),
            F.round(F.exp(F.col("_x")), decimals).alias("ppl"),
        )
    )


def kn_trigram_perplexity(
    df: DataFrame,
    is_reference: Column,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    discount: float = 0.75,
    smoothing: float = 0.5,
    decimals: int = 6,
) -> DataFrame:
    """Interpolated Kneser-Ney TRIGRAM perplexity (Chen & Goodman 1999's
    recommended formulation; what a KenLM order-3 model computes) — the
    top of the engine's LM ladder (unigram → add-k bigram → KN bigram →
    Stupid-Backoff trigram → this). Three levels::

        P(c|ab)   = max(T(abc)−d, 0)/H(ab) + d·N1+(ab·)/H(ab) · P₂(c|b)
        P₂(c|b)   = max(M(bc)−d, 0)/M(b·) + d·N1c(b)/M(b·) · P₁(c)
        P₁(c)     = (N1+(·c) + k) / (N1+(··) + k·V)

    where ``T`` = trigram counts, ``H(ab) = Σ_c T(abc)``, ``M(bc) =
    |{a: T(abc)>0}|`` (continuation TYPES, the Kneser-Ney insight:
    lower orders model how likely a gram is to appear in a NEW
    context), ``M(b·) = Σ_c M(bc)``, ``N1c(b) = |{c: M(bc)>0}|``, and
    ``P₁`` is the add-k-smoothed continuation unigram over actual
    bigram types. Unseen histories fall through to the next level.
    Returns ``(id, n_trigrams, n_seen_hist, xent, ppl)`` for
    non-reference sequences with ≥1 trigram (``n_seen_hist`` counts
    trigram positions whose (a, b) history was seen).

    Scale shape: the trigram count table is ONE map-side-combined agg on
    uniform (a,b,c) keys; every other model table is an aggregate OVER
    it or over the bigram table (all gram-type-bounded, never a second
    corpus pass). Scoring joins the two gram-keyed tables under AQE and
    broadcasts the three ≤|vocab|-keyed tables; the final per-doc agg
    moves ~1 row per document.
    """
    from ..functions.text import index_range

    toks = F.col(tokens_col)
    tri_arr = F.transform(
        index_range(F.size(toks) - 2),
        lambda i: F.struct(
            F.element_at(toks, i).alias("a"),
            F.element_at(toks, i + 1).alias("b"),
            F.element_at(toks, i + 2).alias("c"),
        ),
    )
    pair_arr = F.transform(
        index_range(F.size(toks) - 1),
        lambda i: F.struct(
            F.element_at(toks, i).alias("a"),
            F.element_at(toks, i + 1).alias("b"),
        ),
    )
    ref = df.filter(is_reference)
    tri = (
        ref.select(F.explode(tri_arr).alias("t"))
        .select("t.a", "t.b", "t.c")
        .groupBy("a", "b", "c")
        .agg(F.count(F.lit(1)).alias("nt"))
    )
    hist = tri.groupBy("a", "b").agg(
        F.sum("nt").alias("n_ab"), F.count(F.lit(1)).alias("n1f_ab")
    )
    midc = tri.groupBy("b", "c").agg(F.count(F.lit(1)).alias("m_bc"))
    midh = midc.groupBy("b").agg(
        F.sum("m_bc").alias("m_b"), F.count(F.lit(1)).alias("n1c_b")
    )
    ref_pairs = ref.select(F.explode(pair_arr).alias("p")).select(
        "p.a", "p.b"
    )
    cont = (
        ref_pairs.groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("_nb"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("n1b"))
        .select(F.col("b").alias("c"), "n1b")
    )
    n1_all = ref_pairs.agg(F.count_distinct("a", "b")).collect()[0][0]
    v = float(
        ref.select(F.explode(toks).alias("t"))
        .agg(F.count_distinct("t"))
        .collect()[0][0]
    )
    d = float(discount)
    k = float(smoothing)
    scored = (
        df.filter(~is_reference)
        .select(F.col(id_col).alias("id"), F.explode(tri_arr).alias("t"))
        .select("id", "t.a", "t.b", "t.c")
    )
    p1 = (F.coalesce(F.col("n1b"), F.lit(0)) + F.lit(k)) / F.lit(
        float(n1_all) + k * v
    )
    seen_mid = F.col("m_b").isNotNull()
    p2 = F.when(
        seen_mid,
        F.greatest(
            F.coalesce(F.col("m_bc"), F.lit(0)) - F.lit(d), F.lit(0.0)
        )
        / F.col("m_b")
        + F.lit(d) * F.col("n1c_b") / F.col("m_b") * p1,
    ).otherwise(p1)
    seen = F.col("n_ab").isNotNull()
    p = F.when(
        seen,
        F.greatest(
            F.coalesce(F.col("nt"), F.lit(0)) - F.lit(d), F.lit(0.0)
        )
        / F.col("n_ab")
        + F.lit(d) * F.col("n1f_ab") / F.col("n_ab") * p2,
    ).otherwise(p2)
    return (
        scored.join(tri, on=["a", "b", "c"], how="left")
        .join(hist, on=["a", "b"], how="left")
        .join(midc, on=["b", "c"], how="left")
        .join(F.broadcast(midh), on="b", how="left")
        .join(F.broadcast(cont), on="c", how="left")
        .select("id", seen.cast("long").alias("_s"), (-F.ln(p)).alias("nll"))
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_trigrams"),
            F.sum("_s").alias("n_seen_hist"),
            F.avg("nll").alias("_x"),
        )
        .select(
            "id",
            "n_trigrams",
            "n_seen_hist",
            F.round(F.col("_x"), decimals).alias("xent"),
            F.round(F.exp(F.col("_x")), decimals).alias("ppl"),
        )
    )


def trigram_stupid_backoff(
    df: DataFrame,
    is_reference: Column,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    alpha: float = 0.4,
    smoothing: float = 0.5,
    decimals: int = 6,
) -> DataFrame:
    """Stupid-Backoff trigram scoring (Brants et al. 2007, "Large Language
    Models in Machine Translation") — the web-scale LM ranker: raw-count
    relative frequencies with a fixed backoff penalty instead of
    normalized discounting, which is exactly what makes it trainable by
    pure counting at 10^12 tokens (no held-out EM, no discount tuning).

    Per trigram position, the score is

        S(c | a, b) = T(a,b,c) / B(a,b)            if T(a,b,c) > 0
                    = alpha * B(b,c) / U(b)        elif B(b,c) > 0
                    = alpha^2 * (U(c)+k)/(N+k*V)   otherwise

    with T/B/U the raw trigram/bigram/unigram counts on the reference
    slice, N total reference tokens, V distinct reference token ids and
    ``k`` an add-k floor on the unigram base so out-of-vocabulary tokens
    are priced, not scored zero (Brants' S(w)=U(w)/N is kept for seen
    tokens up to the +k shift; the floor only matters for unseen ids).
    Scores are not normalized probabilities — the mean negative log score
    (``xent``) is a ranking key, not a true cross-entropy.

    Returns ``(id, n_trigrams, n_hit3, n_hit2, xent)`` for non-reference
    sequences with >= 1 trigram: how many positions were priced by the
    full trigram, how many fell back to the bigram, and the mean -log S.
    The hit-tier counts are the model-coverage diagnostic Brants reports
    (backoff-tier usage tracks domain match better than xent alone).

    Scale shape: the three count tables are map-side-combined aggs keyed
    by uniform token ids. Scoring explodes trigram positions (no
    pre-shuffle) and joins count tables on their gram keys — the trigram
    and bigram tables via AQE (broadcast when small, shuffle-join
    otherwise; at 10^12 tokens these are the classic distributed LM shard
    joins), the vocab-bounded unigram table explicitly broadcast. N and V
    are one 2-scalar collect. Final per-doc agg moves ~1 row/doc.
    """
    from ..functions.text import index_range

    toks = F.col(tokens_col)
    tri_arr = F.transform(
        index_range(F.size(toks) - 2),
        lambda i: F.struct(
            F.element_at(toks, i).alias("a"),
            F.element_at(toks, i + 1).alias("b"),
            F.element_at(toks, i + 2).alias("c"),
        ),
    )
    pair_arr = F.transform(
        index_range(F.size(toks) - 1),
        lambda i: F.struct(
            F.element_at(toks, i).alias("a"),
            F.element_at(toks, i + 1).alias("b"),
        ),
    )
    ref = df.filter(is_reference)
    tri = (
        ref.select(F.explode(tri_arr).alias("g"))
        .select("g.a", "g.b", "g.c")
        .groupBy("a", "b", "c")
        .agg(F.count(F.lit(1)).alias("nt"))
    )
    big = (
        ref.select(F.explode(pair_arr).alias("p"))
        .select("p.a", "p.b")
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("np"))
    )
    uni = (
        ref.select(F.explode(toks).alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("nu"))
    )
    totals = uni.agg(
        F.sum("nu").alias("n"), F.count(F.lit(1)).alias("v")
    ).collect()[0]
    n_total, v = int(totals.n), int(totals.v)
    k = float(smoothing)
    a2 = alpha * alpha
    scored = (
        df.filter(~is_reference)
        .select(F.col(id_col).alias("id"), F.explode(tri_arr).alias("g"))
        .select("id", "g.a", "g.b", "g.c")
    )
    nt = F.coalesce(F.col("nt"), F.lit(0))
    n_bc = F.coalesce(F.col("n_bc"), F.lit(0))
    score = (
        F.when(nt > 0, F.col("nt") / F.col("n_ab"))
        .when(n_bc > 0, F.lit(alpha) * F.col("n_bc") / F.col("n_b"))
        .otherwise(
            F.lit(a2)
            * (F.coalesce(F.col("n_c"), F.lit(0)) + F.lit(k))
            / F.lit(n_total + k * v)
        )
    )
    return (
        scored.join(tri, on=["a", "b", "c"], how="left")
        .join(
            big.select(
                F.col("a"), F.col("b"), F.col("np").alias("n_ab")
            ),
            on=["a", "b"],
            how="left",
        )
        .join(
            big.select(
                F.col("a").alias("b"), F.col("b").alias("c"),
                F.col("np").alias("n_bc"),
            ),
            on=["b", "c"],
            how="left",
        )
        .join(
            F.broadcast(
                uni.select(F.col("t").alias("b"), F.col("nu").alias("n_b"))
            ),
            on="b",
            how="left",
        )
        .join(
            F.broadcast(
                uni.select(F.col("t").alias("c"), F.col("nu").alias("n_c"))
            ),
            on="c",
            how="left",
        )
        .select(
            "id",
            nt.alias("_nt"),
            n_bc.alias("_nbc"),
            (-F.ln(score)).alias("_nll"),
        )
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_trigrams"),
            F.count(F.when(F.col("_nt") > 0, 1)).alias("n_hit3"),
            F.count(
                F.when((F.col("_nt") == 0) & (F.col("_nbc") > 0), 1)
            ).alias("n_hit2"),
            F.round(F.avg("_nll"), decimals).alias("xent"),
        )
    )
