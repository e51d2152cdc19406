"""Vocabulary maintenance over pre-tokenized corpora: min-count pruning
with a deterministic dense re-id, applied scan-stage to the token arrays.

The standard shrink step before training a smaller model or after merging
corpora with divergent tokenizer tails: ids below a frequency floor
collapse to one OOV id, survivors re-number densely by frequency rank so
the embedding table has no holes.

Scale shapes:
- building the remap is one explode → map-side-combined count per token id
  (shuffle keyed by uniform ids, volume ≤ |vocab| after combine) plus a
  rank window over ≤ |vocab| rows — corpus size never reaches the window;
- applying it is a scan-stage ``transform`` over a map LITERAL, kept
  honest by ``max_map`` (default 100k entries; a plan does not want more —
  raise the guard consciously or join on the exploded form for
  million-entry vocabularies). Zero Python either way.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# A map literal beyond this many entries bloats every task binary and
# stops being the fast path; the explode + broadcast-join + re-aggregate
# form is the right shape past it.
REMAP_LITERAL_MAX = 100_000


def vocab_remap_table(
    df: DataFrame,
    tokens_col: str = "tokens",
    min_count: int = 2,
) -> DataFrame:
    """``(tok, freq, new_id)`` for every token id with corpus frequency ≥
    ``min_count``; ``new_id`` is the dense 1-based frequency rank (ties
    break on token id, so the table is a pure function of the corpus —
    identical on any cluster and in the DuckDB oracle)."""
    counts = (
        df.select(F.explode(tokens_col).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.col("freq") >= min_count)
    )
    w = Window.orderBy(F.col("freq").desc(), F.col("tok").asc())
    return counts.withColumn("new_id", F.row_number().over(w))


def prune_vocab(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    min_count: int = 2,
    oov_id: int = 0,
    max_map: int = REMAP_LITERAL_MAX,
) -> DataFrame:
    """``(id, tokens, n_oov)``: every token id remapped through the
    min-count table (survivors → dense rank, casualties → ``oov_id``),
    order and length preserved.

    The remap table is collected to the driver (guarded by ``max_map`` —
    same contract as referential.py's domain guard: a misconfigured floor
    can never OOM the driver) and compiled into a map literal probed
    inside ``transform`` — the whole apply pass is one scan-stage
    projection, no join, no shuffle of the corpus.
    """
    head = vocab_remap_table(df, tokens_col, min_count).limit(max_map + 1).collect()
    if len(head) > max_map:
        raise ValueError(
            f"remap table exceeds {max_map} entries; raise max_map "
            "consciously or apply via explode + broadcast join instead"
        )
    if head:
        mapping = F.create_map(
            *[F.lit(x) for r in head for x in (r["tok"], r["new_id"])]
        )

        def _lookup(t: Column) -> Column:
            return F.element_at(mapping, t.cast("int"))

    else:

        def _lookup(t: Column) -> Column:
            return F.lit(None).cast("int")

    toks = F.col(tokens_col)
    # two single-pass HOFs (each expression evaluated once); n_oov counts
    # PRUNED originals, so it stays correct even if oov_id collides with a
    # surviving new_id
    remapped = F.transform(toks, lambda t: F.coalesce(_lookup(t), F.lit(int(oov_id))))
    n_oov = F.size(F.filter(toks, lambda t: _lookup(t).isNull()))
    return df.select(
        F.col(id_col), remapped.alias(tokens_col), n_oov.alias("n_oov")
    )


def prune_vocab_join(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    min_count: int = 2,
    oov_id: int = 0,
) -> DataFrame:
    """The large-vocabulary form of ``prune_vocab`` (same output contract,
    bit-identical results — pinned by test): instead of a driver-collected
    map literal, the remap table stays distributed and the apply pass is
    posexplode → join on the uniform token id → per-doc rebuild.

    Use when the surviving vocabulary exceeds ``REMAP_LITERAL_MAX`` (BPE
    merges at 10^6-10^7 ids): nothing is ever collected to the driver.
    Costs two shuffles of the corpus (explode join + rebuild groupBy) that
    the literal form avoids — which is exactly why the literal form is the
    default below the size gate. The rebuild's collect_list is bounded by
    a single document's length (the same per-group contract as
    strip_boilerplate's rebuild), and AQE broadcasts the remap side
    whenever it actually fits.
    """
    remap = vocab_remap_table(df, tokens_col, min_count).select("tok", "new_id")
    exploded = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode_outer(F.col(tokens_col)).alias("_pos", "tok"),
    )
    joined = exploded.join(remap, on="tok", how="left")
    rebuilt = joined.groupBy("_id").agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.when(
                        F.col("_pos").isNotNull(),
                        F.struct(
                            F.col("_pos").alias("p"),
                            F.coalesce(
                                F.col("new_id"), F.lit(int(oov_id))
                            ).alias("t"),
                        ),
                    )
                )
            ),
            lambda s: s.getField("t"),
        ).alias(tokens_col),
        F.sum(
            (F.col("_pos").isNotNull() & F.col("new_id").isNull()).cast("int")
        ).alias("n_oov"),
    )
    return rebuilt.select(
        F.col("_id").alias(id_col),
        F.col(tokens_col).cast("array<int>"),
        F.col("n_oov").cast("int"),
    )
