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
