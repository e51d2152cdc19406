"""Line-level corpus cleaning: boilerplate detection and removal (the
C4/CCNet-style pipeline stage — lines that repeat across many documents
are navigation chrome, license footers, cookie banners; they carry no
training signal and distort n-gram statistics). New semantics per the
north rule: the reference validates one document at a time
(/root/reference/validate.go) and has no cross-document frequency notion;
SURVEY.md §2.3 extends validation to table scale, and "line appears in
>= N documents" is exactly a table-scope frequency constraint.

Scale shapes (design target 10^12 docs):

- ``line_doc_frequency``: split -> explode (no shuffle) -> distinct on
  (doc, line) -> count per line. The distinct's key is the (doc, line)
  pair — uniform by construction, no hot key — and the per-line count is
  a map-side-combined agg, so a boilerplate line in 10^10 docs costs its
  row count streamed through combiners, never one giant reducer group.
- ``strip_boilerplate``: the boilerplate table (lines above the
  threshold) is tiny relative to the corpus — the join against it is a
  broadcast (AQE picks it up; an explicit hint would pin it) left-anti
  on the exploded lines, and the per-document rebuild is one groupBy
  with a sorted collect_list bounded by document size. The line split is
  recomputed on the probe side rather than cached: caching doc x lines
  rows at 10^12 scale costs more than re-running a split over the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def doc_lines(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, pos, line): one row per (document, line position)."""
    return df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    )


def line_doc_frequency(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(line, n_docs): number of DISTINCT documents each line occurs in
    (a line repeated within one document counts once)."""
    return (
        doc_lines(df, id_col, text_col)
        .select("id", "line")
        .distinct()
        .groupBy("line")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def boilerplate_lines(
    df: DataFrame, id_col: str, text_col: str, min_docs: int
) -> DataFrame:
    """(line, n_docs): lines occurring in >= ``min_docs`` distinct
    documents — the boilerplate set."""
    return line_doc_frequency(df, id_col, text_col).filter(
        F.col("n_docs") >= min_docs
    )


def strip_boilerplate(
    df: DataFrame, id_col: str, text_col: str, min_docs: int
) -> DataFrame:
    """(id, n_kept, text_clean): every document with its boilerplate lines
    removed (order of surviving lines preserved). Documents whose every
    line was boilerplate survive with ``n_kept = 0`` and empty text —
    dropping them is the caller's policy decision, not the operator's."""
    bp = boilerplate_lines(df, id_col, text_col, min_docs).select("line")
    kept = doc_lines(df, id_col, text_col).join(
        F.broadcast(bp), on="line", how="left_anti"
    )
    rebuilt = kept.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
        ).alias("text_clean"),
    )
    ids = df.select(F.col(id_col).alias("id"))
    return (
        ids.join(rebuilt, on="id", how="left")
        .select(
            "id",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.coalesce("text_clean", F.lit("")).alias("text_clean"),
        )
    )


def c4_clean(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_words_per_line: int = 5,
    min_kept_lines: int = 3,
) -> DataFrame:
    """C4 cleaning rules (Raffel et al. 2020 §2.2 — the public line/page
    heuristics the original C4 corpus was built with, reused by mC4, Pile-
    CC derivatives, Dolma): per document, keep only lines that (a) end in
    a terminal punctuation mark (``. ! ? "``), (b) contain at least
    ``min_words_per_line`` words, and (c) do not mention "javascript";
    flag pages containing "lorem ipsum" or a curly brace (code/placeholder
    page signals). ``passes`` = at least ``min_kept_lines`` surviving
    lines and neither page flag — C4 drops failing pages; reported as a
    verdict row so that policy stays with the caller (same philosophy as
    :func:`gopher_quality`).

    Returns ``(id, n_lines, n_kept, has_lorem, has_brace, text_clean,
    passes)`` with ``text_clean`` the surviving lines joined by newline in
    original order.

    Scale shape: pure let-bound scan-stage expressions — the line split is
    bound once (CLAUDE.md rule #2: HOFs get no CSE) and the kept-line
    array once; no shuffle, no UDF, no state. 10^12 docs cost one codegen
    projection, and unlike :func:`strip_boilerplate` there is no
    cross-document frequency table, so this composes with it in the same
    stage.
    """
    from jsonschema_spark.functions.text import let_, words

    text = F.col(text_col)

    def _keep(line: Column) -> Column:
        return (
            F.rtrim(line).rlike('[.!?"]$')
            & (F.size(words(F.lower(line))) >= min_words_per_line)
            & ~F.lower(line).contains("javascript")
        )

    def _out(lines: Column) -> Column:
        return let_(
            F.filter(lines, _keep),
            lambda kept: F.struct(
                F.size(lines).alias("n_lines"),
                F.size(kept).alias("n_kept"),
                F.concat_ws("\n", kept).alias("text_clean"),
            ),
        )

    o = let_(F.split(text, "\n"), _out)
    return (
        df.select(
            F.col(id_col).alias("id"),
            o["n_lines"].alias("n_lines"),
            o["n_kept"].alias("n_kept"),
            F.lower(text).contains("lorem ipsum").alias("has_lorem"),
            text.contains("{").alias("has_brace"),
            o["text_clean"].alias("text_clean"),
        )
        .withColumn(
            "passes",
            (F.col("n_kept") >= min_kept_lines)
            & ~F.col("has_lorem")
            & ~F.col("has_brace"),
        )
    )


def gopher_quality(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    min_alpha_ratio: float = 0.8,
    max_top2gram_frac: float = 0.2,
    max_dup3gram_frac: float = 0.3,
) -> DataFrame:
    """Gopher-style document quality rule bundle (Rae et al. 2021 §A1.1,
    the public heuristics every large-scale text pipeline reuses —
    MassiveText, RefinedWeb, Dolma): per document, the five filter
    signals and a single ``passes`` verdict. Reported per-signal rather
    than filtered so downstream policy (drop vs down-weight vs audit)
    stays with the caller — the same verdict-row philosophy as the
    schema validators (SURVEY.md §2.3; the reference emits per-document
    accept/reject the same way, /root/reference/validate.go).

    Signals: word count in [min_words, max_words]; mean word length in
    [min_mean_word_len, max_mean_word_len]; fraction of words containing
    an alphabetic character >= min_alpha_ratio; top-2-gram fraction <=
    max_top2gram_frac; duplicate-3-gram fraction <= max_dup3gram_frac.

    Scale shape: pure let-bound expressions in the scan stage — no
    shuffle, no UDF, no state; 10^12 docs cost one codegen projection.
    """
    from jsonschema_spark.functions.text import (
        let_,
        repetition_ratio,
        top_ngram_fraction,
        words,
    )

    text = F.col(text_col)

    def _metrics(ws):
        n = F.size(ws)
        mean_len = F.when(n == 0, F.lit(0.0)).otherwise(
            F.aggregate(
                ws, F.lit(0).cast("long"),
                lambda a, w: a + F.length(w),
            ).cast("double")
            / n
        )
        alpha = F.when(n == 0, F.lit(0.0)).otherwise(
            F.size(F.filter(ws, lambda w: w.rlike("[a-z]"))).cast("double") / n
        )
        return F.struct(
            n.alias("n_words"),
            F.round(mean_len, 6).alias("mean_word_len"),
            F.round(alpha, 6).alias("alpha_ratio"),
        )

    m = let_(words(F.lower(text)), _metrics)
    return df.select(
        F.col(id_col),
        m["n_words"].alias("n_words"),
        m["mean_word_len"].alias("mean_word_len"),
        m["alpha_ratio"].alias("alpha_ratio"),
        F.round(top_ngram_fraction(text, 2), 6).alias("top2gram_frac"),
        F.round(repetition_ratio(text, 3), 6).alias("dup3gram_frac"),
    ).withColumn(
        "passes",
        (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words)
        & (F.col("mean_word_len") >= min_mean_word_len)
        & (F.col("mean_word_len") <= max_mean_word_len)
        & (F.col("alpha_ratio") >= min_alpha_ratio)
        & (F.col("top2gram_frac") <= max_top2gram_frac)
        & (F.col("dup3gram_frac") <= max_dup3gram_frac),
    )


# Default PII redaction table: (pattern, typed placeholder). Patterns are
# literal-range regexes valid in both Java regex and RE2 so the DuckDB
# oracle runs the identical strings; placeholders contain no digits or '@'
# so one replacement can never create a later pattern's match (no cascade).
PII_REDACTIONS = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"[0-9]{3}-[0-9]{2}-[0-9]{4}", "<SSN>"),
    (r"[0-9]{9,}", "<NUM>"),
)


def pii_redact(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    redactions=PII_REDACTIONS,
) -> DataFrame:
    """``(id, text_redacted, n_redacted)``: span-level PII removal — the
    rewrite stage that follows ``pii_scan``'s detection pass (a corpus you
    can't redact you can't ship). Each pattern is replaced globally with
    its typed placeholder, applied in table order; ``n_redacted`` counts
    matches on the ORIGINAL text so the number is independent of
    replacement order.

    Scale shape: a chain of native regexp_replace/regexp_count expressions
    in one scan-stage projection — zero shuffle, zero Python; the rewrite
    streams at parquet-decode speed like c4_clean.
    """
    text = F.col(text_col)
    redacted = text
    for pat, placeholder in redactions:
        redacted = F.regexp_replace(redacted, pat, placeholder)
    n = None
    for pat, _ in redactions:
        c = F.regexp_count(text, F.lit(pat))
        n = c if n is None else n + c
    return df.select(
        F.col(id_col),
        redacted.alias("text_redacted"),
        n.cast("int").alias("n_redacted"),
    )
