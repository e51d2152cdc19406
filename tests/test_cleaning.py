"""Unit proofs for line-level boilerplate cleaning and the rare-token-rate
quality signal: closed-form doc frequencies on the injected line corpus,
hand-checkable strip semantics (order, intra-doc repeats, all-boilerplate
docs), and an independent pandas recomputation of rare rates over the
Zipf-skewed token corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

from jsonschema_spark.operators.cleaning import (
    boilerplate_lines,
    line_doc_frequency,
    strip_boilerplate,
)
from jsonschema_spark.operators.stats import rare_token_rate
from jsonschema_spark.sources.corpus import (
    BOILERPLATE_LINES,
    expected_boilerplate_doc_counts,
    line_corpus,
    zipf_token_corpus,
)


def test_line_corpus_closed_form_doc_frequencies(spark):
    n = 600
    df = line_corpus(spark, n, seed=7)
    assert df.count() == n
    freq = {
        r["line"]: r["n_docs"]
        for r in boilerplate_lines(df, "doc_id", "text", min_docs=50).collect()
    }
    assert freq == expected_boilerplate_doc_counts(n)


def test_line_doc_frequency_counts_doc_once(spark):
    df = spark.createDataFrame(
        [(1, "a\nb\na"), (2, "b\nc")], "doc_id long, text string"
    )
    freq = {
        r["line"]: r["n_docs"]
        for r in line_doc_frequency(df, "doc_id", "text").collect()
    }
    assert freq == {"a": 1, "b": 2, "c": 1}


def test_strip_removes_every_occurrence_within_a_doc(spark):
    # BP occurs in docs 1,2,3 (>= min_docs=3) and is stripped everywhere,
    # including both positions inside doc 1; x/y/z are below threshold and
    # survive in original order; doc 3 becomes empty but is NOT dropped
    df = spark.createDataFrame(
        [(1, "x\nBP\ny\nBP"), (2, "BP\nz"), (3, "BP")],
        "doc_id long, text string",
    )
    out = {
        r["id"]: (r["n_kept"], r["text_clean"])
        for r in strip_boilerplate(df, "doc_id", "text", min_docs=3).collect()
    }
    assert out == {1: (2, "x\ny"), 2: (1, "z"), 3: (0, "")}


def test_strip_on_line_corpus_drops_exactly_the_injected_lines(spark):
    n = 300
    df = line_corpus(spark, n, seed=7)
    out = strip_boilerplate(df, "doc_id", "text", min_docs=30)
    assert out.count() == n
    # every doc keeps exactly its 4 unique content lines
    assert out.filter(F.col("n_kept") != 4).count() == 0
    assert (
        out.filter(
            F.col("text_clean").contains(BOILERPLATE_LINES[0])
            | F.col("text_clean").contains(BOILERPLATE_LINES[1])
            | F.col("text_clean").contains(BOILERPLATE_LINES[2])
        ).count()
        == 0
    )


def test_rare_token_rate_handcheck(spark):
    df = spark.createDataFrame(
        [
            (1, [10, 10, 10, 99]),
            (2, [10, 10, 99, 98]),
            (3, [10]),
            (4, []),
        ],
        "doc_id long, tokens array<int>",
    )
    # frequencies: 10 -> 6, 99 -> 2, 98 -> 1; min_count=3 => 99 and 98 rare
    out = {
        r["id"]: (r["n_tok"], r["n_rare"], r["rare_rate"])
        for r in rare_token_rate(df, "doc_id", "tokens", min_count=3).collect()
    }
    assert out[1] == (4, 1, 0.25)
    assert out[2] == (4, 2, 0.5)
    assert out[3] == (1, 0, 0.0)
    assert out[4] == (0, 0, None)


def test_rare_token_rate_matches_pandas_recompute(spark):
    df = zipf_token_corpus(spark, 400, seed=11, vocab=1000)
    got = {
        r["id"]: (r["n_tok"], r["n_rare"])
        for r in rare_token_rate(df, "doc_id", "tokens", min_count=5).collect()
    }
    pdf = df.toPandas()
    from collections import Counter

    freq = Counter(t for toks in pdf["tokens"] for t in toks)
    rare = {t for t, c in freq.items() if c < 5}
    assert len(rare) > 0  # the Zipf tail actually produces rare tokens
    for _, row in pdf.iterrows():
        toks = list(row["tokens"])
        expect = (len(toks), sum(1 for t in toks if t in rare))
        assert got[row["doc_id"]] == expect


def test_zipf_corpus_deterministic_across_partitionings(spark):
    a = zipf_token_corpus(spark, 200, seed=11).orderBy("doc_id").collect()
    b = (
        zipf_token_corpus(spark, 200, seed=11)
        .repartition(7)
        .orderBy("doc_id")
        .collect()
    )
    assert [r["tokens"] for r in a] == [r["tokens"] for r in b]


def test_c4_clean_line_rules(spark):
    """Each C4 line rule in isolation, plus page flags and the verdict."""
    from jsonschema_spark.operators.cleaning import c4_clean

    good = "alpha beta gamma delta epsilon."
    docs = [
        # every rule satisfied on 3 lines -> passes
        (1, "\n".join([good, "one two three four five!", 'quoted line with five words"'])),
        # line-level failures: no punct / <5 words / javascript
        (2, "\n".join(["no terminal punctuation here", "short line.", "please enable javascript to proceed."])),
        # page flags kill the verdict even with 3 good lines
        (3, "\n".join([good, good, good, "lorem ipsum dolor sit amet."])),
        (4, "\n".join([good, good, good, "code { sample } text."])),
        # only 2 surviving lines -> fails the min_kept_lines gate
        (5, "\n".join([good, good, "nope"])),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r.id: r for r in c4_clean(df, "doc_id", "text").collect()}

    assert out[1].n_kept == 3 and out[1].passes
    assert out[1].text_clean == docs[0][1]
    assert out[2].n_kept == 0 and not out[2].passes
    assert out[3].has_lorem and not out[3].passes and out[3].n_kept == 4
    assert out[4].has_brace and not out[4].passes
    assert out[5].n_kept == 2 and not out[5].passes


def test_pii_redact_spans_and_counts(spark):
    from jsonschema_spark.operators.cleaning import pii_redact

    df = spark.createDataFrame(
        [
            (1, "mail bob@x.com or 123-45-6789 now 123456789012"),
            (2, "clean prose with short digits 12345"),
            (3, "two mails a@b.io c@d.net"),
        ],
        "doc_id: long, text: string",
    )
    rows = {r["doc_id"]: r for r in pii_redact(df).collect()}
    assert rows[1]["text_redacted"] == "mail <EMAIL> or <SSN> now <NUM>"
    assert rows[1]["n_redacted"] == 3
    assert rows[2]["text_redacted"].endswith("12345") and rows[2]["n_redacted"] == 0
    assert rows[3]["text_redacted"] == "two mails <EMAIL> <EMAIL>"
    assert rows[3]["n_redacted"] == 2
