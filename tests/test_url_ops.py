"""URL canonicalization (functions/url.py) — rule-by-rule pins plus the
synthesis contract the DuckDB oracle replays."""

from pyspark.sql import functions as F

from jsonschema_spark.functions.url import (
    synth_url,
    url_domain,
    url_host,
    url_normalize,
    url_scheme,
)


def _norm_one(spark, url: str) -> str:
    return (
        spark.range(1)
        .select(url_normalize(F.lit(url)).alias("u"))
        .collect()[0]
        .u
    )


def test_normalization_rules(spark):
    cases = {
        # case-folds scheme and host, path case preserved
        "HTTPS://ExAmPlE.CoM/Path": "https://example.com/Path",
        # default ports stripped, non-default kept
        "http://a.com:80/x": "http://a.com/x",
        "https://a.com:443/x": "https://a.com/x",
        "https://a.com:8443/x": "https://a.com:8443/x",
        # www stripped
        "https://www.a.com/x": "https://a.com/x",
        # fragment dropped
        "https://a.com/x#frag": "https://a.com/x",
        # utm params dropped, others kept in order
        "https://a.com/x?utm_source=s&id=1&utm_medium=m&b=2": (
            "https://a.com/x?id=1&b=2"
        ),
        # all-utm query drops the '?' entirely
        "https://a.com/x?utm_source=s": "https://a.com/x",
        # trailing slash(es) stripped
        "https://a.com/x/": "https://a.com/x",
        "https://a.com/": "https://a.com",
    }
    for raw, want in cases.items():
        assert _norm_one(spark, raw) == want, raw


def test_normalize_idempotent(spark):
    df = spark.range(300).select(
        synth_url(F.col("id")).alias("raw")
    ).select(
        url_normalize(F.col("raw")).alias("once")
    ).select(
        "once", url_normalize(F.col("once")).alias("twice")
    )
    assert df.filter(F.col("once") != F.col("twice")).count() == 0


def test_synth_decorations_do_not_change_canonical(spark):
    """Docs with equal m = doc_id % 120 must canonicalize identically no
    matter which mess decorations their raw doc_id residues picked."""
    df = (
        spark.range(480)
        .select(
            (F.col("id") % 120).alias("m"),
            url_normalize(synth_url(F.col("id"))).alias("canon"),
        )
        .groupBy("m")
        .agg(F.count_distinct("canon").alias("n"))
    )
    assert df.filter(F.col("n") != 1).count() == 0


def test_host_domain_scheme(spark):
    row = (
        spark.range(1)
        .select(
            url_scheme(F.lit("HTTP://WWW.Sub.Site9.ORG:80/a?x=1")).alias("s"),
            url_host(F.lit("HTTP://WWW.Sub.Site9.ORG:80/a?x=1")).alias("h"),
            url_domain(F.lit("HTTP://WWW.Sub.Site9.ORG:80/a?x=1")).alias("d"),
        )
        .collect()[0]
    )
    assert row.s == "http"
    assert row.h == "sub.site9.org"
    assert row.d == "site9.org"


def test_domain_cap_bound(spark):
    from jsonschema_spark.operators.sampling import cap_per_group

    df = spark.range(400).select(
        F.col("id").alias("doc_id"),
        url_domain(synth_url(F.col("id"))).alias("domain"),
    )
    kept = cap_per_group(df, "domain", k=3, order_col="doc_id")
    per = kept.groupBy("domain").count().collect()
    assert all(r["count"] <= 3 for r in per)
    # keep-first determinism: kept ids are the 3 smallest per domain
    first = kept.groupBy("domain").agg(F.min("doc_id").alias("lo")).collect()
    lows = df.groupBy("domain").agg(F.min("doc_id").alias("lo")).collect()
    assert {(r.domain, r.lo) for r in first} == {(r.domain, r.lo) for r in lows}
