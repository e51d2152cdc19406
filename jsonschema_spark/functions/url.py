"""URL canonicalization for web-crawl corpora — the normalization step
every CC-style pipeline runs before URL-level dedup and per-domain caps
(RefinedWeb §3.2 keeps one document per canonical URL; domain caps bound
any single host's share of the mixture).

Everything is native Column expressions (regexp over the shared
Java/RE2-safe subset — no lookaround, no named classes — so the DuckDB
oracle runs the same patterns verbatim; the one higher-order function
operates on a per-URL query-param array of a few elements). Scale shape:
pure codegen projection, no shuffle, no Python.

Canonicalization rules (each is an independently defensible, widely used
normalization; the set is the contract):

- scheme and host lowercased (RFC 3986 §6.2.2.1 case normalization)
- default ports stripped (``:80`` for http, ``:443`` for https)
- leading ``www.`` stripped from the host (alias collapse for dedup)
- fragment dropped (never sent to the server)
- ``utm_*`` tracking parameters dropped from the query
- trailing ``/`` stripped from the path (``/a/`` == ``/a`` for dedup)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Java and RE2 agree on these. [^/?#] is the RFC 3986 authority/path
# delimiter class.
_SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOST_RE = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)"
_PATH_RE = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)"
_QUERY_RE = "\\?([^#]*)"


def url_scheme(url: Column) -> Column:
    return F.lower(F.regexp_extract(url, _SCHEME_RE, 1))


def url_host(url: Column) -> Column:
    """Lowercased host with default port and leading ``www.`` stripped."""
    hostport = F.lower(F.regexp_extract(url, _HOST_RE, 1))
    scheme = url_scheme(url)
    no_port = (
        F.when(
            (scheme == F.lit("http")),
            F.regexp_replace(hostport, ":80$", ""),
        )
        .when(
            (scheme == F.lit("https")),
            F.regexp_replace(hostport, ":443$", ""),
        )
        .otherwise(hostport)
    )
    return F.regexp_replace(no_port, "^www\\.", "")


def url_domain(url: Column) -> Column:
    """Registered domain: the last two dot-labels of the normalized host
    (the public-suffix list is a lookup table in a real deployment; the
    two-label rule is the deterministic stand-in both engines replay)."""
    return F.regexp_extract(url_host(url), "([^.]+\\.[^.]+)$", 1)


def url_normalize(url: Column) -> Column:
    """Canonical URL per the module rules. Deterministic, engine-portable,
    pure projection."""
    path = F.regexp_replace(
        F.regexp_extract(url, _PATH_RE, 1), "/+$", ""
    )
    query = F.regexp_extract(url, _QUERY_RE, 1)
    kept = F.array_join(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.startswith("utm_"),
        ),
        "&",
    )
    return F.concat(
        url_scheme(url),
        F.lit("://"),
        url_host(url),
        path,
        F.when(kept != "", F.concat(F.lit("?"), kept)).otherwise(F.lit("")),
    )


def synth_url(doc_id: Column) -> Column:
    """Deterministic messy URL keyed by doc_id — the closed-form synthesis
    contract (same discipline as multimodal.make_bmp). The
    canonical-affecting parts depend only on ``m = doc_id % 120`` (scheme
    http iff m%8==0, host site{m%10}.{com|org by m%2}, path /p/{m%4},
    base query ``id={m%4}`` iff m%3==0), so exactly 120 canonical URLs
    exist and collisions are guaranteed at test scale. The
    normalization-invariant MESS depends on the raw doc_id: WWW prefix
    (%3==0), host case (%10==0 -> uppercase), explicit default port
    (%11==0), trailing slash (%5==0), utm_* params prepended/appended
    (%6 in {0, 3}), fragment (%9==0) — two docs with equal m but
    different decorations must canonicalize identically. The DuckDB
    oracle rebuilds the same string from doc_id, so normalization is
    verified end-to-end without any URL column in the test data."""
    d = doc_id
    m = d % 120
    scheme = F.when(m % 8 == 0, F.lit("http")).otherwise(F.lit("https"))
    host = F.concat(
        F.when(d % 3 == 0, F.lit("WWW.")).otherwise(F.lit("")),
        F.lit("site"),
        (m % 10).cast("string"),
        F.when(m % 2 == 0, F.lit(".com")).otherwise(F.lit(".org")),
    )
    host = F.when(d % 10 == 0, F.upper(host)).otherwise(F.lower(host))
    port = F.when(
        d % 11 == 0,
        F.when(m % 8 == 0, F.lit(":80")).otherwise(F.lit(":443")),
    ).otherwise(F.lit(""))
    path = F.concat(
        F.lit("/p/"),
        (m % 4).cast("string"),
        F.when(d % 5 == 0, F.lit("/")).otherwise(F.lit("")),
    )
    params = F.filter(
        F.array(
            F.when(d % 6 == 0, F.lit("utm_source=feed")).otherwise(F.lit("")),
            F.when(
                m % 3 == 0, F.concat(F.lit("id="), (m % 4).cast("string"))
            ).otherwise(F.lit("")),
            F.when(d % 6 == 3, F.lit("utm_medium=email")).otherwise(F.lit("")),
        ),
        lambda p: p != "",
    )
    query = F.when(
        F.size(params) > 0, F.concat(F.lit("?"), F.array_join(params, "&"))
    ).otherwise(F.lit(""))
    frag = F.when(d % 9 == 0, F.lit("#sec")).otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), host, port, path, query, frag)
