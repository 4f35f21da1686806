"""URL canonicalization and URL/domain-level deduplication.

The CommonCrawl-style curation step the rest of llm/curation.py was
missing: before any content-level dedup, a web corpus is deduplicated at
the URL level — the same page is fetched many times under trivially
different URLs (scheme/host case, default ports, www, tracking
parameters, fragments, trailing slashes, query-parameter order). The
reference has no web surface at all (SURVEY.md §2.2); this module is a
first-class training-pipeline addition.

Everything here is pure whole-stage-codegen column expressions —
regexp_extract/regexp_replace plus higher-order array functions — so
canonicalization is a scan-stage projection with NO shuffle, NO UDF, and
the dedup itself is one groupBy on the canonical string (at 100 TB:
one hash-partitioned shuffle on a short key; the canonical form is
computed map-side and never materializes the corpus twice).

Canonical form (a practical subset of RFC 3986 normalization):

1. strip the fragment (``#...`` never reaches the server);
2. lowercase the scheme and host (case-insensitive by spec) — the path
   and query stay case-sensitive;
3. drop a leading ``www.`` label;
4. drop the default port (``:80`` for http, ``:443`` for https);
5. strip trailing slashes from the path (empty path -> ``/``);
6. drop tracking query parameters (``utm_*``, ``gclid``, ``fbclid``,
   ``msclkid``, ``mc_cid``/``mc_eid``, ``ref``/``ref_src``) and sort the
   survivors byte-lexicographically, so parameter order is irrelevant.

Strings that don't look like absolute URLs (no ``scheme://``) pass
through unchanged — canonicalization never destroys a row.

Every rule is expressible in ANSI-ish SQL (the DuckDB oracles in
queries/curation.py rebuild the identical form), which keeps the gates
hash-checkable; the regexes stay inside the Java-regex/RE2 common
subset.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# anchored prefix match over one `key=value` parameter
TRACKING_PARAM_RE = (
    "^(utm_[a-z0-9]+|gclid|fbclid|msclkid|mc_cid|mc_eid|ref|ref_src)="
)

_SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOST_RE = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_REST_RE = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)"


def canonical_url(url: Column) -> Column:
    """Canonical form of an absolute URL (see module docstring); non-URL
    strings pass through unchanged."""
    u = F.regexp_replace(url, "#.*", "")
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    hostport = F.lower(F.regexp_extract(u, _HOST_RE, 1))
    host = F.regexp_replace(hostport, "^www\\.", "")
    host = (
        F.when(scheme == "http", F.regexp_replace(host, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(host, ":443$", ""))
        .otherwise(host)
    )
    rest = F.regexp_extract(u, _REST_RE, 1)
    path = F.regexp_replace(F.regexp_extract(rest, "^([^?]*)", 1), "/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(rest, "\\?(.*)$", 1)
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda x: (x != "") & ~x.rlike(TRACKING_PARAM_RE),
        )
    )
    qs = F.array_join(params, "&")
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qs == "", F.lit("")).otherwise(F.concat(F.lit("?"), qs)),
    )
    return F.when(scheme == "", url).otherwise(canon)


def url_domain(url: Column) -> Column:
    """Registered-host key for domain-level grouping: lowercased host
    with ``www.`` and any port stripped ('' for non-URL strings)."""
    hostport = F.lower(F.regexp_extract(url, _HOST_RE, 1))
    return F.regexp_replace(
        F.regexp_replace(hostport, "^www\\.", ""), ":[0-9]+$", ""
    )


def url_dedup(
    docs: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """URL-level dedup: one row per canonical URL with the smallest id as
    the deterministic keeper and the duplicate count.

    Returns (canon_url, keeper_id, n_dupes). One shuffle, keyed by the
    canonical string, with map-side combine — the canonicalization
    itself is a free scan-stage projection. At 100 TB this runs BEFORE
    any content hashing: it removes refetch duplicates for the cost of
    a count-distinct, not a text shuffle.
    """
    return (
        docs.select(
            canonical_url(F.col(url_col)).alias("canon_url"), F.col(id_col)
        )
        .groupBy("canon_url")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("n_dupes"),
        )
    )


def domain_stats(
    docs: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Domain-level rollup over canonicalized URLs: per domain, the page
    count, distinct canonical-URL count, and duplicate ratio — the
    signal used to cap over-crawled hosts ("no more than N pages per
    domain") and to spot mirror domains.

    Returns (domain, n_pages, n_urls, dup_ratio). Two-level aggregate:
    the inner groupBy(canon_url) reuses the dedup shuffle, the outer
    groupBy(domain) is |distinct urls| rows — tiny. pages_per_url is a
    single IEEE double division of two exact integers — correctly
    rounded by the standard, so bit-identical on any engine (decimal
    division would NOT be: engines disagree on result scale).
    """
    per_url = (
        docs.select(canonical_url(F.col(url_col)).alias("canon_url"))
        .groupBy("canon_url")
        .agg(F.count(F.lit(1)).alias("n_pages"))
    )
    return (
        per_url.groupBy(url_domain(F.col("canon_url")).alias("domain"))
        .agg(
            F.sum("n_pages").alias("n_pages"),
            F.count(F.lit(1)).alias("n_urls"),
        )
        .select(
            "domain",
            "n_pages",
            "n_urls",
            (F.col("n_pages").cast("double") / F.col("n_urls"))
            .alias("pages_per_url"),
        )
    )
