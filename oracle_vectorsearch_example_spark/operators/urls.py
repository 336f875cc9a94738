"""URL canonicalization + URL/domain-level dedup (X48, training-pipeline
extension surface) — the CommonCrawl pre-step every public pipeline runs
BEFORE text dedup (CCNet, C4, RefinedWeb all dedup by URL first): the
same page is crawled under trivially-different URLs (scheme/host case,
default ports, trailing slashes, tracking params, fragments), and
collapsing those is orders of magnitude cheaper than letting MinHash
discover the duplicates from page text.

Frozen canonicalization spec — PURE column expressions, so DuckDB
replays the string surgery verbatim for hash goldens:

1. trim whitespace; strip the fragment (everything from the first '#');
2. scheme and host lowercase; a URL without a ``scheme://`` is not an
   absolute URL and canonicalizes to NULL (quarantine, don't guess);
3. default ports drop (':80' for http, ':443' for https);
4. path: trailing '/'-runs strip ("/a/b/" → "/a/b"); an empty path
   becomes "/" (so "http://x.com" == "http://x.com/");
5. query: split on '&', drop empty params and tracking params (param
   lowercased starts with 'utm_'), sort the surviving 'k=v' strings
   lexicographically, re-join; an emptied query drops its '?'.

Scale posture: canonicalization is map-side codegen (regexp + array
lambdas, no UDF, no shuffle). ``url_dedup`` adds ONE group-by on the
canonical URL (keep-first = min id, the exact-dedup discipline);
``domain_stats`` is one group-by on the host. Payloads never shuffle —
dedup joins survivors back semi-join-style on the id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "canonical_url",
    "domain_stats",
    "surt_key",
    "url_dedup",
    "url_domain",
]

_SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"
_AUTH_RE = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_REST_RE = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"


def canonical_url(url: Column | str) -> Column:
    """The frozen canonical form of an absolute http(s)-style URL (see
    module docstring), or NULL when the string has no ``scheme://``."""
    u = F.trim(F.col(url) if isinstance(url, str) else url)
    u = F.regexp_replace(u, "#.*", "")  # fragment never reaches a server
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    auth = F.lower(F.regexp_extract(u, _AUTH_RE, 1))
    # default-port stripping via anchored regexp on the lowercased authority
    host = F.when(scheme == "http", F.regexp_replace(auth, ":80$", "")).otherwise(
        F.when(scheme == "https", F.regexp_replace(auth, ":443$", "")).otherwise(auth)
    )
    rest = F.regexp_replace(u, _REST_RE, "")
    path = F.regexp_extract(rest, "^([^?]*)", 1)
    p1 = F.regexp_replace(path, "/+$", "")
    path_n = F.when(p1 == "", F.lit("/")).otherwise(p1)
    query = F.regexp_extract(rest, "\\?(.*)$", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda x: (x != "") & ~F.lower(x).startswith("utm_"),
    )
    qs = F.array_join(F.array_sort(params), "&")
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        path_n,
        F.when(qs == "", F.lit("")).otherwise(F.concat(F.lit("?"), qs)),
    )
    return F.when(scheme == "", F.lit(None).cast("string")).otherwise(canon)


def surt_key(url: Column | str) -> Column:
    """The SURT-form index key of an absolute URL — the CDX ``urlkey``
    convention (Sort-friendly URI Reordering Transform, the public
    Common Crawl / Wayback index layout): canonicalize
    (:func:`canonical_url`), drop the scheme, reverse the host on dots
    comma-joined with a leading ``www.`` label stripped, then ``)`` +
    path[?query] — ``https://www.example.org/a?b=1`` →
    ``org,example)/a?b=1``. Reversed hosts make one SORT co-locate
    every capture under a domain (and its subdomains as a prefix
    range), which is what lets a 100 TB index answer "all of
    example.org" with a partition-prunable range scan instead of a
    full pass. NULL when the URL does not canonicalize. Pure column
    expressions — map-side codegen, no UDF, DuckDB-replayable."""
    canon = canonical_url(url)
    auth = F.regexp_extract(canon, _AUTH_RE, 1)
    host = F.regexp_replace(auth, "^www\\.", "")
    rev = F.array_join(F.reverse(F.split(host, "\\.")), ",")
    rest = F.regexp_replace(canon, _REST_RE, "")
    return F.when(
        canon.isNull(), F.lit(None).cast("string")
    ).otherwise(F.concat(rev, F.lit(")"), rest))


def url_domain(url: Column | str) -> Column:
    """The lowercased host (port stripped) of an absolute URL, or NULL —
    the domain key for per-domain stats and domain-level policies."""
    u = F.trim(F.col(url) if isinstance(url, str) else url)
    auth = F.lower(F.regexp_extract(u, _AUTH_RE, 1))
    host = F.regexp_replace(auth, ":[0-9]+$", "")
    return F.when(host == "", F.lit(None).cast("string")).otherwise(host)


def url_dedup(
    docs: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    out_col: str = "canonical_url",
) -> DataFrame:
    """Keep-first URL dedup: one surviving row (min id — deterministic)
    per canonical URL, with the canonical form appended as ``out_col``.
    Rows whose URL does not canonicalize (NULL) pass through untouched —
    quarantine decisions belong to the caller, and dropping them here
    would silently lose non-web documents. Payloads never shuffle: the
    winner set is a skinny (canon, id) frame semi-joined back."""
    if out_col in docs.columns:
        raise ValueError(
            f"out_col {out_col!r} already exists in docs; "
            "rename it or pass a different out_col"
        )
    canon = docs.select(F.col(id_col), canonical_url(url_col).alias(out_col))
    winners = (
        canon.filter(F.col(out_col).isNotNull())
        .groupBy(out_col)
        .agg(F.min(id_col).alias(id_col))
        .select(id_col, F.col(out_col))
    )
    # one keep frame carrying the canon → docs join ONCE on the id
    # (a semi join + a second left join would shuffle the payload twice);
    # unionByName so a future column reorder in either select is a loud
    # error instead of a silent mis-join
    keep = winners.unionByName(canon.filter(F.col(out_col).isNull()))
    return docs.join(keep, id_col, "inner")


def domain_stats(
    docs: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """(domain, n_docs, n_canonical_urls) — the per-domain profile that
    feeds domain block/allow policies and crawl-skew diagnostics. One
    group-by over skinny (domain, canon) rows."""
    keyed = docs.select(
        url_domain(url_col).alias("domain"),
        canonical_url(url_col).alias("__canon"),
    ).filter(F.col("domain").isNotNull())
    return keyed.groupBy("domain").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.countDistinct("__canon").cast("long").alias("n_canonical_urls"),
    )
