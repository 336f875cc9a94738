"""X48 URL canonicalization + URL-level dedup: hand-checked canonical
forms, NULL quarantine, keep-first dedup, domain stats, composition
with the text-dedup pipeline (URL dedup first — the CommonCrawl
ordering), plan hygiene."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oracle_vectorsearch_example_spark.operators.urls import (
    canonical_url,
    domain_stats,
    url_dedup,
    url_domain,
)

CASES = [
    # (input, canonical, domain)
    ("HTTP://WWW.Example.COM:80/Docs/A/?utm_source=f&b=2&a=1#frag",
     "http://www.example.com/Docs/A?a=1&b=2", "www.example.com"),
    ("https://Example.com:443/x", "https://example.com/x", "example.com"),
    ("http://example.com/x///", "http://example.com/x", "example.com"),
    ("http://example.com:8080/p?z=1&y=2&utm_campaign=x",
     "http://example.com:8080/p?y=2&z=1", "example.com"),
    ("  https://sub.Example.com?a=5 ", "https://sub.example.com/?a=5",
     "sub.example.com"),
    ("https://example.com", "https://example.com/", "example.com"),
    ("http://example.com/?", "http://example.com/", "example.com"),
    ("not a url at all", None, None),
    ("HTTPS://A.B/Q?UTM_SOURCE=x&k=V", "https://a.b/Q?k=V", "a.b"),
    # :80 is NOT default for https and stays; path case is preserved
    ("https://h.com:80/P", "https://h.com:80/P", "h.com"),
]


def test_canonical_forms(spark):
    df = spark.createDataFrame(
        [(i, u) for i, (u, _, _) in enumerate(CASES)], "id long, url string"
    )
    got = {
        r["id"]: (r["c"], r["d"])
        for r in df.select(
            "id",
            canonical_url("url").alias("c"),
            url_domain("url").alias("d"),
        ).collect()
    }
    for i, (_, want_c, want_d) in enumerate(CASES):
        assert got[i] == (want_c, want_d), (i, CASES[i][0], got[i])


def test_idempotent(spark):
    """Canonicalizing a canonical URL is a no-op (fixed point)."""
    df = spark.createDataFrame(
        [(i, c) for i, (_, c, _) in enumerate(CASES) if c is not None],
        "id long, url string",
    )
    rows = df.select("url", canonical_url("url").alias("c")).collect()
    for r in rows:
        assert r["c"] == r["url"], r


def test_url_dedup_keep_first(spark):
    """All spellings of one page collapse to the min-id row; the
    non-URL row passes through (quarantine is the caller's call)."""
    rows = [
        (3, "http://Example.com/a/", "x"),
        (1, "HTTP://EXAMPLE.COM:80/a?utm_s=1", "y"),
        (2, "http://example.com/a", "z"),
        (7, "http://example.com/b", "b"),
        (9, "not a url", "n"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, text string")
    out = url_dedup(df).collect()
    ids = sorted(r["doc_id"] for r in out)
    assert ids == [1, 7, 9]
    byid = {r["doc_id"]: r for r in out}
    assert byid[1]["canonical_url"] == "http://example.com/a"
    assert byid[9]["canonical_url"] is None
    assert byid[1]["text"] == "y"  # payload intact


def test_domain_stats(spark):
    rows = [
        (1, "http://a.com/x"),
        (2, "http://A.com/x/"),       # same canon as 1
        (3, "https://a.com:443/y"),
        (4, "http://b.com/"),
        (5, "nope"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = {r["domain"]: (r["n_docs"], r["n_canonical_urls"])
           for r in domain_stats(df).collect()}
    assert got == {"a.com": (3, 2), "b.com": (1, 1)}


def test_composes_with_text_dedup(spark):
    """The CommonCrawl ordering: URL dedup first collapses re-crawls of
    one page cheaply, then the text pipeline dedups what remains —
    equivalent here to running the text dedup on the URL survivors."""
    from oracle_vectorsearch_example_spark.operators.dedup import exact_dedup

    page = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, "http://site.com/p1", page),
        (2, "http://SITE.com/p1/", page),            # same URL, same text
        (3, "http://site.com/p1?utm_source=x", page),  # same URL again
        (4, "http://mirror.org/copy", page),         # text dup, new URL
        (5, "http://site.com/p2", "completely different words here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, text string")
    by_url = url_dedup(df)
    assert sorted(r.doc_id for r in by_url.collect()) == [1, 4, 5]
    final = exact_dedup(by_url, text_col="text", id_col="doc_id")
    assert sorted(r.doc_id for r in final.collect()) == [1, 5]


def test_no_python_udf(spark):
    df = spark.createDataFrame([(1, "http://a.com/x")], "doc_id long, url string")
    plan = (
        df.select(canonical_url("url"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_out_col_collision_raises(spark):
    """r8 ADVICE regression: a pre-existing out_col would produce
    ambiguous duplicate columns downstream — refuse loudly."""
    df = spark.createDataFrame(
        [(1, "http://a.com/x", "taken")],
        "doc_id long, url string, canonical_url string",
    )
    with pytest.raises(ValueError, match="canonical_url"):
        url_dedup(df)
    # a non-colliding out_col still works
    out = url_dedup(df, out_col="canon2")
    assert "canon2" in out.columns and out.count() == 1
