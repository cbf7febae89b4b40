"""URL canonicalization (operators/urls.py): every documented rule,
plus the dedup keep-first grain."""

from __future__ import annotations

import pytest

from python_stream_processing_framework_spark.operators.urls import (
    canonicalize_urls,
    dedup_by_url,
)


def _canon(spark, url):
    df = spark.createDataFrame([(1, url)], "id bigint, url string")
    (row,) = canonicalize_urls(df, "id", "url").collect()
    return row["url_canon"], row["host"]


@pytest.mark.parametrize(
    ("raw", "want"),
    [
        # case, www, default port, fragment, tracking params, sorting
        (
            "HTTP://WWW.Site.COM:80/a/b/?utm_source=x&b=2&a=1#frag",
            "http://site.com/a/b?a=1&b=2",
        ),
        ("http://site.com/a/b?a=1&b=2", "http://site.com/a/b?a=1&b=2"),
        # scheme-less input defaults to http; bare host gets /
        ("Site.com", "http://site.com/"),
        ("https://x.org:443", "https://x.org/"),
        # non-default port survives
        ("https://x.org:8443/p", "https://x.org:8443/p"),
        # root slash is kept, non-root trailing slash dropped
        ("http://a.b/", "http://a.b/"),
        ("http://a.b/p/", "http://a.b/p"),
        # query emptied by tracking-param removal disappears
        ("http://a.b/p?utm_campaign=z&gclid=1&fbclid", "http://a.b/p"),
        # path case is preserved (paths are case-sensitive)
        ("http://A.B/CaSe", "http://a.b/CaSe"),
    ],
)
def test_canonical_rules(spark, raw, want):
    got, _ = _canon(spark, raw)
    assert got == want


def test_host_column(spark):
    _, host = _canon(spark, "HTTPS://WWW.Sub.Example.ORG:443/x?a=1")
    assert host == "sub.example.org"


def test_dedup_by_url_keep_first(spark):
    df = spark.createDataFrame(
        [
            (3, "http://www.site.com/a/?utm_source=t"),
            (1, "HTTP://site.com:80/a"),
            (2, "http://site.com/b"),
        ],
        "id bigint, url string",
    )
    out = {r["url_canon"]: r for r in dedup_by_url(df, "id", "url").collect()}
    assert out["http://site.com/a"]["keep_id"] == 1
    assert out["http://site.com/a"]["n_dups"] == 1
    assert out["http://site.com/b"]["n_dups"] == 0
