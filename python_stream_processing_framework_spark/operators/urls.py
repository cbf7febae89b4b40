"""URL canonicalization — the key for crawl-level URL dedup.

Beyond-reference capability (SURVEY §2.7 charter): C4, RefinedWeb,
and FineWeb all deduplicate at the URL level before any content pass
(the same page re-crawled across snapshots is the single largest
duplicate source), and that requires a canonical form: the raw crawl
carries `HTTP://WWW.Site.COM:80/a/b/?utm_source=x&b=2&a=1#frag` and
`http://site.com/a/b?a=1&b=2` for the same page.

The canonical form applied here (each rule is a documented, fixed
choice — canonicalization is a convention, not a truth):

1. strip the fragment (``#...``);
2. lowercase the scheme; a missing scheme becomes ``http``;
3. lowercase host:port, drop a leading ``www.``, drop an explicit
   default port (``:80``/``:443``);
4. drop a trailing slash from a non-root path; an empty path becomes
   ``/``;
5. drop tracking parameters (``utm_*``, ``fbclid``, ``gclid``) and
   sort the survivors bytewise (query order never distinguishes
   pages); an emptied query disappears.

Scale shape: a pure map-only JVM expression chain (regexp extraction
+ array HOFs for the param sort — the sort is over ONE url's params,
not data). URL-level dedup is then exact dedup (dedup.dedup_exact /
a groupBy-min) on the canonical column; at 100 TB the canonical key
shuffle carries short strings with map-side partials. Every pattern
sits in the Java-regex/RE2 common subset, every list op has a DuckDB
twin (list_filter/list_sort binary order = sort_array), so the
oracle replay is bit-exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Tracking parameters dropped from query strings (name match, with
#: or without a value).
TRACKING_PARAM_RE = r"^(utm_[^=]*|fbclid|gclid)(=.*)?$"


def canonical_url_expr(url_col: str) -> Column:
    """The canonical form of a URL column (see module docstring)."""
    u = F.regexp_replace(F.trim(F.col(url_col)), r"#.*$", "")
    scheme = F.lower(
        F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1)
    )
    scheme = F.when(scheme == "", F.lit("http")).otherwise(scheme)
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://", "")
    hostport = F.lower(F.regexp_extract(rest, r"^([^/?]*)", 1))
    host = F.regexp_replace(hostport, r"^www\.", "")
    host = F.regexp_replace(host, r":(80|443)$", "")
    pathq = F.regexp_replace(rest, r"^[^/?]*", "")
    path = F.regexp_extract(pathq, r"^([^?]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(
        F.regexp_replace(path, r"(.)/$", "$1")
    )
    query = F.regexp_replace(pathq, r"^[^?]*\??", "")
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    q = F.array_join(F.sort_array(params), "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q)),
    )


def canonical_host_expr(url_col: str) -> Column:
    """Just the canonical host (dedup/blocklist grain above the URL)."""
    u = F.regexp_replace(F.trim(F.col(url_col)), r"#.*$", "")
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://", "")
    hostport = F.lower(F.regexp_extract(rest, r"^([^/?]*)", 1))
    host = F.regexp_replace(hostport, r"^www\.", "")
    return F.regexp_replace(host, r":(80|443)$", "")


def canonicalize_urls(
    df: DataFrame, id_col: str, url_col: str
) -> DataFrame:
    """(id, url_canon, host): canonical URL + host per row. Map-only."""
    return df.select(
        F.col(id_col),
        canonical_url_expr(url_col).alias("url_canon"),
        canonical_host_expr(url_col).alias("host"),
    )


def dedup_by_url(
    df: DataFrame, id_col: str, url_col: str
) -> DataFrame:
    """URL-level dedup: one row per canonical URL, keeping the lowest
    id (the deterministic keep-first rule the dedup family uses).
    Returns (url_canon, keep_id, n_dups). The shuffle key is the
    short canonical string with map-side partial min/count."""
    return (
        canonicalize_urls(df, id_col, url_col)
        .groupBy("url_canon")
        .agg(
            F.min(id_col).alias("keep_id"),
            (F.count(F.lit(1)) - 1).cast("bigint").alias("n_dups"),
        )
    )
