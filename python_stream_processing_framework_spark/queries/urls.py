"""URL canonicalization + dedup catalog query (operators/urls.py).

Builds four messy variants per site/page from doc_id arithmetic —
uppercase scheme/host + www + explicit :80 + tracking params +
fragment, the clean form, an https page, and a scheme-less page —
so every canonicalization rule fires and each quadruple plants one
real duplicate pair. The oracle replays the full canonical chain in
DuckDB (regexp extraction, tracking-param filter, bytewise param
sort — DuckDB list_sort and Spark sort_array share binary string
order) and the same keep-lowest-id dedup; all values are exact
strings/integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_stream_processing_framework_spark.catalog import load
from python_stream_processing_framework_spark.operators.urls import dedup_by_url
from python_stream_processing_framework_spark.queries.base import query

_ORACLE = """
    WITH built AS (
      SELECT doc_id,
             CASE doc_id % 4
               WHEN 0 THEN 'HTTP://WWW.Site' || CAST((doc_id // 4) % 7 AS VARCHAR)
                           || '.COM:80/p/' || CAST(doc_id // 4 AS VARCHAR)
                           || '/?utm_source=x&b=2&a=1#frag'
               WHEN 1 THEN 'http://site' || CAST((doc_id // 4) % 7 AS VARCHAR)
                           || '.com/p/' || CAST(doc_id // 4 AS VARCHAR)
                           || '?a=1&b=2'
               WHEN 2 THEN 'https://site' || CAST((doc_id // 4) % 7 AS VARCHAR)
                           || '.com:443/q/' || CAST(doc_id AS VARCHAR) || '/'
               ELSE 'Site' || CAST((doc_id // 4) % 7 AS VARCHAR)
                    || '.com/r/' || CAST(doc_id AS VARCHAR)
             END AS url
      FROM documents),
    parts AS (
      SELECT doc_id,
             regexp_replace(trim(url), '#.*$', '') AS u
      FROM built),
    comp AS (
      SELECT doc_id,
             CASE WHEN regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.\\-]*)://', 1) = ''
                  THEN 'http'
                  ELSE lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.\\-]*)://', 1))
             END AS scheme,
             regexp_replace(u, '^[A-Za-z][A-Za-z0-9+.\\-]*://', '') AS rest
      FROM parts),
    comp2 AS (
      SELECT doc_id, scheme,
             regexp_replace(regexp_replace(
               lower(regexp_extract(rest, '^([^/?]*)', 1)),
               '^www\\.', ''), ':(80|443)$', '') AS host,
             regexp_replace(rest, '^[^/?]*', '') AS pathq
      FROM comp),
    comp3 AS (
      SELECT doc_id, scheme, host,
             CASE WHEN regexp_extract(pathq, '^([^?]*)', 1) = '' THEN '/'
                  ELSE regexp_replace(regexp_extract(pathq, '^([^?]*)', 1),
                                      '(.)/$', '\\1')
             END AS path,
             coalesce(array_to_string(list_sort(list_filter(
               string_split(regexp_replace(pathq, '^[^?]*\\??', ''), '&'),
               p -> p <> '' AND NOT regexp_matches(
                 p, '^(utm_[^=]*|fbclid|gclid)(=.*)?$'))), '&'), '') AS q
      FROM comp2),
    canon AS (
      SELECT doc_id,
             scheme || '://' || host || path
             || CASE WHEN q = '' THEN '' ELSE '?' || q END AS url_canon
      FROM comp3)
    SELECT url_canon, min(doc_id) AS keep_id,
           CAST(count(*) - 1 AS BIGINT) AS n_dups
    FROM canon GROUP BY url_canon
    ORDER BY url_canon
    """


@query(
    "url_dedup",
    _ORACLE,
    doc="URL canonicalization + URL-level dedup (operators/urls.py; "
    "the C4/RefinedWeb pre-content pass): strip fragments, default "
    "scheme, lowercase host, drop www./default ports/trailing "
    "slashes/tracking params, sort surviving query params bytewise, "
    "then keep the lowest doc per canonical URL. Canonicalization is "
    "a map-only JVM regexp+array chain; the dedup groupBy shuffles "
    "short canonical strings with map-side partial min/count. Four "
    "messy variants per page are planted so every rule fires and each "
    "quadruple carries one true duplicate pair. Oracle replays the "
    "chain and keep-rule bit-exact.",
)
def url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    site = F.concat(
        F.lit("site"), ((F.col("doc_id") / 4).cast("bigint") % 7).cast("string")
    )
    page = (F.col("doc_id") / 4).cast("bigint").cast("string")
    built = documents.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(
                F.lit("HTTP://WWW.Site"),
                ((F.col("doc_id") / 4).cast("bigint") % 7).cast("string"),
                F.lit(".COM:80/p/"), page, F.lit("/?utm_source=x&b=2&a=1#frag"),
            ),
        )
        .when(
            F.col("doc_id") % 4 == 1,
            F.concat(F.lit("http://"), site, F.lit(".com/p/"), page, F.lit("?a=1&b=2")),
        )
        .when(
            F.col("doc_id") % 4 == 2,
            F.concat(
                F.lit("https://"), site, F.lit(".com:443/q/"),
                F.col("doc_id").cast("string"), F.lit("/"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("Site"),
                ((F.col("doc_id") / 4).cast("bigint") % 7).cast("string"),
                F.lit(".com/r/"), F.col("doc_id").cast("string"),
            )
        )
        .alias("url"),
    )
    return dedup_by_url(built, "doc_id", "url")
