"""PageRank catalog query (operators/graph.py pagerank).

A deterministic 97-host link graph derives from doc_id arithmetic
(two out-links per document; many documents share a host, so the
graph has real multi-edges and hubs). All PageRank arithmetic is
integer (nano-unit ranks, floor divisions), so the oracle unrolls
the three iterations as CTEs — the BPE-rounds pattern — and every
rank reproduces bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_stream_processing_framework_spark.catalog import load
from python_stream_processing_framework_spark.operators.graph import pagerank
from python_stream_processing_framework_spark.queries.base import query

_M = 97
_D = 85
_ITERS = 3


def _iter_ctes() -> str:
    ctes = []
    for i in range(1, _ITERS + 1):
        prev = f"r{i - 1}"
        ctes.append(f"""
    c{i} AS (
      SELECT e.dst AS node, SUM({prev}.rank_nano // deg.deg) AS s
      FROM e JOIN deg USING (src) JOIN {prev} ON {prev}.node = e.src
      GROUP BY e.dst),
    r{i} AS (
      SELECT n.node,
             CAST(p.base + (coalesce(c{i}.s, 0) * {_D}) // 100 AS BIGINT)
               AS rank_nano
      FROM nodes n LEFT JOIN c{i} USING (node) CROSS JOIN params p)""")
    return ",".join(ctes)


_ORACLE = f"""
    WITH e AS (
      SELECT doc_id % {_M} AS src, (doc_id * 7 + 3) % {_M} AS dst
      FROM documents
      UNION ALL
      SELECT doc_id % {_M}, (doc_id * 13 + 1) % {_M} FROM documents),
    nodes AS (
      SELECT DISTINCT node FROM (
        SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
    deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
    params AS (
      SELECT CAST(round(1e9 / n) AS BIGINT) AS init,
             CAST(round((100 - {_D}) * 1e9 / n / 100) AS BIGINT) AS base
      FROM (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes)),
    r0 AS (
      SELECT node, CAST(p.init AS BIGINT) AS rank_nano
      FROM nodes CROSS JOIN params p),{_iter_ctes()}
    SELECT node, rank_nano FROM r{_ITERS}
    ORDER BY rank_nano DESC, node LIMIT 25
    """


@query(
    "pagerank_hosts",
    _ORACLE,
    doc="Integer-exact PageRank over a deterministic host link graph "
    "(operators/graph.pagerank; the crawl-prioritization ranking — "
    "Common Crawl publishes centrality ranks for exactly this use): "
    "two out-links per document onto 97 hosts, 3 iterations, "
    "nano-unit integer ranks with floor-division contributions and "
    "damping, dangling mass leaked (the simplest published variant). "
    "Per iteration: one narrow rank-edges join + one groupBy(dst) "
    "sum with map-side partials; nothing but the node count reaches "
    "the driver. Returns the top 25 hosts. Oracle unrolls all three "
    "iterations as CTEs and reproduces every rank bit-for-bit.",
)
def pagerank_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    e1 = documents.select(
        (F.col("doc_id") % _M).alias("src"),
        ((F.col("doc_id") * 7 + 3) % _M).alias("dst"),
    )
    e2 = documents.select(
        (F.col("doc_id") % _M).alias("src"),
        ((F.col("doc_id") * 13 + 1) % _M).alias("dst"),
    )
    ranks = pagerank(e1.unionByName(e2), n_iter=_ITERS, damping_pct=_D)
    return ranks.orderBy(F.col("rank_nano").desc(), F.col("node").asc()).limit(25)


@query(
    "triangle_hosts",
    f"""
    WITH raw AS (
      SELECT doc_id % {_M} AS s, (doc_id * 7 + 3) % {_M} AS d FROM documents
      UNION ALL
      SELECT doc_id % {_M}, (doc_id * 13 + 1) % {_M} FROM documents),
    und AS (
      SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b
      FROM raw WHERE s != d),
    deg AS (
      SELECT node, count(*) AS deg FROM (
        SELECT a AS node FROM und UNION ALL SELECT b FROM und)
      GROUP BY node),
    o AS (
      SELECT CASE WHEN (da.deg, u.a) < (db.deg, u.b) THEN u.a ELSE u.b END AS src,
             CASE WHEN (da.deg, u.a) < (db.deg, u.b) THEN u.b ELSE u.a END AS dst,
             CASE WHEN (da.deg, u.a) < (db.deg, u.b) THEN db.deg ELSE da.deg END AS degdst
      FROM und u
      JOIN deg da ON da.node = u.a
      JOIN deg db ON db.node = u.b),
    w AS (
      SELECT o1.src AS x, o1.dst AS y, o2.dst AS z
      FROM o o1 JOIN o o2 ON o1.src = o2.src
      WHERE (o1.degdst, o1.dst) < (o2.degdst, o2.dst)),
    t AS (SELECT x, y, z FROM w JOIN o ON o.src = w.y AND o.dst = w.z),
    corners AS (
      SELECT x AS node FROM t
      UNION ALL SELECT y FROM t
      UNION ALL SELECT z FROM t)
    SELECT node, count(*) AS triangles FROM corners GROUP BY node
    """,
    doc="Per-host triangle counts on the synthetic 97-host link graph "
    "(operators/graph.triangle_counts): degree-orientation "
    "(node-iterator++) — undirected distinct edges oriented low->high "
    "(degree, node), each triangle materializes exactly once as an "
    "oriented wedge closed by an oriented edge, bounding the wedge "
    "self-join at O(m^1.5) regardless of hubs. Integer counts, "
    "engine-exact; the oracle replays orientation, wedges, and "
    "closing joins verbatim.",
)
def triangle_hosts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from python_stream_processing_framework_spark.operators.graph import (
        triangle_counts,
    )

    (documents,) = load(spark, sf_dir, "documents")
    docs = documents.select("doc_id")
    e = docs.select(
        (F.col("doc_id") % _M).alias("src"),
        ((F.col("doc_id") * 7 + 3) % _M).alias("dst"),
    ).unionByName(
        docs.select(
            (F.col("doc_id") % _M).alias("src"),
            ((F.col("doc_id") * 13 + 1) % _M).alias("dst"),
        )
    )
    return triangle_counts(e)
