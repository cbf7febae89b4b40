"""SemDeDup catalog query (operators/semdedup.py).

The oracle replays the full published pipeline in DuckDB: the m=1
PQ-Lloyd k-means (reusing queries/pq.py's unrolled CTE chain —
seeding, both rounds, assignment, all integer-exact), within-cluster
pair cosines over the same 1e-6-quantized int64 vectors, duplicate
groups as recursive-CTE connected components of the eps-graph, and
the paper's keep-rule (lowest centroid similarity per group, ties to
the smaller id) as one window. Cosines round to 6dp after a single
division of identical doubles — engine-exact (the pq.py contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from python_stream_processing_framework_spark.catalog import load
from python_stream_processing_framework_spark.operators.semdedup import semdedup
from python_stream_processing_framework_spark.queries.base import query
from python_stream_processing_framework_spark.queries.pq import _pq_ctes

_K, _ITERS, _EPS = 8, 2, 0.4

_DOT = (
    "CAST(list_sum(list_transform(list_zip({a}, {b}),"
    " p -> p[1] * p[2])) AS DOUBLE)"
)

_ORACLE = f"""
    WITH RECURSIVE {_pq_ctes(1, _K, _ITERS, 64)},
    assign AS (SELECT vec_id, code AS cluster FROM enc),
    vq2 AS (SELECT vec_id, vq,
                   CAST(list_sum(list_transform(vq, x -> x * x)) AS BIGINT) AS n2
            FROM e),
    cent AS (SELECT code AS cluster, cq,
                    CAST(list_sum(list_transform(cq, x -> x * x)) AS BIGINT) AS c2
             FROM cb{_ITERS}),
    pairs AS (
      SELECT x.vec_id AS id_a, y.vec_id AS id_b
      FROM assign x
      JOIN assign y ON x.cluster = y.cluster AND x.vec_id < y.vec_id
      JOIN vq2 a ON a.vec_id = x.vec_id
      JOIN vq2 b ON b.vec_id = y.vec_id
      WHERE round({_DOT.format(a='a.vq', b='b.vq')}
                  / sqrt(CAST(a.n2 AS DOUBLE) * CAST(b.n2 AS DOUBLE)), 6)
            >= {_EPS}),
    edges AS (SELECT id_a AS s, id_b AS d FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
    reach(node, lab) AS (
      SELECT s, s FROM edges
      UNION
      SELECT e2.d, r.lab FROM reach r JOIN edges e2 ON e2.s = r.node),
    comp AS (SELECT node, MIN(lab) AS component FROM reach GROUP BY node),
    cs AS (
      SELECT v.vec_id, a.cluster,
             round({_DOT.format(a='v.vq', b='c.cq')}
                   / sqrt(CAST(v.n2 AS DOUBLE) * CAST(c.c2 AS DOUBLE)), 6)
               AS centroid_sim
      FROM vq2 v
      JOIN assign a USING (vec_id)
      JOIN cent c ON c.cluster = a.cluster),
    grp AS (
      SELECT cs.vec_id, cs.cluster, cs.centroid_sim,
             coalesce(comp.component, cs.vec_id) AS dup_group
      FROM cs LEFT JOIN comp ON comp.node = cs.vec_id)
    SELECT vec_id, cluster, dup_group, centroid_sim,
           row_number() OVER (PARTITION BY dup_group
                              ORDER BY centroid_sim, vec_id) = 1 AS keep
    FROM grp
    """


@query(
    "semdedup_prune",
    _ORACLE,
    doc="SemDeDup (Abbas et al. 2023), the published cluster-then-"
    "prune semantic dedup: k-means the embeddings (m=1 PQ-Lloyd, "
    f"k={_K}, {_ITERS} rounds), find within-cluster pairs at cosine "
    f">= {_EPS}, group them as connected components, keep each "
    "group's LOWEST-centroid-similarity member. Candidate pairs are "
    "cluster-bucketed (the paper's cost model — raise k with corpus "
    "size), vectors travel as quantized int64, components is "
    "iterative with counts-only driver traffic. Oracle replays "
    "k-means, pair cosines, the recursive-CTE components, and the "
    "keep-rule window bit-exact.",
)
def semdedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    (embeddings,) = load(spark, sf_dir, "embeddings")
    return semdedup(embeddings, k=_K, iters=_ITERS, eps=_EPS)
