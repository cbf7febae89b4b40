"""Product-quantization queries with exact DuckDB oracles.

The oracle replays the ENTIRE PQ pipeline in SQL — hash-smallest
seeding, each unrolled Lloyd round (integer-exact means), final-round
encoding, and ADC table scoring — against the same parquet, exact to
the bit. That is possible because operators/pq.py defines every
distance over 1e-6-quantized int64 components (see the module
docstring's determinism contract): assignment argmins and ADC sums
are pure integer arithmetic in both engines, ties break to the
smaller code/id, and the only doubles are single exact-rounded
divisions of identical integers.

Parameters here (m=8, k=16, iters=2 over the dim-64 embeddings) keep
the unrolled SQL readable; the operators themselves take arbitrary
m/k/iters (tests pin m=4/k=8 and bench pins m=8/k=32/iters=3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_stream_processing_framework_spark.catalog import load
from python_stream_processing_framework_spark.operators.pq import (
    ivfpq_topk,
    pq_encode,
    pq_topk,
    pq_train,
)
from python_stream_processing_framework_spark.queries.base import query

_M, _K, _ITERS, _DSUB = 8, 16, 2, 8  # embeddings are dim 64 = _M * _DSUB

_L2Q = "list_sum(list_transform(list_zip({a}, {b}), p -> (p[1]-p[2])*(p[1]-p[2])))"


def _assign_cte(name: str, cb: str) -> str:
    """Nearest-centroid assignment of every (vector, subspace) row
    against codebook CTE ``cb`` — integer distances, ties to the
    smaller code (mirrors _assign's argmin-first-minimum)."""
    return f"""
    {name} AS (
      SELECT vec_id, s, sv, code FROM (
        SELECT b.vec_id, b.s, b.sv, c.code,
               row_number() OVER (PARTITION BY b.vec_id, b.s
                                  ORDER BY {_L2Q.format(a='b.sv', b='c.cq')},
                                           c.code) AS rn
        FROM sub b JOIN {cb} c ON c.s = b.s) z
      WHERE rn = 1)"""


def _pq_ctes(m: int, k: int, iters: int, dsub: int) -> str:
    """CTE chain: quantized vectors -> subvector rows -> seeded
    codebook -> ``iters`` unrolled Lloyd rounds -> ``enc`` (final
    assignment = pq_encode) and ``tab`` (the ADC lookup table for the
    vec_id=0 query)."""
    parts = [
        f"""
    e AS (SELECT vec_id,
                 list_transform(embedding,
                   x -> CAST(floor(CAST(x AS DOUBLE)*1000000.0 + 0.5) AS BIGINT))
                   AS vq
          FROM embeddings),
    sub AS (SELECT vec_id, CAST(s AS INT) AS s,
                   vq[s*{dsub}+1 : s*{dsub}+{dsub}] AS sv
            FROM e, range(0, {m}) t(s)),
    seeds AS (SELECT vec_id,
                     CAST(row_number() OVER (ORDER BY h, vec_id) - 1 AS INT)
                       AS code
              FROM (SELECT vec_id,
                           ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT
                             AS h
                    FROM e) z
              QUALIFY row_number() OVER (ORDER BY h, vec_id) <= {k}),
    cb0 AS (SELECT s, code, sv AS cq FROM sub JOIN seeds USING (vec_id))"""
    ]
    for r in range(iters):
        parts.append(_assign_cte(f"a{r}", f"cb{r}"))
        # exact integer means, re-quantized through the IDENTICAL IEEE
        # op chain the Spark side uses: (sum/1e6)/n -> *1e6 -> floor+0.5
        parts.append(
            f"""
    m{r} AS (SELECT s, code, i, SUM(sv[i]) AS ssum, COUNT(*) AS n
             FROM a{r}, range(1, {dsub + 1}) t(i) GROUP BY s, code, i),
    cb{r + 1} AS (SELECT s, code,
                   list(CAST(floor((CAST(ssum AS DOUBLE)/1000000.0/n)*1000000.0
                                   + 0.5) AS BIGINT) ORDER BY i) AS cq
                   FROM m{r} GROUP BY s, code)"""
        )
    parts.append(_assign_cte("enc", f"cb{iters}"))
    parts.append(
        f"""
    qsub AS (SELECT s, sv AS qv FROM sub WHERE vec_id = 0),
    tab AS (SELECT c.s, c.code, {_L2Q.format(a='q.qv', b='c.cq')} AS d
            FROM cb{iters} c JOIN qsub q ON q.s = c.s)"""
    )
    return ",".join(parts)


def _train_encode(spark: SparkSession, sf_dir: str):
    (embeddings,) = load(spark, sf_dir, "embeddings")
    cb = pq_train(embeddings, m=_M, k=_K, iters=_ITERS)
    corpus = embeddings.filter(F.col("vec_id") != 0)
    enc = pq_encode(corpus, cb)
    qv = (
        embeddings.filter(F.col("vec_id") == 0)
        .select(F.col("embedding").cast("array<double>"))
        .first()[0]
    )
    return embeddings, cb, enc, qv


@query(
    "pq_adc_topk",
    f"""
    WITH {_pq_ctes(_M, _K, _ITERS, _DSUB)},
    scored AS (SELECT a.vec_id,
                      CAST(SUM(t.d) AS DOUBLE)/1000000000000.0 AS adc_dist
               FROM enc a JOIN tab t ON t.s = a.s AND t.code = a.code
               WHERE a.vec_id != 0
               GROUP BY a.vec_id)
    SELECT vec_id, adc_dist FROM scored ORDER BY adc_dist, vec_id LIMIT 10
    """,
    doc="PQ compressed-domain top-10 (Jegou et al. 2011): train an "
    "m=8/k=16 codebook (2 deterministic Lloyd rounds), encode every "
    "vector to 8 codes, score by ADC lookup-table against the vec_id=0 "
    "query — raw vectors never touched at query time. The oracle "
    "replays training, encoding, and scoring bit-exactly in SQL "
    "(integer-quantized distance contract, operators/pq.py).",
)
def pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, cb, enc, qv = _train_encode(spark, sf_dir)
    return pq_topk(enc, cb, qv, id_col="vec_id", k=10)


@query(
    "ann_ivfpq_topk",
    f"""
    WITH {_pq_ctes(_M, _K, _ITERS, _DSUB)},
    lab AS (SELECT vec_id, label FROM embeddings),
    freq AS (SELECT l.label, a.s, a.code, COUNT(*) AS n
             FROM enc a JOIN lab l USING (vec_id)
             WHERE a.vec_id != 0 GROUP BY 1, 2, 3),
    probe AS (SELECT label FROM (
                SELECT f.label,
                       CAST({_M} * SUM(CAST(f.n AS HUGEINT) * t.d) AS DOUBLE)
                         / SUM(f.n) AS mean_member_adc
                FROM freq f JOIN tab t ON t.s = f.s AND t.code = f.code
                GROUP BY f.label) z
              ORDER BY mean_member_adc, label LIMIT 3),
    scored AS (SELECT a.vec_id,
                      CAST(SUM(t.d) AS DOUBLE)/1000000000000.0 AS adc_dist
               FROM enc a JOIN lab l USING (vec_id)
                          JOIN probe p ON p.label = l.label
                          JOIN tab t ON t.s = a.s AND t.code = a.code
               WHERE a.vec_id != 0
               GROUP BY a.vec_id)
    SELECT vec_id, adc_dist FROM scored ORDER BY adc_dist, vec_id LIMIT 10
    """,
    doc="IVF-PQ two-level ANN (FAISS IVFPQ shape): probe the 3 coarse "
    "cells whose mean member ADC distance (codes-only, no float "
    "corpus access) is nearest the query, then ADC-score only their "
    "members. Cell ranking uses an exact wide-integer numerator "
    "(DECIMAL/HUGEINT), so even probe selection is oracle-exact.",
)
def ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    (embeddings,) = load(spark, sf_dir, "embeddings")
    _, cb, enc, qv = _train_encode(spark, sf_dir)
    cells = embeddings.select("vec_id", "label")
    return ivfpq_topk(
        enc, cb, cells, qv, id_col="vec_id", cell_col="label", k=10, n_probe=3
    )


@query(
    "kmeans_clusters",
    f"""
    WITH {_pq_ctes(1, 8, 2, 64)},
    assign AS (SELECT vec_id, code AS cluster FROM enc),
    sizes AS (SELECT cluster, CAST(COUNT(*) AS BIGINT) AS cluster_size
              FROM assign GROUP BY cluster)
    SELECT a.vec_id, a.cluster, s.cluster_size
    FROM assign a JOIN sizes s USING (cluster)
    """,
    doc="Full-vector deterministic k-means over the embedding corpus "
    "— the cluster step under semantic curation (SemDeDup's cluster-"
    "then-dedup, cluster-balanced mixing, per-cluster sampling). "
    "Reuses the PQ Lloyd trainer with m=1 (one subspace = whole "
    "vector, k=8, 2 rounds): hash-smallest seeding, integer-exact "
    "means, Arrow-batched matmul assignment against the broadcast "
    "codebook — each round is ONE full-data job. Output is every "
    "vector's (cluster, cluster_size) assignment; the oracle replays "
    "seeding, both Lloyd rounds, and the final assignment bit-exactly "
    "in SQL (the operators/pq.py integer-quantized distance "
    "contract).",
)
def kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from python_stream_processing_framework_spark.operators.common import (
        persist_lazy,
    )

    (embeddings,) = load(spark, sf_dir, "embeddings")
    cb = pq_train(embeddings, m=1, k=8, iters=2)
    enc = pq_encode(embeddings, cb)
    # assign feeds BOTH the sizes aggregate (broadcast build) and the
    # probe side; pq_encode is map-only since r15 (no exchange for
    # ReusedExchange to anchor on), so without a persist the Arrow
    # encode pass would run once per consumer. Lazy: the broadcast
    # build populates the blocks, the probe reads them.
    assign = persist_lazy(
        enc.select("vec_id", F.element_at("codes", 1).alias("cluster"))
    )
    sizes = assign.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return assign.join(F.broadcast(sizes), "cluster").select(
        "vec_id", "cluster", "cluster_size"
    )


@query(
    "embedding_outliers",
    f"""
    WITH {_pq_ctes(1, 8, 2, 64)},
    assign AS (SELECT vec_id, code AS cluster FROM enc),
    dist AS (SELECT a.vec_id, a.cluster,
                    {_L2Q.format(a='b.sv', b='c.cq')} AS dist_q
             FROM assign a
             JOIN sub b ON b.vec_id = a.vec_id
             JOIN cb2 c ON c.s = b.s AND c.code = a.cluster),
    ranked AS (SELECT vec_id, cluster, dist_q,
                      row_number() OVER (PARTITION BY cluster
                                         ORDER BY dist_q DESC, vec_id) AS rn,
                      count(*) OVER (PARTITION BY cluster) AS n
               FROM dist)
    SELECT vec_id, cluster, CAST(dist_q AS BIGINT) AS dist_q,
           (rn * 20 <= n) AS is_outlier
    FROM ranked
    """,
    doc="Embedding-space outlier audit "
    "(operators/semdedup.cluster_outliers): k-means (the shared "
    "cluster_assign step, m=1/k=8/2 Lloyd rounds) then each vector's "
    "EXACT integer squared L2 to its centroid (1e-6-quantized), with "
    "the top 5% per cluster by (distance desc, id) flagged — a rank "
    "rule instead of a z-score so the flag needs no mean/std doubles "
    "and replays bit-exact. The curation complement of dedup: "
    "surfaces OCR garbage / off-distribution content for exclusion. "
    "Oracle replays seeding, both Lloyd rounds, assignment, the "
    "integer distances, and the window rank.",
)
def embedding_outliers_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from python_stream_processing_framework_spark.operators.semdedup import (
        cluster_outliers,
    )

    (embeddings,) = load(spark, sf_dir, "embeddings")
    return cluster_outliers(embeddings, k=8, iters=2, outlier_denom=20)
