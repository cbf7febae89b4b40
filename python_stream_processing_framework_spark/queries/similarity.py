"""Similarity-search queries over the embeddings table.

Cosine math mirrors functions/vectors.py: per-element cast to double,
sequential left-fold sums — DuckDB's list_reduce folds the same way,
so scores match bit-for-bit before the final 6dp rounding (the
rounding is belt-and-braces for ordering stability).

Every similarity query is oracle-exact, including the approximate
paths: `ann_ivf_topk` uses exact integer-sum centroids (a double
`avg()` would be summation-order-dependent) and `cosine_lsh_pairs`
derives its hyperplanes from md5, so both engines reproduce the same
candidate sets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_stream_processing_framework_spark.catalog import load
from python_stream_processing_framework_spark.operators.similarity import (
    cosine_lsh_pairs,
    cosine_topk,
    ivf_topk,
)
from python_stream_processing_framework_spark.queries.base import query

_V = "list_transform(embedding, x -> CAST(x AS DOUBLE))"
_DOT = "list_reduce(list_transform(list_zip({a}, {b}), s -> s[1]*s[2]), (p, q) -> p + q)"
_NORM = "sqrt(list_reduce(list_transform({a}, x -> x*x), (p, q) -> p + q))"


@query(
    "cosine_topk",
    f"""
    WITH e AS (SELECT vec_id, {_V} AS v FROM embeddings),
         qv AS (SELECT v AS q FROM e WHERE vec_id = 0),
         scored AS (
           SELECT vec_id,
                  round({_DOT.format(a='v', b='q')} /
                        ({_NORM.format(a='v')} * {_NORM.format(a='q')}), 6)
                    AS cos_sim
           FROM e, qv WHERE vec_id != 0)
    SELECT vec_id, cos_sim FROM scored
    ORDER BY cos_sim DESC, vec_id LIMIT 10
    """,
    doc="Brute-force cosine top-10 against vec_id=0 — the exactness "
    "baseline (TakeOrderedAndProject: per-partition top-k, no full sort).",
)
def cosine_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    (embeddings,) = load(spark, sf_dir, "embeddings")
    return cosine_topk(embeddings, query_id=0, k=10)


# embedding_neardup (brute-force all-pairs cosine) was consolidated
# out of the 50-entry registry: cosine_lsh_pairs is the sub-quadratic
# scale path for the same capability and cosine_topk keeps the exact
# brute-force baseline; operators/similarity.cosine_pairs remains
# available and unit-tested.

# Integer plane coefficient in [-1e6, 1e6] (mirrors operators/
# similarity._plane_coef_int); components quantize to int64 via
# floor(x * 2^20 + 0.5). Both the plane signs AND the candidate
# verification are order-free exact integer sums over the SAME
# quantized vector, so the numpy matmuls on the Spark side and the
# list_sum folds here produce bit-identical cosines (one division of
# identical doubles, then round 6).
_COEF_INT = (
    "((('0x' || substr(md5('plane#' || CAST(p AS VARCHAR) || '#' ||"
    " CAST(d AS VARCHAR)), 1, 15))::BIGINT % 2000001) - 1000000)"
)
_QDOT = (
    "CAST(list_sum(list_transform(list_zip({a}, {b}),"
    " s -> s[1] * s[2])) AS BIGINT)"
)


# Shared CTE blocks: quantization -> signatures -> banding (the BASE
# every sign-LSH query builds on), plus the self-join hamming-
# prefiltered candidates. cosine_lsh_pairs, dedup_semantic, AND
# semantic_decontaminate build on the ONE base definition (mirrors
# the Spark side, where all three call the same sign_signatures
# machinery), so the detector and the operators built on it cannot
# diverge.
_LSH_BASE_CTES = f"""
    e AS (SELECT vec_id, {_V} AS v FROM embeddings),
         q AS (
           SELECT vec_id,
                  list_transform(v,
                    x -> CAST(floor(x * 1048576.0 + 0.5) AS BIGINT)) AS qv
           FROM e),
         sigs AS (
           SELECT vec_id, qv,
                  CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT)
                    AS nq2,
                  list_reduce(list_transform(range(0, 32), p ->
                    CASE WHEN list_reduce(
                           list_transform(range(1, 65), d ->
                             qv[d] * ({_COEF_INT})),
                           (a, b) -> a + b) >= 0
                         THEN (1::BIGINT << p) ELSE 0::BIGINT END),
                    (a, b) -> a + b) AS s
           FROM q),
         banded AS (
           SELECT vec_id, s, b,
                  CAST((s >> CAST(4*b AS INT)) & 15 AS INT) AS band_key
           FROM sigs, range(0, 8) t(b))"""

_LSH_CTES = (
    _LSH_BASE_CTES
    + """,
         cand AS (
           SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
           FROM banded x JOIN banded y
             ON x.b = y.b AND x.band_key = y.band_key
              AND x.vec_id < y.vec_id
              AND bit_count(xor(x.s, y.s)) <= 16)"""
)

_LSH_COS = (
    f"round(CAST({_QDOT.format(a='a.qv', b='b.qv')} AS DOUBLE) /"
    " sqrt(CAST(a.nq2 AS DOUBLE) * CAST(b.nq2 AS DOUBLE)), 6)"
)


@query(
    "cosine_lsh_pairs",
    f"""
    WITH {_LSH_CTES}
    SELECT id_a, id_b, {_LSH_COS} AS cos_sim
    FROM cand JOIN sigs a ON a.vec_id = id_a JOIN sigs b ON b.vec_id = id_b
    WHERE {_LSH_COS} >= 0.4
    """,
    doc="Sign-random-projection LSH (8 bands x 4 bits, md5-derived "
    "deterministic hyperplanes) + signature-hamming prefilter "
    "(bit_count(xor) <= 16, i.e. expected agreement at cos 0.4 minus "
    "4 planes of slack) + quantized-exact cosine verification at 0.4 "
    "— the sub-quadratic scale path for embedding near-dup; recall "
    "< 1 by construction and the oracle mirrors the identical "
    "pipeline on the same 2^20-quantized integer vectors.",
)
def cosine_lsh_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    (embeddings,) = load(spark, sf_dir, "embeddings")
    return cosine_lsh_pairs(embeddings, threshold=0.4, bands=8, band_bits=4)


@query(
    "dedup_semantic",
    f"""
    WITH RECURSIVE {_LSH_CTES},
         pairs AS (
           SELECT id_a, id_b
           FROM cand JOIN sigs a ON a.vec_id = id_a
                     JOIN sigs b ON b.vec_id = id_b
           WHERE {_LSH_COS} >= 0.42),
         edges AS (
           SELECT id_a AS s, id_b AS dd FROM pairs
           UNION SELECT id_b, id_a FROM pairs),
         reach(node, lab) AS (
           SELECT s, s FROM edges
           UNION
           SELECT e2.dd, r.lab FROM reach r JOIN edges e2 ON e2.s = r.node),
         comp AS (
           SELECT node, MIN(lab) AS component FROM reach GROUP BY node)
    SELECT node AS vec_id, component,
           (node = component) AS is_canonical
    FROM comp
    """,
    doc="Semantic (embedding-cosine) dedup, SemDeDup-shaped: sign-LSH "
    "near-dup pairs at cos>=0.42 transitive-closed into clusters "
    "(operators/graph.connected_components), min-id member canonical. "
    "The embedding-space analog of dedup_components — catches "
    "paraphrases that share no shingles, the case lexical MinHash "
    "dedup structurally misses. Oracle: the shared LSH candidate CTEs "
    "+ recursive reachability.",
)
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from python_stream_processing_framework_spark.operators.graph import (
        connected_components,
    )

    (embeddings,) = load(spark, sf_dir, "embeddings")
    # 0.42 (vs the pair query's 0.4): the dedup threshold is
    # deliberately tighter — at 0.4 the sf0.1 pair graph is chain-
    # shaped (992 nodes / 699 edges), which is dissimilar-docs chained
    # through borderline pairs, not duplicate clusters. Same hamming
    # prefilter constant (16) at both thresholds, so the shared CTEs
    # hold verbatim.
    pairs = cosine_lsh_pairs(embeddings, threshold=0.42, bands=8, band_bits=4)
    cc = connected_components(pairs.select("id_a", "id_b"), "id_a", "id_b")
    return cc.select(
        F.col("node").alias("vec_id"),
        "component",
        (F.col("node") == F.col("component")).alias("is_canonical"),
    )


@query(
    "semantic_decontaminate",
    f"""
    WITH {_LSH_BASE_CTES},
         split AS (
           SELECT vec_id,
                  ('0x' || substr(md5(CAST(vec_id AS VARCHAR) || '#split#'),
                   1, 15))::BIGINT % 20 AS bkt
           FROM embeddings),
         xcand AS (
           SELECT DISTINCT c.vec_id AS cid, h.vec_id AS hid
           FROM banded c JOIN banded h
             ON c.b = h.b AND c.band_key = h.band_key
              AND bit_count(xor(c.s, h.s)) <= 16
           WHERE c.vec_id IN (SELECT vec_id FROM split WHERE bkt != 0)
             AND h.vec_id IN (SELECT vec_id FROM split WHERE bkt = 0)),
         flagged AS (
           SELECT DISTINCT cid
           FROM xcand JOIN sigs a ON a.vec_id = cid
                      JOIN sigs b ON b.vec_id = hid
           WHERE {_LSH_COS} >= 0.42)
    SELECT em.vec_id, em.label
    FROM embeddings em JOIN split USING (vec_id)
    WHERE split.bkt != 0
      AND em.vec_id NOT IN (SELECT cid FROM flagged)
    """,
    doc="SEMANTIC corpus decontamination (operators/similarity."
    "semantic_decontaminate): hash-split the embeddings 95/5 into "
    "corpus and held-out (the lexical family's split discipline), "
    "then drop every corpus row whose embedding is >= 0.42 cosine to "
    "ANY held-out row — sign-LSH banded cross-join + hamming "
    "prefilter + quantized-exact verify, flagged ids anti-joined "
    "through the size-gated broadcast. The embedding-space member of "
    "the decontamination family: catches paraphrased contamination "
    "that shares no 13-gram and no shingle with the held-out text. "
    "Oracle: the shared sign-LSH base CTEs crossed over the same "
    "md5 split (engine-exact integer sums throughout).",
)
def semantic_decontaminate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from python_stream_processing_framework_spark.functions.hashing import hash60
    from python_stream_processing_framework_spark.operators.similarity import (
        semantic_decontaminate,
    )

    (embeddings,) = load(spark, sf_dir, "embeddings")
    bucket = hash60(
        F.concat(F.col("vec_id").cast("string"), F.lit("#split#"))
    ) % 20
    heldout = embeddings.filter(bucket == 0)
    corpus = embeddings.filter(bucket != 0)
    clean = semantic_decontaminate(
        corpus, heldout, threshold=0.42, bands=8, band_bits=4
    )
    return clean.select("vec_id", "label")


@query(
    "ann_ivf_topk",
    f"""
    WITH e AS (SELECT vec_id, label, {_V} AS v FROM embeddings),
         qv AS (SELECT v AS q FROM e WHERE vec_id = 0),
         comp AS (
           SELECT label, i,
                  CAST(sum(CAST(round(v[i]*1000000) AS BIGINT)) AS DOUBLE)
                    /1000000.0/count(*) AS c
           FROM e, range(1, 65) t(i)
           GROUP BY label, i),
         cent AS (SELECT label, list(c ORDER BY i) AS cv FROM comp GROUP BY label),
         probe AS (
           SELECT label FROM (
             SELECT label,
                    round({_DOT.format(a='cv', b='q')} /
                          ({_NORM.format(a='cv')} * {_NORM.format(a='q')}), 6)
                      AS csim
             FROM cent, qv) s
           ORDER BY csim DESC, label LIMIT 3),
         scored AS (
           SELECT vec_id,
                  round({_DOT.format(a='v', b='q')} /
                        ({_NORM.format(a='v')} * {_NORM.format(a='q')}), 6)
                    AS cos_sim
           FROM e JOIN probe USING (label), qv
           WHERE vec_id != 0)
    SELECT vec_id, cos_sim FROM scored ORDER BY cos_sim DESC, vec_id LIMIT 10
    """,
    doc="IVF approximate top-10: probe the 3 cells nearest the query, "
    "scan only those (~n_probe/cells of the corpus in production). "
    "Centroids use exact integer-sum arithmetic, so even the probe "
    "selection is oracle-exact.",
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    (embeddings,) = load(spark, sf_dir, "embeddings")
    return ivf_topk(embeddings, query_id=0, k=10, n_probe=3)


_Q_CTE = """
    WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
         m AS (SELECT vec_id, v,
                      list_max(list_transform(v, x -> abs(x))) AS maxabs
               FROM v),
         q AS (SELECT vec_id, maxabs,
                      CASE WHEN maxabs = 0.0 THEN list_transform(v, x -> 0)
                           ELSE list_transform(v,
                                  x -> CAST(round(x * 127.0 / maxabs) AS INT))
                      END AS qv
               FROM m)
"""


@query(
    "int8_mips_topk",
    f"""
    {_Q_CTE},
         qq AS (SELECT qv AS qsel FROM q WHERE vec_id = 0),
         scored AS (
           SELECT vec_id,
                  CAST(round(list_dot_product(
                         list_transform(qv, x -> CAST(x AS DOUBLE)),
                         list_transform(qsel, x -> CAST(x AS DOUBLE))))
                       AS BIGINT) AS dot_q,
                  CAST(list_min(qv) AS INT) AS q_min,
                  CAST(list_max(qv) AS INT) AS q_max,
                  CAST(list_sum(qv) AS BIGINT) AS q_sum,
                  CAST(round(maxabs / 127.0 * 1e9) AS BIGINT) AS scale_ppb
           FROM q, qq WHERE vec_id != 0)
    SELECT vec_id, dot_q, q_min, q_max, q_sum, scale_ppb
    FROM scored ORDER BY dot_q DESC, vec_id LIMIT 10
    """,
    doc="Maximum-inner-product top-10 over the int8-quantized store "
    "(operators/similarity.py int8_mips_topk + quantize_int8). Integer "
    "dot products are exact and order-free, so the ranking is "
    "engine-reproducible; per-vector quantization stats "
    "(min/max/sum + ppb-rounded scale) ride along so the quantizer "
    "itself stays oracle-pinned after int8_quantize_stats was "
    "consolidated into this entry (50-entry registry cap).",
)
def int8_mips_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from python_stream_processing_framework_spark.operators.similarity import (
        int8_mips_topk,
        quantize_int8,
    )

    (embeddings,) = load(spark, sf_dir, "embeddings")
    topk = int8_mips_topk(embeddings, query_id=0, k=10)
    stats = quantize_int8(embeddings).select(
        "vec_id",
        F.array_min("q").alias("q_min"),
        F.array_max("q").alias("q_max"),
        F.aggregate(F.col("q"), F.lit(0).cast("bigint"), lambda acc, x: acc + x).alias(
            "q_sum"
        ),
        F.round(F.col("scale") * F.lit(1e9)).cast("bigint").alias("scale_ppb"),
    )
    # Broadcast the k-row top-k side; the quantized store is the big side.
    return stats.join(F.broadcast(topk), "vec_id").select(
        "vec_id", "dot_q", "q_min", "q_max", "q_sum", "scale_ppb"
    )


@query(
    "pooled_retrieval",
    f"""
    WITH c AS (
      SELECT vec_id // 5 AS doc_id,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 1048576.0 + 0.5)
                         AS BIGINT)) AS qv
      FROM embeddings),
    m AS (
      SELECT doc_id, i, CAST(sum(qv[i]) AS DOUBLE) / count(*) AS mu
      FROM c, unnest(range(1, 65)) AS t(i)
      GROUP BY doc_id, i),
    p AS (SELECT doc_id, list(mu ORDER BY i) AS pv FROM m GROUP BY doc_id),
    u AS (
      SELECT doc_id,
             list_transform(pv, x -> x / nullif({_NORM.format(a='pv')}, 0.0))
               AS v
      FROM p),
    qv2 AS (SELECT v AS q FROM u WHERE doc_id = 0),
    scored AS (
      SELECT doc_id,
             round({_DOT.format(a='v', b='q')} /
                   ({_NORM.format(a='v')} * {_NORM.format(a='q')}), 6)
               AS cos_sim
      FROM u, qv2 WHERE doc_id != 0)
    SELECT doc_id, cos_sim FROM scored
    ORDER BY cos_sim DESC, doc_id LIMIT 10
    """,
    doc="The chunk->document retrieval chain: 5 consecutive chunk "
    "embeddings per document are mean-pooled (operators/similarity."
    "mean_pool), unit-normalized (functions/vectors.l2_normalize), and "
    "the pooled doc-0 vector retrieves the cosine top-10 documents "
    "(cosine_topk) — the standard shape for long-document retrieval "
    "where chunks are embedded separately. Oracle-exact: components "
    "quantize to int64 (floor(x*2^20+0.5), the LSH family's "
    "quantizer) BEFORE pooling, so the distributed per-dimension mean "
    "is an order-free integer sum divided by a count — identical "
    "doubles in both engines — and the normalize/cosine folds mirror "
    "the sequential list_reduce order the other cosine oracles pin.",
)
def pooled_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from python_stream_processing_framework_spark.functions.vectors import (
        l2_normalize,
    )
    from python_stream_processing_framework_spark.operators.similarity import (
        mean_pool,
    )

    (embeddings,) = load(spark, sf_dir, "embeddings")
    chunks = embeddings.select(
        F.expr("vec_id div 5").alias("doc_id"),
        F.expr(
            "transform(embedding,"
            " x -> cast(floor(cast(x as double) * 1048576.0 + 0.5) as bigint))"
        ).alias("qv"),
    )
    pooled = mean_pool(chunks, ["doc_id"], "qv", out_col="pv")
    unit = pooled.select("doc_id", l2_normalize(F.col("pv")).alias("embedding"))
    return cosine_topk(unit, query_id=0, id_col="doc_id", k=10).select(
        "doc_id", "cos_sim"
    )


@query(
    "hard_negatives",
    f"""
    WITH {_LSH_CTES},
    scored AS (
      SELECT id_a, id_b, {_LSH_COS} AS cos_sim
      FROM cand JOIN sigs a ON a.vec_id = id_a JOIN sigs b ON b.vec_id = id_b
      WHERE {_LSH_COS} >= 0.4 AND {_LSH_COS} < 0.95),
    sym AS (
      SELECT id_a AS vec_id, id_b AS negative_id, cos_sim FROM scored
      UNION ALL
      SELECT id_b, id_a, cos_sim FROM scored),
    ranked AS (
      SELECT vec_id, negative_id, cos_sim,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY cos_sim DESC, negative_id) AS rank
      FROM sym)
    SELECT vec_id, negative_id, cos_sim, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= 3
    """,
    doc="Hard-negative mining for contrastive training "
    "(operators/similarity.hard_negatives): per anchor, the top-3 "
    "candidates in the similarity band 0.4 <= cos < 0.95 — above is a "
    "near-dup (a false negative that would poison the loss), below is "
    "an easy negative not worth training on. Pure composition over "
    "the sign-LSH pair machinery (sub-quadratic banding, integer-"
    "exact cosines), symmetrized and ranked with one window shuffle "
    "on the anchor. Oracle replays the LSH CTEs + band filter + "
    "window rank.",
)
def hard_negatives_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from python_stream_processing_framework_spark.operators.similarity import (
        hard_negatives,
    )

    (embeddings,) = load(spark, sf_dir, "embeddings")
    out = hard_negatives(
        embeddings, lo=0.4, hi=0.95, per_anchor=3, bands=8, band_bits=4
    )
    return out.select(
        "vec_id", "negative_id", "cos_sim", F.col("rank").cast("int").alias("rank")
    )
