"""Keyword-retrieval catalog query: BM25 top-k over the documents table.

The oracle replays the full Okapi BM25 computation (operators/
retrieval.py) in DuckDB: same tokenizer (whitespace-run split on
trimmed lowercase), same corpus statistics (N, avgdl — exact because
doc lengths are integers, so the double sums are order-free), same
idf/tf formula with identical literal-arithmetic association order,
and the same SORTED-term left fold for the per-document score sum —
so the 6dp-rounded scores compare bit-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from python_stream_processing_framework_spark.catalog import load
from python_stream_processing_framework_spark.operators.retrieval import (
    bm25_topk,
    tfidf_topk,
)
from python_stream_processing_framework_spark.queries.base import query

#: The probe query: three terms from the synthetic corpus vocabulary,
#: alphabetically unsorted on purpose (the operator sorts internally).
_Q = "window spark merge"
_TERMS_SQL = "('merge', 'spark', 'window')"


@query(
    "bm25_topk",
    f"""
    WITH tok AS (
      SELECT doc_id,
             CASE WHEN trim(lower(text)) = ''
                  THEN CAST([] AS VARCHAR[])
                  ELSE regexp_split_to_array(trim(lower(text)), '\\s+')
             END AS toks
      FROM documents),
    stats AS (
      SELECT count(*) AS n, avg(CAST(len(toks) AS DOUBLE)) AS avgdl FROM tok),
    hits AS (
      SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl, unnest(toks) AS t
      FROM tok),
    tf AS (
      SELECT doc_id, t, dl, CAST(count(*) AS DOUBLE) AS tf
      FROM hits WHERE t IN {_TERMS_SQL}
      GROUP BY doc_id, t, dl),
    dfc AS (SELECT t, count(*) AS df FROM tf GROUP BY t),
    scored AS (
      SELECT doc_id, t,
             ln(1.0 + (n - df + 0.5) / (df + 0.5))
               * tf * (1.2 + 1.0)
               / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)) AS s
      FROM tf JOIN dfc USING (t), stats)
    SELECT doc_id,
           round(list_reduce(
             list_transform(list_sort(list(struct_pack(t := t, s := s))),
                            p -> p.s),
             (acc, x) -> acc + x), 6) AS bm25
    FROM scored GROUP BY doc_id
    ORDER BY bm25 DESC, doc_id LIMIT 10
    """,
    doc="Okapi BM25 top-10 for the probe query 'window spark merge' "
    "(operators/retrieval.bm25_topk): query-term-pruned corpus scan, "
    "(N, avgdl) corpus constants, ln-idf, and a sorted-term "
    "deterministic score fold; oracle replays every step bit-exact "
    "including the fold association order.",
)
def bm25_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    # cache lifecycle: the tf frame the operator pins is released by
    # the harness's common.release_caches() sweep, like every other
    # materialize()-backed catalog query
    return bm25_topk(documents, _Q, id_col="doc_id", text_col="text", k=10)


#: tf-idf probe: 'stream' repeated on purpose so the query tf weights
#: are exercised (qtf = {merge: 1, spark: 1, stream: 2}).
_TFIDF_Q = "spark stream stream merge"
_TFIDF_TERMS_SQL = "('merge', 'spark', 'stream')"


@query(
    "tfidf_topk",
    f"""
    WITH tok AS (
      SELECT doc_id,
             CASE WHEN trim(lower(text)) = ''
                  THEN CAST([] AS VARCHAR[])
                  ELSE regexp_split_to_array(trim(lower(text)), '\\s+')
             END AS toks
      FROM documents),
    n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM tok),
    tf AS (
      SELECT doc_id, t, CAST(count(*) AS DOUBLE) AS tf
      FROM (SELECT doc_id, unnest(toks) AS t FROM tok)
      GROUP BY doc_id, t),
    dfc AS (SELECT t, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY t),
    w AS (
      SELECT doc_id, t, tf * (ln((1.0 + n) / (1.0 + df)) + 1.0) AS w
      FROM tf JOIN dfc USING (t), n),
    qt(t, qtf) AS (VALUES ('merge', 1.0), ('spark', 1.0), ('stream', 2.0)),
    qw AS (
      SELECT qt.t, qt.qtf * (ln((1.0 + n) / (1.0 + coalesce(dfc.df, 0.0))) + 1.0) AS qw
      FROM qt LEFT JOIN dfc ON qt.t = dfc.t, n),
    qnorm AS (
      SELECT sqrt(list_reduce(
        list_transform(list_sort(list(struct_pack(t := t, w := qw))),
                       p -> p.w * p.w),
        (acc, x) -> acc + x)) AS qn
      FROM qw),
    norms AS (
      SELECT doc_id, sqrt(list_reduce(
        list_transform(list_sort(list(struct_pack(t := t, w := w))),
                       p -> p.w * p.w),
        (acc, x) -> acc + x)) AS norm
      FROM w GROUP BY doc_id),
    dots AS (
      SELECT doc_id, list_reduce(
        list_transform(list_sort(list(struct_pack(t := w.t, x := w.w * qw.qw))),
                       p -> p.x),
        (acc, x) -> acc + x) AS dot
      FROM w JOIN qw ON w.t = qw.t WHERE w.t IN {_TFIDF_TERMS_SQL}
      GROUP BY doc_id)
    SELECT d.doc_id, round(d.dot / (norms.norm * qnorm.qn), 6) AS tfidf_cosine
    FROM dots d JOIN norms USING (doc_id), qnorm
    ORDER BY tfidf_cosine DESC, doc_id LIMIT 10
    """,
    doc="Vector-space tf-idf cosine top-10 for the probe 'spark stream "
    "stream merge' (operators/retrieval.tfidf_topk): smoothed idf over "
    "the FULL vocabulary (the inverted-index statistics build), "
    "per-document norms and query-term dot products in one "
    "aggregation, sorted-term deterministic folds throughout; the "
    "oracle replays vocabulary df, both norms, and the dot bit-exact.",
)
def tfidf_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    return tfidf_topk(documents, _TFIDF_Q, id_col="doc_id", text_col="text", k=10)
