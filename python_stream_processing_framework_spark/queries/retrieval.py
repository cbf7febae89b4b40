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
from python_stream_processing_framework_spark.operators.retrieval import bm25_topk
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
