"""Trained char-n-gram multiclass classifier catalog query with an
exact oracle (operators/charclf.py, r14 verdict #2).

The oracle replays the WHOLE pipeline in DuckDB: whitespace-run
tokens, ``<``/``>``-padded char trigrams, the md5-prefix bucket hash
(hash28_mod), dense-per-observed-bucket multinomial NB weights with
add-k smoothing nano-quantized as ``round(1e9 * ln(...))``, unseen
fallback, doc-count priors, exact integer scoring, and the
(score DESC, label ASC) argmax — so trained predictions compare
bit-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_stream_processing_framework_spark.catalog import load
from python_stream_processing_framework_spark.operators.charclf import (
    charclf_predict,
    charclf_train,
)
from python_stream_processing_framework_spark.queries.base import query

_N = 3
_B = 4_096
_ADD_K = 0.5

_ORACLE = f"""
    WITH tok AS (
      SELECT doc_id, lang,
             unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS w
      FROM documents WHERE trim(coalesce(text, '')) <> ''),
    grams AS (
      SELECT doc_id, lang, substr('<' || w || '>', i, {_N}) AS g
      FROM tok, unnest(range(1, len(w) + 4 - {_N})) AS u(i)
      WHERE len(w) + 3 - {_N} >= 1),
    feat AS (
      SELECT doc_id, lang,
             CAST('0x' || substr(md5(g), 1, 7) AS BIGINT) % {_B} AS bucket,
             CAST(count(*) AS BIGINT) AS cnt
      FROM grams GROUP BY 1, 2, 3),
    counts AS (
      SELECT lang AS label, bucket, sum(cnt) AS c
      FROM feat WHERE doc_id % 5 <> 0 GROUP BY 1, 2),
    doc_counts AS (
      SELECT lang AS label, count(*) AS nd
      FROM documents WHERE doc_id % 5 <> 0 GROUP BY 1),
    totals AS (
      SELECT d.label, coalesce(s.t, 0) AS t
      FROM doc_counts d LEFT JOIN
           (SELECT label, sum(c) AS t FROM counts GROUP BY 1) s
           USING (label)),
    observed AS (SELECT DISTINCT bucket FROM counts),
    dense AS (
      SELECT t.label, o.bucket,
             CAST(round(ln((coalesce(c.c, 0) + {_ADD_K})
                           / (t.t + {_ADD_K} * {_B})) * 1e9) AS BIGINT)
               AS w_nano
      FROM observed o CROSS JOIN totals t
      LEFT JOIN counts c ON c.label = t.label AND c.bucket = o.bucket),
    meta AS (
      SELECT t.label,
             CAST(round(ln({_ADD_K} / (t.t + {_ADD_K} * {_B})) * 1e9)
                  AS BIGINT) AS unseen_nano,
             CAST(round(ln(CAST(d.nd AS DOUBLE)
                           / (SELECT sum(nd) FROM doc_counts)) * 1e9)
                  AS BIGINT) AS prior_nano
      FROM totals t JOIN doc_counts d USING (label)),
    test_feat AS (SELECT doc_id, bucket, cnt FROM feat WHERE doc_id % 5 = 0),
    matched AS (
      SELECT f.doc_id, w.label,
             sum(f.cnt * w.w_nano) AS ms, sum(f.cnt) AS mc
      FROM test_feat f JOIN dense w USING (bucket)
      GROUP BY 1, 2),
    doc_tot AS (
      SELECT d.doc_id, coalesce(s.tot, 0) AS tot
      FROM (SELECT doc_id FROM documents WHERE doc_id % 5 = 0) d
      LEFT JOIN (SELECT doc_id, sum(cnt) AS tot FROM test_feat GROUP BY 1) s
      USING (doc_id)),
    scored AS (
      SELECT dt.doc_id, m.label,
             CAST(m.prior_nano + coalesce(x.ms, 0)
                  + (dt.tot - coalesce(x.mc, 0)) * m.unseen_nano
                  AS BIGINT) AS score_nano
      FROM doc_tot dt CROSS JOIN meta m
      LEFT JOIN matched x ON x.doc_id = dt.doc_id AND x.label = m.label),
    best AS (
      SELECT doc_id, label, score_nano,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score_nano DESC, label) AS rn
      FROM scored)
    SELECT doc_id, label AS pred, score_nano FROM best WHERE rn = 1
    """


@query(
    "charclf_predict",
    _ORACLE,
    doc="Trained fastText-shape language classifier (operators/"
    "charclf.py; Joulin et al. 2016): train multinomial-NB "
    "log-weights over hashed <padded> char trigrams (4096 buckets, "
    "add-0.5 smoothing, nano-quantized) on the 80% split "
    "(doc_id % 5 <> 0) of documents with lang as the label, then "
    "predict the held-out 20% — exact integer argmax with "
    "(score DESC, label ASC) ties. Training is one explode -> "
    "(label, bucket) groupBy bounded by |labels| x n_buckets; "
    "serving broadcast-joins the gram stream against the "
    "label-pivoted model and pays ONE id-keyed shuffle, argmax a "
    "map-only struct-min over driver-literal priors. Oracle replays "
    "features, smoothing, quantization, unseen fallback, priors, "
    "and tie-break bit-exact.",
)
def charclf_predict_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    train = documents.filter(F.col("doc_id") % 5 != 0)
    test = documents.filter(F.col("doc_id") % 5 == 0)
    model = charclf_train(
        train, "doc_id", "text", "lang", n=_N, n_buckets=_B, add_k=_ADD_K
    )
    return charclf_predict(
        test, model, "doc_id", "text", n=_N, n_buckets=_B
    )
