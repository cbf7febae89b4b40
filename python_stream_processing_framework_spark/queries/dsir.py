"""DSIR importance-resampling catalog query with an exact oracle.

The oracle replays the whole pipeline (operators/dsir.py) in DuckDB:
the whitespace-run tokenizer, unigram+bigram hashed features
(md5-prefix bucket hash — the engine-portable hash28_mod), add-k
bucket models over both corpus splits, nano-quantized per-bucket
log-ratios whose per-document dot product is an exact integer sum,
and the Gumbel top-k selection keyed on the hash60 uniform — so the
selected set, weights, and keys compare bit-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_stream_processing_framework_spark.catalog import load
from python_stream_processing_framework_spark.operators.dsir import (
    dsir_log_ratios,
    dsir_scores,
    dsir_select,
    hashed_ngram_features,
)
from python_stream_processing_framework_spark.queries.base import query

_B = 10_000
_ADD_K = 0.5
_N = 50
_SEED = "r7"
_HS = float(16**15)

_ORACLE = f"""
    WITH tok AS (
      SELECT doc_id,
             CASE WHEN trim(lower(text)) = ''
                  THEN CAST([] AS VARCHAR[])
                  ELSE regexp_split_to_array(trim(lower(text)), '\\s+')
             END AS toks
      FROM documents),
    grams AS (
      SELECT doc_id, unnest(toks) AS g FROM tok
      UNION ALL
      SELECT doc_id, toks[i] || ' ' || toks[i+1] AS g
      FROM tok, unnest(range(1, len(toks))) AS u(i)),
    feat AS (
      SELECT doc_id,
             CAST('0x' || substr(md5(g), 1, 7) AS BIGINT) % {_B} AS bucket,
             CAST(count(*) AS BIGINT) AS cnt
      FROM grams GROUP BY 1, 2),
    tcnt AS (SELECT bucket, sum(cnt) AS ct FROM feat
             WHERE doc_id % 5 = 4 GROUP BY bucket),
    rcnt AS (SELECT bucket, sum(cnt) AS cr FROM feat
             WHERE doc_id % 5 < 4 GROUP BY bucket),
    tot AS (SELECT
      (SELECT coalesce(sum(cnt), 0) FROM feat WHERE doc_id % 5 = 4) AS tt,
      (SELECT coalesce(sum(cnt), 0) FROM feat WHERE doc_id % 5 < 4) AS tr),
    lr AS (
      SELECT coalesce(t.bucket, r.bucket) AS bucket,
             CAST(round((ln((coalesce(ct, 0) + {_ADD_K}) / (tt + {_ADD_K} * {_B}))
                       - ln((coalesce(cr, 0) + {_ADD_K}) / (tr + {_ADD_K} * {_B})))
                      * 1e9) AS BIGINT) AS lr_nano
      FROM tcnt t FULL OUTER JOIN rcnt r ON t.bucket = r.bucket
      CROSS JOIN tot),
    unseen AS (
      SELECT CAST(round((ln({_ADD_K} / (tt + {_ADD_K} * {_B}))
                       - ln({_ADD_K} / (tr + {_ADD_K} * {_B}))) * 1e9) AS BIGINT)
             AS ulr
      FROM tot),
    sc AS (
      SELECT doc_id, sum(cnt) AS n_grams,
             sum(cnt * coalesce(lr_nano, ulr)) AS s
      FROM feat LEFT JOIN lr USING (bucket) CROSS JOIN unseen
      WHERE doc_id % 5 < 4
      GROUP BY doc_id),
    pool AS (SELECT doc_id FROM documents WHERE doc_id % 5 < 4),
    scored AS (
      SELECT doc_id,
             CAST(coalesce(n_grams, 0) AS BIGINT) AS n_grams,
             round(CAST(coalesce(s, 0) AS DOUBLE) / 1e9, 6) AS log_weight
      FROM pool LEFT JOIN sc USING (doc_id)),
    keyed AS (
      SELECT doc_id, n_grams, log_weight,
             round(log_weight + -ln(-ln(
               (CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                                        || '#dsir#{_SEED}'), 1, 15) AS BIGINT)
                + 0.5) / {_HS})), 6) AS sel_key
      FROM scored)
    SELECT doc_id, n_grams, log_weight, sel_key
    FROM keyed ORDER BY sel_key DESC, doc_id LIMIT {_N}
    """


@query(
    "dsir_select",
    _ORACLE,
    doc="DSIR importance resampling (Xie et al. 2023; operators/"
    "dsir.py): fit hashed unigram+bigram bucket models (10k buckets) "
    "on the 20% target split (doc_id % 5 = 4) and the 80% raw pool, "
    "score every raw document's importance log-weight as an exact "
    "integer dot product against nano-quantized per-bucket "
    "log-ratios, select 50 via deterministic Gumbel top-k. Feature "
    "scans are corpus passes; the model/ratio tables are bounded by "
    "n_buckets (broadcast by construction); selection is "
    "TakeOrderedAndProject. Oracle replays features, models, "
    "quantized ratios, scores, and the Gumbel key bit-exact.",
)
def dsir_select_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from python_stream_processing_framework_spark.operators.common import (
        persist_lazy,
    )

    (documents,) = load(spark, sf_dir, "documents")
    target = documents.filter(F.col("doc_id") % 5 == 4)
    raw = documents.filter(F.col("doc_id") % 5 < 4)
    tf = hashed_ngram_features(target, "doc_id", "text", n_buckets=_B)
    # ONE raw-corpus explode shared by ratio estimation and scoring
    # (r15): the outer frame feeds dsir_scores directly; its non-null
    # rows are exactly the default hashed_ngram_features output the
    # ratio side needs
    rf_outer = persist_lazy(
        hashed_ngram_features(
            raw, "doc_id", "text", n_buckets=_B, keep_empty_docs=True
        )
    )
    rf = rf_outer.filter(F.col("bucket").isNotNull())
    ratios, unseen = dsir_log_ratios(tf, rf, n_buckets=_B, add_k=_ADD_K)
    scored = dsir_scores(
        raw, ratios, unseen, "doc_id", "text", n_buckets=_B, feats=rf_outer
    )
    return dsir_select(scored, "doc_id", n=_N, seed=_SEED)
