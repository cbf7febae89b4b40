"""CCNet head/middle/tail perplexity bucketing (operators/lm.py
perplexity_buckets).

The last CCNet stage: within each language, partition documents into
three equal-mass perplexity bands — head (least surprising under the
trusted LM), middle, tail. The oracle embeds the SAME bigram-LM
scoring CTEs as `lm_doc_scores` (queries/lm.py BIGRAM_SCORED_CTES —
one source of truth), then replays the tercile rule: micro-quantized
scores, exact order-statistic cutoffs on the per-language cumulative
histogram (cut i = smallest score whose cumulative count reaches
ceil(i*n/3), integer arithmetic), threshold CASE assignment. Output
is the per-(lang, bucket) roll-up in exact integers, so the compare
is bit-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_stream_processing_framework_spark.catalog import load
from python_stream_processing_framework_spark.operators.lm import (
    perplexity_buckets,
    score_bigram_lm,
    train_bigram_lm,
)
from python_stream_processing_framework_spark.queries.base import query
from python_stream_processing_framework_spark.queries.lm import (
    _ADD_K,
    _MIN_COUNT,
    BIGRAM_SCORED_CTES,
)

_ORACLE = f"""
    WITH {BIGRAM_SCORED_CTES},
    sl AS (
      SELECT s.doc_id, d.lang,
             CAST(round(s.avg_lp * 1e6) AS BIGINT) AS sm
      FROM scored s JOIN documents d USING (doc_id)
      WHERE s.n_tokens >= 1),
    hist AS (SELECT lang, sm, count(*) AS c FROM sl GROUP BY 1, 2),
    cum AS (
      SELECT lang, sm,
             sum(c) OVER (PARTITION BY lang ORDER BY sm) AS cum,
             sum(c) OVER (PARTITION BY lang) AS n
      FROM hist),
    thr AS (
      SELECT lang,
             min(CASE WHEN cum >= (n + 2) // 3 THEN sm END) AS t1,
             min(CASE WHEN cum >= (2 * n + 2) // 3 THEN sm END) AS t2
      FROM cum GROUP BY lang),
    lab AS (
      SELECT sl.lang,
             CASE WHEN sm <= t1 THEN 'tail'
                  WHEN sm <= t2 THEN 'middle'
                  ELSE 'head' END AS bucket,
             sm
      FROM sl JOIN thr USING (lang))
    SELECT lang, bucket, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(sm) AS BIGINT) AS sum_lp_micro,
           min(sm) AS min_lp_micro, max(sm) AS max_lp_micro
    FROM lab GROUP BY 1, 2 ORDER BY lang, bucket
    """


@query(
    "ccnet_buckets",
    _ORACLE,
    doc="CCNet head/middle/tail perplexity bucketing (Wenzek et al. "
    "2020; operators/lm.perplexity_buckets): score every document "
    "with the pruned bigram LM (same train split and smoothing as "
    "lm_doc_scores), then partition each language into three "
    "equal-mass perplexity bands. The cutoffs are exact order "
    "statistics over the DISTINCT-quantized-score histogram — never "
    "an NTILE global sort per language — and assignment is a "
    "map-side CASE against the broadcast one-row-per-language "
    "threshold table. Returns the per-(lang, bucket) roll-up in "
    "exact micro-unit integers. Oracle embeds lm_doc_scores' scoring "
    "CTEs verbatim and replays the tercile rule bit-exact.",
)
def ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    train = documents.filter(F.col("doc_id") % 5 < 4)
    bigrams, contexts, v = train_bigram_lm(
        train, "doc_id", "text", min_count=_MIN_COUNT
    )
    scored = score_bigram_lm(
        documents, bigrams, contexts, v, "doc_id", "text", add_k=_ADD_K
    )
    with_lang = scored.filter(F.col("n_tokens") >= 1).join(
        documents.select("doc_id", "lang"), ["doc_id"]
    )
    bucketed = perplexity_buckets(with_lang, "lang", "avg_lp", n_buckets=3)
    return (
        bucketed.groupBy("lang", "bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("score_micro").cast("bigint").alias("sum_lp_micro"),
            F.min("score_micro").alias("min_lp_micro"),
            F.max("score_micro").alias("max_lp_micro"),
        )
        .orderBy("lang", "bucket")
    )
