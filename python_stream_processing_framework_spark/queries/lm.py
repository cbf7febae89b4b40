"""LM-perplexity catalog query: the CCNet quality filter's scorer.

The oracle replays the full train + score pipeline (operators/lm.py)
in DuckDB: same tokenizer (whitespace-run split of trimmed lowercase,
zero tokens for blank text), same BOS padding, the same 80% training
split (doc_id % 5 < 4), identical add-0.5 smoothing over an exact
(V + 1) denominator, and the same nano-unit quantization
(round(lp * 1e9) AS BIGINT) whose integer sum is order-free — so the
6dp-rounded mean log-probs compare bit-exact with no fold-order
coupling at all (similarity.py's integer-cents contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_stream_processing_framework_spark.catalog import load
from python_stream_processing_framework_spark.operators.lm import (
    score_bigram_lm,
    train_bigram_lm,
)
from python_stream_processing_framework_spark.queries.base import query

_ADD_K = 0.5

_ORACLE = f"""
    WITH tok AS (
      SELECT doc_id,
             CASE WHEN trim(lower(text)) = ''
                  THEN CAST([] AS VARCHAR[])
                  ELSE regexp_split_to_array(trim(lower(text)), '\\s+')
             END AS toks
      FROM documents),
    pad AS (
      SELECT doc_id, list_concat(['<s>'], toks) AS p,
             CAST(len(toks) AS BIGINT) AS n
      FROM tok),
    big AS (
      SELECT p[i-1] AS ctx, p[i] AS w, CAST(count(*) AS DOUBLE) AS c
      FROM pad, unnest(range(2, len(p) + 1)) AS u(i)
      WHERE doc_id % 5 < 4
      GROUP BY 1, 2),
    ctxc AS (SELECT ctx, sum(c) AS cc FROM big GROUP BY ctx),
    voc AS (
      SELECT CAST(count(DISTINCT t) AS DOUBLE) AS v
      FROM (SELECT unnest(toks) AS t FROM tok WHERE doc_id % 5 < 4)),
    ev AS (
      SELECT doc_id, p[i-1] AS ctx, p[i] AS w
      FROM pad, unnest(range(2, len(p) + 1)) AS u(i)),
    lp AS (
      SELECT doc_id,
             CAST(round(ln((coalesce(b.c, 0.0) + {_ADD_K})
                           / (coalesce(x.cc, 0.0) + {_ADD_K} * (v + 1.0)))
                        * 1e9) AS BIGINT) AS lp_nano
      FROM ev
      LEFT JOIN big b USING (ctx, w)
      LEFT JOIN ctxc x USING (ctx)
      CROSS JOIN voc),
    agg AS (SELECT doc_id, sum(lp_nano) AS s FROM lp GROUP BY doc_id)
    SELECT doc_id, n AS n_tokens,
           round(CAST(s AS DOUBLE) / 1e9 / n, 6) AS avg_lp
    FROM pad LEFT JOIN agg USING (doc_id)
    ORDER BY avg_lp ASC, doc_id LIMIT 25
    """


@query(
    "lm_doc_scores",
    _ORACLE,
    doc="CCNet-style bigram-LM perplexity scoring (operators/lm.py): "
    "train add-0.5-smoothed bigram counts on the 80% split "
    "(doc_id % 5 < 4), score EVERY document's mean token log-prob, "
    "return the 25 most-surprising documents. One training scan + "
    "one scoring scan + two count-table equi-joins; nothing "
    "corpus-sized reaches the driver. Oracle replays tokenizer, BOS, "
    "counts, smoothing, and the nano-quantized order-free sum "
    "bit-exact.",
)
def lm_doc_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    train = documents.filter(F.col("doc_id") % 5 < 4)
    bigrams, contexts, v = train_bigram_lm(train, "doc_id", "text")
    scored = score_bigram_lm(
        documents, bigrams, contexts, v, "doc_id", "text", add_k=_ADD_K
    )
    # asc_nulls_last matches DuckDB's ASC default (NULLS LAST), so a
    # zero-token document can never reorder the two engines' top-25
    return scored.orderBy(
        F.col("avg_lp").asc_nulls_last(), F.col("doc_id").asc()
    ).limit(25)
