"""LM-perplexity catalog queries: the CCNet quality filter's scorer.

The oracles replay the full train + score pipelines (operators/lm.py)
in DuckDB: same tokenizer (whitespace-run split of trimmed lowercase,
zero tokens for blank text), same BOS padding, the same 80% training
split (doc_id % 5 < 4), identical smoothing arithmetic, and the same
nano-unit quantization (round(lp * 1e9) AS BIGINT) whose integer sum
is order-free — so the 6dp-rounded mean log-probs compare bit-exact
with no fold-order coupling at all (similarity.py's integer-cents
contract).

`lm_doc_scores` is the add-k bigram path WITH min_count=2 count
pruning (r7): singleton bigrams are dropped before scoring, the
context marginals re-derive from the pruned table, and the vocabulary
is counted pre-prune — one HAVING clause in the oracle.
`lm_backoff_scores` is the stupid-backoff trigram path (Brants et
al. 2007): highest surviving order's relative frequency, alpha=0.4
per backed-off order, add-k unigram base.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_stream_processing_framework_spark.catalog import load
from python_stream_processing_framework_spark.operators.lm import (
    score_backoff_lm,
    score_bigram_lm,
    train_backoff_lm,
    train_bigram_lm,
)
from python_stream_processing_framework_spark.queries.base import query

_ADD_K = 0.5
_MIN_COUNT = 2
_ALPHA = 0.4

# Shared CTE core: tokenizer -> BOS pad -> pruned bigram counts ->
# smoothing -> nano-quantized per-doc sums -> `scored`(doc_id,
# n_tokens, avg_lp). Embedded verbatim by `lm_doc_scores` and by
# queries/ccnet.py's tercile-bucket oracle so the two replays can
# never drift.
BIGRAM_SCORED_CTES = f"""
    tok AS (
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
      GROUP BY 1, 2
      HAVING count(*) >= {_MIN_COUNT}),
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
    agg AS (SELECT doc_id, sum(lp_nano) AS s FROM lp GROUP BY doc_id),
    scored AS (
      SELECT doc_id, n AS n_tokens,
             round(CAST(s AS DOUBLE) / 1e9 / n, 6) AS avg_lp
      FROM pad LEFT JOIN agg USING (doc_id))
    """

_ORACLE = f"""
    WITH {BIGRAM_SCORED_CTES}
    SELECT doc_id, n_tokens, avg_lp FROM scored
    ORDER BY avg_lp ASC, doc_id LIMIT 25
    """


@query(
    "lm_doc_scores",
    _ORACLE,
    doc="CCNet-style bigram-LM perplexity scoring (operators/lm.py): "
    "train add-0.5-smoothed bigram counts on the 80% split "
    "(doc_id % 5 < 4) with min_count=2 pruning (r7 — singleton "
    "bigrams dropped, marginals re-derived from the pruned table, "
    "vocabulary counted pre-prune), score EVERY document's mean "
    "token log-prob, return the 25 most-surprising documents. One "
    "training scan + one scoring scan + two count-table equi-joins; "
    "nothing corpus-sized reaches the driver. Oracle replays "
    "tokenizer, BOS, counts, the pruning HAVING, smoothing, and the "
    "nano-quantized order-free sum bit-exact.",
)
def lm_doc_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    train = documents.filter(F.col("doc_id") % 5 < 4)
    bigrams, contexts, v = train_bigram_lm(
        train, "doc_id", "text", min_count=_MIN_COUNT
    )
    scored = score_bigram_lm(
        documents, bigrams, contexts, v, "doc_id", "text", add_k=_ADD_K
    )
    # asc_nulls_last matches DuckDB's ASC default (NULLS LAST), so a
    # zero-token document can never reorder the two engines' top-25
    return scored.orderBy(
        F.col("avg_lp").asc_nulls_last(), F.col("doc_id").asc()
    ).limit(25)


# Stupid-backoff trigram oracle: the top-order (trigram) count table
# is built once; bigram/unigram tables marginalize its context suffix
# — mirroring train_backoff_lm's derive-don't-rescan shape — then the
# scorer CASE-cascades highest-surviving-order relative frequency
# with ln(alpha) per backed-off order and the add-k unigram base.
_BACKOFF_ORACLE = f"""
    WITH tok AS (
      SELECT doc_id,
             CASE WHEN trim(lower(text)) = ''
                  THEN CAST([] AS VARCHAR[])
                  ELSE regexp_split_to_array(trim(lower(text)), '\\s+')
             END AS toks
      FROM documents),
    pad AS (
      SELECT doc_id, list_concat(['<s>', '<s>'], toks) AS p,
             CAST(len(toks) AS BIGINT) AS n
      FROM tok),
    tri AS (
      SELECT p[i-2] || ' ' || p[i-1] AS ctx, p[i] AS w,
             CAST(count(*) AS DOUBLE) AS c
      FROM pad, unnest(range(3, len(p) + 1)) AS u(i)
      WHERE doc_id % 5 < 4
      GROUP BY 1, 2
      HAVING count(*) >= {_MIN_COUNT}),
    tri_all AS (
      SELECT p[i-2] || ' ' || p[i-1] AS ctx, p[i] AS w,
             CAST(count(*) AS DOUBLE) AS c
      FROM pad, unnest(range(3, len(p) + 1)) AS u(i)
      WHERE doc_id % 5 < 4
      GROUP BY 1, 2),
    bi AS (
      SELECT string_split(ctx, ' ')[2] AS ctx, w, sum(c) AS c
      FROM tri_all GROUP BY 1, 2
      HAVING sum(c) >= {_MIN_COUNT}),
    uni AS (
      SELECT w, sum(c) AS c FROM tri_all GROUP BY w
      HAVING sum(c) >= {_MIN_COUNT}),
    tric AS (SELECT ctx, sum(c) AS cc FROM tri GROUP BY ctx),
    bic AS (SELECT ctx, sum(c) AS cc FROM bi GROUP BY ctx),
    scal AS (
      SELECT CAST(count(DISTINCT w) AS DOUBLE) AS v,
             CAST(sum(c) AS DOUBLE) AS nn
      FROM tri_all),
    ev AS (
      SELECT doc_id, p[i-2] || ' ' || p[i-1] AS ctx3, p[i-1] AS ctx2,
             p[i] AS w
      FROM pad, unnest(range(3, len(p) + 1)) AS u(i)),
    lp AS (
      SELECT doc_id,
             CAST(round((CASE
               WHEN t.c IS NOT NULL THEN ln(t.c / tc.cc)
               WHEN b.c IS NOT NULL THEN ln(b.c / bc.cc) + ln({_ALPHA})
               ELSE ln((coalesce(un.c, 0.0) + {_ADD_K})
                       / (nn + {_ADD_K} * (v + 1.0)))
                    + 2.0 * ln({_ALPHA})
             END) * 1e9) AS BIGINT) AS lp_nano
      FROM ev
      LEFT JOIN tri t ON t.ctx = ev.ctx3 AND t.w = ev.w
      LEFT JOIN tric tc ON tc.ctx = ev.ctx3
      LEFT JOIN bi b ON b.ctx = ev.ctx2 AND b.w = ev.w
      LEFT JOIN bic bc ON bc.ctx = ev.ctx2
      LEFT JOIN uni un ON un.w = ev.w
      CROSS JOIN scal),
    agg AS (SELECT doc_id, sum(lp_nano) AS s FROM lp GROUP BY doc_id)
    SELECT doc_id, n AS n_tokens,
           round(CAST(s AS DOUBLE) / 1e9 / n, 6) AS avg_lp
    FROM pad LEFT JOIN agg USING (doc_id)
    ORDER BY avg_lp ASC, doc_id LIMIT 25
    """


@query(
    "lm_backoff_scores",
    _BACKOFF_ORACLE,
    doc="Stupid-backoff trigram scoring (Brants et al. 2007; "
    "operators/lm.py train_backoff_lm/score_backoff_lm): trigram/"
    "bigram/unigram counts from ONE corpus scan (lower orders "
    "marginalize the trigram table's context suffix), min_count=2 "
    "pruning per order, score = highest surviving order's relative "
    "frequency with alpha=0.4 per backed-off order and an add-k "
    "unigram base. The web-scale n>=4 answer: pruning keeps tables "
    "vocab-bounded and backoff keeps pruned mass finite. Oracle "
    "replays the derivation, cascade, and nano-quantized sum "
    "bit-exact.",
)
def lm_backoff_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    train = documents.filter(F.col("doc_id") % 5 < 4)
    orders, v, nn = train_backoff_lm(
        train, "doc_id", "text", n=3, min_count=_MIN_COUNT
    )
    scored = score_backoff_lm(
        documents, orders, v, nn, "doc_id", "text",
        n=3, alpha=_ALPHA, add_k=_ADD_K,
    )
    return scored.orderBy(
        F.col("avg_lp").asc_nulls_last(), F.col("doc_id").asc()
    ).limit(25)
