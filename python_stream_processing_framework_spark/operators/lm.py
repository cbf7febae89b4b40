"""N-gram language-model perplexity scoring — the CCNet filter.

Beyond-reference capability (SURVEY §2.7 charter): the standard
quality filter for LLM pretraining corpora (CCNet, Wenzek et al. 2019;
used by LLaMA/RedPajama/FineWeb pipelines) scores every document with
a small n-gram language model trained on trusted text and drops or
buckets documents by perplexity. The reference engine
(/root/reference/pspf) has no text statistics at all; this module
supplies the train + score pair Spark-first.

Model: an add-k-smoothed bigram LM over whitespace tokens with a BOS
marker::

    lp(w | ctx) = ln( (c(ctx, w) + k) / (c(ctx) + k * (V + 1)) )

where ``V`` is the training vocabulary size and the ``+1`` reserves a
slot for unseen tokens (any (ctx, w) the training corpus never saw
falls back toward the uniform floor ``-ln(V + 1)``). A document's
score is its mean token log-probability — perplexity is
``exp(-avg_lp)``, monotone in it, so filtering thresholds on
``avg_lp`` directly and no exp() need enter the comparison.

Scale shape:

- **Training** is one corpus scan: token explode -> two chained
  groupBy counts (bigram, then context marginal derived FROM the
  bigram frame, so contexts cost a second small shuffle over the
  count table, not a second corpus scan). Count tables are
  vocab-bounded (|V|² worst case, Zipf-tiny in practice), NOT
  corpus-sized.
- **Scoring** is one corpus scan + two equi-joins against the count
  frames. The joins are left joins keyed on (ctx, w) / ctx; at
  sf-test sizes AQE broadcasts the count side, at 100 TB they stay
  shuffle hash joins on a key whose build side has exactly one row
  per key (no build-side skew; probe-side hot keys like stopword
  contexts are ordinary shuffle-join traffic AQE's skew handling
  splits).
- Nothing corpus-sized ever reaches the driver: the only collect is
  the 1-row vocabulary-size scalar (the same bounded-metadata
  contract as retrieval.bm25's (N, avgdl)).

Determinism (oracle contract): each per-document sum of token
log-probs folds in POSITION order — array_sort(collect_list(
struct(pos, lp))) then a left fold seeded with 0.0 — so the double
summation has a fixed association order any engine reproduces.
Every count enters the probability as an exact-integer-valued DOUBLE
and the division/ln expression shape is mirrored verbatim in the
DuckDB oracle; the final 6dp round absorbs sub-ulp libm drift
(retrieval.py's established contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from python_stream_processing_framework_spark.operators.retrieval import tokenize_expr

#: Beginning-of-document marker prepended before the first token so the
#: first real token is conditioned on a document-start context.
BOS = "<s>"


def _padded_tokens(df: DataFrame, text_col: str):
    """Tokenize and prepend BOS; returns (padded_array, n_tokens)."""
    toks = tokenize_expr(F.col(text_col))
    padded = F.concat(F.array(F.lit(BOS)), toks)
    return padded, F.size(toks)


def _bigram_explode(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One row per (doc, position): the bigram (ctx, w) at each token.

    Positions are 1-based over the REAL tokens (BOS itself is never a
    predicted word, only a context). Zero-token documents produce no
    rows — sequence() would count DOWN from (2, 1), so the guard is
    semantics, not just hygiene.
    """
    padded, n = _padded_tokens(df, text_col)
    pos = F.when(n >= 1, F.sequence(F.lit(2), F.size(padded))).otherwise(
        F.array().cast("array<int>")
    )
    return (
        df.select(
            F.col(id_col),
            n.cast("long").alias("n_tokens"),
            padded.alias("_p"),
            F.explode(pos).alias("_i"),
        )
        .select(
            id_col,
            "n_tokens",
            (F.col("_i") - F.lit(1)).alias("pos"),
            F.col("_p")[F.col("_i") - 2].alias("ctx"),
            F.col("_p")[F.col("_i") - 1].alias("w"),
        )
    )


def train_bigram_lm(
    train_df: DataFrame,
    id_col: str,
    text_col: str,
) -> tuple[DataFrame, DataFrame, int]:
    """Count bigrams over a training corpus.

    Returns ``(bigram_counts, context_counts, vocab_size)``:
    ``bigram_counts`` has columns (ctx, w, c), ``context_counts``
    (ctx, cc) — both counts as exact-integer-valued DOUBLE so the
    smoothed division is bit-reproducible in any engine —
    and ``vocab_size`` is the exact number of distinct training
    tokens (BOS excluded), the one scalar this trainer collects.
    """
    grams = _bigram_explode(train_df, id_col, text_col)
    bigrams = grams.groupBy("ctx", "w").agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    # marginal from the count table, not a second corpus scan
    contexts = bigrams.groupBy("ctx").agg(F.sum("c").alias("cc"))
    vocab_size = (
        train_df.select(
            F.explode(tokenize_expr(F.col(text_col))).alias("t")
        )
        .agg(F.countDistinct("t").alias("v"))
        .collect()[0]["v"]
    )
    return bigrams, contexts, int(vocab_size)


def score_bigram_lm(
    df: DataFrame,
    bigrams: DataFrame,
    contexts: DataFrame,
    vocab_size: int,
    id_col: str,
    text_col: str,
    *,
    add_k: float = 0.5,
) -> DataFrame:
    """Mean token log-probability per document under the trained LM.

    Returns (id_col, n_tokens, avg_lp) with avg_lp rounded to 6dp;
    zero-token documents keep a row with n_tokens=0 and NULL avg_lp
    (a filter must decide their fate explicitly, not lose them).
    Lower avg_lp = higher perplexity = less like the training corpus.
    """
    ev = _bigram_explode(df, id_col, text_col)
    denom_k = F.lit(float(add_k)) * F.lit(float(vocab_size + 1))
    lp = (
        ev.join(bigrams, ["ctx", "w"], "left")
        .join(contexts, ["ctx"], "left")
        .select(
            id_col,
            "n_tokens",
            "pos",
            F.log(
                (F.coalesce(F.col("c"), F.lit(0.0)) + F.lit(float(add_k)))
                / (F.coalesce(F.col("cc"), F.lit(0.0)) + denom_k)
            ).alias("lp"),
        )
    )
    summed = lp.groupBy(id_col).agg(
        F.first("n_tokens").alias("n_tokens"),
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "lp"))),
                lambda s: s["lp"],
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("_sum"),
    )
    scored = summed.select(
        id_col,
        "n_tokens",
        F.round(F.col("_sum") / F.col("n_tokens"), 6).alias("avg_lp"),
    )
    # zero-token docs never enter the explode; re-attach them with NULL
    empties = (
        df.select(F.col(id_col))
        .join(scored.select(id_col), [id_col], "left_anti")
        .select(
            id_col,
            F.lit(0).cast("long").alias("n_tokens"),
            F.lit(None).cast("double").alias("avg_lp"),
        )
    )
    return scored.unionByName(empties)


def lm_filter(
    df: DataFrame,
    scored: DataFrame,
    id_col: str,
    *,
    min_avg_lp: float,
) -> DataFrame:
    """Keep documents whose mean log-prob clears the floor.

    The CCNet keep-rule: documents too surprising to the trusted LM
    (avg_lp below the threshold — including NULL-scored empty docs)
    are dropped. Join is an equi semi-join on the id; the scored frame
    carries only (id, score), never text, so at 100 TB the join sides
    are id-width."""
    keep = scored.filter(F.col("avg_lp") >= F.lit(float(min_avg_lp))).select(id_col)
    return df.join(keep, [id_col], "left_semi")
