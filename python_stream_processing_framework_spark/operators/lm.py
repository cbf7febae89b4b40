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

Determinism (oracle contract): each token's log-prob is quantized to
integer NANO-units (round(lp * 1e9) as BIGINT — the functions/
exact.py "integer cents" pattern) so the per-document sum is an
order-free exact integer sum: Spark gets map-side partial
aggregation and a narrow shuffle, and any engine reproduces the sum
bit-exact regardless of association order. Every count enters the
probability as an exact-integer-valued DOUBLE, the division/ln
expression shape is mirrored verbatim in the DuckDB oracle, and the
final 6dp round is computed from the nano sum identically in both.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from python_stream_processing_framework_spark.operators.retrieval import tokenize_expr

#: Beginning-of-document marker prepended before the first token so the
#: first real token is conditioned on a document-start context.
BOS = "<s>"


def _bigram_pairs(text_col: str):
    """Array of (ctx, w) structs: the bigram predicting each token.

    BOS itself is never a predicted word, only a context. Built as
    zip_with over two slices of the padded array so the generator
    emits ONLY the pair structs — an explode over position indices
    would carry the whole padded token array into every output row
    and re-index it there, which dominated the scoring scan's cost.
    Zero-token documents yield an empty array (slice of length 0).
    """
    toks = tokenize_expr(F.col(text_col))
    padded = F.concat(F.array(F.lit(BOS)), toks)
    n = F.size(toks)
    return F.zip_with(
        F.slice(padded, 1, n),
        F.slice(padded, 2, n),
        lambda a, b: F.struct(a.alias("ctx"), b.alias("w")),
    )


def _bigram_explode(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One row per real token: the bigram (ctx, w) predicting it.
    Zero-token documents produce no rows."""
    return df.select(
        F.col(id_col), F.explode(_bigram_pairs(text_col)).alias("_pr")
    ).select(id_col, "_pr.ctx", "_pr.w")


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
    from python_stream_processing_framework_spark.operators.common import materialize

    grams = _bigram_explode(train_df, id_col, text_col)
    # ONE corpus scan total: the materialized count table feeds the
    # context marginals, the vocabulary size, AND both scoring joins.
    bigrams = materialize(
        grams.groupBy("ctx", "w").agg(
            F.count(F.lit(1)).cast("double").alias("c")
        )
    )
    contexts = bigrams.groupBy("ctx").agg(F.sum("c").alias("cc"))
    # every training token has a predecessor (BOS for the first), so
    # the distinct `w` values ARE the vocabulary — a count over the
    # cached vocab-bounded table, not a second corpus scan
    vocab_size = bigrams.select("w").distinct().count()
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
    # explode_outer keeps zero-token documents as one NULL-pair row,
    # so ONE corpus scan yields both the per-token log-probs and the
    # token counts (count of non-null pairs) — no second base scan,
    # no join back, no anti-join recomputing the aggregation.
    ev = df.select(
        F.col(id_col), F.explode_outer(_bigram_pairs(text_col)).alias("_pr")
    ).select(
        id_col, F.col("_pr.ctx").alias("ctx"), F.col("_pr.w").alias("w")
    )
    denom_k = F.lit(float(add_k)) * F.lit(float(vocab_size + 1))
    # Determinism WITHOUT a positional fold: quantize each token's
    # log-prob to integer nano-units (the functions/exact.py "integer
    # cents" pattern, same as similarity.py's int8 path) so the
    # per-document sum is an order-free exact BIGINT sum — Spark gets
    # map-side partial aggregation and a narrow shuffle instead of a
    # per-doc struct sort, and any engine reproduces it bit-exact.
    lp = (
        ev.join(bigrams, ["ctx", "w"], "left")
        .join(contexts, ["ctx"], "left")
        .select(
            id_col,
            F.when(
                F.col("w").isNotNull(),
                F.round(
                    F.log(
                        (
                            F.coalesce(F.col("c"), F.lit(0.0))
                            + F.lit(float(add_k))
                        )
                        / (F.coalesce(F.col("cc"), F.lit(0.0)) + denom_k)
                    )
                    * F.lit(1e9)
                ).cast("bigint"),
            ).alias("lp_nano"),
        )
    )
    return lp.groupBy(id_col).agg(
        F.count("lp_nano").alias("n_tokens"),
        F.round(
            F.sum("lp_nano").cast("double")
            / F.lit(1e9)
            / F.count("lp_nano"),
            6,
        ).alias("avg_lp"),
    )


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
