"""N-gram language-model perplexity scoring — the CCNet filter.

Beyond-reference capability (SURVEY §2.7 charter): the standard
quality filter for LLM pretraining corpora (CCNet, Wenzek et al. 2019;
used by LLaMA/RedPajama/FineWeb pipelines) scores every document with
a small n-gram language model trained on trusted text and drops or
buckets documents by perplexity. The reference engine
(/root/reference/pspf) has no text statistics at all; this module
supplies the train + score pair Spark-first.

Model: an add-k-smoothed n-gram LM (default bigram; ``n`` raises the
order — contexts become space-joined (n-1)-token windows, same shape
throughout) over whitespace tokens with BOS markers::

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


def _ngram_pairs(text_col: str, n: int):
    """Array of (ctx, w) structs: the (n-1)-token context predicting
    each token. ``ctx`` is the space-joined window (tokens contain no
    whitespace — the tokenizer splits on it — so the join is
    unambiguous); the first tokens see n-1 BOS markers.

    BOS itself is never a predicted word, only context. Built so the
    generator emits ONLY the pair structs — an explode over position
    indices would carry the whole padded token array into every
    output row and re-index it there, which dominated the scoring
    scan's cost. Zero-token documents yield an empty array.
    """
    toks = tokenize_expr(F.col(text_col))
    padded = F.concat(F.array(*[F.lit(BOS)] * (n - 1)), toks)
    ntok = F.size(toks)
    if n == 2:
        # fast path: two slices zipped, no per-element re-slicing
        return F.zip_with(
            F.slice(padded, 1, ntok),
            F.slice(padded, 2, ntok),
            lambda a, b: F.struct(a.alias("ctx"), b.alias("w")),
        )
    pos = F.when(ntok >= 1, F.sequence(F.lit(1), ntok)).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(
        pos,
        lambda i: F.struct(
            F.array_join(F.slice(padded, i, n - 1), " ").alias("ctx"),
            F.element_at(padded, i + F.lit(n - 1)).alias("w"),
        ),
    )


def _ngram_explode(
    df: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """One row per real token: the (ctx, w) n-gram predicting it.
    Zero-token documents produce no rows."""
    return df.select(
        F.col(id_col), F.explode(_ngram_pairs(text_col, n)).alias("_pr")
    ).select(id_col, "_pr.ctx", "_pr.w")


def train_ngram_lm(
    train_df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 2,
) -> tuple[DataFrame, DataFrame, int]:
    """Count n-grams over a training corpus (default bigram).

    Returns ``(ngram_counts, context_counts, vocab_size)``:
    ``ngram_counts`` has columns (ctx, w, c) where ``ctx`` is the
    space-joined (n-1)-token context, ``context_counts`` (ctx, cc) —
    both counts as exact-integer-valued DOUBLE so the smoothed
    division is bit-reproducible in any engine — and ``vocab_size``
    is the exact number of distinct training tokens (BOS excluded),
    the one scalar this trainer collects. Count-table size is
    bounded by OBSERVED n-grams (Zipf-tiny vs the corpus; grows with
    n, the usual n-gram-LM trade).
    """
    if n < 2:
        raise ValueError(f"n must be >= 2, got {n}")
    from python_stream_processing_framework_spark.operators.common import materialize

    grams = _ngram_explode(train_df, id_col, text_col, n)
    # ONE corpus scan total: the materialized count table feeds the
    # context marginals, the vocabulary size, AND both scoring joins.
    ngrams = materialize(
        grams.groupBy("ctx", "w").agg(
            F.count(F.lit(1)).cast("double").alias("c")
        )
    )
    contexts = ngrams.groupBy("ctx").agg(F.sum("c").alias("cc"))
    # every training token is predicted exactly once (BOS pads the
    # first contexts), so the distinct `w` values ARE the vocabulary
    # — a count over the cached vocab-bounded table, not a second
    # corpus scan
    vocab_size = ngrams.select("w").distinct().count()
    return ngrams, contexts, int(vocab_size)


def train_bigram_lm(
    train_df: DataFrame,
    id_col: str,
    text_col: str,
) -> tuple[DataFrame, DataFrame, int]:
    """Bigram convenience form of `train_ngram_lm` (n=2)."""
    return train_ngram_lm(train_df, id_col, text_col, n=2)


def score_ngram_lm(
    df: DataFrame,
    ngrams: DataFrame,
    contexts: DataFrame,
    vocab_size: int,
    id_col: str,
    text_col: str,
    *,
    add_k: float = 0.5,
    n: int = 2,
) -> DataFrame:
    """Mean token log-probability per document under the trained LM.

    ``n`` must match the order the counts were trained at. Returns
    (id_col, n_tokens, avg_lp) with avg_lp rounded to 6dp;
    zero-token documents keep a row with n_tokens=0 and NULL avg_lp
    (a filter must decide their fate explicitly, not lose them).
    Lower avg_lp = higher perplexity = less like the training corpus.
    """
    if n < 2:
        raise ValueError(f"n must be >= 2, got {n}")
    # explode_outer keeps zero-token documents as one NULL-pair row,
    # so ONE corpus scan yields both the per-token log-probs and the
    # token counts (count of non-null pairs) — no second base scan,
    # no join back, no anti-join recomputing the aggregation.
    ev = df.select(
        F.col(id_col),
        F.explode_outer(_ngram_pairs(text_col, n)).alias("_pr"),
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
        ev.join(ngrams, ["ctx", "w"], "left")
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
    """Bigram convenience form of `score_ngram_lm` (n=2)."""
    return score_ngram_lm(
        df, bigrams, contexts, vocab_size, id_col, text_col,
        add_k=add_k, n=2,
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
