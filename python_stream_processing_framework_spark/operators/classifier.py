"""Classifier-based quality scoring: the filter step modern corpus
pipelines run after the rule batteries (the DCLM / FineWeb-Edu
pattern — train a cheap linear text classifier on weak labels, score
every document, keep the top of the distribution).

Beyond-reference capability (SURVEY §2.7); the reference has no text
operators at all. Spark-first shape: training is ONE explode +
groupBy pass (vocabulary-sized output), scoring is a broadcast hash
join of the corpus' token stream against the weight table — the
corpus never shuffles. A fastText / transformer scorer slots into
the same two-function contract as an Arrow `mapInPandas` stage;
these built-ins keep the whole path JVM-side.

Determinism contract (same as operators/pq.py): every weight is an
integer in MICRO-UNITS computed with integer division, and the
document score is an integer mean of integers — no transcendental
functions, no float summation order, so DuckDB replays the full
train + score pipeline bit-exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from python_stream_processing_framework_spark.operators.common import maybe_broadcast
from python_stream_processing_framework_spark.operators.dedup import tokens_expr

#: Weight scale: probabilities are stored as integers in [0, 1e6].
MICRO = 1_000_000


def classifier_train(
    df: DataFrame,
    id_col: str,
    text_col: str,
    label_col: str,
    *,
    smoothing: int = 1,
) -> DataFrame:
    """Train token weights from weakly-labeled documents.

    Bernoulli naive-Bayes shape: each document votes once per
    DISTINCT token (presence, not count — a doc repeating one word
    500 times gets one vote, the same robustness argument as
    document-frequency boilerplate mining). Per token the output row
    is (token, n_pos, n_neg, w_micro) where ``w_micro`` is the
    Laplace-smoothed positive-class posterior in micro-units::

        w_micro = (n_pos + s) * 1_000_000 DIV (n_pos + n_neg + 2*s)

    Integer floor division — exact in every engine; 500_000 is the
    neutral point (token seen equally in both classes).

    Scale shape: one map-side explode of distinct tokens feeding one
    partially-aggregated groupBy — the single shuffle is bounded by
    vocabulary, not corpus size. Labels are whatever weak signal the
    pipeline has (a rule battery verdict, a domain allowlist, an
    LM-scored seed set); `label_col` must be boolean.
    """
    if smoothing < 1:
        raise ValueError(f"smoothing must be >= 1, got {smoothing}")
    toks = df.select(
        F.col(label_col).cast("boolean").alias("_y"),
        F.explode(F.array_distinct(tokens_expr(text_col))).alias("token"),
    )
    pos = F.sum(F.when(F.col("_y"), 1).otherwise(0)).cast("bigint")
    neg = F.sum(F.when(F.col("_y"), 0).otherwise(1)).cast("bigint")
    return (
        toks.groupBy("token")
        .agg(pos.alias("n_pos"), neg.alias("n_neg"))
        .withColumn(
            "w_micro",
            F.expr(
                f"(n_pos + {smoothing}) * {MICRO} DIV "
                f"(n_pos + n_neg + {2 * smoothing})"
            ).cast("bigint"),
        )
    )


def classifier_score(
    df: DataFrame,
    weights: DataFrame,
    id_col: str,
    text_col: str,
    *,
    broadcast_row_cap: int | None = None,
) -> DataFrame:
    """Score documents against a trained weight table.

    Output: (id, n_matched, score_micro) — ``n_matched`` distinct
    tokens found in the vocabulary and ``score_micro`` their integer
    mean weight (floor), i.e. the mean positive-class posterior of
    the document's known tokens in micro-units. 500_000 is neutral;
    rank/threshold on it the way DCLM thresholds its fastText score.
    Documents with NO in-vocabulary token produce no row (the join is
    inner): callers wanting them back left-join and impute neutral.

    Scale shape: map-side distinct-token explode, then ONE hash join
    against the weight table. The broadcast hint is size-gated
    (``common.maybe_broadcast``): a fastText-sized 2M-row vocabulary
    broadcasts comfortably, but the weight table is user-supplied and
    unbounded in principle, so above ``common.BROADCAST_ROW_CAP`` the
    join stays a plain equi-join and AQE decides. When broadcast, the
    corpus is never exchanged by the join; only (id, weight) pairs
    shuffle for the final mean.
    """
    toks = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(tokens_expr(text_col))).alias("token"),
    )
    joined = toks.join(
        maybe_broadcast(
            weights.select("token", "w_micro"), max_rows=broadcast_row_cap
        ),
        "token",
    )
    return (
        joined.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_matched"),
            F.sum("w_micro").alias("_sw"),
        )
        .select(
            F.col(id_col),
            F.col("n_matched"),
            F.expr("_sw DIV n_matched").cast("bigint").alias("score_micro"),
        )
    )
