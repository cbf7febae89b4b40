"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling").

Beyond-reference capability (SURVEY §2.7 charter): the published
method for selecting raw web documents that LOOK LIKE a trusted
target corpus. Two bag-of-hashed-ngrams models are fit — one on the
target, one on the raw pool — and each raw document gets an
importance log-weight

    log w(x) = sum_b c_b(x) * [ ln p_target(b) - ln p_raw(b) ]

over hashed n-gram buckets ``b`` (the paper: unigrams + bigrams
hashed into 10k buckets). Selection is Gumbel top-k: sampling k
documents without replacement with probability proportional to
``w(x) ** (1/temperature)`` is exactly taking the top k of
``log w / temperature + Gumbel(0,1)`` (the Gumbel-max trick), which
becomes a deterministic distributed TakeOrdered once the Gumbel draw
derives from an md5 hash of the document id (the sampling.py
determinism pattern).

Scale shape:

- **Featurize** is one corpus scan per corpus: token explode ->
  bucket hash (hash28_mod — engine-portable md5) -> (id, bucket,
  cnt) groupBy with map-side partials. Feature rows per doc are
  bounded by min(doc grams, n_buckets).
- **Models** are bucket-count tables bounded by ``n_buckets`` (10k
  rows — driver/broadcast scale by construction, unlike raw n-gram
  vocabularies). The two corpus totals are the only collected
  scalars.
- **Scoring** is one broadcast join of the feature rows against the
  n_buckets-row log-ratio table + a per-doc integer sum; **selection**
  is TakeOrderedAndProject, never a global sort.

Determinism (oracle contract): per-bucket log-ratios quantize to
integer NANO-units once (round(lr * 1e9) BIGINT), so each document's
score is an exact integer dot product ``sum(c_b * lr_nano_b)`` —
order-free, partial-agg friendly, bit-reproducible in DuckDB. The
Gumbel key derives from the same hash60 uniform the samplers use and
is rounded to 6dp before the comparison; ties break on the id.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from python_stream_processing_framework_spark.functions.hashing import hash28_mod
from python_stream_processing_framework_spark.operators.common import (
    persist_lazy,
)
from python_stream_processing_framework_spark.operators.retrieval import tokenize_expr
from python_stream_processing_framework_spark.operators.sampling import (
    HASH_SPACE,
    _unit_hash,
)

#: The paper's hashed-feature width.
N_BUCKETS = 10_000


def _grams_expr(text_col: str, *, bigrams: bool = True) -> Column:
    """Unigrams (+ adjacent bigrams) of the whitespace tokens — the
    paper's feature set. Built from two shifted slices zipped (the
    lm.py O(n*len) shape), never a per-position re-slice."""
    toks = tokenize_expr(F.col(text_col))
    if not bigrams:
        return toks
    # greatest(.., 0): slice() rejects negative lengths on empty docs
    nbi = F.greatest(F.size(toks) - 1, F.lit(0))
    bi = F.zip_with(
        F.slice(toks, 1, nbi),
        F.slice(toks, 2, nbi),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    return F.concat(toks, bi)


def hashed_ngram_features(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n_buckets: int = N_BUCKETS,
    bigrams: bool = True,
    keep_empty_docs: bool = False,
) -> DataFrame:
    """(id, bucket, cnt): the hashed bag-of-ngrams feature rows.
    One corpus scan; zero-token documents contribute no rows (their
    score is the empty sum = 0, and `dsir_scores` keeps their row).

    ``keep_empty_docs=True`` switches to the dsir_scores frame shape:
    explode_outer, so a zero-gram document keeps one (id, NULL bucket,
    cnt=1) row. A query that both estimates ratios AND scores the same
    corpus builds this outer frame ONCE (persisted), filters
    ``bucket IS NOT NULL`` for the ratio side, and passes the frame to
    :func:`dsir_scores` via ``feats=`` — one corpus explode instead of
    two (r15). The filtered rows are exactly the default output."""
    grams = _grams_expr(text_col, bigrams=bigrams)
    if keep_empty_docs:
        return (
            df.select(F.col(id_col), F.explode_outer(grams).alias("_g"))
            .select(
                id_col,
                F.when(
                    F.col("_g").isNotNull(), hash28_mod(F.col("_g"), n_buckets)
                ).alias("bucket"),
            )
            .groupBy(id_col, "bucket")
            .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        )
    return (
        df.select(F.col(id_col), F.explode(grams).alias("_g"))
        .select(id_col, hash28_mod(F.col("_g"), n_buckets).alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def dsir_log_ratios(
    target_features: DataFrame,
    raw_features: DataFrame,
    *,
    n_buckets: int = N_BUCKETS,
    add_k: float = 0.5,
) -> tuple[DataFrame, int]:
    """Per-bucket nano-quantized importance log-ratio.

    Returns ``(ratios, unseen_lr_nano)``: ``ratios`` is (bucket,
    lr_nano) for every bucket observed in EITHER corpus, where
    ``lr_nano = round(1e9 * [ln((ct+a)/(Tt+a*B)) - ln((cr+a)/(Tr+a*B))])``
    with add-k smoothing over the ``B = n_buckets`` feature space;
    ``unseen_lr_nano`` is the same expression at ct=cr=0 — the
    constant a scored document's bucket falls back to when neither
    corpus observed it. The corpus totals marginalize from the
    materialized count table (ONE bounded collect over <= n_buckets
    rows); the ratio table is <= n_buckets rows by construction."""
    # union-then-aggregate, NOT a full-outer join of the two count
    # tables: a full outer cannot broadcast and plants a sort-merge
    # join in the plan; the tagged union reaches the same (ct, cr)
    # rows through ONE bucket-keyed shuffle with map-side partials.
    unioned = target_features.select(
        "bucket",
        F.col("cnt").alias("_tc"),
        F.lit(0).cast("bigint").alias("_rc"),
    ).unionByName(
        raw_features.select(
            "bucket",
            F.lit(0).cast("bigint").alias("_tc"),
            F.col("cnt").alias("_rc"),
        )
    )
    # persist the <= n_buckets-row count table once: the corpus
    # totals marginalize FROM it (one bounded collect), instead of two
    # extra featurize scans re-running the corpus explode per total.
    # LAZY (r15): the totals collect right below populates the blocks
    # — materialize's eager count was a duplicate job.
    counts = persist_lazy(
        unioned.groupBy("bucket").agg(
            F.sum("_tc").alias("ct"), F.sum("_rc").alias("cr")
        )
    )
    row = counts.agg(F.sum("ct"), F.sum("cr")).collect()[0]
    tt, tr = int(row[0] or 0), int(row[1] or 0)
    a = float(add_k)
    denom_t = float(tt) + a * float(n_buckets)
    denom_r = float(tr) + a * float(n_buckets)
    lr = F.log(
        (F.col("ct").cast("double") + F.lit(a)) / F.lit(denom_t)
    ) - F.log(
        (F.col("cr").cast("double") + F.lit(a)) / F.lit(denom_r)
    )
    ratios = counts.select(
        "bucket",
        F.round(lr * F.lit(1e9)).cast("bigint").alias("lr_nano"),
    )
    unseen = round((math.log(a / denom_t) - math.log(a / denom_r)) * 1e9)
    return ratios, int(unseen)


def dsir_scores(
    df: DataFrame,
    ratios: DataFrame,
    unseen_lr_nano: int,
    id_col: str,
    text_col: str,
    *,
    n_buckets: int = N_BUCKETS,
    bigrams: bool = True,
    feats: DataFrame | None = None,
) -> DataFrame:
    """Importance log-weight per document: (id, n_grams, log_weight).

    ``log_weight`` is the exact integer dot product of the document's
    bucket counts with the nano-quantized log-ratios, divided once
    and rounded to 6dp. Zero-gram documents keep a row with
    log_weight 0.0 (the empty product — they look exactly as much
    like the target as like the raw pool). One corpus scan + one
    broadcast join against the <= n_buckets-row ratio table.

    ``feats``: a pre-built (typically persisted) outer feature frame —
    ``hashed_ngram_features(df, ..., keep_empty_docs=True)`` — shared
    with the ratio-estimation side so the corpus explodes once (r15).
    """
    if feats is None:
        feats = hashed_ngram_features(
            df,
            id_col,
            text_col,
            n_buckets=n_buckets,
            bigrams=bigrams,
            keep_empty_docs=True,
        )
    scored = feats.join(F.broadcast(ratios), ["bucket"], "left").select(
        id_col,
        F.when(F.col("bucket").isNotNull(), F.col("cnt")).otherwise(
            F.lit(0)
        ).alias("_n"),
        F.when(
            F.col("bucket").isNotNull(),
            F.col("cnt")
            * F.coalesce(F.col("lr_nano"), F.lit(int(unseen_lr_nano))),
        )
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("_s"),
    )
    return scored.groupBy(id_col).agg(
        F.sum("_n").cast("bigint").alias("n_grams"),
        F.round(F.sum("_s").cast("double") / F.lit(1e9), 6).alias("log_weight"),
    )


def dsir_select(
    scored: DataFrame,
    id_col: str,
    *,
    n: int,
    temperature: float = 1.0,
    seed: str = "",
    mode: str = "gumbel",
) -> DataFrame:
    """Select ``n`` documents from the scored pool.

    ``mode="gumbel"`` (the paper): sampling n docs without
    replacement with probability proportional to
    ``exp(log_weight / temperature)`` == taking the top n of
    ``log_weight / temperature + Gumbel``, with the Gumbel draw
    ``-ln(-ln(u))`` derived from the deterministic hash60 uniform of
    (id, seed). ``mode="topk"``: plain highest-weight-first (the
    paper's ablation). Both keys round to 6dp with id tie-break, so
    the cut is engine-exact; the plan is TakeOrderedAndProject."""
    if mode not in ("gumbel", "topk"):
        raise ValueError(f"mode must be 'gumbel' or 'topk', got {mode}")
    base = F.col("log_weight") / F.lit(float(temperature))
    if mode == "gumbel":
        u = (_unit_hash(id_col, "dsir#" + seed) + F.lit(0.5)) / F.lit(
            float(HASH_SPACE)
        )
        key = base + -F.log(-F.log(u))
    else:
        key = base
    return (
        scored.withColumn("sel_key", F.round(key, 6))
        .orderBy(F.col("sel_key").desc(), F.col(id_col).asc())
        .limit(n)
    )
