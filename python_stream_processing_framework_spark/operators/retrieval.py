"""Keyword retrieval over the corpus — BM25 scoring at scale.

Beyond-reference capability (SURVEY §2.7 charter): corpus curation
needs lexical retrieval — "find the training docs most relevant to
this probe query" drives targeted decontamination (retrieve-then-
verify beats hashing when the leak is a paraphrase), quality auditing
(what does the corpus say about X?), and dataset search UIs. The
reference has no text scoring of any kind.

BM25 (Robertson/Sparck Jones; the Okapi formulation every search
engine ships):

    score(D, Q) = sum_t idf(t) * tf(t,D)*(k1+1)
                            / (tf(t,D) + k1*(1 - b + b*|D|/avgdl))
    idf(t) = ln(1 + (N - df(t) + 0.5) / (df(t) + 0.5))

Scale shape: the query's term set is TINY, so everything prunes to it
immediately —

- TWO corpus scans total: one narrow scan aggregates the (N, avgdl)
  corpus constants; one scan + token explode (filtered to query terms
  inside the same stage, so non-query tokens never reach a shuffle)
  feeds the materialized tf frame — df(t), idf, and scoring all read
  that tiny cache, never the corpus again;
- final scoring is a groupBy(doc) over at most |docs_with_a_hit| x
  |terms| rows + TakeOrderedAndProject for the top-k. In a serving
  deployment (N, avgdl, df) are precomputed index statistics and the
  per-query cost drops to the pruned scan alone.

Determinism: the per-doc sum folds term scores in SORTED term order
(array_sort(collect_list(struct(term, score)))), so the double
summation has a fixed association order — same result on any
partitioning, reproducible in any engine.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tokenize_expr(col):
    """Lowercase whitespace-run tokens, Python ``str.split()``
    semantics: runs of any whitespace separate tokens and blank text
    yields ZERO tokens (``split`` alone returns ``['']`` there, which
    would count empty docs as length 1 and skew avgdl). NOTE: this is
    deliberately NOT dedup.tokens_expr — that family splits on single
    spaces (its oracle contract, pinned by shipped hashes), so token
    counts can differ on multi-whitespace text."""
    trimmed = F.trim(F.lower(col))
    return F.when(
        F.length(trimmed) == 0, F.array().cast("array<string>")
    ).otherwise(F.split(trimmed, r"\s+"))


def bm25_topk(
    df: DataFrame,
    query: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents by BM25 relevance to ``query``.

    Output: (id_col, bm25) with bm25 rounded to 6dp; ties break by id.
    Documents sharing no term with the query never appear (score 0).
    """
    terms = sorted({t for t in query.strip().lower().split() if t})
    if not terms:
        raise ValueError("query must contain at least one term")

    toks = df.select(
        F.col(id_col),
        tokenize_expr(F.col(text_col)).alias("_toks"),
    ).select(
        F.col(id_col),
        F.size("_toks").cast("double").alias("_dl"),
        F.explode("_toks").alias("_t"),
    )

    # (N, avgdl): two corpus scalars from one narrow aggregation over
    # doc lengths (distinct on id after the explode would rescan; use
    # the pre-explode frame instead).
    stats = (
        df.select(F.size(tokenize_expr(F.col(text_col))).cast("double").alias("_dl"))
        .agg(F.count(F.lit(1)).alias("_n"), F.avg("_dl").alias("_avgdl"))
        .collect()[0]
    )
    n_docs = int(stats["_n"])
    if n_docs == 0 or stats["_avgdl"] is None or float(stats["_avgdl"]) == 0.0:
        raise ValueError("bm25_topk: corpus is empty (no documents/tokens)")
    avgdl = float(stats["_avgdl"])

    from python_stream_processing_framework_spark.operators.common import materialize

    hits = toks.filter(F.col("_t").isin(terms))
    # tf is tiny (docs-with-a-hit x |terms| rows) but its lineage is
    # the full corpus scan + explode: materialize it so the df_counts
    # collect below and the scoring job both read the cache instead of
    # each re-running the scan (release via common.release_caches()).
    tf = materialize(
        hits.groupBy(id_col, "_t").agg(
            F.count(F.lit(1)).cast("double").alias("_tf"),
            F.first("_dl").alias("_dl"),
        )
    )
    df_counts = {
        r["_t"]: r["_df"]
        for r in tf.groupBy("_t").agg(F.count(F.lit(1)).alias("_df")).collect()
    }
    # idf per term, computed driver-side (|terms| values) with plain
    # math.log — the identical IEEE op any reimplementation performs.
    idf = {
        t: math.log(1.0 + (n_docs - dfc + 0.5) / (dfc + 0.5))
        for t, dfc in df_counts.items()
    }
    if not idf:
        # no query term occurs in the corpus: every score is 0 and
        # zero-score docs never appear — return the empty result
        # directly (an empty F.create_map() has VOID key type and
        # fails analysis)
        return df.sparkSession.createDataFrame(
            [], f"{id_col} {dict(df.dtypes)[id_col]}, bm25 double"
        )
    idf_expr = F.create_map(
        *[x for t, v in sorted(idf.items()) for x in (F.lit(t), F.lit(v))]
    )

    denom = F.col("_tf") + k1 * (1.0 - b + b * F.col("_dl") / F.lit(avgdl))
    term_score = (idf_expr[F.col("_t")] * F.col("_tf") * (k1 + 1.0) / denom).alias(
        "_s"
    )
    # fixed-order fold: sort (term, score) pairs, then sum — the
    # association order of the double additions is deterministic
    scored = (
        tf.select(F.col(id_col), F.col("_t"), term_score)
        .groupBy(id_col)
        .agg(
            F.round(
                F.aggregate(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("_t", "_s"))),
                        lambda p: p["_s"],
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                6,
            ).alias("bm25")
        )
    )
    return scored.orderBy(F.col("bm25").desc(), F.col(id_col)).limit(k)


def _sorted_fold(pairs: Column, value) -> Column:
    """Deterministic double sum: sort (term, weight) structs, map each
    to ``value(struct)``, left-fold with a 0.0 seed — the same
    association order on any partitioning and in any engine."""
    return F.aggregate(
        F.transform(F.array_sort(pairs), value),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def tfidf_topk(
    df: DataFrame,
    query: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    broadcast_row_cap: int | None = None,
) -> DataFrame:
    """Top-k documents by tf-idf cosine similarity to ``query``.

    The vector-space-model complement to :func:`bm25_topk` — and the
    structurally different half of lexical retrieval: BM25 only ever
    touches query terms, while the cosine denominator needs each
    document's FULL tf-idf norm, i.e. idf statistics over the entire
    vocabulary. That full-vocab pass is exactly the inverted-index
    build a search deployment runs offline, so this operator doubles
    as the index-statistics job.

    Formulation (smoothed idf, the sklearn/Lucene-classic form):

        idf(t)   = ln((1 + N) / (1 + df(t))) + 1
        w(t, d)  = tf(t, d) * idf(t)
        score    = dot(w_q, w_d) / (||w_q|| * ||w_d||)

    Scale shape: ONE corpus scan + token explode feeds the (doc, term,
    tf) frame, materialized once because two narrow consumers read it
    — the vocabulary df aggregation (Zipf-tiny output, broadcast back)
    and the per-document aggregation that computes the norm and the
    query-term hits in a SINGLE groupBy(doc). Scoring is then map-only
    over docs-with-a-hit. Two shuffles total (tf, per-doc agg), both
    on pre-aggregated rows, never raw text.

    Determinism: every double sum (doc norms, query norm, dot product)
    folds in SORTED term order with a 0.0 seed, so scores reproduce
    bit-exact on any partitioning and replay bit-exact in DuckDB.

    Output: (id_col, tfidf_cosine) rounded to 6dp, ties by id.
    Documents sharing no term with the query never appear.
    """
    qtoks = [t for t in query.strip().lower().split() if t]
    if not qtoks:
        raise ValueError("query must contain at least one term")
    qtf = {t: float(qtoks.count(t)) for t in sorted(set(qtoks))}
    terms = sorted(qtf)

    n_docs = df.count()
    if n_docs == 0:
        raise ValueError("tfidf_topk: corpus is empty")
    one_plus_n = 1.0 + n_docs

    toks = df.select(
        F.col(id_col),
        F.explode(tokenize_expr(F.col(text_col))).alias("_t"),
    )

    from python_stream_processing_framework_spark.operators.common import (
        materialize,
        maybe_broadcast,
    )

    # (doc, term, tf): the inverted-index frame. Materialized because
    # BOTH the df aggregation and the per-doc norm aggregation read it;
    # projected to three narrow columns first so no text is cached.
    tf = materialize(
        toks.groupBy(id_col, "_t").agg(F.count(F.lit(1)).cast("double").alias("_tf"))
    )

    # Vocabulary df -> idf. Size-gated broadcast: "unique terms only"
    # is tiny relative to the corpus but NOT bounded (~1e8-1e9 tokens
    # at 100 TB of web text), so the hint applies only under the row
    # cap; above it the join stays a plain equi-join and AQE decides.
    # Materialized HERE (not inside maybe_broadcast, whose probe is
    # deliberately bounded): the query-term collect below re-reads
    # dfc, and the cached count doubles as the gate's known_count.
    dfm = materialize(
        tf.groupBy("_t").agg(F.count(F.lit(1)).cast("double").alias("_df"))
    )
    dfc = maybe_broadcast(
        dfm, max_rows=broadcast_row_cap, known_count=dfm.count()
    )
    idf_col = F.log(F.lit(one_plus_n) / (1.0 + F.col("_df"))) + 1.0

    weighted = tf.join(dfc, "_t").select(
        F.col(id_col),
        F.col("_t"),
        (F.col("_tf") * idf_col).alias("_w"),
    )

    # Query vector, driver-side: |terms| values. df for absent terms
    # is 0 (idf = ln(1+N) + 1) — they widen the query norm only.
    df_q = {
        r["_t"]: float(r["_df"])
        for r in dfm.filter(F.col("_t").isin(terms)).collect()
    }
    qw = {
        t: qtf[t] * (math.log(one_plus_n / (1.0 + df_q.get(t, 0.0))) + 1.0)
        for t in terms
    }
    norm_q = math.sqrt(_py_sorted_sq_sum(qw))
    qw_expr = F.create_map(
        *[x for t in terms for x in (F.lit(t), F.lit(qw[t]))]
    )

    # ONE per-doc aggregation computes both the full-vocab norm and
    # the query-term hit list; scoring is map-only afterwards.
    hit = F.when(F.col("_t").isin(terms), F.struct("_t", "_w"))
    per_doc = weighted.groupBy(id_col).agg(
        F.sqrt(_sorted_fold(F.collect_list(F.struct("_t", "_w")), lambda p: p["_w"] * p["_w"])).alias("_norm"),
        F.collect_list(hit).alias("_hits"),
    )
    dot = _sorted_fold(F.col("_hits"), lambda p: p["_w"] * qw_expr[p["_t"]])
    scored = per_doc.filter(F.size("_hits") > 0).select(
        F.col(id_col),
        F.round(dot / (F.col("_norm") * F.lit(norm_q)), 6).alias("tfidf_cosine"),
    )
    return scored.orderBy(F.col("tfidf_cosine").desc(), F.col(id_col)).limit(k)


def _py_sorted_sq_sum(qw: dict[str, float]) -> float:
    """Left-fold of squared weights in sorted term order with a 0.0
    seed — mirrors _sorted_fold exactly (fsum would NOT: different
    association)."""
    acc = 0.0
    for t in sorted(qw):
        acc = acc + qw[t] * qw[t]
    return acc
