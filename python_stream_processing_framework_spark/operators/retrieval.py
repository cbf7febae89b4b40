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

from pyspark.sql import DataFrame
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
