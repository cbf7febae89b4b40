"""Exact set-similarity join via prefix filtering (AllPairs/PPJoin).

Beyond-reference capability (SURVEY §2.7 charter): the dedup module's
candidate generators trade recall for scale (MinHash bands, SimHash
bands, doc-freq-capped inverted index all miss pairs by design). The
prefix-filtered join (Bayardo et al. 2007 "Scaling Up All Pairs
Similarity Search"; Xiao et al. PPJoin) is the EXACT counterpart: for
Jaccard >= t, two token sets must share at least one token among each
set's ``|s| - ceil(t*|s|) + 1`` RAREST tokens (rarity = global
document frequency, ties by token) — so indexing only those prefix
tokens generates every qualifying pair while the hot, common tokens
that make a naive inverted index quadratic never enter the join. No
recall loss, and the pruning strengthens as t rises.

Scale shape: one scan builds per-doc distinct token arrays; the
global df table joins back to rank tokens (size-gated broadcast —
shingle vocabularies run ~1e10 at web scale, so the hint only
applies under ``common.BROADCAST_ROW_CAP``); prefix tokens (a
~(1-t) fraction of each doc's vocabulary)
feed ONE equi-join shuffle; candidate verification joins the two
token-set arrays (candidates only) and computes exact Jaccard with
array_intersect — all JVM expressions, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from python_stream_processing_framework_spark.operators.common import maybe_broadcast
from python_stream_processing_framework_spark.operators.dedup import tokens_expr


def setsim_join(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    threshold: float = 0.6,
    shingle_k: int = 2,
    broadcast_row_cap: int | None = None,
) -> DataFrame:
    """All pairs with set Jaccard >= ``threshold`` — EXACT.

    The set is each document's distinct ``shingle_k``-word shingles
    (``shingle_k=1`` = unigram tokens — beware: on homogeneous
    corpora unigram VOCABULARIES converge and nearly every pair
    qualifies; shingles keep the sets discriminative, which is also
    what makes the prefix filter bite). Output: (id_a, id_b, jaccard)
    with id_a < id_b, jaccard rounded to 6dp. Documents with no
    shingles (blank, or shorter than ``shingle_k`` tokens) are
    excluded.
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    if shingle_k < 1:
        raise ValueError(f"shingle_k must be >= 1, got {shingle_k}")
    set_expr = (
        F.array_distinct(tokens_expr(text_col))
        if shingle_k == 1
        else F.expr(
            f"array_distinct(transform("
            f"  sequence(1, size(_toks) - {shingle_k - 1}),"
            f"  i -> concat_ws(' ', slice(_toks, i, {shingle_k}))))"
        )
    )
    sets = (
        df.filter(F.length(F.trim(F.col(text_col))) > 0)
        .withColumn("_toks", tokens_expr(text_col))
        .filter(F.size("_toks") >= shingle_k)
        .select(F.col(id_col).alias("_id"), set_expr.alias("_s"))
    )
    # Hash the shingle sets to 64-bit images ONCE, up front, and
    # materialize (r15 optimization pass). Everything downstream —
    # df ranking, prefix build, candidate join, verification — now
    # runs on fixed 8 B longs instead of variable-length shingle
    # text, and the scan+tokenize+shingle pipeline executes once
    # instead of four times (the unpersisted form recomputed it under
    # toks, under both prefix sides, and under each verification
    # side). ~8 B/shingle of MEMORY_AND_DISK cache — far below the
    # text it replaces; release_caches() drains it. Collisions can
    # only merge two distinct shingles into one identity, which
    # over-keeps candidates and was already the verification
    # contract's accepted ~n^2/2^64 risk (docstring below).
    from python_stream_processing_framework_spark.operators.common import (
        materialize,
    )

    hsets = materialize(
        sets.select(
            "_id",
            F.expr("array_distinct(transform(_s, s -> xxhash64(s)))").alias(
                "_h"
            ),
        )
    )
    toks = hsets.select("_id", F.explode("_h").alias("_t"))
    # Size-gated broadcast: the distinct-SHINGLE df table is strictly
    # LARGER than the vocabulary (~1e10 2-word shingles on web-scale
    # text), so the hint applies only under the row cap; above it the
    # rarity join is a plain equi-join and AQE picks the strategy.
    dfc = maybe_broadcast(
        toks.groupBy("_t").agg(F.count(F.lit(1)).alias("_df")),
        max_rows=broadcast_row_cap,
    )
    # global rarity order: (df asc, token-hash asc) — a total order
    # shared by every doc, which is all prefix-filter correctness
    # needs (rarity gives the PRUNING POWER; the tie-break among
    # equal-df tokens is arbitrary and the exact verification decides
    # membership regardless)
    ranked = toks.join(dfc, "_t").select(
        "_id", F.struct(F.col("_df"), F.col("_t")).alias("_k"), "_t"
    )
    # prefix = the (n - ceil(t*n) + 1) rarest tokens of each doc: if
    # none of them appears in the other set, the overlap is at most
    # ceil(t*n) - 1 < t*n, so Jaccard < t — no qualifying pair lost.
    # floor() instead of ceil(): floor(t*n) <= ceil(t*n) always, so
    # the prefix is never SHORTER than required — float jitter in
    # t*n (0.6*5 = 3.0000000000000004) would make ceil() over-round
    # and silently drop qualifying pairs; floor costs at most one
    # extra indexed token per doc.
    # prefix rows carry (token, 1-based position in rarity order, set
    # size) so the join can apply PPJoin's positional filter, not just
    # bare AllPairs token sharing. Materialized (r15): the index and
    # probe sides of the candidate join are both derived from this
    # frame, and unpersisted each re-ran the rank join + per-doc
    # sort + posexplode. Prefix rows are a ~(1-t) fraction of the
    # token explode — the smallest corpus-scale frame in the join.
    prefixes = materialize(
        ranked.groupBy("_id")
        .agg(F.collect_list("_k").alias("_ks"))
        .select(
            "_id",
            F.size("_ks").alias("_n"),
            F.posexplode(
                F.expr(
                    f"slice(transform(array_sort(_ks), k -> k._t), 1,"
                    f" cast(size(_ks) - floor({threshold!r} * size(_ks)) + 1"
                    f" as int))"
                )
            ).alias("_pos0", "_t"),
        )
        .select("_id", "_n", (F.col("_pos0") + 1).alias("_pos"), "_t")
    )
    # asymmetric prefixes (AllPairs proper): the smaller set of a pair
    # only needs its INDEX prefix probed — length n - ceil(2t/(1+t)*n)
    # + 1, shorter than the probe prefix because the overlap bound
    # tightens when the partner is at least as large. Canonical
    # orientation (x.n, x.id) < (y.n, y.id) generates each pair once
    # with x the smaller set. All bounds use floor() (safe: over-keeps
    # under float jitter, never drops — the exact verification below
    # decides membership).
    idx_frac = 2.0 * threshold / (1.0 + threshold)
    index_side = prefixes.filter(
        F.col("_pos") <= F.col("_n") - F.floor(F.lit(idx_frac) * F.col("_n")) + 1
    )
    x, y = index_side.alias("x"), prefixes.alias("y")
    xn, yn = F.col("x._n"), F.col("y._n")
    # positional filter (PPJoin): overlap <= 1 + min(|A|-posA,|B|-posB)
    # for the first shared rarity-ordered token, and Jaccard >= t
    # needs overlap >= ceil(t/(1+t)*(|A|+|B|)). (r8 measured the MPJoin
    # aggregated-positions strengthening here — groupBy(pair) +
    # min/max/count bounds — and REJECTED it: it cut dense-regime
    # candidates only 22% (2.6M -> 2.0M on the sf0.1 corpus) while the
    # per-pair aggregation shuffle cost more than the pruning saved;
    # the row filter + distinct keeps the shuffle narrow.)
    alpha = F.floor(F.lit(threshold / (1.0 + threshold)) * (xn + yn))
    ubound = 1 + F.least(xn - F.col("x._pos"), yn - F.col("y._pos"))
    xkey = F.struct(xn, F.col("x._id"))
    ykey = F.struct(yn, F.col("y._id"))
    cand = (
        x.join(y, "_t")
        .filter(
            (xkey < ykey)
            & (xn >= F.floor(F.lit(threshold) * yn))
            & (ubound >= alpha)
        )
        .select(
            F.least(F.col("x._id"), F.col("y._id")).alias("id_a"),
            F.greatest(F.col("x._id"), F.col("y._id")).alias("id_b"),
        )
        .distinct()
    )
    # Verification intersects 64-bit xxhash64 IMAGES of the shingle
    # sets, not the strings: candidate pairs fetch a fixed 8 B/element
    # array instead of variable-length text, and array_intersect
    # hashes longs instead of strings — measured 14.5 s -> 9-10 s for
    # the whole join at sf0.1 (SCALE.md dense-regime note), with the
    # candidate stage now the floor. Set sizes are preserved exactly
    # unless two distinct shingles of the same PAIR collide in 64
    # bits (~n^2/2^64 ~ 1e-12 per pair on 1e3-shingle docs) — far
    # below any realistic corpus noise floor; the brute-force oracle
    # tests would surface a collision deterministically. Both sides
    # read the materialized hsets frame (r15) — no re-scan.
    a = hsets.select(F.col("_id").alias("id_a"), F.col("_h").alias("_sa"))
    b = hsets.select(F.col("_id").alias("id_b"), F.col("_h").alias("_sb"))
    inter = F.size(F.array_intersect("_sa", "_sb"))
    jac = inter.cast("double") / (
        (F.size("_sa") + F.size("_sb") - inter).cast("double")
    )
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )
