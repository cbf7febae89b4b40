"""Product quantization (PQ) — compressed-domain ANN at corpus scale.

Jegou et al., "Product Quantization for Nearest Neighbor Search"
(TPAMI 2011): split each d-dim vector into ``m`` subvectors, learn a
``k``-centroid codebook per subspace, store each vector as ``m`` small
codes (m bytes at k=256, vs 4*d bytes float32 — a 512x compression at
d=1024 before the float store is even considered). Queries score
against codes via an Asymmetric Distance Computation (ADC) lookup
table, never touching raw vectors.

This is the missing tier of the similarity family (similarity.py):
exact cosine (baseline) -> IVF (scan pruning) -> sign-LSH (pair
mining) -> int8 (4x compression, exact dot) -> PQ (32-512x
compression, table-lookup scoring). At 100 TB of embeddings the PQ
code table is the only representation that fits hot storage.

Spark shapes:
- training: Lloyd iterations as posexplode + broadcast-join +
  groupBy-mean — the same flat-in-dim centroid pattern as
  similarity.ivf_topk (never one aggregate expression per dimension).
  Deterministic: init centroids are the subvectors of the k
  hash-smallest vector ids (partition-invariant), iteration count is
  fixed, and means divide int64 sums of 1e-6-quantized components —
  so the codebook is reproducible run-to-run on any partitioning.
- assignment/encoding: nearest-centroid is ONE Arrow-batched numpy
  matmul per batch against the broadcast codebook (map-only — a
  join + per-pair Catalyst-lambda distance would evaluate an
  interpreted HOF (subvectors x centroids) times, the hazard
  similarity.py documents); the only shuffle in encode is the final
  regroup to one codes-array row per vector id.
- ADC query: the m*k distance table is computed as a tiny broadcast
  plan; scoring is one broadcast join on (subspace, code) + a
  groupBy-sum + TakeOrderedAndProject.

Determinism contract (what makes the family DuckDB-oracle-able): every
distance is computed over 1e-6-QUANTIZED components — xq =
floor(x*1e6 + 0.5) as int64 — so assignment argmins, ADC table
entries, and per-vector ADC sums are exact integer arithmetic with no
summation-order dependence; ties break to the smaller code / id.
Centroids are exact rationals (int64 component sums / 1e6 / count)
materialized through the identical IEEE op sequence in Spark, numpy,
and SQL, then re-quantized with the same floor(c*1e6 + 0.5) before any
distance. The only doubles in the outputs are single exact-rounded
divisions of identical int64s. Quantization error (<= 1e-6 per
component) is negligible against PQ's own approximation error.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from python_stream_processing_framework_spark.functions.hashing import hash60

#: component quantum for exact integer means (matches similarity.ivf)
_Q = 1_000_000


def _quant(col):
    """1e-6 quantization to int64: floor(x*1e6 + 0.5) per component.

    floor(+0.5) (not round()) everywhere — Spark/DuckDB round() differ
    on negative halves (HALF_UP vs half-away nuances); floor of the
    same IEEE double is unambiguous in every engine and in numpy.
    """
    return F.transform(
        col, lambda x: F.floor(x * F.lit(1_000_000.0) + F.lit(0.5)).cast("bigint")
    )


def _l2sq_q(a, b):
    """Integer squared L2 between two quantized bigint arrays (JVM HOF).

    Magnitudes: |xq| <= 1e6 at unit-scale embeddings -> per-component
    square <= 4e12, x 512 dims ~ 2e15 — inside int64 (and these sums
    are exact; no float enters until the final display division).
    """
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )


def _subvec_rows(e: DataFrame, m: int) -> DataFrame:
    """(_id, _sub, _sv): the m subvector rows of every vector."""
    return e.select(
        "_id",
        "_v",
        F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("_sub"),
    ).select(
        "_id",
        "_sub",
        F.expr(
            f"slice(_v, _sub * (size(_v) DIV {m}) + 1, size(_v) DIV {m})"
        ).alias("_sv"),
    )


def _by_sub_from_rows(rows) -> dict[int, tuple]:
    """Build the {sub: (codes, cq, |cq|^2)} assignment dict from
    collected (_sub, code, centroid) rows: codes sorted ascending
    (the tie-break contract), centroids 1e-6-quantized to int64 (the
    module rule). Shared by the per-subvector assign (training) and
    the whole-vector encode — and since r16 also fed DIRECTLY from
    each Lloyd round's collected mean rows, so the loop never
    round-trips a codebook through createDataFrame + collect (one
    local-DataFrame job per round, pure driver overhead)."""
    by_sub: dict[int, tuple] = {}
    for s in {r["_sub"] for r in rows}:
        group = sorted(
            ((r["code"], r["centroid"]) for r in rows if r["_sub"] == s)
        )
        codes = np.array([c for c, _ in group], dtype=np.int32)
        mat = np.array([v for _, v in group], dtype=np.float64)
        cq = np.floor(mat * 1e6 + 0.5).astype(np.int64)
        by_sub[int(s)] = (codes, cq, (cq * cq).sum(axis=1))
    return by_sub


def _collect_codebook(codebook: DataFrame) -> dict[int, tuple]:
    """Collect a (m*k)-row codebook DataFrame to the assign dict."""
    return _by_sub_from_rows(
        codebook.select("_sub", "code", "centroid").collect()
    )


def _shape_of(by_sub: dict[int, tuple]) -> tuple[int, int]:
    """(m, dsub) of a collected codebook — driver-side arithmetic on
    the dict every caller already holds. Replaces the r15
    `_codebook_shape` AGGREGATE JOB over the (local, m*k-row)
    codebook DataFrame, which cost a measured ~0.4 s of scheduling
    per call and ran up to 3x per IVF-PQ query (encode, probe
    selection, ADC scoring) — ~1.2 s of pure driver overhead on a
    fixed-cost path (guide §5: the driver should do almost no data
    work, and equally no data-shaped jobs for driver-known facts)."""
    m = max(by_sub) + 1
    dsub = max(cq.shape[1] for _, cq, _ in by_sub.values())
    return m, dsub


def _assign(sub: DataFrame, by_sub: dict):
    """Nearest-centroid code per (vector, subspace) row, against a
    collected codebook dict (``_by_sub_from_rows`` shape).

    One Arrow-batched numpy matmul per batch against the broadcast
    codebook — NOT a join + per-pair HOF distance: Catalyst lambda
    expressions (zip_with/aggregate) are interpreted, and evaluating
    them once per (subvector x centroid) pair dominated training by
    10x (the same hazard similarity.cosine_lsh_pairs documents for
    its signature pass).

    Distances are integer-exact: both subvector and centroid are
    1e-6-quantized to int64 (floor(v*1e6+0.5), the module contract),
    and the argmin compares |cq|^2 - 2*xq.cq (the row-constant |xq|^2
    dropped — an integer shift that cannot change the argmin). Ties
    break on the smaller code (argmin first-minimum; codes sorted
    ascending) — matching ORDER BY (dist, code) in the SQL oracle.

    Returns (assigned_df, broadcast): the caller owns the broadcast's
    lifecycle — destroy it once every action on assigned_df has run
    (pq_train does, per Lloyd round); leave it alive while the
    DataFrame may still execute (pq_encode's return value).
    """
    from pyspark.sql.functions import pandas_udf

    bc = sub.sparkSession.sparkContext.broadcast(by_sub)

    @pandas_udf("int")
    def _nearest(subspace: pd.Series, sv: pd.Series) -> pd.Series:
        cb = bc.value
        out = np.empty(len(sv), dtype=np.int32)
        subs = subspace.to_numpy()
        for s in np.unique(subs):
            codes, cq, c2 = cb[int(s)]
            idx = np.nonzero(subs == s)[0]
            x = np.stack([np.asarray(v, dtype=np.float64) for v in sv.iloc[idx]])
            xq = np.floor(x * 1e6 + 0.5).astype(np.int64)
            # integer argmin over |cq|^2 - 2 xq.cq^T (|xq|^2 row-constant)
            d = c2[None, :] - 2 * (xq @ cq.T)
            out[idx] = codes[d.argmin(axis=1)]
        return pd.Series(out)

    return sub.withColumn("code", _nearest(F.col("_sub"), F.col("_sv"))), bc


def _check_dim(df: DataFrame, vec_expr, m: int, *, dsub: int | None = None) -> int:
    """Validate vector dim divisible by m (one-row job); returns dim.

    Without this, slice() silently drops the trailing dim % m
    components from training, encoding, and queries — degraded
    distances with no error.
    """
    row = df.select(F.size(vec_expr).alias("_dim")).first()
    if row is None:
        raise ValueError("no vectors to quantize (empty input)")
    dim = int(row["_dim"])
    if dim % m != 0:
        raise ValueError(f"vector dim {dim} is not divisible by m={m}")
    if dsub is not None and dim != m * dsub:
        raise ValueError(
            f"vector dim {dim} != m*dsub = {m}*{dsub} of the codebook"
        )
    return dim


def _adc_table_local(spark, by_sub: dict, qq: list[int], m: int, dsub: int) -> DataFrame:
    """(_sub, code, _d) ADC lookup table as a LOCAL DataFrame:
    integer quantized sq-L2 from the quantized query subvector to
    each quantized centroid, computed driver-side in numpy from the
    collected codebook (m*k rows — bounded by construction). The r15
    shape built this as a crossJoin + interpreted HOF plan over the
    codebook DataFrame, which cost a `_codebook_shape` probe job plus
    plan/codegen overhead per query; the values are the identical
    int64 arithmetic on the identical 1e-6-quantized operands
    (`_by_sub_from_rows` quantizes exactly like `_quant`)."""
    qarr = np.asarray(qq, dtype=np.int64)
    data: list[tuple[int, int, int]] = []
    for s in range(m):
        if s not in by_sub:
            continue
        codes, cq, _ = by_sub[s]
        qs = qarr[s * dsub : (s + 1) * dsub]
        diff = qs[None, :] - cq
        d = (diff * diff).sum(axis=1)
        data.extend(
            (s, int(c), int(dv)) for c, dv in zip(codes.tolist(), d.tolist())
        )
    return spark.createDataFrame(data, "_sub int, code int, _d bigint")


def pq_train(
    embeddings: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    k: int = 16,
    iters: int = 3,
) -> DataFrame:
    """Learn a PQ codebook: (subspace, code, centroid) rows, m*k total.

    Deterministic k-means per subspace: centroids initialize from the
    subvectors of the k vectors with the smallest md5(id) (stable
    under partitioning), then ``iters`` fixed Lloyd rounds. Vector dim
    must be divisible by ``m``.

    The returned codebook is CONCRETE (collected per round and
    rebuilt as a local-data DataFrame): each Lloyd round runs exactly
    one full-data job, its codebook broadcast is destroyed as soon as
    the round completes, and downstream actions (encode, queries)
    replay nothing — without this, every codebook action would rerun
    the final round's whole-dataset assignment pass.

    A centroid that attracts no points DROPS OUT of the codebook
    (the mean step has no rows for it), so a subspace can end up with
    fewer than k codes; assignment and ADC only reference surviving
    codes, so results stay correct — but do not assume exactly m*k
    rows.
    """
    e = embeddings.select(
        F.col(id_col).alias("_id"), F.col(vec_col).cast("array<double>").alias("_v")
    ).filter(F.col("_v").isNotNull())
    _check_dim(e, F.col("_v"), m)
    sub = _subvec_rows(e, m)

    seed_ids = (
        e.select("_id", hash60(F.col("_id").cast("string")).alias("_h"))
        .orderBy("_h", "_id")
        .limit(k)
        .withColumn(
            "code",
            (
                # k rows post-limit: the single-partition window is
                # intentional (partitionBy(lit) just mutes the
                # move-all-data warning for this tiny frame)
                F.row_number().over(Window.partitionBy(F.lit(0)).orderBy("_h", "_id"))
                - 1
            ).cast("int"),
        )
        .select("_id", "code")
    )
    codebook = (
        sub.withColumnRenamed("_id", "_sid")
        .join(F.broadcast(seed_ids), F.col("_sid") == seed_ids["_id"])
        .select("_sub", "code", F.col("_sv").alias("centroid"))
    )

    spark = embeddings.sparkSession
    cb_schema = "_sub int, code int, centroid array<double>"
    # collect the seed codebook ONCE (the round-0 full-data job) and
    # carry each round's codebook as the collected rows + assign dict
    # from there on: the r15 loop rebuilt a local codebook DataFrame
    # per round only for the next round's _collect_codebook to collect
    # it straight back — one local-DataFrame job of pure scheduling
    # overhead per Lloyd round (guide §5). Values are bit-identical:
    # createDataFrame + collect round-trips IEEE doubles exactly.
    rows = codebook.select("_sub", "code", "centroid").collect()
    for _ in range(iters):
        assigned, bc = _assign(sub, _by_sub_from_rows(rows))
        # exact integer means per (subspace, code, position) — flat in
        # dim: (m*k*dsub) rows through two tiny shuffles, never one
        # aggregate expression per dimension.
        comp = (
            assigned.select("_sub", "code", F.posexplode("_sv").alias("_i", "_x"))
            .groupBy("_sub", "code", "_i")
            .agg(
                # floor(x*1e6+0.5), the module-wide quantization rule
                F.sum(
                    F.floor(
                        F.col("_x") * F.lit(1_000_000.0) + F.lit(0.5)
                    ).cast("bigint")
                ).alias("_s"),
                F.count(F.lit(1)).alias("_n"),
            )
        )
        rows = (
            comp.groupBy("_sub", "code")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_i", "_s", "_n"))),
                    lambda t: t["_s"].cast("double") / F.lit(float(_Q)) / t["_n"],
                ).alias("centroid")
            )
            .collect()  # m*k rows: the round's ONE full-data job
        )
        bc.destroy()
    return spark.createDataFrame(
        [(int(r["_sub"]), int(r["code"]), list(r["centroid"])) for r in rows],
        cb_schema,
    )


def pq_encode(
    embeddings: DataFrame,
    codebook: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Compress vectors to (id, codes): an array of m small ints.

    ONE map-only Arrow pass (r15 optimization, guide §2.4/§4): the
    whole-vector batch UDF computes all m subspace argmins per vector
    and emits the codes array directly. The previous shape exploded
    to m subvector rows, ran the same argmin per row, and SHUFFLED
    the corpus to regroup codes per id (groupBy + collect_list) — a
    corpus-linear exchange that pure encoding never needed. Codes are
    bit-identical: the per-subspace integer argmin is the same
    arithmetic on the same 1e-6-quantized slices, and the emitted
    order is subspace-ascending exactly as the regroup's array_sort
    produced.
    """
    by_sub = _collect_codebook(codebook)
    m, dsub = _shape_of(by_sub)
    e = embeddings.select(
        F.col(id_col).alias("_id"), F.col(vec_col).cast("array<double>").alias("_v")
    ).filter(F.col("_v").isNotNull())
    _check_dim(e, F.col("_v"), m, dsub=dsub)
    # the broadcast must outlive the returned (lazy) DataFrame, so it
    # is registered with the session cache tracker instead of being
    # destroyed here — common.release_caches() reclaims it once the
    # encode result has been consumed
    from pyspark.sql.functions import pandas_udf

    from python_stream_processing_framework_spark.operators.common import (
        track_broadcast,
    )
    bc = embeddings.sparkSession.sparkContext.broadcast(by_sub)
    track_broadcast(bc)

    @pandas_udf("array<int>")
    def _codes(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype=object)
        cb = bc.value
        x = np.stack([np.asarray(row, dtype=np.float64) for row in v])
        xq = np.floor(x * 1e6 + 0.5).astype(np.int64)
        out = np.empty((len(v), m), dtype=np.int32)
        for s in range(m):
            codes, cq, c2 = cb[s]
            xs = xq[:, s * dsub : (s + 1) * dsub]
            # integer argmin over |cq|^2 - 2 xq.cq^T (|xq|^2 row-
            # constant), ties to the smaller code — the _assign rule
            d = c2[None, :] - 2 * (xs @ cq.T)
            out[:, s] = codes[d.argmin(axis=1)]
        return pd.Series(list(out))

    return e.select(F.col("_id").alias(id_col), _codes("_v").alias("codes"))


def pq_topk(
    encoded: DataFrame,
    codebook: DataFrame,
    query_vec: list[float],
    *,
    id_col: str = "vec_id",
    k: int = 10,
) -> DataFrame:
    """ADC top-k: smallest approximate L2 distance to ``query_vec``.

    Builds the m*k lookup table (distance from each query subvector to
    each centroid), broadcast-joins it against the exploded codes, and
    sums per vector — compressed-domain scoring; raw vectors are never
    read. Returns (id, adc_dist) ascending, ties broken on id.

    ``adc_dist`` is the integer quantized squared L2 (micro^2 units)
    divided by 1e12 — a single exact-rounded division of an exact
    int64 sum, so the ranking AND the value are engine-reproducible.
    """
    by_sub = _collect_codebook(codebook)
    return _pq_topk_local(encoded, by_sub, query_vec, id_col=id_col, k=k)


def _pq_topk_local(
    encoded: DataFrame,
    by_sub: dict,
    query_vec: list[float],
    *,
    id_col: str = "vec_id",
    k: int = 10,
) -> DataFrame:
    """pq_topk against an already-collected codebook dict — lets
    ivfpq_topk share ONE codebook collect across probe selection and
    ADC scoring instead of re-collecting per phase (r16, guide §5)."""
    m, dsub = _shape_of(by_sub)
    if len(query_vec) != m * dsub:
        raise ValueError(
            f"query dim {len(query_vec)} != m*dsub = {m}*{dsub} of the codebook"
        )
    spark = encoded.sparkSession
    # quantize the query driver-side with the module rule (Python float
    # math is the same IEEE ops as JVM/numpy/SQL)
    qq = [int(math.floor(float(x) * 1e6 + 0.5)) for x in query_vec]
    table = _adc_table_local(spark, by_sub, qq, m, dsub)
    exploded = encoded.select(F.col(id_col), F.posexplode("codes").alias("_sub", "code"))
    return (
        exploded.join(F.broadcast(table), ["_sub", "code"])
        .groupBy(id_col)
        .agg(
            (F.sum("_d").cast("double") / F.lit(1e12)).alias("adc_dist")
        )
        .orderBy(F.col("adc_dist").asc(), F.col(id_col))
        .limit(k)
    )


def ivfpq_topk(
    encoded: DataFrame,
    codebook: DataFrame,
    cells: DataFrame,
    query_vec: list[float],
    *,
    id_col: str = "vec_id",
    cell_col: str = "label",
    k: int = 10,
    n_probe: int = 3,
) -> DataFrame:
    """IVF-PQ: coarse-cell probing + compressed-domain ADC scoring —
    the classic two-level ANN index (FAISS IVFPQ shape).

    ``cells`` maps id -> coarse cell (the same partition column
    similarity.ivf_topk probes). The n_probe cells whose PER-CELL MEAN
    of decoded centroids is nearest the query are selected, then only
    their members are ADC-scored: at 1000 cells / 8 probes the scan
    touches ~1% of the code table, which is itself 32-512x smaller
    than the float corpus — the only query shape that stays
    interactive at 100 TB of embeddings.

    Cell selection uses the PQ-reconstructed member vectors (sum of
    per-subspace centroid means), so it needs no access to the float
    corpus either — the whole query path runs off codes + codebook.

    Recall is bounded by how well the cell partitioner matches vector
    geometry — the inherent IVF trade (similarity.ivf_topk has the
    same property): with kmeans-quality cells a few probes recover
    the true neighbours (test-pinned); over semantically-assigned
    cells raise n_probe (at n_probe ~ cells the result equals full
    ADC, verified on the embeddings table).
    """
    from python_stream_processing_framework_spark.operators.common import (
        persist_lazy,
    )

    # Persisted (r15 optimization): the code table fans out into
    # the probe-selection subtree (which lands inside a BROADCAST
    # build) and the final member-scoring pass — unpersisted, each
    # consumer re-ran the whole Arrow-batched encode assignment.
    # Codes are the 32-512x-compressed representation (m small ints
    # per vector); caching them IS the IVFPQ serving shape (the
    # persisted-index operators in ann_index.py write exactly this
    # frame to parquet), and release_caches() drains it. LAZY, not
    # eager: the broadcast-side stage populates the blocks and the
    # member pass reads them — materialize's extra count job measured
    # +0.2-1.0 s on this fixed-cost path (interleaved A/B).
    enc = persist_lazy(
        encoded.join(cells.select(F.col(id_col), F.col(cell_col)), id_col)
    )
    # reconstruct each member approximately: per (cell, subspace, code)
    # frequency times centroid, averaged per cell — all tiny frames
    # after the first groupBy (cells x m x k upper bound).
    code_freq = (
        enc.select(F.col(cell_col), F.posexplode("codes").alias("_sub", "code"))
        .groupBy(cell_col, "_sub", "code")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    by_sub = _collect_codebook(codebook)
    m, dsub = _shape_of(by_sub)
    if len(query_vec) != m * dsub:
        raise ValueError(
            f"query dim {len(query_vec)} != m*dsub = {m}*{dsub} of the codebook"
        )
    spark = encoded.sparkSession
    qq = [int(math.floor(float(x) * 1e6 + 0.5)) for x in query_vec]
    # distance of the query subvector to each centroid, weighted by how
    # many members of the cell use that centroid -> mean MEMBER ADC
    # distance per cell == the IVF probe ranking, codes-only. sum(_n)
    # counts m code rows per member, so the member count is sum(_n)/m:
    # mean = m * sum(_n*_d) / sum(_n). The numerator rides in
    # DECIMAL(38,0) (n*d can pass int64 at large-magnitude vectors) —
    # still exact integer arithmetic, order-free; DuckDB mirrors it
    # with HUGEINT. One exact wide-int -> double conversion (IEEE
    # nearest in both engines), one division.
    table = _adc_table_local(spark, by_sub, qq, m, dsub)
    probed = (
        code_freq.join(F.broadcast(table), ["_sub", "code"])
        .groupBy(cell_col)
        .agg(
            (
                (
                    F.lit(m)
                    * F.sum(F.col("_n").cast("decimal(38,0)") * F.col("_d"))
                ).cast("double")
                / F.sum("_n")
            ).alias("_mean_member_adc")
        )
        .orderBy(F.col("_mean_member_adc").asc(), F.col(cell_col))
        .limit(n_probe)
        .select(cell_col)
    )
    return _pq_topk_local(
        enc.join(F.broadcast(probed), cell_col).select(id_col, "codes"),
        by_sub,
        query_vec,
        id_col=id_col,
        k=k,
    )
