"""Similarity search over embedding columns (array<float>).

Beyond-reference capability (SURVEY §2.7). Three tiers:

- `cosine_topk`: brute-force scored top-k against one query vector —
  the exactness baseline. Map-only over the corpus (query broadcast),
  then a k-row ordered take: at 100 TB this is a full scan but no
  shuffle beyond the final top-k, which Spark runs as per-partition
  top-k + driver merge (TakeOrderedAndProject).
- `cosine_pairs`: all-pairs above a threshold — quadratic; only for
  small corpora / oracle checks.
- `ivf_topk`: the scale path. Coarse-quantize vectors to the nearest
  centroid (inverted file), search only the `n_probe` closest cells.
  Probed cells are a broadcast-join filter, so the scan prunes to
  ~n_probe/n_cells of the corpus.

All vector math is JVM-side higher-order functions (functions/vectors);
no Python UDF in any hot path.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _plane_coef_int(p: int, d: int) -> int:
    """Deterministic INTEGER hyperplane coefficient in [-1e6, 1e6]:
    the Python evaluation of the same md5 derivation the SQL oracle
    computes (`('0x'||substr(md5('plane#p#d'),1,15))::BIGINT
    % 2000001 - 1000000`). Kept integral so signature dot products
    are exact int64 sums — order-free, hence engine-portable."""
    h = int(hashlib.md5(f"plane#{p}#{d}".encode()).hexdigest()[:15], 16)
    return h % 2000001 - 1000000

from python_stream_processing_framework_spark.functions.vectors import (
    as_double_array,
    cosine,
    dot,
    l2_norm,
)


def _prep(df: DataFrame, vec_col: str) -> DataFrame:
    # Widen single-row-group scans so vector math runs on all cores;
    # `spread` is a no-op (no Exchange) when the scan is already wide.
    from python_stream_processing_framework_spark.operators.dedup import spread

    return spread(df).withColumn("_v", as_double_array(vec_col))


def cosine_topk(
    embeddings: DataFrame,
    query_id: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact top-k by cosine similarity to the vector with `query_id`.

    Output: (vec_id, cos_sim) — cos_sim rounded to 6dp so ordering and
    values are stable across engines; ties broken by id.
    """
    e = _prep(embeddings, vec_col)
    q = e.filter(F.col(id_col) == query_id).select(F.col("_v").alias("_q"))
    scored = (
        e.filter(F.col(id_col) != query_id)
        .crossJoin(F.broadcast(q))
        .select(
            F.col(id_col),
            F.round(cosine(F.col("_v"), F.col("_q")), 6).alias("cos_sim"),
        )
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col(id_col)).limit(k)


def cosine_pairs(
    embeddings: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.45,
) -> DataFrame:
    """All pairs (a < b) with cosine similarity >= threshold.

    Brute-force O(n^2): correct baseline for the oracle harness. At
    corpus scale use `minhash`-style LSH banding on sign-random
    projections or `ivf_topk` per query instead.
    """
    from python_stream_processing_framework_spark.operators.common import materialize

    # both sides of the pair join read this; materialize (not bare
    # persist) so the fan-out computes once AND the cache is tracked
    # for release_caches() — a long session calling this repeatedly
    # must not accrete caches
    e = materialize(
        _prep(embeddings, vec_col).select(
            F.col(id_col), F.col("_v"), l2_norm(F.col("_v")).alias("_n")
        )
    )
    a = e.select(
        F.col(id_col).alias("id_a"), F.col("_v").alias("_va"), F.col("_n").alias("_na")
    )
    b = e.select(
        F.col(id_col).alias("id_b"), F.col("_v").alias("_vb"), F.col("_n").alias("_nb")
    )
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(
                dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb")), 6
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def _lsh_max_disagree(threshold: float, n_planes: int) -> int:
    """Signature-hamming prefilter bound: a pair at exactly
    `threshold` cosine disagrees on an expected
    `n_planes * acos(threshold)/pi` planes (Charikar); allow 4 planes
    of slack below the expected agreement so borderline-true pairs
    survive (~1.5 sigma at 32 planes). Deterministic in (threshold,
    n_planes), so the SQL oracle hardcodes the same constant."""
    import math

    t = min(1.0, max(-1.0, threshold))
    min_agree = max(0, math.floor(n_planes * (1.0 - math.acos(t) / math.pi)) - 4)
    return n_planes - min_agree


def sign_signatures(
    embeddings: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bands: int = 8,
    band_bits: int = 4,
) -> DataFrame | None:
    """Materialized sign-LSH signature frame (id, s, q, nq2): s = the
    n_planes sign bits packed into one BIGINT, q = the 2^20-quantized
    vector as packed little-endian int32 BINARY, nq2 = its exact
    int64 squared norm. The shared signature stage of
    cosine_lsh_pairs and the persisted embedding index
    (operators/embed_index.py) — one Arrow pandas-UDF pass, coefs
    shipped once per executor as a SparkContext broadcast. Returns
    None for an empty/all-null input (nothing can be signed).

    Null-vector rows are FILTERED OUT of the returned frame (they
    cannot be near anything, so they belong in no band and no index);
    callers admitting such rows verbatim re-derive them from the
    input, never from the signatures. The emptiness/dim probe reads
    the first NON-NULL vector — a null-first mixed batch must still
    be signed (an arbitrary-row probe here silently skipped
    dedup for whole batches; see tests/test_embed_index.py).

    Pins one frame via materialize(); callers release with
    common.release_caches(), the family-wide contract.
    """
    n_planes = bands * band_bits
    nonnull = embeddings.filter(F.col(vec_col).isNotNull())
    e = _prep(nonnull, vec_col)
    row = nonnull.select(vec_col).limit(1).collect()
    if not row:
        return None
    dim = len(row[0][0])
    from pyspark.sql.functions import pandas_udf

    # (dim x planes) int64 coefficient matrix, computed driver-side
    # with hashlib (same md5 derivation the oracle evaluates in SQL),
    # shipped once per executor via broadcast.
    coef_t = np.array(
        [
            [_plane_coef_int(p, d) for p in range(n_planes)]
            for d in range(1, dim + 1)
        ],
        dtype=np.int64,
    )
    bc = embeddings.sparkSession.sparkContext.broadcast(coef_t)

    # Quantized vectors travel candidate-join -> verify as packed
    # little-endian int32 BINARY, not array<bigint>: 4x fewer bytes on
    # the wire and Arrow ships one buffer per row instead of a boxed
    # list (|q| = |x| * 2^20 needs |x| < 2048 — comfortable for
    # embeddings). The verify matmul still runs in int64. The plane
    # signs pack into one BIGINT (bit p = plane p), so band keys and
    # the hamming prefilter are bit ops, no array column at all.
    @pandas_udf("s bigint, q binary, nq2 bigint")
    def _sigq(v: pd.Series) -> pd.DataFrame:
        ct = bc.value
        vals = v.values
        out = pd.DataFrame(
            {
                "s": pd.array([None] * len(vals), dtype="Int64"),
                "q": [None] * len(vals),
                "nq2": pd.array([None] * len(vals), dtype="Int64"),
            }
        )
        mask = np.array([x is not None for x in vals], dtype=bool)
        if mask.any():
            m = np.stack([np.asarray(x, dtype=np.float64) for x in vals[mask]])
            xq = np.floor(m * 1048576.0 + 0.5).astype(np.int64)
            bits = (xq @ ct >= 0).astype(np.int64)
            sig_int = (bits << np.arange(ct.shape[1], dtype=np.int64)).sum(axis=1)
            nq2 = (xq * xq).sum(axis=1)
            packed = xq.astype("<i4")
            idx = np.nonzero(mask)[0]
            for j, i in enumerate(idx):
                out.iat[i, 1] = packed[j].tobytes()
            out.loc[mask, "s"] = sig_int
            out.loc[mask, "nq2"] = nq2
        # null vectors keep null s/q: transform/posexplode of a null
        # signature yields no band rows, so they never produce
        # candidates (they can't be near anything).
        return out

    from python_stream_processing_framework_spark.operators.common import materialize

    # Signatures feed four plan branches (both band-join sides, both
    # verify-fetch sides): materialize so the pandas-UDF signature
    # pass runs ONCE — lazily-persisted, the concurrently-scheduled
    # branches would each recompute it (2-4x the query's whole cost,
    # and the dominant run-to-run variance in bench).
    sigs = materialize(
        e.select(F.col(id_col), _sigq(F.col("_v")).alias("_s")).select(
            id_col, "_s.s", "_s.q", "_s.nq2"
        )
    )
    return sigs


def _cos_from_packed(qa_col, qb_col, na2_col, nb2_col):
    """Exact quantized cosine from packed-int32 vector pairs — the
    verification scorer shared by cosine_lsh_pairs and the persisted
    embedding index (operators/embed_index.py). Arrow-batched; the
    dot is an exact int64 sum, the division one float op, so scores
    replay bit-exact in any engine."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _cosq(
        qa: pd.Series, qb: pd.Series, na2: pd.Series, nb2: pd.Series
    ) -> pd.Series:
        out = np.full(len(qa), np.nan)
        mask = np.array(
            [x is not None and y is not None for x, y in zip(qa.values, qb.values)],
            dtype=bool,
        )
        if mask.any():
            A = np.frombuffer(b"".join(qa.values[mask]), dtype="<i4").reshape(
                mask.sum(), -1
            ).astype(np.int64)
            B = np.frombuffer(b"".join(qb.values[mask]), dtype="<i4").reshape(
                mask.sum(), -1
            ).astype(np.int64)
            dots = (A * B).sum(axis=1).astype(np.float64)  # exact int64 sums
            denom = np.sqrt(
                na2[mask].to_numpy(np.float64) * nb2[mask].to_numpy(np.float64)
            )
            with np.errstate(divide="ignore", invalid="ignore"):
                out[mask] = dots / denom
        return pd.Series(out)

    return _cosq(qa_col, qb_col, na2_col, nb2_col)


def cosine_lsh_pairs(
    embeddings: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    bands: int = 8,
    band_bits: int = 4,
    sigs: DataFrame | None = None,
    max_band_freq: int | None = None,
) -> DataFrame:
    """Near-dup pairs via sign-random-projection LSH (Charikar) —
    the sub-quadratic scale path for embedding dedup.

    ``sigs``: a precomputed :func:`sign_signatures` frame for
    ``embeddings`` (same bands/band_bits). Callers that need the
    signatures themselves (the persisted embedding index signs once
    and reuses the frame for its cross-index stage and index write)
    pass it here so the Arrow signing pass runs exactly once.

    ``max_band_freq``: drop (band, key) buckets with more occupants —
    the MinHash family's hot-bucket guard (dedup._cap_band_buckets)
    applied to sign-LSH; recommended **256** on corpora with
    boilerplate/padding mass (measured recall-neutral outside capped
    buckets, SCALE.md "Hot-bucket cap"). A degenerate embedding
    region (zero vectors,
    a provider's padding embedding, a cluster of near-identical
    boilerplate) puts its whole mass in one bucket per band, and the
    candidate join is per-bucket QUADRATIC; the cap bounds it at
    O(cap^2) per bucket by trading recall inside capped buckets only.
    Default off — at the default band_bits=4 there are only 16 keys
    per band, so legitimate buckets are large; size bands to the
    batch (the 100k bench uses bands=4 x band_bits=16) before arming
    the cap.

    Hyperplanes are pseudo-random but DETERMINISTIC: coefficient
    (p, d) is the md5('plane#p#d')-derived INTEGER in [-1e6, 1e6] —
    so the whole pipeline (signatures, banding, candidates,
    verification) is engine-exact and oracle-checkable. Candidate
    generation is an equi-join on (band, 4-bit key); only candidates
    pay the exact cosine verification. Recall < 1 by construction
    (that's the LSH trade) — the oracle mirrors the same pipeline,
    not brute force.

    Signatures AND verification are the one place this module uses
    Python: vectorized Arrow pandas UDFs doing numpy int64 matmuls
    per batch. Components quantize to int64 via floor(x * 2^20 + 0.5)
    ONCE; the quantized vector drives both the plane-sign signatures
    (q @ coefs >= 0) and the candidate verification
    (dot(qa, qb) / sqrt(|qa|^2 * |qb|^2)). Every sum is an order-free
    exact integer sum that DuckDB reproduces bit-for-bit; the final
    cosine is one division of identical doubles, so the score is
    engine-exact despite being numpy-computed. (The Catalyst-lambda
    forms these replaced evaluated interpreted left-folds per row and
    per candidate pair — no codegen inside nested HOFs — which at
    dim >= 1024 dominated the whole query.) The (dim x planes)
    coefficient matrix ships once per executor as a SparkContext
    broadcast, never as an expression tree.

    Overflow bounds (int64): |x| <= 2000 at dim 4096 keeps
    sum(q_a[d]*q_b[d]) under 2^63; plane terms are smaller (coef
    <= 1e6 < 2^20). Embedding components are unit-ish; documented,
    not checked per-row.
    """
    n_planes = bands * band_bits
    if sigs is None:
        sigs = sign_signatures(
            embeddings,
            id_col=id_col,
            vec_col=vec_col,
            bands=bands,
            band_bits=band_bits,
        )
    if sigs is None:
        return embeddings.sparkSession.createDataFrame(
            [], "id_a bigint, id_b bigint, cos_sim double"
        )
    from pyspark.sql.functions import pandas_udf

    mask = 2**band_bits - 1
    band_keys = F.expr(
        f"transform(sequence(0, {bands - 1}),"
        f" b -> cast(shiftright(s, cast(b * {band_bits} as int)) & {mask} as int))"
    )
    banded = sigs.select(
        F.col(id_col),
        F.col("s"),
        F.posexplode(band_keys).alias("band_idx", "band_key"),
    )
    if max_band_freq is not None:
        from python_stream_processing_framework_spark.operators.dedup import (
            _cap_band_buckets,
        )

        banded = _cap_band_buckets(
            banded, max_band_freq, keys=("band_idx", "band_key")
        )
    # Deterministic signature-hamming prefilter BEFORE the heavy
    # vector fetch: band collisions between genuinely-dissimilar
    # vectors (the bulk of candidates on clustered data) die on a
    # popcount, so only near-agreeing pairs pay the exact verify.
    # Same constant in the oracle => engine-identical candidate sets.
    max_disagree = _lsh_max_disagree(threshold, n_planes)
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(b, ["band_idx", "band_key"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .filter(
            F.bit_count(F.col("a.s").bitwiseXOR(F.col("b.s"))) <= max_disagree
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )

    va = sigs.select(
        F.col(id_col).alias("id_a"), F.col("q").alias("_qa"), F.col("nq2").alias("_na2")
    )
    vb = sigs.select(
        F.col(id_col).alias("id_b"), F.col("q").alias("_qb"), F.col("nq2").alias("_nb2")
    )
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                _cos_from_packed(F.col("_qa"), F.col("_qb"), F.col("_na2"), F.col("_nb2")), 6
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def semantic_decontaminate(
    corpus: DataFrame,
    heldout: DataFrame | None = None,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    bands: int = 8,
    band_bits: int = 4,
    corpus_sigs: DataFrame | None = None,
    heldout_sigs: DataFrame | None = None,
    max_band_freq: int | None = None,
) -> DataFrame:
    """SEMANTIC corpus decontamination: drop corpus rows whose
    embedding is >= ``threshold`` cosine to ANY held-out row — the
    embedding-space member of the decontamination family
    (dedup.decontaminate / ngram_decontaminate / bloom_decontaminate
    are the lexical three). Catches PARAPHRASED benchmark
    contamination sharing no 13-gram and no shingle with the held-out
    text, the case every lexical rule structurally misses.

    cosine_lsh_pairs' machinery, crossed: both sides sign with the
    SAME deterministic hyperplanes (sign_signatures — pass
    ``corpus_sigs`` to reuse a frame a composed pipeline already
    signed), candidates come from an equi-join of the two banded
    sides + the signature-hamming prefilter, only candidates pay the
    quantized-exact cosine verify, and flagged corpus ids anti-join
    out through the size-gated broadcast (flag mass is
    heldout-proportional but a boilerplate-heavy corpus can flag
    arbitrarily much — the gate decides). Null-vector corpus rows
    pass through (they can't be near anything). ``max_band_freq``
    caps HELD-OUT-side bucket occupancy — the family hot-bucket
    guard; a degenerate held-out region would otherwise make the
    cross join per-bucket proportional to corpus x heldout mass.

    Returns the clean corpus rows with all their original columns.
    Pins signature frames via materialize(); release with
    common.release_caches(), the family-wide contract.

    ``heldout_sigs``: a pre-signed held-out frame (sign_signatures
    output, e.g. the parquet the streaming facade persists at
    registration) — MUST have been signed with the same ``bands`` /
    ``band_bits``, since the deterministic hyperplanes are a pure
    function of (dim, n_planes). Exactly one of ``heldout`` /
    ``heldout_sigs`` is required.
    """
    from python_stream_processing_framework_spark.operators.common import (
        maybe_broadcast,
    )

    if (heldout is None) == (heldout_sigs is None):
        raise ValueError("pass exactly one of heldout / heldout_sigs")

    n_planes = bands * band_bits
    sigs_c = (
        corpus_sigs
        if corpus_sigs is not None
        else sign_signatures(
            corpus, id_col=id_col, vec_col=vec_col, bands=bands,
            band_bits=band_bits,
        )
    )
    sigs_h = (
        heldout_sigs
        if heldout_sigs is not None
        else sign_signatures(
            heldout, id_col=id_col, vec_col=vec_col, bands=bands,
            band_bits=band_bits,
        )
    )
    if sigs_c is None or sigs_h is None:
        return corpus

    mask = 2**band_bits - 1
    band_keys = F.expr(
        f"transform(sequence(0, {bands - 1}),"
        f" b -> cast(shiftright(s, cast(b * {band_bits} as int)) & {mask} as int))"
    )

    def banded(sigs: DataFrame, tag: str) -> DataFrame:
        return sigs.select(
            F.col(id_col).alias(f"_{tag}id"),
            F.col("s").alias(f"_{tag}s"),
            F.posexplode(band_keys).alias("band_idx", "band_key"),
        )

    bc_ = banded(sigs_c, "c")
    bh = banded(sigs_h, "h")
    if max_band_freq is not None:
        from python_stream_processing_framework_spark.operators.dedup import (
            _cap_band_buckets,
        )

        bh = _cap_band_buckets(bh, max_band_freq, keys=("band_idx", "band_key"))
    max_disagree = _lsh_max_disagree(threshold, n_planes)
    cand = (
        bc_.join(bh, ["band_idx", "band_key"])
        .filter(
            F.bit_count(F.col("_cs").bitwiseXOR(F.col("_hs"))) <= max_disagree
        )
        .select("_cid", "_hid")
        .distinct()
    )
    vc = sigs_c.select(
        F.col(id_col).alias("_cid"), F.col("q").alias("_qc"),
        F.col("nq2").alias("_nc2"),
    )
    vh = sigs_h.select(
        F.col(id_col).alias("_hid"), F.col("q").alias("_qh"),
        F.col("nq2").alias("_nh2"),
    )
    flagged = (
        cand.join(vc, "_cid")
        .join(vh, "_hid")
        .filter(
            F.round(
                _cos_from_packed(
                    F.col("_qc"), F.col("_qh"), F.col("_nc2"), F.col("_nh2")
                ),
                6,
            )
            >= F.lit(threshold)
        )
        .select(F.col("_cid").alias(id_col))
        .distinct()
    )
    return corpus.join(maybe_broadcast(flagged), id_col, "left_anti")


def ivf_topk(
    embeddings: DataFrame,
    query_id: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
    k: int = 10,
    n_probe: int = 3,
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k via inverted-file (IVF) coarse quantization.

    Uses `cell_col` as the coarse partition (here: the precomputed
    cluster label; in production the assignment step is a kmeans fit or
    any partitioner). Centroids are per-cell mean vectors; only the
    `n_probe` cells whose centroids are closest to the query are
    scanned. Probing is a broadcast semi-join — the corpus scan prunes
    to the probed cells, which at 1000 cells / 8 probes is ~1% of the
    data.

    `dim` is accepted for API compatibility but no longer needed: the
    centroid build is dimension-agnostic.
    """
    e = _prep(embeddings, vec_col)
    # Exact-arithmetic centroids: per-dim int64 sums of 1e-6-rounded
    # components, divided once — order-free and engine-exact, so even
    # the IVF probe selection is oracle-comparable (see queries/
    # similarity.py). An avg() of doubles would be neither.
    #
    # Shape: posexplode + groupBy(cell, pos), NOT `dim` separate
    # aggregate expressions — at embedding dims 768-4096 a per-dim
    # aggregate list blows up Catalyst analysis/codegen, while
    # (cells x dim) rows through two tiny shuffles stays flat in dim.
    exploded = e.select(F.col(cell_col), F.posexplode(F.col("_v")).alias("_i", "_x"))
    comp = exploded.groupBy(cell_col, "_i").agg(
        F.sum(F.round(F.col("_x") * F.lit(1000000)).cast("bigint")).alias("_s"),
        F.count(F.lit(1)).alias("_cnt"),
    )
    centroids = comp.groupBy(cell_col).agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col("_i"), F.col("_s"), F.col("_cnt")))
            ),
            lambda t: t["_s"].cast("double") / F.lit(1000000.0) / t["_cnt"],
        ).alias("_c")
    )
    q = e.filter(F.col(id_col) == query_id).select(F.col("_v").alias("_q"))
    probed = (
        centroids.crossJoin(F.broadcast(q))
        .select(
            cell_col, F.round(cosine(F.col("_c"), F.col("_q")), 6).alias("_csim")
        )
        .orderBy(F.col("_csim").desc(), F.col(cell_col))
        .limit(n_probe)
        .select(cell_col)
    )
    scored = (
        e.filter(F.col(id_col) != query_id)
        .join(F.broadcast(probed), cell_col)
        .crossJoin(F.broadcast(q))
        .select(
            F.col(id_col),
            F.round(cosine(F.col("_v"), F.col("_q")), 6).alias("cos_sim"),
        )
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col(id_col)).limit(k)


def quantize_int8(
    embeddings: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-vector symmetric int8 scalar quantization.

    ``q[i] = round(v[i] * 127 / max_abs)`` with ``scale = max_abs/127``
    (so ``v ~= q * scale``); a zero vector quantizes to zeros with
    scale 0. The compression every 100 TB embedding store runs before
    ANN: 4x smaller than float32, and integer dot products are exact
    and order-free, which also makes results engine-portable. Output:
    (id, q array<int>, scale double). Map-only — no shuffle.

    Not in the reference (no vector ops there at all); standard
    training-data-pipeline capability per the build brief.
    """
    e = _prep(embeddings, vec_col)
    maxabs = F.array_max(F.transform(F.col("_v"), lambda x: F.abs(x)))
    q = F.when(
        maxabs == F.lit(0.0),
        F.transform(F.col("_v"), lambda x: F.lit(0)),
    ).otherwise(
        F.transform(
            F.col("_v"),
            lambda x: F.round(x * F.lit(127.0) / maxabs).cast("int"),
        )
    )
    return e.select(
        F.col(id_col),
        q.alias("q"),
        (maxabs / F.lit(127.0)).alias("scale"),
    )


def int8_mips_topk(
    embeddings: DataFrame,
    query_id: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Top-k by exact integer dot product of int8-quantized vectors —
    maximum-inner-product search over the compressed store.

    The int64 accumulation is exact (|q|<=127, so dim 4096 still sits
    far under 2^53/2^63), so unlike float scores the ranking is
    bit-reproducible on any engine. Same plan shape as `cosine_topk`:
    broadcast one query row, map-side scoring, TakeOrderedAndProject.
    """
    qd = quantize_int8(embeddings, id_col=id_col, vec_col=vec_col)
    query = qd.filter(F.col(id_col) == query_id).select(F.col("q").alias("_qq"))
    scored = (
        qd.filter(F.col(id_col) != query_id)
        .crossJoin(F.broadcast(query))
        .select(
            F.col(id_col),
            F.aggregate(
                F.zip_with(
                    F.col("q"), F.col("_qq"), lambda a, b: (a * b).cast("bigint")
                ),
                F.lit(0).cast("bigint"),
                lambda acc, x: acc + x,
            ).alias("dot_q"),
        )
    )
    return scored.orderBy(F.col("dot_q").desc(), F.col(id_col)).limit(k)


def mean_pool(
    df: DataFrame,
    group_cols: list[str],
    vec_col: str = "embedding",
    *,
    out_col: str = "embedding",
) -> DataFrame:
    """Element-wise mean embedding per group.

    The two standard shapes of embedding aggregation in a corpus
    pipeline: chunk embeddings -> one document embedding (group by
    doc), and document embeddings -> a domain/source centroid (group
    by domain — the input to centroid-based semantic mixture or
    drift monitoring).

    Shape: posexplode + groupBy(group, pos) + avg, then rebuild the
    array sorted by position — the same dimension-agnostic layout the
    IVF centroid build uses (one shuffle keyed on (group, pos), never
    `dim` separate aggregates, which stalls Catalyst past ~100 dims).
    Rows with null/empty vectors are dropped. Note the per-(group,
    pos) float sum is shuffle-order-dependent in the last ulp, like
    any distributed mean — fine for pooling, not for bit-exact
    oracles.
    """
    exploded = (
        df.filter(F.col(vec_col).isNotNull() & (F.size(vec_col) > 0))
        .select(*group_cols, F.posexplode(vec_col).alias("_i", "_x"))
        .groupBy(*group_cols, "_i")
        .agg(F.avg("_x").alias("_m"))
    )
    return (
        exploded.groupBy(*group_cols)
        .agg(
            F.array_sort(
                F.collect_list(F.struct("_i", "_m"))
            ).alias("_parts"),
        )
        .select(
            *group_cols,
            F.expr("transform(_parts, p -> p._m)").alias(out_col),
        )
    )


def hard_negatives(
    embeddings: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    lo: float = 0.4,
    hi: float = 0.95,
    per_anchor: int = 3,
    bands: int = 8,
    band_bits: int = 4,
) -> DataFrame:
    """Mine hard negatives for contrastive training.

    The standard recipe for embedding/retrieval training data: for
    each anchor, the most USEFUL negatives are the ones the current
    embedding space considers similar — but not SO similar that they
    are actually duplicates/positives mislabeled as negatives (the
    classic false-negative poisoning failure). So: candidates come
    from the similarity band ``lo <= cos < hi`` — above ``hi`` is
    treated as a near-dup and excluded, below ``lo`` is an easy
    negative not worth training on — and each anchor keeps its top
    ``per_anchor`` by (cos desc, id).

    Pure composition over :func:`cosine_lsh_pairs` (same recall <1
    trade, same integer-exact scores): the pair set is sub-quadratic
    via banding, symmetrized so both endpoints serve as anchors, and
    ranked with one window shuffle on the anchor id. Returns
    (id_col, negative_id, cos_sim, rank).
    """
    if not 0.0 <= lo < hi:
        raise ValueError(f"need 0 <= lo < hi, got lo={lo} hi={hi}")
    if per_anchor < 1:
        raise ValueError(f"per_anchor must be >= 1, got {per_anchor}")
    pairs = cosine_lsh_pairs(
        embeddings,
        id_col=id_col,
        vec_col=vec_col,
        threshold=lo,
        bands=bands,
        band_bits=band_bits,
    ).filter(F.col("cos_sim") < hi)
    sym = pairs.select(
        F.col("id_a").alias(id_col),
        F.col("id_b").alias("negative_id"),
        "cos_sim",
    ).unionByName(
        pairs.select(
            F.col("id_b").alias(id_col),
            F.col("id_a").alias("negative_id"),
            "cos_sim",
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("cos_sim").desc(), F.col("negative_id").asc()
    )
    return sym.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= per_anchor
    )
