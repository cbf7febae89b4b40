"""Persisted embedding index: incremental SEMANTIC near-dup admission.

The embedding-modality twin of operators/dedup_index.py: at 100 TB
you never re-embed or re-mine the corpus because a new batch arrived.
This module keeps a parquet SIGNATURE index per document — the packed
sign-LSH bits, the 2^20-quantized vector (packed int32 binary), and
its exact squared norm; never the text — and admits batches
incrementally:

1. within-batch: sign-LSH candidate pairs -> exact integer-cosine
   verification -> connected components -> keep the min-id
   representative per component (operators/similarity.cosine_lsh_pairs
   end to end);
2. cross-index: band-join the survivors' signatures against the INDEX
   signatures (no re-signing of the historical corpus), kill obvious
   non-matches with the deterministic hamming prefilter, and drop
   survivors whose exact quantized cosine meets the threshold against
   any indexed vector;
3. append the admitted signatures under ``sigs/batch=<tag>`` — a
   whole-directory overwrite per batch tag, so a retried batch
   (foreachBatch redelivery, job restart) rewrites the same rows
   instead of duplicating them, and the current tag is pruned OUT of
   the cross-read so a retry never collides with its own partial
   previous write.

Admission invariant (tests/test_embed_index.py): after any sequence
of admits, no two admitted vectors anywhere in the index are
``threshold``-cosine near-duplicates that the banding surfaces —
recall < 1 is the LSH trade, identical to the batch operator.

Scale: the per-batch side is micro-batch-sized; the index side is
read signature-only (column-pruned: id, s, q, nq2). The band join
shuffles on (band_idx, band_key) and the hamming popcount kills the
bulk of band collisions before any vector bytes move. Stored q is
4 bytes/dim; at petabyte index sizes swap q for the int8 or PQ codes
(operators/similarity.quantize_int8 / operators/pq.pq_encode) and
verify with their scorers — the banding plumbing is unchanged.
Lifecycle: the per-batch directories compact with
operators/dedup_index.compact_index (layout-agnostic: it folds
``sigs/batch=*`` partitions deduplicating on the FULL row —
crash-replay duplicates are bit-identical and collapse to one, while
an id re-admitted with different content keeps both signatures; its
``id_col`` parameter is call-site compatibility only).

The reference has no embedding surface; this is beyond-reference
charter (SURVEY §2.7 similarity family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from python_stream_processing_framework_spark.operators.common import (
    materialize,
    maybe_broadcast,
)
from python_stream_processing_framework_spark.operators.dedup_index import (
    exclude_batch_tag,
    read_index,
    _sigs_path,
)
from python_stream_processing_framework_spark.operators.graph import (
    connected_components,
)
from python_stream_processing_framework_spark.operators.similarity import (
    _lsh_max_disagree,
    cosine_lsh_pairs,
    sign_signatures,
)


def _band_keys_expr(bands: int, band_bits: int):
    mask = 2**band_bits - 1
    return F.expr(
        f"transform(sequence(0, {bands - 1}),"
        f" b -> cast(shiftright(s, cast(b * {band_bits} as int)) & {mask} as int))"
    )


def embed_index_admit(
    new_vecs: DataFrame,
    index_path: str,
    batch_tag: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    bands: int = 8,
    band_bits: int = 4,
    max_band_freq: int | None = None,
) -> DataFrame:
    """Admit a vector batch against the persisted index; return the
    admitted rows with all their original columns. Side effect:
    admitted signatures land in ``sigs/batch=<batch_tag>``
    (idempotent overwrite per tag — reuse a tag only to RETRY that
    batch). Rows with a null vector are admitted verbatim but not
    indexed (they can't be near anything), the same recall floor as
    the batch LSH path.

    ``max_band_freq`` caps (band, key) bucket occupancy on BOTH the
    within-batch join (via cosine_lsh_pairs) and the INDEX side of
    the cross-index join — the recall-trading hot-bucket guard
    minhash_index_admit has; without it a degenerate embedding
    region (padding vectors, boilerplate clusters) makes the
    cross-join per-bucket quadratic in INDEX size.

    Pins signature frames via materialize() — call
    common.release_caches() once the returned frame is consumed, the
    family-wide contract.
    """
    spark = new_vecs.sparkSession

    # Sign ONCE: this signature frame drives the within-batch band
    # join (passed through to cosine_lsh_pairs), the cross-index
    # stage, and the index write — one Arrow pandas-UDF pass, one
    # pinned cache, instead of the two an inner re-sign would cost.
    # sign_signatures drops null-vector rows, so they are structurally
    # incapable of being indexed; they rejoin the admitted output
    # verbatim at the end (they can't be near anything).
    null_rows = new_vecs.filter(F.col(vec_col).isNull())
    sigs_all = sign_signatures(
        new_vecs, id_col=id_col, vec_col=vec_col, bands=bands, band_bits=band_bits
    )
    if sigs_all is None:  # no non-null vectors: nothing to index or drop
        return new_vecs

    # Within-batch: LSH pairs -> exact verify -> component-canonical.
    vec_rows = new_vecs.filter(F.col(vec_col).isNotNull())
    pairs = cosine_lsh_pairs(
        vec_rows,
        id_col=id_col,
        vec_col=vec_col,
        threshold=threshold,
        bands=bands,
        band_bits=band_bits,
        sigs=sigs_all,
        max_band_freq=max_band_freq,
    )
    if pairs.isEmpty():
        survivors = vec_rows
        sigs_new = sigs_all
    else:
        comp = connected_components(
            pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        )
        # Size-gated, not an unconditional hint: in streaming the
        # loser set is micro-batch-bounded, but a bootstrap admit of
        # a whole corpus as batch 1 makes it corpus-proportional —
        # above the cap the anti-join stays an exchange join and AQE
        # decides (same discipline as the vocabulary-df gates).
        losers = maybe_broadcast(
            comp.filter(F.col("node") != F.col("component")).select(
                F.col("node").alias(id_col)
            )
        )
        survivors = vec_rows.join(losers, id_col, "left_anti")
        sigs_new = sigs_all.join(losers, id_col, "left_anti")

    idx = read_index(spark, index_path)
    if idx is not None:
        # shared inference-robust exclusion: the raw != compare
        # nulled out for non-numeric tags on int-inferred columns
        # (silently dropping the whole index) and missed zero-
        # padded numeric tags — see dedup_index.exclude_batch_tag
        idx = exclude_batch_tag(idx, batch_tag)
        keys = _band_keys_expr(bands, band_bits)
        bn = sigs_new.select(
            F.col(id_col).alias("id_new"),
            F.col("s").alias("_sn"),
            F.posexplode(keys).alias("band_idx", "band_key"),
        )
        bi = idx.select(
            F.col(id_col).alias("id_idx"),
            F.col("s").alias("_si"),
            F.posexplode(keys).alias("band_idx", "band_key"),
        )
        if max_band_freq is not None:
            from python_stream_processing_framework_spark.operators.dedup import (
                _cap_band_buckets,
            )

            bi = _cap_band_buckets(
                bi, max_band_freq, keys=("band_idx", "band_key")
            )
        max_disagree = _lsh_max_disagree(threshold, bands * band_bits)
        cand = (
            bn.join(bi, ["band_idx", "band_key"])
            .filter(
                F.bit_count(F.col("_sn").bitwiseXOR(F.col("_si"))) <= max_disagree
            )
            .select("id_new", "id_idx")
            .distinct()
        )
        from python_stream_processing_framework_spark.operators.similarity import (
            _cos_from_packed,
        )

        va = sigs_new.select(
            F.col(id_col).alias("id_new"),
            F.col("q").alias("_qa"),
            F.col("nq2").alias("_na2"),
        )
        vb = idx.select(
            F.col(id_col).alias("id_idx"),
            F.col("q").alias("_qb"),
            F.col("nq2").alias("_nb2"),
        )
        # bounded: the drop list is at most the new batch's ids;
        # materialize completes the index scan BEFORE this batch's own
        # partition overwrite below starts (same ordering contract as
        # minhash_index_admit)
        dropped = materialize(
            cand.join(va, "id_new")
            .join(vb, "id_idx")
            .withColumn(
                "_cos", _cos_from_packed("_qa", "_qb", "_na2", "_nb2")
            )
            .filter(F.round(F.col("_cos"), 6) >= threshold)
            .select(F.col("id_new").alias(id_col))
            .distinct()
        )
        admitted = survivors.join(dropped, id_col, "left_anti")
        sigs_admitted = sigs_new.join(dropped, id_col, "left_anti")
    else:
        admitted = survivors
        sigs_admitted = sigs_new

    sigs_admitted.select(id_col, "s", "q", "nq2").write.mode("overwrite").parquet(
        f"{_sigs_path(index_path)}/batch={batch_tag}"
    )
    # Null-vector rows: admitted verbatim, never indexed (the write
    # above reads only the null-free signature frame).
    return admitted.unionByName(null_rows)
