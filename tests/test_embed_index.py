"""Incremental embedding-index admission (operators/embed_index.py):
crafted-vector exactness and the no-admitted-near-dups invariant
across batches — the semantic twin of tests/test_dedup_index.py.

Vectors are crafted so every decision is arithmetic: a vector and a
tiny perturbation of it have cosine ~0.999 (a near-dup at the 0.9
threshold); orthogonal basis-ish vectors have cosine ~0 (never
near-dups). bands=8 x band_bits=4 = 32 planes — at cosine 0.999 the
expected disagreeing planes are ~0.3, so banding recall here is
effectively certain (and deterministic anyway: the planes are
md5-derived)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from python_stream_processing_framework_spark.operators.common import release_caches
from python_stream_processing_framework_spark.operators.dedup_index import (
    compact_index,
    read_index,
)
from python_stream_processing_framework_spark.operators.embed_index import (
    embed_index_admit,
)

_KW = dict(threshold=0.9, bands=8, band_bits=4)
_DIM = 16


def _vec(axis: int, eps_axis: int | None = None) -> list[float]:
    v = [0.0] * _DIM
    v[axis] = 1.0
    if eps_axis is not None:
        v[eps_axis] = 0.04  # cosine(base, perturbed) ~ 0.9992
    return v


def _vecs(spark, items):
    return spark.createDataFrame(
        [(i, v) for i, v in items], "vec_id bigint, embedding array<double>"
    )


def test_admit_batches_keeps_invariant(spark, tmp_path):
    idx = str(tmp_path / "idx")
    try:
        # Batch 1: 1 ~ 2 (perturbed copy) -> min id 1 survives; 3 distinct.
        a1 = sorted(
            r["vec_id"]
            for r in embed_index_admit(
                _vecs(spark, [(1, _vec(0)), (2, _vec(0, 5)), (3, _vec(1))]),
                idx,
                "b1",
                **_KW,
            ).collect()
        )
        assert a1 == [1, 3]

        # Batch 2: 4 near-dups INDEXED 1 -> dropped cross-index;
        # 5 orthogonal -> admitted.
        a2 = sorted(
            r["vec_id"]
            for r in embed_index_admit(
                _vecs(spark, [(4, _vec(0, 7)), (5, _vec(2))]), idx, "b2", **_KW
            ).collect()
        )
        assert a2 == [5]

        stored = read_index(spark, idx)
        assert sorted(r["vec_id"] for r in stored.select("vec_id").collect()) == [
            1,
            3,
            5,
        ]
        assert set(stored.columns) == {"vec_id", "s", "q", "nq2", "batch"}
    finally:
        release_caches()


def test_admit_retry_same_tag_is_idempotent(spark, tmp_path):
    idx = str(tmp_path / "idx")
    try:
        b1 = _vecs(spark, [(1, _vec(0)), (3, _vec(1))])
        embed_index_admit(b1, idx, "b1", **_KW).collect()
        retried = sorted(
            r["vec_id"] for r in embed_index_admit(b1, idx, "b1", **_KW).collect()
        )
        assert retried == [1, 3]
        stored = read_index(spark, idx)
        assert stored.count() == 2
        assert (
            stored.groupBy("vec_id").count().filter(F.col("count") > 1).count() == 0
        )
    finally:
        release_caches()


def test_below_threshold_pair_admitted(spark, tmp_path):
    """cosine(axis0, axis0+0.6*axis5) ~ 0.857 < 0.9: banding may
    surface the candidate but exact verification must admit it."""
    idx = str(tmp_path / "idx")
    try:
        embed_index_admit(_vecs(spark, [(1, _vec(0))]), idx, "b1", **_KW).collect()
        v = [0.0] * _DIM
        v[0], v[5] = 1.0, 0.6
        admitted = sorted(
            r["vec_id"]
            for r in embed_index_admit(
                _vecs(spark, [(9, v)]), idx, "b2", **_KW
            ).collect()
        )
        assert admitted == [9]
    finally:
        release_caches()


def test_compact_index_is_layout_agnostic(spark, tmp_path):
    """The dedup_index compaction job folds the EMBEDDING index's
    per-batch partitions too (it only needs the id column + batch
    partitioning), and admission decisions are unchanged after."""
    idx = str(tmp_path / "idx")
    try:
        embed_index_admit(
            _vecs(spark, [(1, _vec(0)), (3, _vec(1))]), idx, "b1", **_KW
        ).collect()
        embed_index_admit(_vecs(spark, [(5, _vec(2))]), idx, "b2", **_KW).collect()
        tag = compact_index(spark, idx, id_col="vec_id", target_files=1)
        assert tag is not None
        # post-compaction: a near-dup of a pre-compaction admit still drops
        a3 = sorted(
            r["vec_id"]
            for r in embed_index_admit(
                _vecs(spark, [(7, _vec(1, 9)), (8, _vec(3))]), idx, "b3", **_KW
            ).collect()
        )
        assert a3 == [8]
        assert sorted(
            r["vec_id"] for r in read_index(spark, idx).select("vec_id").collect()
        ) == [1, 3, 5, 8]
    finally:
        release_caches()


def test_null_vectors_admitted_not_indexed(spark, tmp_path):
    idx = str(tmp_path / "idx")
    try:
        docs = spark.createDataFrame(
            [(1, _vec(0)), (2, None)], "vec_id bigint, embedding array<double>"
        )
        admitted = sorted(
            r["vec_id"] for r in embed_index_admit(docs, idx, "b1", **_KW).collect()
        )
        assert admitted == [1, 2]
        stored = read_index(spark, idx)
        assert [r["vec_id"] for r in stored.select("vec_id").collect()] == [1]
    finally:
        release_caches()


@pytest.mark.slow
def test_loser_gate_exchange_regime(spark, tmp_path, monkeypatch):
    """r8 verdict #2: the within-batch loser anti-join is size-gated.
    Forcing the cap to 0 (loser set 'too big to broadcast') must not
    change admit decisions — strategy changes, results don't."""
    from python_stream_processing_framework_spark.operators import common

    def run(tag_dir):
        idx = str(tmp_path / tag_dir)
        a1 = sorted(
            r["vec_id"]
            for r in embed_index_admit(
                _vecs(spark, [(1, _vec(0)), (2, _vec(0, 5)), (3, _vec(1))]),
                idx,
                "b1",
                **_KW,
            ).collect()
        )
        a2 = sorted(
            r["vec_id"]
            for r in embed_index_admit(
                _vecs(spark, [(4, _vec(0, 7)), (5, _vec(2))]), idx, "b2", **_KW
            ).collect()
        )
        return a1, a2

    try:
        default = run("idx_default")
        monkeypatch.setattr(common, "BROADCAST_ROW_CAP", 0)
        forced = run("idx_forced")
        assert forced == default == ([1, 3], [5])
    finally:
        release_caches()


def test_null_first_mixed_batch_still_deduped(spark, tmp_path):
    """ADVICE r8 (medium): the old emptiness probe read an ARBITRARY
    row — a null vector in slot one made sign_signatures return None
    and the whole batch was admitted with no dedup and no index write.
    The probe now reads the first NON-NULL vector: null-first batches
    still sign, dedupe within-batch, and index their survivors."""
    idx = str(tmp_path / "idx")
    try:
        docs = spark.createDataFrame(
            [(2, None), (3, _vec(0)), (4, _vec(0, 5))],
            "vec_id bigint, embedding array<double>",
        )
        admitted = sorted(
            r["vec_id"] for r in embed_index_admit(docs, idx, "b1", **_KW).collect()
        )
        assert admitted == [2, 3]  # 4 is a within-batch near-dup of 3
        stored = read_index(spark, idx)
        assert [r["vec_id"] for r in stored.select("vec_id").collect()] == [3]
    finally:
        release_caches()


def test_max_band_freq_caps_hot_buckets(spark, tmp_path):
    """Hot-bucket guard: a degenerate region (many identical vectors)
    saturates its (band, key) buckets; with the cap armed those
    buckets drop from the candidate join (bounded O(cap^2) work, the
    documented recall trade), while vectors in uncapped buckets keep
    deduping exactly."""
    from python_stream_processing_framework_spark.operators.similarity import (
        cosine_lsh_pairs,
    )

    # 30 identical vectors -> every one of their buckets has 30
    # occupants; one distinct near-dup pair (100, 101) elsewhere.
    rows = [(i, _vec(0)) for i in range(30)]
    rows += [(100, _vec(1)), (101, _vec(1, 5))]
    vecs = _vecs(spark, rows)
    try:
        uncapped = cosine_lsh_pairs(vecs, threshold=0.9, bands=8, band_bits=4)
        assert uncapped.count() >= 29 + 1  # hot clique + the pair
        capped = cosine_lsh_pairs(
            vecs, threshold=0.9, bands=8, band_bits=4, max_band_freq=10
        )
        got = sorted((r["id_a"], r["id_b"]) for r in capped.collect())
        # the hot clique's buckets (30 > 10) are gone; (100, 101)
        # shares buckets with at most the hot mass... their bucket
        # holds only the pair unless a hot-vector band key collides,
        # in which case that band's bucket is also capped — the pair
        # must still surface via at least one clean band.
        assert (100, 101) in got
        assert all(a >= 100 for a, _ in got), got
    finally:
        release_caches()


def test_admit_with_band_cap_still_admits_distinct(spark, tmp_path):
    idx = str(tmp_path / "idx")
    try:
        a1 = sorted(
            r["vec_id"]
            for r in embed_index_admit(
                _vecs(spark, [(1, _vec(0)), (3, _vec(1))]),
                idx,
                "b1",
                max_band_freq=8,
                **_KW,
            ).collect()
        )
        assert a1 == [1, 3]
        # cross-index drop still works under the cap (buckets of 1)
        a2 = sorted(
            r["vec_id"]
            for r in embed_index_admit(
                _vecs(spark, [(4, _vec(0, 7)), (5, _vec(2))]),
                idx,
                "b2",
                max_band_freq=8,
                **_KW,
            ).collect()
        )
        assert a2 == [5]
    finally:
        release_caches()


@pytest.mark.slow
def test_admit_non_numeric_and_zero_padded_tags_vs_inference(spark, tmp_path):
    """r12 review regression (the third exclude_batch_tag site): with
    only numeric batch dirs the partition column is int-inferred, so
    (a) a non-numeric retry tag cast to null and silently dropped the
    ENTIRE signature index — duplicates sailed through — and (b) a
    zero-padded retry tag failed to exclude its own partition and
    admitted nothing. Both directions now route through the shared
    inference-robust exclusion."""
    from python_stream_processing_framework_spark.operators.embed_index import (
        embed_index_admit,
    )

    # (a) numeric dir, then a duplicate arrives under a non-numeric
    # tag: the index must still be SEEN (duplicate rejected)
    idx = str(tmp_path / "idx-a")
    try:
        embed_index_admit(_vecs(spark, [(1, _vec(0))]), idx, "7", **_KW).collect()
        dup = embed_index_admit(
            _vecs(spark, [(9, _vec(0))]), idx, "retry-x", **_KW
        ).collect()
        assert [r["vec_id"] for r in dup] == []
    finally:
        release_caches()

    # (b) zero-padded tag retry: own int-inferred partition excluded,
    # the batch re-admits itself
    idx2 = str(tmp_path / "idx-b")
    try:
        b = _vecs(spark, [(5, _vec(1))])
        embed_index_admit(b, idx2, "07", **_KW).collect()
        retried = [
            r["vec_id"]
            for r in embed_index_admit(b, idx2, "07", **_KW).collect()
        ]
        assert retried == [5]
    finally:
        release_caches()
