"""Incremental MinHash-index admission: crafted-corpus exactness and
the no-admitted-near-dups invariant across batches.

Texts are 40 unique tokens; a one-word edit replaces exactly 3 of the
38 3-shingles, so exact Jaccard is 35/41 = 0.854 (a near-dup at the
0.8 threshold) and a two-word edit gives 32/44 = 0.727 (NOT a
near-dup) — every admit/drop decision below is arithmetic, not
vibes. bands=8 x rows=2 makes LSH band recall at j=0.854 effectively
certain (miss probability ~3e-5, and md5 is deterministic anyway).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from python_stream_processing_framework_spark.operators.common import release_caches
from python_stream_processing_framework_spark.operators.dedup import (
    minhash_lsh_pairs,
)
from python_stream_processing_framework_spark.operators.dedup_index import (
    minhash_index_admit,
    read_index,
)

_KW = dict(num_hashes=16, bands=8, shingle_k=3, threshold=0.8)


def _text(changes: dict[int, str] | None = None, prefix: str = "alpha") -> str:
    toks = [f"{prefix}{i}" for i in range(40)]
    for pos, word in (changes or {}).items():
        toks[pos] = word
    return " ".join(toks)


_A = _text()                              # the base document
_B = _text({20: "editB"})                 # ~A (j = 35/41 = 0.854)
_Z = _text({20: "editB", 30: "editZ"})    # ~B (0.854), NOT ~A (0.727)
_D = _text({10: "editD"})                 # ~A (0.854)
_C = _text(prefix="beta")                 # distinct
_E = _text(prefix="gamma")                # distinct


def _docs(spark, items):
    return spark.createDataFrame(list(items), ["doc_id", "text"])


def test_admit_batches_keeps_invariant(spark, tmp_path):
    idx = str(tmp_path / "idx")
    try:
        # Batch 1: A(1)~B(2) -> component keeps min id 1; C(3) distinct.
        a1 = sorted(
            r["doc_id"]
            for r in minhash_index_admit(
                _docs(spark, [(1, _A), (2, _B), (3, _C)]), idx, "b1", **_KW
            ).collect()
        )
        assert a1 == [1, 3]

        # Batch 2: D(4) near-dups INDEXED A(1) -> dropped cross-index
        # (no within-batch pair); E(5) distinct -> admitted.
        a2 = sorted(
            r["doc_id"]
            for r in minhash_index_admit(
                _docs(spark, [(4, _D), (5, _E)]), idx, "b2", **_KW
            ).collect()
        )
        assert a2 == [5]

        stored = read_index(spark, idx)
        assert sorted(r["doc_id"] for r in stored.select("doc_id").collect()) == [
            1,
            3,
            5,
        ]

        # Invariant: no two admitted docs are near-duplicates.
        pairs = minhash_lsh_pairs(
            _docs(spark, [(1, _A), (3, _C), (5, _E)]), "doc_id", "text", **_KW
        )
        assert pairs.count() == 0
    finally:
        release_caches()


def test_admit_retry_same_tag_is_idempotent(spark, tmp_path):
    idx = str(tmp_path / "idx")
    try:
        b1 = _docs(spark, [(1, _A), (3, _C)])
        minhash_index_admit(b1, idx, "b1", **_KW).collect()
        # Retry the SAME batch under the same tag (foreachBatch
        # redelivery): the index must not grow duplicate rows.
        minhash_index_admit(b1, idx, "b1", **_KW).collect()
        stored = read_index(spark, idx)
        assert stored.count() == 2
        assert stored.groupBy("doc_id").count().filter(F.col("count") > 1).count() == 0
    finally:
        release_caches()


def test_chain_collapses_to_one_survivor(spark, tmp_path):
    """A~B and B~Z but NOT A~Z: the component chain {1,2,4} keeps only
    min id 1 (component-canonical, same rule as dedup_corpus)."""
    idx = str(tmp_path / "idx")
    try:
        admitted = sorted(
            r["doc_id"]
            for r in minhash_index_admit(
                _docs(spark, [(2, _B), (1, _A), (4, _Z), (9, _E)]), idx, "first", **_KW
            ).collect()
        )
        assert admitted == [1, 9]
    finally:
        release_caches()


def test_cross_index_drop_respects_threshold(spark, tmp_path):
    """Z is 0.727-similar to indexed A — BELOW the 0.8 threshold, so
    the exact-verify step must admit it even though banding may
    surface the candidate pair."""
    idx = str(tmp_path / "idx")
    try:
        minhash_index_admit(_docs(spark, [(1, _A)]), idx, "b1", **_KW).collect()
        admitted = sorted(
            r["doc_id"]
            for r in minhash_index_admit(
                _docs(spark, [(4, _Z)]), idx, "b2", **_KW
            ).collect()
        )
        assert admitted == [4]
    finally:
        release_caches()


def test_index_stores_signatures_not_text(spark, tmp_path):
    idx = str(tmp_path / "idx")
    try:
        minhash_index_admit(_docs(spark, [(1, _A), (3, _C)]), idx, "b1", **_KW).collect()
        stored = read_index(spark, idx)
        assert set(stored.columns) == {"doc_id", "_sig", "_shingles", "batch"}
    finally:
        release_caches()
