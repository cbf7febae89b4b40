"""Exact-duplicate mass guard for MinHash-LSH (operators/dedup.py).

Real web corpora are 30-50% byte-identical duplicates; c copies of one
document share every LSH band value, so an unguarded band self-join
generates O(c^2) candidates per copy-cluster. These tests pin:
  - the collapse is EXACTLY output-equivalent in pairs mode,
  - the band join only ever sees one representative per distinct text
    (candidate generation is O(#distinct), not O(#docs^2)),
  - expand='star' yields linear spanning edges with identical
    connected components,
  - the optional per-bucket occupancy cap drops hot buckets.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from python_stream_processing_framework_spark.operators.common import release_caches
from python_stream_processing_framework_spark.operators.dedup import (
    collapse_exact_dups,
    minhash_lsh_join,
    minhash_lsh_pairs,
)

# three mutually-dissimilar base texts plus a near-dup variant of the
# first (one appended word -> trigram Jaccard 10/11, and the 4-band
# collision fires deterministically for this md5 hash family)
BASE = [
    "the quick brown fox jumps over the lazy dog near the river",
    "federated learning requires careful aggregation of model updates across devices",
    "stock prices rallied sharply after the central bank cut interest rates",
]
NEAR = BASE[0] + " today"


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _pairset(rows):
    return {(r["doc_a"], r["doc_b"], r["n_common"], r["n_union"], round(r["jaccard"], 9)) for r in rows}


def test_collapse_reps_and_members(spark):
    rows = [(i, BASE[0]) for i in range(1000)]
    rows += [(1000, BASE[1]), (1001, BASE[2])]
    # case/whitespace-normalized copies collapse too
    rows += [(1002, BASE[1].upper())]
    reps = collapse_exact_dups(_docs(spark, rows), "doc_id", "text").collect()
    # 1000 copies + {B1, B1.upper()} + B2 -> 3 distinct normalized texts
    assert len(reps) == 3
    by_rep = {r["doc_id"]: sorted(r["_members"]) for r in reps}
    assert by_rep[0] == list(range(1000))
    assert by_rep[1000] == [1000, 1002]
    assert by_rep[1001] == [1001]


def test_copy_mass_star_is_linear(spark):
    """1000 exact copies: the band join sees ONE representative, and
    star mode emits exactly 999 rep->copy edges (not ~500k pairs)."""
    rows = [(i, BASE[0]) for i in range(1000)]
    rows += [(2000 + j, BASE[j]) for j in (1, 2)]
    star = minhash_lsh_pairs(
        _docs(spark, rows), "doc_id", "text", threshold=0.5, expand="star"
    ).collect()
    release_caches()
    # BASE texts are mutually dissimilar -> no rep pairs survive verify;
    # output is exactly the copy-cluster star
    assert len(star) == 999
    assert {r["doc_b"] for r in star} == set(range(1, 1000))
    assert all(r["doc_a"] == 0 and r["jaccard"] == 1.0 for r in star)


def test_pairs_mode_exact_equivalence(spark):
    """collapse_exact=True must reproduce the unguarded output exactly:
    copies of near-dup texts, copies of unrelated texts, singletons."""
    rows = (
        [(i, BASE[0]) for i in range(4)]  # 4 copies of text A
        + [(10, NEAR), (11, NEAR)]  # 2 copies of near-dup A'
        + [(20, BASE[1]), (21, BASE[2])]  # singletons
        + [(30, BASE[2])]  # copy of 21
    )
    docs = _docs(spark, rows)
    guarded = _pairset(
        minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.5).collect()
    )
    release_caches()
    unguarded = _pairset(
        minhash_lsh_pairs(
            docs, "doc_id", "text", threshold=0.5, collapse_exact=False
        ).collect()
    )
    release_caches()
    assert guarded == unguarded
    # sanity: all 8 intra-cluster pairs (C(4,2) for A, one for A', one
    # for B2) at jaccard 1.0, and all 4x2 A x A' cross-cluster pairs
    # carrying the representative pair's stats (10/11)
    intra = {p for p in guarded if p[4] == 1.0}
    cross = guarded - intra
    assert len(intra) == 6 + 1 + 1
    assert len(cross) == 8
    assert {(p[0], p[1]) for p in cross} == {(i, j) for i in range(4) for j in (10, 11)}
    assert all(p[2] == 10 and p[3] == 11 for p in cross)


def test_star_components_match_pairs_components(spark):
    from python_stream_processing_framework_spark.operators.graph import (
        connected_components,
    )

    rows = (
        [(i, BASE[0]) for i in range(5)]
        + [(10, NEAR), (11, NEAR)]
        + [(20, BASE[1]), (21, BASE[2]), (30, BASE[2])]
    )
    docs = _docs(spark, rows)
    comp = {}
    for mode in ("pairs", "star"):
        pairs = minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.5, expand=mode)
        comp[mode] = {
            (r["node"], r["component"])
            for r in connected_components(pairs, "doc_a", "doc_b").collect()
        }
        release_caches()
    assert comp["star"] == comp["pairs"]
    # A-copies and A'-copies form one component rooted at min id 0
    labels = dict(comp["star"])
    assert all(labels[i] == 0 for i in [0, 1, 2, 3, 4, 10, 11])
    assert labels[21] == labels[30] == 21


def test_max_band_freq_cap_drops_hot_buckets(spark):
    """Distinct (non-identical) near-dup texts survive the exact
    collapse; the band-occupancy cap is the guard for THAT residual
    mass. With a cap below the bucket size, the pairs disappear."""
    rows = [(i, BASE[0] + f" tail{i}") for i in range(12)]
    docs = _docs(spark, rows)
    uncapped = minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.5).collect()
    release_caches()
    capped = minhash_lsh_pairs(
        docs, "doc_id", "text", threshold=0.5, max_band_freq=5
    ).collect()
    release_caches()
    assert len(uncapped) > 0
    assert len(capped) < len(uncapped)


def test_join_collapse_equivalence(spark):
    left = _docs(
        spark,
        [(i, BASE[0]) for i in range(3)] + [(5, NEAR), (6, BASE[1])],
    )
    right = _docs(
        spark,
        [(100, BASE[0]), (101, BASE[0]), (102, NEAR), (103, BASE[2])],
    )

    def run(collapse):
        out = {
            (r["id_left"], r["id_right"], round(r["jaccard"], 9))
            for r in minhash_lsh_join(
                left, right, "doc_id", "text", threshold=0.5, collapse_exact=collapse
            ).collect()
        }
        release_caches()
        return out

    guarded, unguarded = run(True), run(False)
    assert guarded == unguarded
    # every left copy of A hits every right copy of A at jaccard 1.0
    assert {(i, j, 1.0) for i in range(3) for j in (100, 101)} <= guarded


def test_star_requires_collapse(spark):
    with pytest.raises(ValueError):
        minhash_lsh_pairs(
            _docs(spark, [(0, BASE[0])]),
            "doc_id",
            "text",
            collapse_exact=False,
            expand="star",
        )
