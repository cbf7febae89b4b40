"""SemDeDup (operators/semdedup.py): duplicate grouping, the paper's
keep-rule, and cluster-bucketing invariants on crafted embeddings.
"""

from __future__ import annotations

import pytest

from python_stream_processing_framework_spark.operators.semdedup import (
    cluster_assign,
    semdedup,
)


def _mk(base, scale, dim=8):
    return [x * scale for x in base] + [0.0] * (dim - len(base))


@pytest.fixture(scope="module")
def crafted(spark):
    """Two tight duplicate families in opposite orthants plus two
    singletons. Cosine is scale-invariant, so scaled copies are
    exact semantic duplicates (cos = 1)."""
    a = [1.0, 0.9, 0.8, 0.7]
    b = [-1.0, 0.8, -0.6, 0.4]
    rows = [
        (0, _mk(a, 1.0)),
        (1, _mk(a, 0.5)),   # dup of 0
        (2, _mk(a, 2.0)),   # dup of 0
        (3, _mk(b, 1.0)),
        (4, _mk(b, 1.5)),   # dup of 3
        (5, _mk([0.1, -0.9, 0.9, -0.2], 1.0)),  # singleton
        (6, _mk([0.9, -0.1, -0.9, 0.3], 1.0)),  # singleton
    ]
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    )


def test_duplicate_families_group_and_keep_one(crafted):
    out = {r["vec_id"]: r for r in semdedup(crafted, k=2, iters=2, eps=0.99).collect()}
    # families share a group labelled by the minimum member id
    assert out[0]["dup_group"] == out[1]["dup_group"] == out[2]["dup_group"] == 0
    assert out[3]["dup_group"] == out[4]["dup_group"] == 3
    # singletons label themselves and are kept
    for v in (5, 6):
        assert out[v]["dup_group"] == v and out[v]["keep"]
    # exactly one keeper per family
    assert sum(out[v]["keep"] for v in (0, 1, 2)) == 1
    assert sum(out[v]["keep"] for v in (3, 4)) == 1
    # the keeper has the LOWEST centroid similarity in its family
    # (ties to the smaller id)
    fam = [(out[v]["centroid_sim"], v) for v in (0, 1, 2)]
    assert out[min(fam)[1]]["keep"]


def test_eps_one_family_only(crafted):
    """Exact duplicates (cos = 1.0) survive even eps = 1.0; nothing
    else does."""
    out = semdedup(crafted, k=2, iters=2, eps=1.0).collect()
    groups = {}
    for r in out:
        groups.setdefault(r["dup_group"], []).append(r["vec_id"])
    dup_groups = {g: m for g, m in groups.items() if len(m) > 1}
    assert sorted(sorted(m) for m in dup_groups.values()) == [[0, 1, 2], [3, 4]]


def test_pairs_are_cluster_bucketed(crafted):
    """Duplicates can only collapse within one k-means cluster —
    members of a dup_group must share a cluster assignment."""
    out = semdedup(crafted, k=2, iters=2, eps=0.99).collect()
    by_group = {}
    for r in out:
        by_group.setdefault(r["dup_group"], set()).add(r["cluster"])
    assert all(len(cs) == 1 for cs in by_group.values())


def test_cluster_assign_shapes(crafted):
    assign, cb = cluster_assign(crafted, k=2, iters=2)
    rows = assign.collect()
    assert len(rows) == 7
    assert {r["cluster"] for r in rows} <= {0, 1}
    # m=1 codebook: one row per surviving cluster, full-dim centroid
    cents = cb.collect()
    assert all(r["_sub"] == 0 and len(r["centroid"]) == 8 for r in cents)


def test_keep_filter_yields_dedup_corpus(crafted):
    out = semdedup(crafted, k=2, iters=2, eps=0.99)
    kept = sorted(r["vec_id"] for r in out.filter("keep").collect())
    # one per family + both singletons = 4 rows
    assert len(kept) == 4
    assert 5 in kept and 6 in kept
