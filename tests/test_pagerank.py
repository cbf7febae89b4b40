"""Integer-exact PageRank (operators/graph.py): hand-computed values,
mass accounting, partition invariance, sequential-reference parity."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st

from tests.conftest import SF_SMOKE

from python_stream_processing_framework_spark.operators.graph import pagerank


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    return {r["node"]: r["rank_nano"] for r in pagerank(df, **kw).collect()}


def test_hand_computed_two_iterations(spark):
    # cycle 1->2->3->1 plus 4->1; n=4, init=250_000_000, base=37_500_000
    edges = [(1, 2), (2, 3), (3, 1), (4, 1)]
    got = _run(spark, edges, n_iter=2)
    assert got == {
        1: 281_875_000,
        2: 430_625_000,
        3: 250_000_000,
        4: 37_500_000,
    }


def test_sink_heavy_node_ranks_highest(spark):
    # star: everyone links to 0
    edges = [(i, 0) for i in range(1, 6)]
    got = _run(spark, edges, n_iter=3)
    assert got[0] == max(got.values())
    assert len({got[i] for i in range(1, 6)}) == 1  # symmetric leaves


def test_partition_invariance_and_guard(spark):
    edges = [(i, (i * 7 + 3) % 20) for i in range(20)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    a = sorted(tuple(r) for r in pagerank(df, n_iter=3).collect())
    b = sorted(tuple(r) for r in pagerank(df.repartition(7), n_iter=3).collect())
    assert a == b
    with pytest.raises(ValueError, match="n_iter"):
        pagerank(df, n_iter=0)


def _reference(edges, n_iter, damping_pct=85):
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(nodes)
    init = round(1e9 / n)
    base = round((100 - damping_pct) * 1e9 / n / 100)
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    rank = {v: init for v in nodes}
    for _ in range(n_iter):
        s = {v: 0 for v in nodes}
        for a, b in edges:
            s[b] += rank[a] // outdeg[a]
        rank = {v: base + (s[v] * damping_pct) // 100 for v in nodes}
    return rank


@settings(max_examples=6, deadline=None)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 6), st.integers(0, 6)),
        min_size=1,
        max_size=15,
        unique=True,
    ),
    n_iter=st.integers(1, 3),
)
@pytest.mark.slow
def test_matches_sequential_reference(spark, edges, n_iter):
    # parallel edges excluded (unique=True) — the operator counts
    # multi-edges in out-degree AND contribution identically, but the
    # reference above assumes simple edges; self-loops are fine
    assert _run(spark, edges, n_iter=n_iter) == _reference(edges, n_iter)


def test_triangle_counts_matches_brute_force(spark):
    """Degree-oriented triangle counting vs an itertools brute force
    on the synthetic host graph, plus the K4 closed form."""
    import itertools

    from pyspark.sql import functions as F

    from python_stream_processing_framework_spark.operators.graph import (
        triangle_counts,
    )

    k4 = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(4) if a != b],
        "src int, dst int",
    )
    assert {
        r["node"]: r["triangles"] for r in triangle_counts(k4).collect()
    } == {0: 3, 1: 3, 2: 3, 3: 3}

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select("doc_id")
    e = docs.select(
        (F.col("doc_id") % 97).alias("src"),
        ((F.col("doc_id") * 7 + 3) % 97).alias("dst"),
    ).unionByName(
        docs.select(
            (F.col("doc_id") % 97).alias("src"),
            ((F.col("doc_id") * 13 + 1) % 97).alias("dst"),
        )
    )
    got = {r["node"]: r["triangles"] for r in triangle_counts(e).collect()}
    und = {
        tuple(sorted(p))
        for p in [(r["src"], r["dst"]) for r in e.collect()]
        if p[0] != p[1]
    }
    adj: dict[int, set[int]] = {}
    for x, y in und:
        adj.setdefault(x, set()).add(y)
        adj.setdefault(y, set()).add(x)
    ref: dict[int, int] = {}
    for x, y, z in itertools.combinations(sorted(adj), 3):
        if y in adj[x] and z in adj[x] and z in adj[y]:
            for node in (x, y, z):
                ref[node] = ref.get(node, 0) + 1
    assert got == ref
