"""Count-min sketch (operators/sketch.py): never-undercount
guarantee, exactness without collisions, forced-collision
overcounting, heavy-hitter ordering, bound helper."""

from __future__ import annotations

import pytest

from python_stream_processing_framework_spark.operators.sketch import (
    cm_build,
    cm_error_bound,
    cm_estimate,
    cm_heavy_hitters,
)


@pytest.fixture(scope="module")
def corpus(spark):
    # token frequencies: a=6, b=3, c=2, d=1
    rows = [(1, "a a a b"), (2, "a b c"), (3, "a a b c d")]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _exact(spark):
    return {"a": 6, "b": 3, "c": 2, "d": 1}


def test_estimates_never_undercount(spark, corpus):
    sketch = cm_build(corpus, "text", depth=4, width=4096)
    cands = spark.createDataFrame(
        [("a",), ("b",), ("c",), ("d",), ("zzz",)], "token string"
    )
    est = {
        r["token"]: r["est"]
        for r in cm_estimate(cands, sketch, "token", depth=4, width=4096).collect()
    }
    for t, c in _exact(spark).items():
        assert est[t] >= c
    # wide sketch, 4 tokens: no collisions — estimates are exact
    assert est == {**_exact(spark), "zzz": 0}


def test_forced_collisions_overcount_only(spark, corpus):
    # width=1: every token lands in the same bucket per row, so every
    # estimate is the total token count — the worst case, but still
    # an OVERcount, never under
    sketch = cm_build(corpus, "text", depth=2, width=1)
    cands = spark.createDataFrame([("a",), ("d",)], "token string")
    est = {
        r["token"]: r["est"]
        for r in cm_estimate(cands, sketch, "token", depth=2, width=1).collect()
    }
    assert est["a"] == 12 and est["d"] == 12


def test_heavy_hitters_order_and_ties(spark, corpus):
    top = cm_heavy_hitters(corpus, "text", k=3, depth=4, width=4096).collect()
    assert [(r["token"], r["est"]) for r in top] == [
        ("a", 6), ("b", 3), ("c", 2)
    ]


def test_error_bound(spark):
    assert cm_error_bound(1000, 4096) == pytest.approx(
        2.718281828459045 * 1000 / 4096
    )


def test_partition_invariance(spark, corpus):
    a = [tuple(r) for r in cm_heavy_hitters(corpus, "text", k=4).collect()]
    b = [
        tuple(r)
        for r in cm_heavy_hitters(corpus.repartition(5), "text", k=4).collect()
    ]
    assert a == b
