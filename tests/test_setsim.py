"""Prefix-filtered exact set-similarity join (operators/setsim.py)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE


def _brute(rows, threshold, k):
    def sh(t):
        toks = t.strip().lower().split(" ")
        if not t.strip() or len(toks) < k:
            return set()
        if k == 1:
            return set(toks)
        return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}

    sets = {d: sh(t) for d, t in rows}
    sets = {d: s for d, s in sets.items() if s}
    out = []
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            if not inter:
                continue
            j = round(inter / (len(sets[a]) + len(sets[b]) - inter), 6)
            if j >= threshold:
                out.append((a, b, j))
    return sorted(out)


@pytest.mark.parametrize("threshold,k", [(0.5, 2), (0.7, 2), (0.3, 1)])
def test_setsim_matches_brute_force(spark, threshold, k):
    """The exactness claim: prefix/length/positional pruning loses no
    qualifying pair at any threshold or set representation."""
    from python_stream_processing_framework_spark.operators.setsim import setsim_join

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    got = sorted(
        tuple(r)
        for r in setsim_join(
            docs, threshold=threshold, shingle_k=k
        ).collect()
    )
    rows = [(r["doc_id"], r["text"]) for r in docs.select("doc_id", "text").collect()]
    assert got == _brute(rows, threshold, k)


def test_setsim_exchange_regime_matches_broadcast_regime(spark):
    """Forcing the shingle-df table above the broadcast size gate
    (broadcast_row_cap=0 → plain equi-join) must not change a single
    pair: the gate is an execution-strategy switch, not semantics."""
    from python_stream_processing_framework_spark.operators.setsim import setsim_join

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(120)
    default = sorted(tuple(r) for r in setsim_join(docs, threshold=0.5).collect())
    forced = sorted(
        tuple(r)
        for r in setsim_join(docs, threshold=0.5, broadcast_row_cap=0).collect()
    )
    assert forced == default


def test_setsim_validates(spark):
    from python_stream_processing_framework_spark.operators.setsim import setsim_join

    docs = spark.createDataFrame([(1, "a b")], "doc_id int, text string")
    with pytest.raises(ValueError, match="threshold"):
        setsim_join(docs, threshold=0.0)
    with pytest.raises(ValueError, match="shingle_k"):
        setsim_join(docs, shingle_k=0)
