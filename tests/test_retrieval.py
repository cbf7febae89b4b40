"""BM25 retrieval (operators/retrieval.py) and curriculum ordering
(operators/mixture.curriculum_order)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

from python_stream_processing_framework_spark.operators.mixture import (
    curriculum_order,
)
from python_stream_processing_framework_spark.operators.retrieval import (
    bm25_topk,
    tfidf_topk,
)


def _docs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet")


def _bm25_reference(rows, query, k1=1.2, b=0.75):
    """Independent plain-Python BM25 over collected (id, text) rows."""
    terms = sorted({t for t in query.lower().split() if t})
    docs = {r[0]: r[1].strip().lower().split() for r in rows}
    n = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / n
    dfc = {
        t: sum(1 for toks in docs.values() if t in toks) for t in terms
    }
    out = {}
    for doc_id, toks in docs.items():
        score = 0.0
        for t in terms:  # sorted term order — same fold order as Spark
            tf = float(toks.count(t))
            if tf == 0 or dfc[t] == 0:
                continue
            idf = math.log(1.0 + (n - dfc[t] + 0.5) / (dfc[t] + 0.5))
            score += idf * tf * (k1 + 1.0) / (tf + k1 * (1 - b + b * len(toks) / avgdl))
        if score > 0:
            out[doc_id] = round(score, 6)
    return out


def test_bm25_matches_reference_implementation(spark):
    docs = _docs(spark)
    query = "spark window join"
    got = {
        r["doc_id"]: r["bm25"]
        for r in bm25_topk(docs, query, k=15).collect()
    }
    rows = [(r["doc_id"], r["text"]) for r in docs.select("doc_id", "text").collect()]
    expect = _bm25_reference(rows, query)
    top = sorted(expect.items(), key=lambda kv: (-kv[1], kv[0]))[:15]
    assert got == dict(top)
    assert len(got) == 15


def test_bm25_partition_invariant_and_validates(spark):
    docs = _docs(spark)
    a = bm25_topk(docs, "table scan", k=5).collect()
    b = bm25_topk(docs.repartition(13, "doc_id"), "table scan", k=5).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    with pytest.raises(ValueError, match="at least one term"):
        bm25_topk(docs, "   ")


def _tfidf_reference(rows, query, k):
    """Independent plain-Python tf-idf cosine over collected rows."""
    qtoks = [t for t in query.lower().split() if t]
    qtf = {t: float(qtoks.count(t)) for t in set(qtoks)}
    docs = {r[0]: r[1].strip().lower().split() for r in rows}
    n = len(docs)
    dfc = {}
    for toks in docs.values():
        for t in set(toks):
            dfc[t] = dfc.get(t, 0) + 1

    def idf(t):
        return math.log((1.0 + n) / (1.0 + dfc.get(t, 0))) + 1.0

    qw = {t: c * idf(t) for t, c in qtf.items()}
    qn_acc = 0.0
    for t in sorted(qw):
        qn_acc = qn_acc + qw[t] * qw[t]
    qn = math.sqrt(qn_acc)

    out = {}
    for doc_id, toks in docs.items():
        w = {t: toks.count(t) * idf(t) for t in set(toks)}
        norm_acc = 0.0
        for t in sorted(w):
            norm_acc = norm_acc + w[t] * w[t]
        if not any(t in w for t in qw):
            continue
        dot = 0.0
        for t in sorted(qw):
            if t in w:
                dot = dot + w[t] * qw[t]
        out[doc_id] = round(dot / (math.sqrt(norm_acc) * qn), 6)
    top = sorted(out.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return dict(top)


def test_tfidf_matches_reference_implementation(spark):
    docs = _docs(spark)
    query = "spark stream stream merge"
    got = {
        r["doc_id"]: r["tfidf_cosine"]
        for r in tfidf_topk(docs, query, k=15).collect()
    }
    rows = [(r["doc_id"], r["text"]) for r in docs.select("doc_id", "text").collect()]
    assert got == _tfidf_reference(rows, query, 15)
    assert len(got) == 15
    assert all(0.0 < v <= 1.0 for v in got.values())


def test_tfidf_partition_invariant_and_validates(spark):
    docs = _docs(spark)
    a = tfidf_topk(docs, "table scan", k=5).collect()
    b = tfidf_topk(docs.repartition(13, "doc_id"), "table scan", k=5).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    with pytest.raises(ValueError, match="at least one term"):
        tfidf_topk(docs, "   ")


def test_curriculum_order_phases_and_shuffle(spark):
    docs = _docs(spark).withColumn(
        "score", (F.col("n_chars") / 1000.0)
    )
    out = curriculum_order(docs, "score", [0.2, 0.4], "doc_id", seed="c")
    rows = out.select("doc_id", "score", "curr_phase", "curr_key").collect()
    for r in rows:
        expected = 0 if r["score"] < 0.2 else (1 if r["score"] < 0.4 else 2)
        assert r["curr_phase"] == expected
    # within-phase order is a hash shuffle: keys are distinct and the
    # schedule is reproducible
    keys = [r["curr_key"] for r in rows]
    assert len(set(keys)) == len(keys)
    again = curriculum_order(docs, "score", [0.2, 0.4], "doc_id", seed="c")
    assert sorted(keys) == sorted(r["curr_key"] for r in again.collect())
    # descending anti-curriculum reverses phase order
    desc = curriculum_order(docs, "score", [0.2, 0.4], "doc_id", ascending=False)
    by_id = {r["doc_id"]: r["curr_phase"] for r in desc.collect()}
    for r in rows:
        assert by_id[r["doc_id"]] == 2 - r["curr_phase"]


def test_curriculum_order_validates(spark):
    docs = _docs(spark)
    with pytest.raises(ValueError, match="non-empty"):
        curriculum_order(docs, "n_chars", [], "doc_id")
    with pytest.raises(ValueError, match="ascending"):
        curriculum_order(docs, "n_chars", [5.0, 1.0], "doc_id")


def test_bm25_all_miss_query_returns_empty(spark):
    """A query whose terms all miss the corpus vocabulary must return
    the empty (id, bm25) frame, not fail analysis (an empty
    F.create_map() types its key as VOID)."""
    from python_stream_processing_framework_spark.operators.common import (
        release_caches,
    )
    from python_stream_processing_framework_spark.operators.retrieval import (
        bm25_topk,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "beta delta")], "doc_id bigint, text string"
    )
    try:
        out = bm25_topk(docs, "zeta omega", k=5)
        assert out.columns == ["doc_id", "bm25"]
        assert out.count() == 0
    finally:
        release_caches()
