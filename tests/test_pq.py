"""Product-quantization tests: codebook determinism, encode shape,
and ADC recall against exact L2 on clustered data."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from python_stream_processing_framework_spark.operators.pq import (
    pq_encode,
    pq_topk,
    pq_train,
)

DIM, M, K = 32, 4, 8


@pytest.fixture(scope="module")
def vecs(spark):
    # 400 vectors in 8 well-separated clusters: cluster c centers at
    # c*10 per component, plus a small deterministic per-vector wiggle
    return spark.range(0, 400).select(
        F.col("id").alias("vec_id"),
        F.expr(
            f"transform(sequence(1, {DIM}), d -> cast((id % 8) * 10.0"
            " + pmod(id * 7 + d * 3, 11) / 11.0 as double))"
        ).alias("embedding"),
    )


@pytest.fixture(scope="module")
def codebook(vecs):
    cb = pq_train(vecs, m=M, k=K, iters=3)
    cb.persist().count()
    return cb


def test_codebook_shape_and_determinism(spark, vecs, codebook):
    rows = codebook.collect()
    assert {r["_sub"] for r in rows} == set(range(M))
    assert all(0 <= r["code"] < K for r in rows)
    assert all(len(r["centroid"]) == DIM // M for r in rows)
    again = pq_train(vecs.repartition(7), m=M, k=K, iters=3)
    a = {(r["_sub"], r["code"], tuple(round(x, 9) for x in r["centroid"]))
         for r in codebook.collect()}
    b = {(r["_sub"], r["code"], tuple(round(x, 9) for x in r["centroid"]))
         for r in again.collect()}
    assert a == b


def test_encode_shape(spark, vecs, codebook):
    enc = pq_encode(vecs, codebook)
    rows = enc.collect()
    assert len(rows) == 400
    assert all(len(r["codes"]) == M for r in rows)
    assert all(0 <= c < K for r in rows for c in r["codes"])


def test_adc_topk_cluster_recall(spark, vecs, codebook):
    # PQ quantizes every same-cluster vector to (nearly) the same
    # codes, so ADC cannot rank WITHIN a cluster — the contract is
    # cluster-level recall: with clusters 10/component apart vs <1
    # intra-cluster wiggle, every ADC top-k hit must come from the
    # query's own cluster.
    enc = pq_encode(vecs, codebook)
    enc.persist().count()
    for qid in (17, 140):
        query = [r["embedding"] for r in vecs.filter(f"vec_id = {qid}").collect()][0]
        approx = [r["vec_id"] for r in pq_topk(enc, codebook, query, k=10).collect()]
        assert len(approx) == 10
        assert all(v % 8 == qid % 8 for v in approx), (qid, approx)
    spark.catalog.clearCache()


def test_ivfpq_topk_probes_and_scores(spark, vecs, codebook):
    from python_stream_processing_framework_spark.operators.pq import ivfpq_topk

    enc = pq_encode(vecs, codebook)
    enc.persist().count()
    # coarse cells = the true cluster id (what a kmeans partitioner
    # would produce on this data)
    cells = vecs.select("vec_id", (F.col("vec_id") % 8).alias("label"))
    query = [r["embedding"] for r in vecs.filter("vec_id = 21").collect()][0]
    got = [r["vec_id"] for r in
           ivfpq_topk(enc, codebook, cells, query, n_probe=2, k=10).collect()]
    assert len(got) == 10
    # every hit must come from the query's own cluster/cell (5 % 8)
    assert all(v % 8 == 21 % 8 for v in got), got
    spark.catalog.clearCache()
