"""Domain-mixture sampling + shard planning (operators/mixture.py).

The catalog parity test (test_oracle_parity) pins the end-to-end
membership against DuckDB at the catalog configuration; these tests
pin the operator contract itself: exact quotas, determinism across
partitionings and bucket granularities, prefix-nested membership, and
validation errors.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

from python_stream_processing_framework_spark.operators.mixture import (
    assign_shards,
    domain_mixture,
    mixture_quotas,
    shard_stats,
)


def _docs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet")


def test_mixture_quotas_math():
    # T = floor(min(100/.6, 50/.4)) = floor(min(166.66, 125)) = 125
    q = mixture_quotas({"a": 100, "b": 50}, {"a": 0.6, "b": 0.4})
    assert q == {"a": 75, "b": 50}
    # A stratum in weights but absent from counts collapses T to 0.
    assert mixture_quotas({"a": 100}, {"a": 0.5, "zz": 0.5}) == {"a": 0, "zz": 0}


def test_mixture_quotas_validation():
    with pytest.raises(ValueError, match="non-empty"):
        mixture_quotas({"a": 1}, {})
    with pytest.raises(ValueError, match="positive"):
        mixture_quotas({"a": 1}, {"a": -0.1})


def test_domain_mixture_exact_counts(spark):
    docs = _docs(spark)
    weights = {"src0": 0.4, "src1": 0.3, "src2": 0.2, "src3": 0.1}
    counts = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    expected = mixture_quotas(counts, weights)
    kept = domain_mixture(docs, "source", weights, "doc_id", seed="t")
    got = {
        r["source"]: r["n"]
        for r in kept.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    # Exact per-stratum counts; strata outside the weights are dropped.
    assert got == {s: q for s, q in expected.items() if q > 0}
    assert kept.columns == docs.columns


def test_domain_mixture_partition_and_bucket_invariant(spark):
    docs = _docs(spark)
    weights = {"src0": 0.5, "src1": 0.5}
    ids = lambda df: sorted(r["doc_id"] for r in df.select("doc_id").collect())
    base = ids(domain_mixture(docs, "source", weights, "doc_id", seed="t"))
    repart = ids(
        domain_mixture(docs.repartition(7, "doc_id"), "source", weights, "doc_id", seed="t")
    )
    # bucket_bits=0 degenerates to one bucket (everything ranks through
    # the window); bucket_bits=12 puts ~every row in its own bucket
    # (cutoff take is 0 or 1). All three must agree exactly.
    coarse = ids(
        domain_mixture(docs, "source", weights, "doc_id", seed="t", bucket_bits=0)
    )
    fine = ids(
        domain_mixture(docs, "source", weights, "doc_id", seed="t", bucket_bits=12)
    )
    assert base == repart == coarse == fine
    assert len(base) > 0


def test_domain_mixture_prefix_nested(spark):
    docs = _docs(spark)
    big = domain_mixture(
        docs, "source", {"src0": 0.5, "src1": 0.5}, "doc_id", seed="t"
    )
    # Shrinking src0's share shrinks its quota; same availability + same
    # seed => the smaller sample is a prefix (subset) of the larger one.
    small = domain_mixture(
        docs, "source", {"src0": 0.2, "src1": 0.8}, "doc_id", seed="t"
    )
    big_src0 = {
        r["doc_id"] for r in big.filter(F.col("source") == "src0").collect()
    }
    small_src0 = {
        r["doc_id"] for r in small.filter(F.col("source") == "src0").collect()
    }
    assert 0 < len(small_src0) < len(big_src0)
    assert small_src0 <= big_src0


def test_assign_shards_and_stats(spark):
    docs = _docs(spark)
    assigned = assign_shards(docs, "doc_id", 8, seed="t")
    n = docs.count()
    assert assigned.count() == n  # map-only: every row keeps its shard
    stats = shard_stats(assigned, size_col="n_chars").collect()
    assert sorted(r["shard"] for r in stats) == sorted(
        {r["shard"] for r in stats}
    )
    assert all(0 <= r["shard"] < 8 for r in stats)
    assert sum(r["n_rows"] for r in stats) == n
    total_chars = docs.agg(F.sum("n_chars")).collect()[0][0]
    assert sum(r["total_size"] for r in stats) == total_chars


def test_assign_shards_validation(spark):
    with pytest.raises(ValueError, match="positive"):
        assign_shards(_docs(spark), "doc_id", 0)


def test_domain_mixture_int_strata(spark):
    """Strata need not be strings: cluster ids / quality buckets are
    ints. The per-stratum plan table mirrors the input dtype."""
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    weights = {0: 0.5, 1: 0.3, 2: 0.2}
    kept = domain_mixture(emb, "label", weights, "vec_id", seed="t")
    counts = {
        r["label"]: r["n"]
        for r in emb.filter(F.col("label") < 3)
        .groupBy("label")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    expected = mixture_quotas(counts, weights)
    got = {
        r["label"]: r["n"]
        for r in kept.groupBy("label").agg(F.count("*").alias("n")).collect()
    }
    assert got == {s: q for s, q in expected.items() if q > 0}
