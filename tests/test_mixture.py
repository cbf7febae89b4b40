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


def test_temperature_weights_properties():
    import math

    from python_stream_processing_framework_spark.operators.mixture import (
        temperature_weights,
    )

    counts = {"en": 900, "de": 100, "fr": 0}
    # tau=1: proportional (zero-count strata excluded)
    w1 = temperature_weights(counts, 1.0)
    assert set(w1) == {"en", "de"}
    assert abs(w1["en"] - 0.9) < 1e-9 and abs(w1["de"] - 0.1) < 1e-9
    # tau=0: uniform over non-empty strata
    w0 = temperature_weights(counts, 0.0)
    assert abs(w0["en"] - 0.5) < 1e-12 and abs(w0["de"] - 0.5) < 1e-12
    # tau=0.5 sits between: low-resource de is UP-weighted vs
    # proportional, still below uniform
    wh = temperature_weights(counts, 0.5)
    assert w1["de"] < wh["de"] < w0["de"]
    assert abs(sum(wh.values()) - 1.0) < 1e-9
    # exact quantization rule: floor(n^tau * 1e12 + 0.5) units
    u_en = math.floor(900**0.5 * 1e12 + 0.5)
    u_de = math.floor(100**0.5 * 1e12 + 0.5)
    assert wh["en"] == u_en / (u_en + u_de)
    import pytest

    with pytest.raises(ValueError, match="non-empty"):
        temperature_weights({"x": 0}, 0.5)
    with pytest.raises(ValueError, match="tau"):
        temperature_weights(counts, -1.0)


def test_temperature_mixture_upweights_low_resource(spark):
    from python_stream_processing_framework_spark.operators.mixture import (
        temperature_mixture,
    )

    rows = [(i, "big" if i < 1600 else "small") for i in range(1700)]
    df = spark.createDataFrame(rows, "doc_id int, lang string")
    kept = temperature_mixture(df, "lang", 0.5, "doc_id", seed="t")
    got = {r["lang"]: 0 for r in kept.collect()}
    for r in kept.collect():
        got[r["lang"]] += 1
    # proportional share of small = 100/1700 ~ 5.9%; at tau=0.5 the
    # weight share is 10/(40+10) = 20%, and small (binding stratum)
    # is taken in full
    assert got["small"] == 100
    frac = got["small"] / (got["small"] + got["big"])
    assert 0.19 < frac <= 0.21
