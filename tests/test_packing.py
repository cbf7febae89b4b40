"""Unit tests for sequence packing and end-to-end corpus dedup."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from python_stream_processing_framework_spark.operators.dedup import dedup_corpus
from python_stream_processing_framework_spark.operators.packing import (
    pack_sequences,
    packing_stats,
)


@pytest.fixture(scope="module")
def docs(spark):
    # 200 docs, token counts 1..200 — mixed sizes incl. one oversized
    rows = [(i, (i * 37) % 190 + 10) for i in range(200)]
    rows.append((1000, 5000))  # single doc bigger than any budget
    return spark.createDataFrame(rows, "doc_id long, n_tokens long")


def test_pack_every_doc_exactly_once(spark, docs):
    packed = pack_sequences(docs, max_tokens=512, num_groups=8)
    got = packed.select("doc_id").collect()
    assert sorted(r["doc_id"] for r in got) == sorted(
        r["doc_id"] for r in docs.collect()
    )


def test_pack_no_sequence_overflows(spark, docs):
    packed = pack_sequences(docs, max_tokens=512, num_groups=8)
    per_seq = (
        packed.groupBy("pack_group", "seq_idx")
        .agg(F.sum("n_tokens").alias("toks"), F.count("*").alias("docs"))
        .collect()
    )
    for r in per_seq:
        # only a single oversized doc may exceed the budget
        assert r["toks"] <= 512 or r["docs"] == 1


def test_pack_deterministic_across_partitioning(spark, docs):
    a = pack_sequences(docs, max_tokens=512, num_groups=8)
    b = pack_sequences(docs.repartition(13), max_tokens=512, num_groups=8)
    ka = {(r["doc_id"], r["pack_group"], r["seq_idx"], r["seq_pos"]) for r in a.collect()}
    kb = {(r["doc_id"], r["pack_group"], r["seq_idx"], r["seq_pos"]) for r in b.collect()}
    assert ka == kb


def test_packing_stats(spark, docs):
    packed = pack_sequences(docs, max_tokens=512, num_groups=8)
    s = packing_stats(packed, max_tokens=512).collect()[0]
    assert s["n_documents"] == docs.count()
    assert s["n_oversized"] == 1
    assert s["n_overfull_bugs"] == 0
    # greedy over thousands of tokens per group should fill reasonably
    assert s["mean_fill"] > 0.5


def test_dedup_corpus_keeps_one_per_cluster(spark):
    corpus = spark.createDataFrame(
        [(i, f"text-{i}") for i in range(10)], "doc_id long, text string"
    )
    # clusters {1,2,3} (transitive via 2), {7,8}; 0,4,5,6,9 untouched
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8)], "doc_a long, doc_b long"
    )
    kept = sorted(r["doc_id"] for r in dedup_corpus(corpus, pairs).collect())
    assert kept == [0, 1, 4, 5, 6, 7, 9]
