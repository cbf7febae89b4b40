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


def test_minhash_lsh_join_finds_cross_corpus_dups(spark):
    from python_stream_processing_framework_spark.operators.dedup import (
        decontaminate,
        minhash_lsh_join,
    )

    base = [
        "the quick brown fox jumps over the lazy dog near the river bank",
        "machine learning systems require large curated training corpora today",
        "spark executes declarative plans with whole stage code generation",
        "completely unrelated text about cooking pasta with fresh tomatoes",
    ]
    corpus = spark.createDataFrame(
        [(i, t) for i, t in enumerate(base)]
        + [(100 + i, f"filler document number {i} with unique words w{i}a w{i}b w{i}c w{i}d")
           for i in range(20)],
        "doc_id long, text string",
    )
    # held-out set shares doc 0 verbatim and doc 1 with one word changed
    heldout = spark.createDataFrame(
        [(0, base[0]), (1, base[1].replace("today", "now")), (2, "entirely disjoint heldout sample")],
        "doc_id long, text string",
    )
    hits = minhash_lsh_join(corpus, heldout, threshold=0.5)
    got = {(r["id_left"], r["id_right"]) for r in hits.collect()}
    assert (0, 0) in got
    assert (1, 1) in got
    assert all(left in (0, 1) for left, _ in got)

    clean = decontaminate(corpus, heldout, threshold=0.5)
    kept = {r["doc_id"] for r in clean.collect()}
    assert 0 not in kept and 1 not in kept
    assert {2, 3}.issubset(kept) and len(kept) == corpus.count() - 2
