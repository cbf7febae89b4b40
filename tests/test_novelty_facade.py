"""Streaming novelty scoring (Stream.score_novelty): the incremental
form of the doc_novelty catalog query — within-batch first-occurrence
rule, cross-batch memory via the persisted gram index, exactly-once
across restarts."""

from __future__ import annotations

import pytest
from pyspark.sql.types import LongType, StringType, StructField, StructType

from python_stream_processing_framework_spark.streaming import Stream

SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
    ]
)

OUT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_grams", LongType()),
        StructField("n_novel", LongType()),
        StructField("novelty_ppm", LongType()),
    ]
)


@pytest.fixture()
def stream(spark, tmp_path):
    return Stream(spark, str(tmp_path / "broker"))


def _scores(stream, topic="docs-novelty"):
    return {
        r["doc_id"]: (r["n_grams"], r["n_novel"], r["novelty_ppm"])
        for r in stream.read_topic(topic, OUT_SCHEMA).collect()
    }


def test_novelty_within_and_across_batches(stream):
    stream.score_novelty("docs", SCHEMA)
    # batch 1: doc 1 all-novel; doc 2 identical -> zero novel;
    # doc 3 shares the "a b c" gram with doc 1, rest novel
    stream.emit(
        "docs",
        {"doc_id": 1, "text": "a b c d"},
        {"doc_id": 2, "text": "a b c d"},
        {"doc_id": 3, "text": "a b c x y z"},
    )
    stream.run_until_idle()
    out = _scores(stream)
    assert out[1] == (2, 2, 1_000_000)
    assert out[2] == (2, 0, 0)
    assert out[3] == (4, 3, 750_000)

    # batch 2: doc 4 repeats batch-1 text -> zero novel via the INDEX;
    # doc 5 entirely new
    stream.emit(
        "docs",
        {"doc_id": 4, "text": "a b c d"},
        {"doc_id": 5, "text": "p q r s"},
    )
    stream.run_until_idle()
    out = _scores(stream)
    assert out[4] == (2, 0, 0)
    assert out[5] == (2, 2, 1_000_000)


def test_novelty_exactly_once_after_restart(spark, tmp_path):
    broker = str(tmp_path / "broker")
    s1 = Stream(spark, broker)
    s1.score_novelty("docs", SCHEMA)
    s1.emit("docs", {"doc_id": 1, "text": "a b c d"})
    s1.run_until_idle()
    assert _scores(s1)[1] == (2, 2, 1_000_000)

    s2 = Stream(spark, broker)
    s2.score_novelty("docs", SCHEMA)
    s2.emit("docs", {"doc_id": 9, "text": "a b c d"})  # seen by index
    s2.run_until_idle()
    out = _scores(s2)
    assert set(out) == {1, 9}  # no re-delivery of batch 1's row
    assert out[9] == (2, 0, 0)


def test_novelty_short_docs_skipped(stream):
    stream.score_novelty("docs", SCHEMA, n=3)
    stream.emit(
        "docs",
        {"doc_id": 1, "text": "a b"},       # < n tokens: no row
        {"doc_id": 2, "text": "a b c"},
    )
    stream.run_until_idle()
    out = _scores(stream)
    assert set(out) == {2}
    assert out[2] == (1, 1, 1_000_000)


def test_novelty_redelivery_after_gram_append_scores_identically(spark, tmp_path):
    """The crash window the facade docstring claims: a foreachBatch
    redelivery AFTER the batch's gram append landed must score
    identically, because the scoring read excludes the current
    batch's own index partition."""
    from python_stream_processing_framework_spark.operators.text import (
        append_novelty_grams,
        novelty_scores_batch,
    )

    idx = str(tmp_path / "idx")
    batch = spark.createDataFrame(
        [(1, "a b c d"), (2, "p q r s")], "doc_id bigint, text string"
    )
    before = {
        r["doc_id"]: tuple(r)
        for r in novelty_scores_batch(batch, idx, "7").collect()
    }
    append_novelty_grams(batch, idx, "7")  # the append landed...
    after = {  # ...then the batch is redelivered with the same tag
        r["doc_id"]: tuple(r)
        for r in novelty_scores_batch(batch, idx, "7").collect()
    }
    assert before == after
    assert before[1][1:] == (2, 2, 1_000_000)

    # a LATER batch does see tag 7's grams
    nxt = spark.createDataFrame([(3, "a b c d")], "doc_id bigint, text string")
    (row,) = novelty_scores_batch(nxt, idx, "8").collect()
    assert (row["n_novel"], row["novelty_ppm"]) == (0, 0)


def test_novelty_non_numeric_tag_vs_numeric_partitions(spark, tmp_path):
    """r12 ADVICE regression: when every existing grams/batch=
    partition is numeric, Spark infers the partition column as int —
    a NON-numeric batch_tag from a direct API caller then cast to
    null in the exclusion filter and silently dropped the ENTIRE seen
    set (every gram scored novel). The compare is now string-typed."""
    from python_stream_processing_framework_spark.operators.text import (
        append_novelty_grams,
        novelty_scores_batch,
    )

    idx = str(tmp_path / "idx")
    first = spark.createDataFrame([(1, "a b c d")], "doc_id bigint, text string")
    append_novelty_grams(first, idx, "7")  # numeric dir -> int inference

    redo = spark.createDataFrame([(2, "a b c d")], "doc_id bigint, text string")
    (row,) = novelty_scores_batch(redo, idx, "retry-x").collect()
    assert (row["n_novel"], row["novelty_ppm"]) == (0, 0)
