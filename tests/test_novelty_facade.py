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


def _gram_dirs(index_path: str):
    import os

    root = os.path.join(index_path, "grams")
    return sorted(d for d in os.listdir(root) if d.startswith("batch="))


def test_compact_grams_then_score_equivalence(spark, tmp_path):
    """Compaction is invisible to scoring (r12 verdict #1): the same
    batch sequence scores identically whether or not the gram index
    was compacted mid-sequence, the directory count actually drops,
    and cross-batch duplicate grams collapse to the distinct set."""
    from python_stream_processing_framework_spark.operators.text import (
        append_novelty_grams,
        compact_novelty_grams,
        novelty_scores_batch,
    )

    idx_plain, idx_comp = str(tmp_path / "plain"), str(tmp_path / "comp")
    b1 = spark.createDataFrame(
        [(1, "a b c d"), (2, "m n o p")], "doc_id bigint, text string"
    )
    b2 = spark.createDataFrame(  # repeats b1's "a b c" boilerplate gram
        [(3, "a b c q")], "doc_id bigint, text string"
    )
    b3 = spark.createDataFrame(
        [(4, "a b c d"), (5, "x y z w")], "doc_id bigint, text string"
    )
    for idx in (idx_plain, idx_comp):
        for tag, b in (("1", b1), ("2", b2)):
            append_novelty_grams(b, idx, tag)
    assert _gram_dirs(idx_comp) == ["batch=1", "batch=2"]

    tag = compact_novelty_grams(spark, idx_comp, target_files=1)
    assert tag is not None and tag.startswith("zz-compact-")
    assert _gram_dirs(idx_comp) == [f"batch={tag}"]
    # cross-batch duplicate grams collapsed: the compact partition is
    # the DISTINCT union (b1: a-b-c, b-c-d, m-n-o, n-o-p; b2: a-b-c
    # again + b-c-q -> 5 distinct, not 6 stored)
    compacted = spark.read.parquet(f"{idx_comp}/grams")
    assert compacted.count() == 5
    assert compacted.select("_g").distinct().count() == 5

    for idx in (idx_plain, idx_comp):
        got = {
            r["doc_id"]: (r["n_grams"], r["n_novel"], r["novelty_ppm"])
            for r in novelty_scores_batch(b3, idx, "3").collect()
        }
        assert got[4] == (2, 0, 0)          # all grams seen
        assert got[5] == (2, 2, 1_000_000)  # all novel


def test_compact_grams_retains_tags_for_retry(spark, tmp_path):
    """The retention rule: a tag that may be redelivered must be
    passed in retain_tags — its partition survives, so the retry
    still excludes its own earlier gram append and scores
    identically instead of seeing itself as 'seen'."""
    from python_stream_processing_framework_spark.operators.text import (
        append_novelty_grams,
        compact_novelty_grams,
        novelty_scores_batch,
    )

    idx = str(tmp_path / "idx")
    b1 = spark.createDataFrame([(1, "a b c d")], "doc_id bigint, text string")
    b2 = spark.createDataFrame([(2, "p q r s")], "doc_id bigint, text string")
    b3 = spark.createDataFrame([(3, "h i j k")], "doc_id bigint, text string")

    append_novelty_grams(b1, idx, "1")
    append_novelty_grams(b2, idx, "2")
    scores_before = [tuple(r) for r in novelty_scores_batch(b3, idx, "3").collect()]
    append_novelty_grams(b3, idx, "3")  # landed; "3" still retryable

    # "3" is in flight: retained, so only 1+2 fold
    tag = compact_novelty_grams(spark, idx, retain_tags=["3"])
    assert tag is not None
    assert "batch=3" in _gram_dirs(idx) and len(_gram_dirs(idx)) == 2

    # the redelivery of batch 3 scores identically post-compaction
    scores_after = [tuple(r) for r in novelty_scores_batch(b3, idx, "3").collect()]
    assert scores_before == scores_after
    assert scores_after[0][1:] == (2, 2, 1_000_000)

    # retaining everything (or <=1 foldable) is a no-op
    assert compact_novelty_grams(spark, idx, retain_tags=["3", tag]) is None


def test_compact_grams_crash_between_write_and_delete(spark, tmp_path):
    """Write-then-delete crash window: if compaction crashed after
    the consolidated write but before the source deletes, grams
    exist in BOTH partitions — scoring's anti-join is idempotent to
    duplicates, and the next compaction folds the leftovers."""
    import shutil

    from python_stream_processing_framework_spark.operators.text import (
        append_novelty_grams,
        compact_novelty_grams,
        novelty_scores_batch,
    )

    idx = str(tmp_path / "idx")
    b1 = spark.createDataFrame([(1, "a b c d")], "doc_id bigint, text string")
    b2 = spark.createDataFrame([(2, "p q r s")], "doc_id bigint, text string")
    append_novelty_grams(b1, idx, "1")
    append_novelty_grams(b2, idx, "2")
    # stash a source partition, compact, then restore it = the
    # post-crash state (consolidated partition durable, one source
    # delete never happened)
    shutil.copytree(f"{idx}/grams/batch=1", str(tmp_path / "stash"))
    tag1 = compact_novelty_grams(spark, idx, target_files=1)
    shutil.copytree(str(tmp_path / "stash"), f"{idx}/grams/batch=1")
    assert _gram_dirs(idx) == ["batch=1", f"batch={tag1}"]

    # duplicates are invisible to scoring
    nxt = spark.createDataFrame(
        [(3, "a b c d"), (4, "f g h i")], "doc_id bigint, text string"
    )
    got = {
        r["doc_id"]: (r["n_novel"], r["novelty_ppm"])
        for r in novelty_scores_batch(nxt, idx, "3").collect()
    }
    assert got == {3: (0, 0), 4: (2, 1_000_000)}

    # the next compaction removes the crash leftovers
    tag2 = compact_novelty_grams(spark, idx, target_files=1)
    assert tag2 is not None and _gram_dirs(idx) == [f"batch={tag2}"]
    grams = spark.read.parquet(f"{idx}/grams")
    assert grams.count() == grams.select("_g").distinct().count()


def test_novelty_facade_compacts_on_schedule(spark, tmp_path):
    """Stream.score_novelty runs the compactor every compact_every
    batches retaining the current tag, and scores are unaffected."""
    stream = Stream(spark, str(tmp_path / "broker"))
    stream.score_novelty("docs", SCHEMA, compact_every=2)
    stream.emit("docs", {"doc_id": 1, "text": "a b c d"})
    stream.run_until_idle()  # batch 0
    stream.emit("docs", {"doc_id": 2, "text": "p q r s"})
    stream.run_until_idle()  # batch 1
    stream.emit("docs", {"doc_id": 3, "text": "a b c d"})
    stream.run_until_idle()  # batch 2 -> compacts, retaining tag 2

    idx = str(stream.broker / "_indexes" / f"{stream.name}-novelty")
    dirs = _gram_dirs(idx)
    assert "batch=2" in dirs  # current tag retained
    assert any(d.startswith("batch=zz-compact-") for d in dirs)
    assert not {"batch=0", "batch=1"} & set(dirs)  # folded

    out = _scores(stream)
    assert out[1] == (2, 2, 1_000_000)
    assert out[2] == (2, 2, 1_000_000)
    assert out[3] == (2, 0, 0)  # seen via the compacted partition

    # post-compaction batches keep scoring correctly
    stream.emit("docs", {"doc_id": 9, "text": "p q r s"})
    stream.run_until_idle()
    assert _scores(stream)[9] == (2, 0, 0)


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


def test_novelty_zero_padded_tag_excludes_own_partition(spark, tmp_path):
    """r12 review regression (exclude_batch_tag): a zero-padded
    numeric tag ('07') is partition-inferred as int 7, so the old
    one-sided raw-string compare ('7' != '07') failed to exclude the
    redelivered batch's OWN earlier grams — a retry scored everything
    as seen. The shared helper matches every inferred surface form."""
    from python_stream_processing_framework_spark.operators.text import (
        append_novelty_grams,
        novelty_scores_batch,
    )

    idx = str(tmp_path / "idx")
    batch = spark.createDataFrame([(1, "a b c d")], "doc_id bigint, text string")
    append_novelty_grams(batch, idx, "07")  # numeric dir -> int inference
    # redelivery with the SAME tag: own partition excluded -> all novel
    (row,) = novelty_scores_batch(batch, idx, "07").collect()
    assert (row["n_novel"], row["novelty_ppm"]) == (2, 1_000_000)
    # a DIFFERENT batch still sees tag 07's grams
    other = spark.createDataFrame([(2, "a b c d")], "doc_id bigint, text string")
    (row2,) = novelty_scores_batch(other, idx, "8").collect()
    assert (row2["n_novel"], row2["novelty_ppm"]) == (0, 0)
