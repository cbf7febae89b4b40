"""Streaming corpus decontamination (Stream.decontaminate): bloom-
bitmask split against held-out n-grams, map-only per micro-batch.

Contract under test: the conservative-superset guarantee of the batch
bloom_decontaminate carries into streaming — a doc sharing a 13-gram
with the held-out set is always flagged; a doc sharing nothing long
passes; restart redelivers nothing.
"""

from __future__ import annotations

import pytest
from pyspark.sql.types import StringType, StructField, StructType

from python_stream_processing_framework_spark.streaming import Stream

SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("text", StringType()),
    ]
)

# 13+ token held-out passage; contaminated doc embeds it verbatim
_BENCH = "q0 q1 q2 q3 q4 q5 q6 q7 q8 q9 q10 q11 q12 q13 q14"
_CONTAMINATED = "intro words then " + _BENCH + " and a tail"
_CLEAN = " ".join(f"c{i}" for i in range(30))


@pytest.fixture()
def heldout(spark):
    return spark.createDataFrame([(_BENCH,)], ["text"])


def _ids(stream, topic):
    return sorted(r["doc_id"] for r in stream.read_topic(topic, SCHEMA).collect())


def test_decontaminate_splits_clean_and_flagged(spark, tmp_path, heldout):
    s = Stream(spark, str(tmp_path / "broker"))
    s.decontaminate("docs", SCHEMA, heldout)
    s.emit(
        "docs",
        {"doc_id": "1", "text": _CLEAN},
        {"doc_id": "2", "text": _CONTAMINATED},
    )
    s.run_until_idle()
    assert _ids(s, "docs-clean") == ["1"]
    assert _ids(s, "docs-contaminated") == ["2"]


def test_decontaminate_matches_batch_operator(spark, tmp_path, heldout):
    """Streaming clean set == batch bloom_decontaminate on the same
    corpus (the duality contract)."""
    from python_stream_processing_framework_spark.operators.dedup import (
        bloom_decontaminate,
    )

    rows = [
        {"doc_id": "1", "text": _CLEAN},
        {"doc_id": "2", "text": _CONTAMINATED},
        {"doc_id": "3", "text": _BENCH},
        {"doc_id": "4", "text": "short"},
    ]
    s = Stream(spark, str(tmp_path / "broker"))
    s.decontaminate("docs", SCHEMA, heldout)
    s.emit("docs", *rows)
    s.run_until_idle()
    corpus = spark.createDataFrame([(r["doc_id"], r["text"]) for r in rows], SCHEMA)
    want = sorted(
        r["doc_id"] for r in bloom_decontaminate(corpus, heldout).collect()
    )
    assert _ids(s, "docs-clean") == want


def test_decontaminate_exactly_once_after_restart(spark, tmp_path, heldout):
    broker = str(tmp_path / "broker")
    s1 = Stream(spark, broker)
    s1.decontaminate("docs", SCHEMA, heldout)
    s1.emit("docs", {"doc_id": "1", "text": _CLEAN})
    s1.run_until_idle()
    assert _ids(s1, "docs-clean") == ["1"]

    s2 = Stream(spark, broker)
    s2.decontaminate("docs", SCHEMA, heldout)
    s2.emit("docs", {"doc_id": "5", "text": _CONTAMINATED})
    s2.run_until_idle()
    # batch 0 not replayed; new doc flagged, clean topic unchanged
    assert _ids(s2, "docs-clean") == ["1"]
    assert _ids(s2, "docs-contaminated") == ["5"]
