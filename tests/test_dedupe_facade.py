"""Streaming first-occurrence dedup (Stream.dedupe) — checkpointed
dropDuplicates / dropDuplicatesWithinWatermark behind the facade."""

from __future__ import annotations

import pytest
from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
)

from python_stream_processing_framework_spark.streaming import Stream

SCHEMA = StructType(
    [
        StructField("event_id", StringType()),
        StructField("timestamp", DoubleType()),
        StructField("value", DoubleType()),
    ]
)


@pytest.fixture()
def stream(spark, tmp_path):
    return Stream(spark, str(tmp_path / "broker"))


def _ids(stream, topic):
    return sorted(
        r["event_id"] for r in stream.read_topic(topic, SCHEMA).collect()
    )


def test_dedupe_within_batch_and_across_batches(stream):
    stream.dedupe("ev", SCHEMA)
    stream.emit(
        "ev",
        {"event_id": "a", "timestamp": 1.0, "value": 1.0},
        {"event_id": "a", "timestamp": 1.0, "value": 1.0},  # same batch dup
        {"event_id": "b", "timestamp": 2.0, "value": 2.0},
    )
    stream.run_until_idle()
    assert _ids(stream, "ev-deduped") == ["a", "b"]

    # cross-batch duplicate: per-key state lives in the checkpoint
    stream.emit("ev", {"event_id": "a", "timestamp": 9.0, "value": 9.0})
    stream.emit("ev", {"event_id": "c", "timestamp": 9.0, "value": 9.0})
    stream.run_until_idle()
    assert _ids(stream, "ev-deduped") == ["a", "b", "c"]


def test_dedupe_within_watermark_bounded_state(stream):
    """dropDuplicatesWithinWatermark: duplicates within the watermark
    horizon collapse; per-key state is evicted once the watermark
    passes (the bounded-state contract — not asserted directly, but
    the query must accept a watermark and still dedup)."""
    stream.dedupe("evw", SCHEMA, watermark_delay_ms=5_000)
    stream.emit(
        "evw",
        {"event_id": "x", "timestamp": 100.0, "value": 1.0},
        {"event_id": "x", "timestamp": 101.0, "value": 1.5},  # dup, in horizon
        {"event_id": "y", "timestamp": 102.0, "value": 2.0},
    )
    stream.run_until_idle()
    assert _ids(stream, "evw-deduped") == ["x", "y"]


def test_dedupe_exactly_once_after_restart(spark, tmp_path):
    """A NEW Stream over the same broker + checkpoints must not
    re-deliver already-forwarded events NOR forget seen keys."""
    broker = str(tmp_path / "broker")
    s1 = Stream(spark, broker)
    s1.dedupe("ev2", SCHEMA)
    s1.emit("ev2", {"event_id": "a", "timestamp": 1.0, "value": 1.0})
    s1.run_until_idle()

    s2 = Stream(spark, broker)  # same checkpoint dir: a restart
    s2.dedupe("ev2", SCHEMA)
    s2.emit("ev2", {"event_id": "a", "timestamp": 2.0, "value": 2.0})  # dup
    s2.emit("ev2", {"event_id": "b", "timestamp": 2.0, "value": 2.0})
    s2.run_until_idle()
    assert _ids(s2, "ev2-deduped") == ["a", "b"]
