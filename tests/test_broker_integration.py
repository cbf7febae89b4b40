"""Live-broker integration tests, env-gated like the reference's
`--run-integration` + availability-skip pattern
(/root/reference/tests/conftest.py:3-18,
tests/test_crash_recovery.py:9-17): they SKIP (not fail) unless
`KAFKA_BOOTSTRAP` / `VALKEY_URL` point at reachable services, so the
already-shipped wire-format logic gets end-to-end coverage the moment
a broker exists in the environment.

The always-on tests below them pin the pure option-builder logic that
doesn't need a broker.
"""

from __future__ import annotations

import json
import os
import time
import uuid

import pytest
from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
)

from python_stream_processing_framework_spark.sources.streams import (
    kafka_reader_options,
    parse_kafka_frame,
    to_kafka_frame,
)

KAFKA_BOOTSTRAP = os.environ.get("KAFKA_BOOTSTRAP")

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", StringType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)


@pytest.mark.skipif(not KAFKA_BOOTSTRAP, reason="KAFKA_BOOTSTRAP not set")
def test_kafka_roundtrip_live(spark):
    """produce via to_kafka_frame -> broker -> read + parse_kafka_frame:
    the full wire path the unit tests exercise broker-free."""
    try:
        from python_stream_processing_framework_spark.sources.streams import (
            _require_kafka,
        )

        _require_kafka(spark)
    except RuntimeError as exc:  # jars absent even though a broker is up
        pytest.skip(str(exc))

    topic = f"it-{uuid.uuid4().hex[:12]}"
    events = [("e1", "click", 1.5), ("e2", "purchase", 2.5)]
    df = spark.createDataFrame(events, EVENT_SCHEMA)
    (
        to_kafka_frame(df, "event_id")
        .write.format("kafka")
        .option("kafka.bootstrap.servers", KAFKA_BOOTSTRAP)
        .option("topic", topic)
        .save()
    )
    deadline = time.time() + 30
    got: dict[str, float] = {}
    while time.time() < deadline and len(got) < len(events):
        raw = (
            spark.read.format("kafka")
            .option("kafka.bootstrap.servers", KAFKA_BOOTSTRAP)
            .option("subscribe", topic)
            .option("startingOffsets", "earliest")
            .load()
        )
        typed = parse_kafka_frame(raw, EVENT_SCHEMA)
        got = {r["event_id"]: r["value"] for r in typed.collect()}
        time.sleep(0.5)
    assert got == {"e1": 1.5, "e2": 2.5}


def test_valkey_wire_format_live(valkey_client):
    """XADD the flattened wire format to a LIVE Valkey-protocol
    server and read it back: per-field JSON flattening, id
    monotonicity, and DLQ naming must behave server-side exactly as
    the broker-free logic promises. Runs against $VALKEY_URL when
    set (real daemon), else the in-process MiniValkeyServer — the
    same client code path either way (conftest.valkey_client)."""
    from python_stream_processing_framework_spark.sources.valkey import (
        dlq_stream,
        flatten_entry,
        parse_entry_id,
        unflatten_entry,
    )

    client = valkey_client
    stream = f"it-{uuid.uuid4().hex[:12]}"
    payloads = [
        {"event_id": "a", "nested": {"x": 1}, "flag": True, "none": None},
        {"event_id": "b", "items": [1, 2], "n": 5},
    ]
    ids = [client.xadd(stream, flatten_entry(p)) for p in payloads]
    # server-assigned ids are strictly monotonic
    assert parse_entry_id(ids[0]) < parse_entry_id(ids[1])

    entries = client.xrange(stream)
    back = [unflatten_entry(dict(fields)) for _id, fields in entries]
    assert back[0]["nested"] == {"x": 1}
    assert back[0]["flag"] is True
    assert back[0]["none"] is None
    assert back[1]["items"] == [1, 2]
    assert back[1]["n"] == 5

    # DLQ sibling naming contract holds server-side too
    client.xadd(dlq_stream(stream), flatten_entry({"_error": "boom"}))
    assert client.xlen(dlq_stream(stream)) == 1
    client.delete(stream, dlq_stream(stream))


# ------------------------------------------------------ broker-free units


def test_kafka_reader_options_backpressure():
    """maxOffsetsPerTrigger (Kafka-path backpressure, parity with the
    file path's maxFilesPerTrigger and the reference's batch tuning,
    pspf/settings.py:36-38) must be plumbed through the reader
    options; absent means unset, non-positive rejected."""
    opts = kafka_reader_options("broker:9092", "events", max_offsets_per_trigger=5000)
    assert opts["maxOffsetsPerTrigger"] == "5000"
    assert opts["subscribe"] == "events"
    assert opts["kafka.bootstrap.servers"] == "broker:9092"
    assert opts["startingOffsets"] == "earliest"

    assert "maxOffsetsPerTrigger" not in kafka_reader_options("b:9092", "t")

    with pytest.raises(ValueError, match="positive"):
        kafka_reader_options("b:9092", "t", max_offsets_per_trigger=0)


def test_kafka_wire_roundtrip_broker_free(spark):
    """to_kafka_frame -> parse_kafka_frame inversion without a broker
    (same frame shape a live topic would carry)."""
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [("e1", "click", 1.5), ("e2", "purchase", 2.5)], EVENT_SCHEMA
    )
    wire = to_kafka_frame(df, "event_id").select(
        F.col("key").cast("binary"),
        F.col("value").cast("binary"),
        F.lit("t").alias("topic"),
        F.lit(0).alias("partition"),
        F.monotonically_increasing_id().alias("offset"),
        F.current_timestamp().alias("timestamp"),
    )
    typed = parse_kafka_frame(wire, EVENT_SCHEMA)
    got = {r["event_id"]: (r["event_type"], r["value"]) for r in typed.collect()}
    assert got == {"e1": ("click", 1.5), "e2": ("purchase", 2.5)}
    assert [r["_corrupt"] for r in typed.collect()] == [None, None]
