"""Facade-level Valkey bridges (Stream.ingest_valkey /
Stream.deliver_valkey): a live Valkey-protocol stream feeds the
broker exactly-once, and a broker topic delivers out through the
distributed pipelined XADD sink — the facade form of the reference's
default-broker deployment (pspf/connectors/valkey.py). Runs against
$VALKEY_URL when set, else the embedded MiniValkeyServer; real
executor sockets either way."""

from __future__ import annotations

import json
import uuid

from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from python_stream_processing_framework_spark.sources.valkey import flatten_entry

SCHEMA = StructType(
    [
        StructField("event_id", StringType()),
        StructField("k", LongType()),
        StructField("value", DoubleType()),
    ]
)


def _events(lo: int, hi: int) -> list[dict]:
    return [
        {"event_id": f"e{i}", "k": i % 5, "value": float(i)} for i in range(lo, hi)
    ]


def test_ingest_valkey_exactly_once_across_runs(spark, tmp_path, valkey_client, valkey_url):
    """XADD -> ingest bridge -> pipeline -> sink: every entry lands
    exactly once, and a SECOND run after more XADDs ingests only the
    new entries (checkpointed entry-id offsets)."""
    from python_stream_processing_framework_spark.streaming import Stream

    skey = f"fin-{uuid.uuid4().hex[:10]}"
    for ev in _events(0, 10):
        valkey_client.xadd(skey, flatten_entry(ev))

    stream = Stream(spark, str(tmp_path / "broker"), state_partitions=4)
    stream.ingest_valkey(valkey_url, skey, topic="in")

    def double(ev):
        return {**ev, "value": ev["value"] * 2}

    stream.pipeline("in", SCHEMA).map(double).sink("out")
    # round 1 ingests; round 2 lets the pipeline see the new files
    # (availableNow pins its file list at start — same draining
    # pattern as handler re-emits)
    stream.run_until_idle(rounds=2)

    out = {
        (r["event_id"], r["value"])
        for r in stream.read_topic("out", SCHEMA).collect()
    }
    assert out == {(f"e{i}", float(i) * 2) for i in range(10)}

    for ev in _events(10, 15):
        valkey_client.xadd(skey, flatten_entry(ev))
    stream.run_until_idle(rounds=2)
    out2 = [
        (r["event_id"], r["value"])
        for r in stream.read_topic("out", SCHEMA).collect()
    ]
    # 15 distinct events, ZERO duplicates of the first batch
    assert len(out2) == 15
    assert set(out2) == {(f"e{i}", float(i) * 2) for i in range(15)}
    valkey_client.delete(skey)


def test_deliver_valkey_distributed_xadd(spark, tmp_path, valkey_client, valkey_url):
    """emit -> deliver bridge -> live stream: every event XADDed,
    payloads round-trip through the wire format."""
    from python_stream_processing_framework_spark.streaming import Stream

    skey = f"fout-{uuid.uuid4().hex[:10]}"
    stream = Stream(spark, str(tmp_path / "broker"), state_partitions=4)
    stream.emit("t", *_events(0, 12))
    stream.deliver_valkey("t", SCHEMA, valkey_url, skey)
    stream.run_until_idle()

    entries = valkey_client.xrange(skey)
    assert len(entries) == 12
    got = {f["event_id"]: float(f["value"]) for _id, f in entries}
    assert got == {f"e{i}": float(i) for i in range(12)}
    valkey_client.delete(skey)


def test_roundtrip_valkey_in_and_out(spark, tmp_path, valkey_client, valkey_url):
    """Full edge-to-edge: live stream in -> facade filter -> live
    stream out. The facade is the exactly-once substrate between two
    broker edges."""
    from python_stream_processing_framework_spark.streaming import Stream

    src_key = f"rin-{uuid.uuid4().hex[:10]}"
    dst_key = f"rout-{uuid.uuid4().hex[:10]}"
    for ev in _events(0, 10):
        valkey_client.xadd(src_key, flatten_entry(ev))

    stream = Stream(spark, str(tmp_path / "broker"), state_partitions=4)
    stream.ingest_valkey(valkey_url, src_key, topic="in")
    stream.pipeline("in", SCHEMA).filter(lambda ev: ev["k"] == 0).sink("keep")
    stream.deliver_valkey("keep", SCHEMA, valkey_url, dst_key)
    stream.run_until_idle(rounds=3)

    entries = valkey_client.xrange(dst_key)
    assert {f["event_id"] for _id, f in entries} == {"e0", "e5"}
    valkey_client.delete(src_key, dst_key)
