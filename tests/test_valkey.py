"""Valkey Streams backend parity — mirrors the reference's wire-format
round-trip specs (tests/test_unit.py:33-94) without a broker, plus the
entry-id and DLQ-naming contracts and the Spark DataSource read path.
"""

from __future__ import annotations

import json

import pytest

from python_stream_processing_framework_spark.sources.valkey import (
    append_to_dump,
    dlq_entry,
    dlq_stream,
    entry_id_key,
    flatten_entry,
    next_entry_id,
    read_dump,
    retry_tracker_key,
    unflatten_entry,
    valkey_dump_sink,
    valkey_dump_source,
)


def test_serialization_logic():
    """Mirror of reference test_valkey_serialization_logic: complex
    values become JSON strings on XADD; simple strings pass through."""
    complex_data = {
        "event_type": "Complex",
        "nested": {"a": 1},
        "list": [1, 2],
        "simple": "string",
        "n": 7,
        "x": 1.5,
        "flag": True,
        "nothing": None,
    }
    flat = flatten_entry(complex_data)
    assert flat["simple"] == "string"
    assert flat["n"] == 7 and flat["x"] == 1.5
    assert isinstance(flat["nested"], str) and json.loads(flat["nested"]) == {"a": 1}
    assert isinstance(flat["list"], str) and json.loads(flat["list"]) == [1, 2]
    assert flat["flag"] == "true" and flat["nothing"] == "null"


def test_deserialization_logic():
    """Mirror of reference test_valkey_deserialization_logic: stored
    JSON strings come back as their parsed values."""
    stored = {
        "event_type": "Complex",
        "nested": '{"a": 1}',
        "list": "[1, 2]",
        "simple": "string",
        "flag": "true",
        "nothing": "null",
    }
    data = unflatten_entry(stored)
    assert data["simple"] == "string"
    assert data["nested"] == {"a": 1}
    assert data["list"] == [1, 2]
    assert data["flag"] is True and data["nothing"] is None


def test_roundtrip_preserves_reference_quirk():
    """flatten->unflatten is identity for typical events; the
    reference's known quirk (a str that parses as JSON changes type)
    is preserved, not 'fixed' — a real consumer sees the same."""
    ev = {"id": "e1", "payload": {"k": [1, 2]}, "note": "plain text", "v": 3}
    assert unflatten_entry(flatten_entry(ev)) == ev
    assert unflatten_entry(flatten_entry({"s": "5"}))["s"] == 5  # the quirk


def test_entry_id_semantics():
    """XADD auto-ids: same-ms increments seq; later ms resets; ids are
    strictly monotonic under the NUMERIC key (not string order)."""
    assert next_entry_id(None, 1000) == "1000-0"
    assert next_entry_id("1000-0", 1000) == "1000-1"
    assert next_entry_id("1000-1", 2000) == "2000-0"
    # clock going backwards must still produce a larger id
    assert next_entry_id("2000-5", 1500) == "2000-6"
    assert entry_id_key("999-0") < entry_id_key("1000-0")  # string order lies


def test_naming_and_dlq_metadata():
    assert dlq_stream("orders") == "orders-dlq"
    assert retry_tracker_key("g1", "orders") == "pspf:retries:g1:orders"
    d = dlq_entry(
        {"k": "v"}, msg_id="1-0", stream_key="orders", error="boom", now=12.5
    )
    assert d["_error"] == "boom"
    assert d["_original_stream"] == "orders"
    assert d["_original_msg_id"] == "1-0"
    assert d["_moved_timestamp"] == "12.5"  # stringified, as the reference does
    assert d["k"] == "v"


def test_dump_append_and_read(tmp_path):
    p = tmp_path / "stream.jsonl"
    ids1 = append_to_dump(p, [{"a": 1}, {"a": 2}], now_ms=1000)
    ids2 = append_to_dump(p, [{"a": 3}], now_ms=1000)  # same ms: seq continues
    assert ids1 == ["1000-0", "1000-1"] and ids2 == ["1000-2"]
    entries = read_dump(p)
    assert [i for i, _ in entries] == ["1000-0", "1000-1", "1000-2"]
    assert [d["a"] for _, d in entries] == [1, 2, 3]


def test_spark_datasource_reads_dump(spark, tmp_path):
    """The Spark 4 Python data source scans a sharded dump in parallel
    (one partition per shard) and round-trips the wire format."""
    d = tmp_path / "dump"
    d.mkdir()
    append_to_dump(d / "shard-0.jsonl", [{"k": "a", "n": 1, "tags": [1, 2]}], now_ms=1000)
    append_to_dump(d / "shard-1.jsonl", [{"k": "b", "n": 2, "tags": []}], now_ms=2000)

    df = valkey_dump_source(spark, str(d))
    assert df.columns == ["msg_id", "data"]
    assert df.rdd.getNumPartitions() == 2  # one per shard
    rows = {r["msg_id"]: json.loads(r["data"]) for r in df.collect()}
    assert rows["1000-0"] == {"k": "a", "n": 1, "tags": [1, 2]}
    assert rows["2000-0"] == {"k": "b", "n": 2, "tags": []}


def test_registry_has_valkey_backend(spark, tmp_path):
    from python_stream_processing_framework_spark.sources.registry import registry

    b = registry.get("valkey")
    p = tmp_path / "s.jsonl"
    df = spark.createDataFrame([("e1", 5)], ["event_id", "v"])
    ids = b.sink(df, str(p), now_ms=500)
    assert ids == ["500-0"]
    back = b.source(spark, str(p)).collect()
    assert json.loads(back[0]["data"]) == {"event_id": "e1", "v": 5}
