"""Valkey Streams backend parity — mirrors the reference's wire-format
round-trip specs (tests/test_unit.py:33-94) without a broker, plus the
entry-id and DLQ-naming contracts and the Spark DataSource read path.
"""

from __future__ import annotations

import json
import os

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


# ---------------------------------------------------------------- live tier
# The live-tier logic takes the client as an argument, so these run
# against an in-memory fake in this broker-free sandbox; the same
# code paths hit a real server wherever VALKEY_URL is set
# (tests/test_broker_integration.py pattern).


class _FakePipeline:
    def __init__(self, server):
        self.server = server
        self.queued = []
        self.executes = 0

    def xadd(self, key, fields, maxlen=None):
        self.queued.append((key, fields, maxlen))

    def execute(self):
        for key, fields, maxlen in self.queued:
            self.server._do_xadd(key, fields, maxlen)
        self.queued = []
        self.executes += 1


class _FakeValkey:
    """Minimal XADD/XRANGE server: auto `<ms>-<seq>` ids via the
    module's own next_entry_id, deterministic clock."""

    def __init__(self):
        self.streams: dict[str, list] = {}
        self.now_ms = 1000
        self.pipelines: list[_FakePipeline] = []

    def _do_xadd(self, key, fields, maxlen=None):
        entries = self.streams.setdefault(key, [])
        last = entries[-1][0] if entries else None
        eid = next_entry_id(last, self.now_ms)
        entries.append((eid, dict(fields)))
        if maxlen is not None:
            del entries[:-maxlen]
        return eid

    def pipeline(self, transaction=True):
        p = _FakePipeline(self)
        self.pipelines.append(p)
        return p

    def xrange(self, key, min="-", max="+", count=None):
        entries = self.streams.get(key, [])
        if min.startswith("("):
            lo = entry_id_key(min[1:])
            out = [e for e in entries if entry_id_key(e[0]) > lo]
        elif min == "-":
            out = list(entries)
        else:
            lo = entry_id_key(min)
            out = [e for e in entries if entry_id_key(e[0]) >= lo]
        return out[:count] if count else out

    def close(self):
        pass


def test_xadd_rows_pipelines_and_wire_format():
    from python_stream_processing_framework_spark.sources.valkey import xadd_rows

    server = _FakeValkey()
    rows = [{"event_id": f"e{i}", "n": i, "meta": {"a": i}} for i in range(7)]
    n = xadd_rows(server, "s", rows, pipeline_size=3)
    assert n == 7
    # ceil(7/3) = 3 round-trips, not 7
    assert server.pipelines[0].executes == 3
    stored = server.streams["s"]
    assert len(stored) == 7
    # wire format: dict JSON-serialized, scalars pass through
    assert stored[0][1] == {"event_id": "e0", "n": 0, "meta": '{"a": 0}'}


def test_xadd_rows_maxlen_trims():
    from python_stream_processing_framework_spark.sources.valkey import xadd_rows

    server = _FakeValkey()
    xadd_rows(server, "s", [{"i": i} for i in range(10)], maxlen=4)
    assert [f["i"] for _, f in server.streams["s"]] == [6, 7, 8, 9]


def test_xrange_after_exclusive_and_roundtrip():
    import json as _json

    from python_stream_processing_framework_spark.sources.valkey import (
        xadd_rows,
        xrange_after,
    )

    server = _FakeValkey()
    xadd_rows(server, "s", [{"i": i, "flag": True} for i in range(5)])
    all_rows = xrange_after(server, "s", "0-0")
    assert len(all_rows) == 5
    # exclusive: restarting from the 2nd id yields exactly the rest
    rest = xrange_after(server, "s", all_rows[1][0])
    assert [r[0] for r in rest] == [r[0] for r in all_rows[2:]]
    # wire-format roundtrip (bool came back a real bool)
    assert _json.loads(all_rows[0][1]) == {"i": 0, "flag": True}


def test_live_stream_reader_offsets_and_replay():
    from python_stream_processing_framework_spark.sources.valkey import (
        HAVE_DATASOURCE_API,
        xadd_rows,
    )

    if not HAVE_DATASOURCE_API:
        pytest.skip("Spark 4 data source API required")
    from python_stream_processing_framework_spark.sources.valkey import (
        ValkeyLiveStreamReader,
    )

    server = _FakeValkey()
    reader = ValkeyLiveStreamReader(
        {"url": "redis://fake", "stream_key": "s", "batch_size": "2"},
        client_factory=lambda url: server,
    )
    start = reader.initialOffset()
    assert start == {"last_id": "0-0"}

    # empty stream: offset must NOT advance
    rows, end = reader.read(start)
    assert list(rows) == [] and end == start

    xadd_rows(server, "s", [{"i": i} for i in range(5)])
    seen = []
    off = start
    for _ in range(5):  # batch_size 2 -> pages of <= 2
        rows, off = reader.read(off)
        seen.extend(rows)
    assert [r[0] for r in seen] == [e[0] for e in server.streams["s"]]

    # committed-range replay: exactly entries 2..4 (exclusive start,
    # inclusive end), across multiple internal pages
    replay = list(
        reader.readBetweenOffsets(
            {"last_id": seen[1][0]}, {"last_id": seen[4][0]}
        )
    )
    assert [r[0] for r in replay] == [r[0] for r in seen[2:5]]


def test_live_reader_validates_options():
    from python_stream_processing_framework_spark.sources.valkey import (
        HAVE_DATASOURCE_API,
    )

    if not HAVE_DATASOURCE_API:
        pytest.skip("Spark 4 data source API required")
    from python_stream_processing_framework_spark.sources.valkey import (
        ValkeyLiveStreamReader,
    )

    with pytest.raises(ValueError, match="valkey_live requires"):
        ValkeyLiveStreamReader({"url": "redis://x"})


def test_live_sink_and_stream_roundtrip_e2e(spark, tmp_path, valkey_url):
    """Against a live Valkey-protocol server ($VALKEY_URL when set,
    else the in-process MiniValkeyServer): distributed XADD sink ->
    valkey_live readStream -> rows match, ids ordered. Executors
    connect to the server themselves (foreachPartition / the data
    source's driver-paging), so this exercises the full socket
    path, not a fake."""
    import json as _json

    from python_stream_processing_framework_spark.sources.valkey import (
        valkey_live_stream,
        valkey_stream_sink,
    )

    stream_key = f"pspf-test-{os.getpid()}"
    df = spark.createDataFrame(
        [(f"e{i}", i) for i in range(20)], ["event_id", "n"]
    )
    valkey_stream_sink(df, valkey_url, stream_key)

    src = valkey_live_stream(spark, valkey_url, stream_key)
    collected = []
    q = (
        src.writeStream.foreachBatch(
            lambda b, _: collected.extend((r["entry_id"], r["value"]) for r in b.collect())
        )
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert len(collected) == 20
    assert {_json.loads(v)["event_id"] for _, v in collected} == {
        f"e{i}" for i in range(20)
    }
