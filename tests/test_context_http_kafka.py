"""Handler arity dispatch + Context state, HTTP idempotent sink against
a live local server, Kafka wire-format parsing, multi-topic subscribe."""

from __future__ import annotations

import http.server
import json
import threading

from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from python_stream_processing_framework_spark.sources.http import HttpSink
from python_stream_processing_framework_spark.sources.streams import parse_kafka_frame
from python_stream_processing_framework_spark.streaming import Stream

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", StringType()),
        StructField("key", StringType()),
        StructField("timestamp", DoubleType()),
        StructField("value", DoubleType()),
        StructField("_attempt", LongType()),
    ]
)


def test_handler_arity_and_context_state(spark, tmp_path):
    """Reference arity dispatch (pspf/stream.py:286-323) + stateful
    wordcount pattern (examples/stateful_wordcount.py): ctx.state
    accumulates across messages and across restarts."""
    broker = str(tmp_path / "broker")
    seen1, seen2 = [], []

    def wire(stream):
        @stream.subscribe("t1", EVENT_SCHEMA, group="g1")
        def one_arg(event):
            seen1.append(event["event_id"])

        @stream.subscribe("t2", EVENT_SCHEMA, group="g2")
        def two_args(msg_id, data):
            seen2.append((msg_id, data["value"]))

        @stream.subscribe("t3", EVENT_SCHEMA, group="g3")
        def three_args(msg_id, data, ctx):
            total = ctx.state.get(data["key"], 0) + data["value"]
            ctx.state.put(data["key"], total)

    s = Stream(spark, broker)
    wire(s)
    s.emit("t1", {"event_id": "a", "key": "k", "timestamp": 1.0, "value": 1.0})
    s.emit("t2", {"event_id": "b", "key": "k", "timestamp": 1.0, "value": 2.0})
    s.emit("t3", {"event_id": "c", "key": "cnt", "timestamp": 1.0, "value": 3.0})
    s.emit("t3", {"event_id": "d", "key": "cnt", "timestamp": 2.0, "value": 4.0})
    s.run_until_idle()
    assert seen1 == ["a"]
    assert seen2 == [("b", 2.0)]

    # restart: ctx.state must be durable (reference SQLite persistence)
    s2 = Stream(spark, broker)
    wire(s2)
    s2.emit("t3", {"event_id": "e", "key": "cnt", "timestamp": 3.0, "value": 5.0})
    s2.run_until_idle()
    state = json.loads((tmp_path / "broker" / "_state" / "g3.json").read_text())
    assert state["cnt"] == 12.0  # 3+4 survived restart, +5


class _Recorder(http.server.BaseHTTPRequestHandler):
    received: list[tuple[str, dict]] = []
    fail_next = 0

    def do_POST(self):  # noqa: N802
        body = self.rfile.read(int(self.headers["Content-Length"]))
        if _Recorder.fail_next > 0:
            _Recorder.fail_next -= 1
            self.send_response(503)
            self.end_headers()
            return
        _Recorder.received.append(
            (self.headers["X-Idempotency-Key"], json.loads(body))
        )
        self.send_response(200)
        self.end_headers()

    def log_message(self, *a):  # silence
        pass


def test_http_sink_idempotent_post(tmp_path):
    srv = http.server.HTTPServer(("127.0.0.1", 0), _Recorder)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        sink = HttpSink("hook", str(tmp_path / "tok"), f"http://127.0.0.1:{port}/")
        ev = {"event_id": "e1", "value": 7}
        assert sink.write(ev) is True
        assert sink.write(ev) is False  # second write suppressed
        assert _Recorder.received == [("hook:e1", ev)]

        # failing endpoint: error propagates (feeds retry/DLQ), no token
        _Recorder.fail_next = 1
        try:
            sink.write({"event_id": "e2"})
            raised = False
        except Exception:
            raised = True
        assert raised
        # retry after outage succeeds — token only recorded on success
        assert sink.write({"event_id": "e2"}) is True
    finally:
        srv.shutdown()


def test_parse_kafka_frame(spark):
    kafka_shape = StructType(
        [
            StructField("key", BinaryType()),
            StructField("value", BinaryType()),
            StructField("topic", StringType()),
            StructField("partition", IntegerType()),
            StructField("offset", LongType()),
            StructField("timestamp", TimestampType()),
        ]
    )
    payload = StructType(
        [StructField("event_id", StringType()), StructField("v", LongType())]
    )
    import datetime

    ts = datetime.datetime(2024, 1, 1)
    raw = spark.createDataFrame(
        [
            (b"k1", json.dumps({"event_id": "e1", "v": 5}).encode(), "t", 0, 1, ts),
            (b"k2", b"{broken", "t", 0, 2, ts),
        ],
        kafka_shape,
    )
    rows = {r["offset"]: r.asDict() for r in parse_kafka_frame(raw, payload).collect()}
    assert rows[1]["event_id"] == "e1" and rows[1]["v"] == 5 and rows[1]["_corrupt"] is None
    assert rows[2]["event_id"] is None and rows[2]["_corrupt"] == "{broken"


def test_multi_topic_subscribe(spark, tmp_path):
    s = Stream(spark, str(tmp_path / "broker"))
    hits = []

    @s.subscribe(["a", "b"], EVENT_SCHEMA)
    def handle(event):
        hits.append(event["event_id"])

    s.emit("a", {"event_id": "ea", "key": "k", "timestamp": 1.0, "value": 1.0})
    s.emit("b", {"event_id": "eb", "key": "k", "timestamp": 1.0, "value": 1.0})
    s.run_until_idle()
    assert sorted(hits) == ["ea", "eb"]


def test_kafka_wire_roundtrip(spark):
    """to_kafka_frame -> parse_kafka_frame is a lossless round trip."""
    import datetime

    from pyspark.sql import functions as F
    from python_stream_processing_framework_spark.sources.streams import (
        to_kafka_frame,
    )

    payload = StructType(
        [StructField("event_id", StringType()), StructField("v", LongType())]
    )
    typed = spark.createDataFrame([("e1", 5), ("e2", 7)], payload)
    wire = to_kafka_frame(typed)
    assert wire.columns == ["key", "value"]
    keys = {r["key"] for r in wire.collect()}
    assert keys == {"e1", "e2"}

    ts = datetime.datetime(2024, 1, 1)
    kafka_shaped = wire.select(
        F.encode("key", "utf-8").alias("key"),
        F.encode("value", "utf-8").alias("value"),
        F.lit("t").alias("topic"),
        F.lit(0).alias("partition"),
        F.monotonically_increasing_id().alias("offset"),
        F.lit(ts).alias("timestamp"),
    )
    back = {r["event_id"]: r["v"] for r in parse_kafka_frame(kafka_shaped, payload).collect()}
    assert back == {"e1": 5, "e2": 7}
