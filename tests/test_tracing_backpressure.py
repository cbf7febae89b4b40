"""Trace-context propagation through the facade (reference
pspf/telemetry.py:108-118) and per-subscription backpressure knobs
(reference batch_size/poll tuning, pspf/settings.py:36-38)."""

from __future__ import annotations

import json

from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from python_stream_processing_framework_spark.streaming.stream import Stream
from python_stream_processing_framework_spark.telemetry import W3CTracer

SCHEMA = StructType(
    [
        StructField("event_id", StringType()),
        StructField("timestamp", DoubleType()),
        StructField("v", LongType()),
    ]
)


def test_tracer_inject_extract_roundtrip():
    t = W3CTracer()
    ev: dict = {"k": 1}
    t.inject(ev)
    ctx = t.extract(ev)
    assert ctx is not None
    assert len(ctx["trace_id"]) == 32 and len(ctx["span_id"]) == 16
    assert ev["traceparent"] == f"00-{ctx['trace_id']}-{ctx['span_id']}-01"
    # an existing traceparent is owned by the upstream producer
    before = ev["traceparent"]
    t.inject(ev)
    assert ev["traceparent"] == before
    assert t.extract({"traceparent": "garbage"}) is None


def test_tracer_continues_trace_inside_span():
    t = W3CTracer()
    incoming: dict = {}
    t.inject(incoming)
    ctx = t.extract(incoming)
    with t.span_from(incoming):
        out: dict = {}
        t.inject(out)
    out_ctx = t.extract(out)
    assert out_ctx["trace_id"] == ctx["trace_id"]  # same trace
    assert out_ctx["span_id"] != ctx["span_id"]  # new span
    assert out["tracestate"] == f"parent={ctx['span_id']}"
    # outside the span a fresh trace starts
    fresh: dict = {}
    t.inject(fresh)
    assert t.extract(fresh)["trace_id"] != ctx["trace_id"]


def test_facade_trace_propagation_end_to_end(spark, tmp_path):
    """emit stamps traceparent; a handler that re-emits CONTINUES the
    incoming trace — the downstream topic's events carry the same
    trace_id with a new span (reference injects on emit, extracts per
    message)."""
    tracer = W3CTracer()
    st = Stream(spark, str(tmp_path / "broker"), tracer=tracer)

    @st.subscribe("ingest", SCHEMA, group="fwd")
    def forward(ev):
        st.emit("derived", {"event_id": ev["event_id"] + "-d", "v": ev["v"] * 2})

    st.emit("ingest", {"event_id": "e1", "v": 5})
    src_raw = json.loads(
        next(iter((tmp_path / "broker" / "ingest").glob("*.json"))).read_text()
    )
    src_ctx = tracer.extract(src_raw)
    assert src_ctx is not None  # emit stamped the event

    st.run_until_idle()
    derived_files = list((tmp_path / "broker" / "derived").glob("*.json"))
    assert derived_files
    out = json.loads(derived_files[0].read_text().splitlines()[0])
    out_ctx = tracer.extract(out)
    assert out_ctx["trace_id"] == src_ctx["trace_id"]  # trace continued
    assert out_ctx["span_id"] != src_ctx["span_id"]


def test_max_files_per_trigger_backpressure(spark, tmp_path):
    """maxFilesPerTrigger caps each micro-batch: three single-event
    emits (= three files) with a cap of 1 process as three batches of
    one row; uncapped they'd drain in one."""
    st = Stream(spark, str(tmp_path / "broker"))
    for i in range(3):
        st.emit("t", {"event_id": f"e{i}", "v": i})

    batch_sizes: list[int] = []

    def record(batch, _bid):
        batch_sizes.append(batch.count())

    q = (
        st.stream_topic("t", SCHEMA, max_files_per_trigger=1)
        .writeStream.foreachBatch(record)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert batch_sizes == [1, 1, 1]

    # the per-subscription knob is stored on the subscription options
    @st.subscribe("t", SCHEMA, group="slow", max_files_per_trigger=2)
    def h(ev):
        pass

    (sub,) = [s for s in st._subscriptions if s.options.get("group") == "slow"]
    assert sub.options["max_files_per_trigger"] == 2


def test_json_log_formatter_fields_and_extras():
    """Structured-logging parity (reference pspf/utils/logging.py +
    tests/test_rc1_features.py test_json_logging_format): every record
    renders as one valid JSON object with the required fields, extras
    merge at top level, exceptions serialize as text, and
    configure_json_logging is idempotent."""
    import io
    import json
    import logging

    from python_stream_processing_framework_spark.telemetry import (
        JsonLogFormatter,
        configure_json_logging,
    )

    fmt = JsonLogFormatter()
    rec = logging.LogRecord(
        name="pspf_spark.test", level=logging.INFO, pathname="x.py",
        lineno=10, msg="Test %s", args=("message",), exc_info=None,
    )
    data = json.loads(fmt.format(rec))
    assert data["message"] == "Test message"
    assert data["level"] == "INFO"
    assert data["logger"] == "pspf_spark.test"
    assert data["line"] == 10
    assert isinstance(data["pid"], int) and "timestamp" in data

    buf = io.StringIO()
    logger = configure_json_logging("pspf_spark.t2", stream=buf)
    logger2 = configure_json_logging("pspf_spark.t2", stream=buf)
    assert logger is logger2 and len(logger.handlers) == 1  # idempotent
    try:
        raise ValueError("boom")
    except ValueError:
        logger.exception("failed", extra={"topic": "orders", "batch_id": 7})
    line = json.loads(buf.getvalue().strip())
    assert line["topic"] == "orders" and line["batch_id"] == 7
    assert "ValueError: boom" in line["exc_info"]
    assert line["level"] == "ERROR"


def test_reliability_events_logged_with_extras(spark, caplog):
    """The retry/DLQ paths emit structured reliability events (counts
    as extras, payloads never interpolated) on the pspf_spark
    .reliability logger — what configure_json_logging turns into the
    reference's JSON log stream."""
    import logging

    from python_stream_processing_framework_spark.streaming.dlq import (
        handle_batch_with_retries,
    )

    batch = spark.createDataFrame(
        [("e1", 0), ("e2", 2)], "event_id string, _attempt long"
    )
    def handler(ev):
        raise ValueError("nope")

    with caplog.at_level(logging.INFO, logger="pspf_spark.reliability"):
        handle_batch_with_retries(
            batch, handler=handler, topic="t9", max_retries=2,
            emit=lambda topic, *ev: [e.get("event_id") for e in ev],
        )
    by_msg = {r.message: r for r in caplog.records}
    assert by_msg["retrying failed messages"].n_retried == 1
    assert by_msg["retrying failed messages"].topic == "t9"
    assert by_msg["moved messages to DLQ"].n_dead == 1
    assert by_msg["moved messages to DLQ"].levelname == "WARNING"
