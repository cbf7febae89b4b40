"""Observability: streaming metrics via StreamingQueryListener.

Capability parity with the reference's Prometheus gauges
(pspf/telemetry.py:16-51 — processed/error counters, processing
latency, consumer lag): Spark's listener delivers the same signals
per micro-batch (numInputRows, inputRowsPerSecond, batchDuration,
state-store metrics), already aggregated per query. `MetricsRecorder`
keeps a rolling snapshot; exporting to Prometheus is a matter of
scraping `snapshot()`.
"""

from __future__ import annotations

import logging as _logging
import threading
from typing import Any

from pyspark.sql.streaming import StreamingQueryListener


class MetricsRecorder(StreamingQueryListener):
    """Collects per-query progress; thread-safe snapshot access."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._progress: dict[str, dict[str, Any]] = {}
        self._totals: dict[str, int] = {}

    # StreamingQueryListener interface -------------------------------
    def onQueryStarted(self, event) -> None:  # noqa: N802
        with self._lock:
            self._progress.setdefault(str(event.id), {"name": event.name})

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        with self._lock:
            qid = str(p.id)
            self._progress[qid] = {
                "name": p.name,
                "batch_id": p.batchId,
                "num_input_rows": p.numInputRows,
                "input_rows_per_second": p.inputRowsPerSecond,
                "processed_rows_per_second": p.processedRowsPerSecond,
                "batch_duration_ms": p.batchDuration,
            }
            self._totals[qid] = self._totals.get(qid, 0) + (p.numInputRows or 0)

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        with self._lock:
            self._progress.setdefault(str(event.id), {})["terminated"] = True

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    # accessors -------------------------------------------------------
    def snapshot(self) -> dict[str, dict[str, Any]]:
        with self._lock:
            return {k: dict(v) for k, v in self._progress.items()}

    def total_rows(self) -> int:
        with self._lock:
            return sum(self._totals.values())


def attach(spark) -> MetricsRecorder:
    rec = MetricsRecorder()
    spark.streams.addListener(rec)
    return rec


def prometheus_exposition(rec: MetricsRecorder) -> str:
    """Render a MetricsRecorder snapshot in the Prometheus text
    exposition format (0.0.4) — the scrape surface the reference ships
    dashboards for (pspf/telemetry.py:16-51 exposes counters/gauges/
    histograms; examples/grafana mirrors its panel set for these
    gauges). Dependency-free: the text format is a stable public
    contract, no client library needed.
    """
    def esc(v: str) -> str:
        # label-value escaping per the exposition format: backslash
        # first, then quote and newline — stripping/ignoring these
        # breaks the whole scrape (one bad label loses every metric)
        return v.replace("\\", "\\\\").replace('"', '\\"').replace("\n", "\\n")

    sane = []
    for qid, p in rec.snapshot().items():
        name = esc(p.get("name") or "unnamed")
        labels = f'{{query="{name}",id="{esc(str(qid))}"}}'
        for metric, key in (
            ("pspf_stream_batch_id", "batch_id"),
            ("pspf_stream_input_rows", "num_input_rows"),
            ("pspf_stream_input_rows_per_second", "input_rows_per_second"),
            ("pspf_stream_processed_rows_per_second", "processed_rows_per_second"),
            ("pspf_stream_batch_duration_ms", "batch_duration_ms"),
        ):
            v = p.get(key)
            if v is not None:
                sane.append((metric, labels, float(v)))
    lines = []
    help_text = {
        "pspf_stream_batch_id": "Last completed micro-batch id per query",
        "pspf_stream_input_rows": "Input rows of the last micro-batch",
        "pspf_stream_input_rows_per_second": "Source arrival rate",
        "pspf_stream_processed_rows_per_second": "Processing throughput",
        "pspf_stream_batch_duration_ms": "Micro-batch wall time",
    }
    for metric in sorted({m for m, _, _ in sane}):
        lines.append(f"# HELP {metric} {help_text[metric]}")
        lines.append(f"# TYPE {metric} gauge")
        for m, labels, v in sane:
            if m == metric:
                lines.append(f"{m}{labels} {v}")
    lines.append("# HELP pspf_stream_rows_total Rows processed since start")
    lines.append("# TYPE pspf_stream_rows_total counter")
    lines.append(f"pspf_stream_rows_total {float(rec.total_rows())}")
    return "\n".join(lines) + "\n"


# ---------------------------------------------------------------- tracing


class W3CTracer:
    """Trace-context propagation through event payloads — parity with
    the reference's OpenTelemetry inject/extract on emit/consume
    (pspf/telemetry.py:108-118, which calls
    `opentelemetry.propagate.inject(carrier)` with the message dict as
    the carrier).

    The wire format is the W3C `traceparent` header
    (`00-<trace_id:32hex>-<span_id:16hex>-<flags:2hex>`) stored as an
    event field, so payloads interoperate with any OTel consumer. The
    tracer itself is dependency-free; if the `opentelemetry` package
    is present a real TracerProvider can replace this object — the
    facade only relies on `inject(dict)` / `extract(dict)`.

    Propagation rule (the reference's): `inject` CONTINUES the current
    trace when called inside a handler that extracted one (same
    trace_id, fresh span_id, extracted span becomes the parent);
    otherwise it starts a new trace.
    """

    FIELD = "traceparent"

    def __init__(self) -> None:
        self._current: dict[str, str] | None = None

    @staticmethod
    def _new_id(nbytes: int) -> str:
        import secrets

        return secrets.token_hex(nbytes)

    def inject(self, carrier: dict) -> dict:
        """Add `traceparent` to the carrier (in place; also returned).
        An existing traceparent is left untouched — the producer
        upstream owns it."""
        if carrier.get(self.FIELD):
            return carrier
        ctx = self._current
        trace_id = ctx["trace_id"] if ctx else self._new_id(16)
        span_id = self._new_id(8)
        carrier[self.FIELD] = f"00-{trace_id}-{span_id}-01"
        if ctx:
            carrier.setdefault("tracestate", f"parent={ctx['span_id']}")
        return carrier

    def extract(self, carrier: dict) -> dict | None:
        """Parse the carrier's traceparent -> {trace_id, span_id,
        flags} or None."""
        tp = carrier.get(self.FIELD)
        if not isinstance(tp, str):
            return None
        parts = tp.split("-")
        if len(parts) != 4 or len(parts[1]) != 32 or len(parts[2]) != 16:
            return None
        return {"trace_id": parts[1], "span_id": parts[2], "flags": parts[3]}

    def span_from(self, carrier: dict):
        """Context manager: make the carrier's trace the CURRENT trace
        for the duration of a handler call, so any emit inside the
        handler continues it."""
        import contextlib

        @contextlib.contextmanager
        def _cm():
            prev = self._current
            self._current = self.extract(carrier)
            try:
                yield self._current
            finally:
                self._current = prev

        return _cm()


class JsonLogFormatter(_logging.Formatter):
    """Structured one-JSON-object-per-record log formatter — parity
    with the reference's JSON logging surface (pspf/utils/logging.py:
    26-55: timestamp/level/logger/message/module/line/pid + contextual
    extras + exception text), re-implemented for driver AND executor
    processes (pid disambiguates them in a merged stream; Spark's own
    log4j JSON template covers the JVM side, this covers Python).

    Fields passed via ``logger.info(..., extra={...})`` are merged at
    the top level; non-serializable values degrade via ``str`` rather
    than raising inside a log call.
    """

    _STD = frozenset(
        vars(
            _logging.LogRecord("", 0, "", 0, "", (), None)
        ).keys()
    ) | {"message", "asctime", "taskName"}

    def format(self, record: _logging.LogRecord) -> str:
        import json as _json
        import os as _os
        from datetime import datetime as _dt
        from datetime import timezone as _tz

        out: dict[str, Any] = {
            "timestamp": _dt.now(_tz.utc).isoformat(),
            "level": record.levelname,
            "logger": record.name,
            "message": record.getMessage(),
            "module": record.module,
            "line": record.lineno,
            "pid": _os.getpid(),
        }
        for k, v in record.__dict__.items():
            if k not in self._STD and not k.startswith("_"):
                out[k] = v
        if record.exc_info:
            out["exc_info"] = self.formatException(record.exc_info)
        return _json.dumps(out, default=str)


def configure_json_logging(
    logger_name: str = "pspf_spark",
    level: int = _logging.INFO,
    stream=None,
) -> _logging.Logger:
    """Attach a JsonLogFormatter handler to ``logger_name`` (idempotent
    — an existing JSON handler is reused, so repeated calls from
    retried tasks never stack duplicate handlers)."""
    logger = _logging.getLogger(logger_name)
    logger.setLevel(level)
    for h in logger.handlers:
        if isinstance(h.formatter, JsonLogFormatter):
            return logger
    handler = _logging.StreamHandler(stream)
    handler.setFormatter(JsonLogFormatter())
    logger.addHandler(handler)
    return logger
