"""Cluster HTTP API — parity with the reference's REST serving layer
(pspf/api/cluster_api.py:13-141): `GET /health`, `GET /state/{key}`
(interactive state queries), `GET /cluster/status`.

The reference runs FastAPI inside each worker and proxies state
lookups to the partition leader. On Spark the state lives in a
`StateTable` (bucket-partitioned parquet materialized from
foreachBatch), so the API is a thin stdlib HTTP layer on the driver
over `StateTable.get` — every lookup is already partition-pruned to
the key's bucket, the single-node analogue of "route to the partition
leader". The internal replication endpoints
(/internal/replicate, /internal/pull) are storage's job here and are
intentionally absent (SURVEY §4.3, S9/R7 drops).

Response shapes mirror the reference exactly:
- /health          -> {"status": "ok", "worker_state": "running"}
- /state/{key}     -> {"key": k, "value": {...}} | 404 {"detail": ...}
- /cluster/status  -> {"ha_enabled": false, "node_id": ...,
                       "nodes": [...], "held_partitions": [...]}
- /metrics         -> Prometheus text exposition of the streaming
                      gauges (when a MetricsRecorder is wired) — the
                      scrape target examples/grafana points at, parity
                      with the reference's prometheus_client surface.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import unquote

from python_stream_processing_framework_spark.streaming.state_table import StateTable


class StateApiServer:
    """Serve a StateTable over HTTP (reference cluster API surface)."""

    def __init__(
        self,
        table: StateTable,
        host: str = "127.0.0.1",
        port: int = 0,
        metrics=None,
    ):
        self.table = table
        self.metrics = metrics  # MetricsRecorder | None
        self.running = False
        api = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):  # quiet test output
                pass

            def _send(self, code: int, payload: dict) -> None:
                body = json.dumps(payload, default=str).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self) -> None:  # noqa: N802 - stdlib contract
                try:
                    self._route()
                except Exception as exc:  # noqa: BLE001 - 500 like the ref
                    self._send(500, {"detail": str(exc)})

            def _route(self) -> None:
                path = self.path.rstrip("/") or "/"
                if path == "/health":
                    state = "running" if api.running else "stopped"
                    # 503 when stopped so status-code-keyed probes
                    # (load balancers) see the worker as unhealthy.
                    self._send(
                        200 if api.running else 503,
                        {
                            "status": "ok" if api.running else "stopped",
                            "worker_state": state,
                        },
                    )
                elif path.startswith("/state/"):
                    key = unquote(path[len("/state/") :])
                    row = api.table.get(api._coerce_key(key))
                    if row is None:
                        self._send(404, {"detail": f"Key {key} not found"})
                    else:
                        self._send(200, {"key": key, "value": row.asDict()})
                elif path == "/cluster/status":
                    self._send(200, api.cluster_status())
                elif path == "/metrics":
                    if api.metrics is None:
                        self._send(404, {"detail": "no metrics recorder wired"})
                        return
                    from python_stream_processing_framework_spark.telemetry import (
                        prometheus_exposition,
                    )

                    body = prometheus_exposition(api.metrics).encode()
                    self.send_response(200)
                    self.send_header(
                        "Content-Type", "text/plain; version=0.0.4; charset=utf-8"
                    )
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                else:
                    self._send(404, {"detail": f"No route {path}"})

        self._server = ThreadingHTTPServer((host, port), Handler)
        self.host, self.port = self._server.server_address[:2]
        self._thread: threading.Thread | None = None

    def _coerce_key(self, key: str):
        """URL path segments are strings; coerce to the key column's
        type so `/state/42` matches a bigint key."""
        dtype = None
        try:
            snap = self.table.snapshot()
            dtype = dict(snap.dtypes).get(self.table.key)
        except FileNotFoundError:
            return key
        if dtype in ("bigint", "int", "smallint", "tinyint"):
            try:
                return int(key)
            except ValueError:
                return key
        if dtype in ("double", "float"):
            try:
                return float(key)
            except ValueError:
                return key
        return key

    def cluster_status(self) -> dict:
        """Single-driver analogue of the reference's cluster view: the
        Spark app is the node, the state buckets are the 'partitions'
        this node holds (all of them — Spark's cluster manager owns HA,
        so ha_enabled is false by design)."""
        sc = self.table.spark.sparkContext
        return {
            "ha_enabled": False,
            "node_id": sc.applicationId,
            "nodes": [],
            "held_partitions": [str(b) for b in range(self.table.buckets)],
        }

    def start(self) -> "StateApiServer":
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )
        self._thread.start()
        self.running = True
        return self

    def stop(self) -> None:
        self.running = False
        self._server.shutdown()
        self._server.server_close()
        if self._thread:
            self._thread.join(timeout=5)
