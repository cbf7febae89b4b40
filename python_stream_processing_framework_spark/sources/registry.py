"""Pluggable source/sink registry — capability parity with the
reference's plugin system (pspf/plugins.py:7-73), which lets third
parties register broker backends and state stores by name (including
via package entry points).

Here a "backend" is a pair of factories producing Spark readers and
writer-builders; the built-ins register the file/memory/rate/kafka
connectors from sources/streams.py. `spark.dataSource.register`
(Spark 4 Python data sources) is the escape hatch for fully custom
protocols (e.g. a Valkey Streams reader).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass


@dataclass(frozen=True)
class Backend:
    name: str
    source: Callable | None
    sink: Callable | None
    doc: str = ""


class SourceRegistry:
    def __init__(self) -> None:
        self._backends: dict[str, Backend] = {}

    def register(
        self,
        name: str,
        *,
        source: Callable | None = None,
        sink: Callable | None = None,
        doc: str = "",
        replace: bool = False,
    ) -> None:
        if name in self._backends and not replace:
            raise ValueError(f"backend {name!r} already registered")
        self._backends[name] = Backend(name, source, sink, doc)

    def get(self, name: str) -> Backend:
        try:
            return self._backends[name]
        except KeyError:
            known = ", ".join(sorted(self._backends))
            raise KeyError(f"unknown backend {name!r}; registered: {known}") from None

    def names(self) -> list[str]:
        return sorted(self._backends)

    def load_entry_points(self, group: str = "pspf_spark.backends") -> int:
        """Discover third-party backends from package entry points
        (same extension mechanism as the reference's plugin loader)."""
        import importlib.metadata as md

        n = 0
        try:
            eps = md.entry_points(group=group)
        except TypeError:  # pragma: no cover - older importlib API
            eps = md.entry_points().get(group, [])
        for ep in eps:  # pragma: no cover - no external plugins in env
            factory = ep.load()
            factory(self)
            n += 1
        return n


registry = SourceRegistry()


def _register_builtins() -> None:
    from python_stream_processing_framework_spark.sources import streams as s

    registry.register(
        "file", source=s.file_source, sink=s.file_sink, doc="JSON-lines directory"
    )
    registry.register(
        "memory", source=s.rate_source, sink=s.memory_sink, doc="rate source / memory sink"
    )
    registry.register(
        "kafka", source=s.kafka_source, sink=s.kafka_sink, doc="Kafka topics (needs jars)"
    )

    from python_stream_processing_framework_spark.sources import valkey as v

    registry.register(
        "valkey",
        source=v.valkey_dump_source,
        sink=v.valkey_dump_sink,
        doc="Valkey/Redis Streams wire format over XRANGE dumps "
        "(broker-free; swap file IO for XADD/XRANGE against a live server)",
    )
    registry.register(
        "valkey-live",
        source=v.valkey_live_stream,
        sink=v.valkey_stream_sink,
        doc="live Valkey/Redis server: streaming XRANGE source "
        "(Python data source, entry-id offsets) + pipelined "
        "foreachPartition XADD sink (needs the redis package)",
    )


_register_builtins()
