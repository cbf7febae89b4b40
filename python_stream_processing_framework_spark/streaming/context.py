"""Handler context — parity with the reference's `Context`
(pspf/context.py:5-14): handlers with the 3-arg signature receive a
`ctx` whose `.state` is a durable per-group key-value store.

Backing is a write-through JSON file per consumer group (the
reference's default is SQLite; the semantics — get/put/delete visible
to the next message and surviving restart — are what matters). For
state that belongs in the engine, use keyed_fold_stream (checkpointed
state store) instead; this exists for handler-side bookkeeping like
the reference's wordcount example.
"""

from __future__ import annotations

import json
import threading
from pathlib import Path
from typing import Any


class KVState:
    """Thread-safe write-through KV store.

    Subscriptions sharing a consumer group MUST share one instance
    (Stream guarantees this): handlers for different topics run
    concurrently on driver threads, and two instances over the same
    file would lose updates last-writer-wins.
    """

    def __init__(self, path: str | Path):
        self._path = Path(path)
        self._path.parent.mkdir(parents=True, exist_ok=True)
        self._lock = threading.Lock()
        if self._path.exists():
            self._data: dict[str, Any] = json.loads(self._path.read_text() or "{}")
        else:
            self._data = {}

    def get(self, key: str, default: Any = None) -> Any:
        with self._lock:
            return self._data.get(key, default)

    def put(self, key: str, value: Any) -> None:
        with self._lock:
            self._data[key] = value
            self._flush()

    def update(self, key: str, fn, default: Any = None) -> Any:
        """Atomic read-modify-write: `new = fn(current)`."""
        with self._lock:
            new = fn(self._data.get(key, default))
            self._data[key] = new
            self._flush()
            return new

    def delete(self, key: str) -> None:
        with self._lock:
            self._data.pop(key, None)
            self._flush()

    def keys(self) -> list[str]:
        with self._lock:
            return sorted(self._data)

    def _flush(self) -> None:
        tmp = self._path.with_suffix(".tmp")
        tmp.write_text(json.dumps(self._data))
        tmp.replace(self._path)


class Context:
    """What a 3-arg handler receives (reference Context).

    `lock` serializes handler execution within a consumer group: the
    reference runs each handler inside a state-store transaction
    (pspf/processor.py:311-328), so get-then-put sequences in handlers
    are atomic — the retry harness takes this lock per message.
    """

    def __init__(self, state: KVState):
        self.state = state
        self.lock = threading.RLock()
