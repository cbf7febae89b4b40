"""Streaming layer: the reference framework's API surface re-expressed
on Structured Streaming.

- stream.py   — `Stream` facade: topics, emit, @subscribe, @window
- windows.py  — TumblingWindow/SlidingWindow/SessionWindow specs
- dlq.py      — retry + dead-letter + idempotent-sink semantics
- state.py    — arbitrary per-key folds (applyInPandasWithState shape)
"""

from python_stream_processing_framework_spark.streaming.windows import (
    SessionWindow,
    SlidingWindow,
    TumblingWindow,
)
from python_stream_processing_framework_spark.streaming.stream import Stream

__all__ = ["Stream", "TumblingWindow", "SlidingWindow", "SessionWindow"]
