"""Window specifications — API parity with the reference's assigners
(pspf/processing/windows.py:18-65), compiled to Spark window columns.

The reference assigns (start, end) float-second tuples per event in
Python; here a spec is declarative and turns into `F.window` /
`F.session_window`, so assignment happens JVM-side inside the
aggregation exchange.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F


def _fmt_ms(ms: int) -> str:
    if ms % 1000 == 0:
        return f"{ms // 1000} seconds"
    return f"{ms} milliseconds"


@dataclass(frozen=True)
class TumblingWindow:
    """Fixed windows: start = ts - ts % size (reference windows.py:18-30)."""

    size_ms: int

    def column(self, ts_col: str) -> Column:
        return F.window(ts_col, _fmt_ms(self.size_ms))

    @property
    def is_session(self) -> bool:
        return False


@dataclass(frozen=True)
class SlidingWindow:
    """Overlapping windows every `slide_ms` (reference windows.py:32-49)."""

    size_ms: int
    slide_ms: int

    def column(self, ts_col: str) -> Column:
        return F.window(ts_col, _fmt_ms(self.size_ms), _fmt_ms(self.slide_ms))

    @property
    def is_session(self) -> bool:
        return False


@dataclass(frozen=True)
class SessionWindow:
    """Gap-merged sessions (reference windows.py:50-65). Unlike the
    reference — which never closes or emits a session and silently
    drops the previous one on gap expiry (pspf/stream.py:415-451) —
    `F.session_window` merges and emits on close."""

    gap_ms: int

    def column(self, ts_col: str) -> Column:
        return F.session_window(ts_col, _fmt_ms(self.gap_ms))

    @property
    def is_session(self) -> bool:
        return True


WindowSpec = TumblingWindow | SlidingWindow | SessionWindow


def late_cutoff_end_ms(spec: WindowSpec, ts_ms_col: Column) -> Column:
    """The LATEST window end (epoch ms) an event at `ts_ms_col` can
    affect — the reference's lateness rule (`window end < current
    watermark` routes to `-late`, pspf/stream.py:402) needs this
    per-row, BEFORE any aggregation:

    - tumbling: its one window's end;
    - sliding: the end of the NEWEST window containing the event (if
      even that window is behind the watermark, the event can affect
      nothing live);
    - session: the event's own singleton-session end (ts + gap) — the
      boundary the grace-tombstone sessionizer also uses.
    """
    if isinstance(spec, TumblingWindow):
        return (
            F.floor(ts_ms_col / spec.size_ms) * spec.size_ms + spec.size_ms
        ).cast("long")
    if isinstance(spec, SlidingWindow):
        return (
            F.floor(ts_ms_col / spec.slide_ms) * spec.slide_ms + spec.size_ms
        ).cast("long")
    return (ts_ms_col + spec.gap_ms).cast("long")
