"""Event-time window operators (batch and streaming shapes).

Capability parity with the reference's window assigners and windowed
per-key fold (reference: pspf/processing/windows.py:18-65 tumbling/
sliding/session assigners; pspf/stream.py:325-471 windowed aggregate
with watermark + late-data routing). The reference assigns windows to
one event at a time in Python; here windows are declarative
(`F.window` / `F.session_window`) so Catalyst plans a single shuffle
on (key, window) with map-side partial aggregation — the shape that
survives 100 TB.

These helpers work identically on batch DataFrames (correctness
harness) and streaming DataFrames (add `withWatermark` upstream).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tumbling(df: DataFrame, ts_col: str, size: str, *keys: str) -> "GroupedWindow":
    """Tumbling window grouping: one window of `size` per event.

    Reference semantics: start = ts - ts % size
    (pspf/processing/windows.py:18-30); `F.window` uses the same
    epoch-aligned bucketing.
    """
    return GroupedWindow(df, [F.col(k) for k in keys], F.window(ts_col, size))


def sliding(df: DataFrame, ts_col: str, size: str, slide: str, *keys: str) -> "GroupedWindow":
    """Sliding window grouping: every overlapping window per event
    (pspf/processing/windows.py:32-49)."""
    return GroupedWindow(df, [F.col(k) for k in keys], F.window(ts_col, size, slide))


def session(df: DataFrame, ts_col: str, gap: str, *keys: str) -> "GroupedWindow":
    """Session windows with inactivity gap (pspf/processing/windows.py:50-65).

    The reference's session handling never closes/emits a session and
    silently drops the previous one (pspf/stream.py:415-451);
    `F.session_window` implements merge + emit-on-close correctly —
    a documented, intentional upgrade.
    """
    return GroupedWindow(df, [F.col(k) for k in keys], F.session_window(ts_col, gap))


class GroupedWindow:
    """A (keys + window) grouping ready for `.agg(...)`.

    Exposes the window struct as epoch columns so results are
    timezone-proof and oracle-comparable.
    """

    def __init__(self, df: DataFrame, keys: list[Column], window: Column):
        self._df = df
        self._keys = keys
        self._window = window

    def agg(self, *exprs: Column) -> DataFrame:
        return self._df.groupBy(*self._keys, self._window.alias("window")).agg(*exprs)

    def agg_with_bounds(
        self,
        *exprs: Column,
        start_col: str = "win_start_s",
        end_col: str | None = None,
        micros: bool = False,
    ) -> DataFrame:
        """`.agg` + replace the window struct with epoch second/micro columns."""
        out = self.agg(*exprs)
        to_epoch = F.unix_micros if micros else F.unix_timestamp
        cols = [c for c in out.columns if c != "window"]
        proj = [F.col(c) for c in cols]
        proj.insert(len(self._keys), to_epoch(F.col("window.start")).alias(start_col))
        if end_col:
            proj.insert(len(self._keys) + 1, to_epoch(F.col("window.end")).alias(end_col))
        return out.select(*proj)


_UNITS_US = {
    "microsecond": 1,
    "millisecond": 1_000,
    "second": 1_000_000,
    "minute": 60_000_000,
    "hour": 3_600_000_000,
    "day": 86_400_000_000,
}


def _duration_us(spec: str) -> int:
    """Parse '10 minutes' / '1 hour' style durations to microseconds."""
    total = 0
    parts = spec.strip().lower().split()
    for qty, unit in zip(parts[::2], parts[1::2]):
        total += int(qty) * _UNITS_US[unit.rstrip("s")]
    return total


def split_late(
    df: DataFrame, ts_col: str, window_size: str, delay: str
) -> tuple[DataFrame, DataFrame]:
    """Split a batch into (on_time, late) against a data-derived watermark.

    Reference semantics: watermark = max(event_ts) - delay; an event is
    late when its window END is strictly before the watermark
    (`end < current_watermark`, pspf/stream.py:402), and late
    events are routed to a `{topic}-late` stream instead of silently
    dropped (pspf/stream.py:391-413). In streaming, the same rule runs
    as `Stream.window(late_topic=...)`'s companion router query
    against a checkpointed high-watermark (streaming/stream.py
    `_start_late_router`); this batch shape derives the watermark with
    a broadcast scalar aggregate — no driver collect.
    """
    wm = df.agg(
        (F.max(F.unix_micros(F.col(ts_col))) - F.lit(_duration_us(delay))).alias("wm_us")
    )
    win_end_us = F.unix_micros(F.window(F.col(ts_col), window_size)["end"])
    tagged = df.crossJoin(F.broadcast(wm)).withColumn(
        "_late", win_end_us < F.col("wm_us")
    )
    on_time = tagged.filter(~F.col("_late")).drop("_late", "wm_us")
    late = tagged.filter(F.col("_late")).drop("_late", "wm_us")
    return on_time, late
