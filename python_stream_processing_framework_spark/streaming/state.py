"""Arbitrary per-key folds — the reference's stateful-handler shape
(`async def handler(event, state) -> state`, pspf/stream.py:325-347)
on Spark's managed state.

Where the fold is algebraic (sum/count/min/max/...), DON'T use these —
declarative `groupBy().agg()` gets map-side partial aggregation and is
the 100 TB shape. These wrappers exist for genuinely non-algebraic
folds (custom sessionization, order-dependent accumulators).

State travels as a JSON string: the reference's state values are
JSON/msgpack documents (SURVEY §1.2), and JSON keeps the Spark state
schema fixed while user state evolves.

- `keyed_fold`         — batch: applyInPandas, time-ordered fold per key
- `keyed_fold_stream`  — streaming: applyInPandasWithState, state
                         persisted in the checkpoint across micro-batches,
                         optional TTL (reference state TTL, SURVEY A8)
- `windowed_fold`      — batch fold per (key, event-time window): the
                         reference's EP3 windowed aggregate with an
                         arbitrary fold function
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StringType, StructField, StructType

_LONG = LongType()

from python_stream_processing_framework_spark.streaming.windows import WindowSpec

FoldFn = Callable[[dict, Any], Any]

_STATE_SCHEMA = StructType([StructField("state_json", StringType())])


def _keys(key_cols: str | list[str]) -> list[str]:
    return [key_cols] if isinstance(key_cols, str) else list(key_cols)


def _out_schema(df: DataFrame, keys: list[str]) -> StructType:
    return StructType(
        [df.schema[k] for k in keys] + [StructField("state_json", StringType())]
    )


def keyed_fold(
    df: DataFrame,
    key_cols: str | list[str],
    ts_col: str,
    fold: FoldFn,
    init: Any = None,
) -> DataFrame:
    """Batch fold: events per key group in `ts_col` order through
    `fold(event, state) -> state`; one output row (keys..., state_json)
    per group. One shuffle on the keys; Arrow-batched per group."""
    keys = _keys(key_cols)
    out = _out_schema(df, keys)

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        # deep-copy the seed per group: state is JSON by contract, and
        # a fold that MUTATES its state in place (the natural style)
        # must not leak one group's accumulation into the next group
        # handled by the same Python worker
        st = None if init is None else json.loads(json.dumps(init))
        for event in pdf.sort_values(ts_col).to_dict("records"):
            st = fold(event, st)
        row = {k: [pdf[k].iloc[0]] for k in keys}
        row["state_json"] = [json.dumps(st)]
        return pd.DataFrame(row)

    return df.groupBy(*keys).applyInPandas(run, out)


def keyed_fold_stream(
    df: DataFrame,
    key_cols: str | list[str],
    ts_col: str,
    fold: FoldFn,
    init: Any = None,
    *,
    ttl_ms: int | None = None,
) -> DataFrame:
    """Streaming fold with checkpointed state: the reference's
    per-key running state (pspf/context.py Context.state) managed by
    Spark's state store — survives restarts, exactly-once with the
    query checkpoint. Emits the updated (keys..., state_json) row each
    micro-batch the key appears in (update semantics).

    `ttl_ms` evicts state for keys idle longer than the TTL (the
    reference's per-key state TTL with lazy eviction + background GC,
    pspf/state/backends/rocksdb_store.py:92-167)."""
    keys = _keys(key_cols)
    out = _out_schema(df, keys)
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout if ttl_ms else GroupStateTimeout.NoTimeout
    )

    def run(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        st = (
            json.loads(state.get[0])
            if state.exists
            # fresh per-key seed — in-place-mutating folds must not
            # share the init object across keys (see keyed_fold)
            else (None if init is None else json.loads(json.dumps(init)))
        )
        # A key's micro-batch group can span multiple Arrow chunks:
        # sorting each chunk independently would break global time
        # order for order-dependent folds. Materialize, sort ONCE.
        # (Bounded by the key's events in one micro-batch — the same
        # memory envelope applyInPandas itself needs per group.)
        chunks = list(pdfs)
        if chunks:
            events = pd.concat(chunks, ignore_index=True)
            for event in events.sort_values(ts_col).to_dict("records"):
                st = fold(event, st)
        state.update((json.dumps(st),))
        if ttl_ms:
            state.setTimeoutDuration(ttl_ms)
        row = {k: [v] for k, v in zip(keys, key)}
        row["state_json"] = [json.dumps(st)]
        yield pd.DataFrame(row)

    return df.groupBy(*keys).applyInPandasWithState(
        run, out, _STATE_SCHEMA, "update", timeout
    )


def session_fold(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap: str,
    fold: FoldFn,
    init: Any = None,
    *,
    value_cols: list[str] | None = None,
) -> DataFrame:
    """Arbitrary fold per session window — SURVEY §7 "hard part #1".

    Sessions merge inside the aggregation operator, so the events are
    gathered per merged session first (`collect_list` of time-ordered
    structs inside `session_window` groupBy — the engine still does the
    merging, watermark-compatible), then the user fold runs over each
    session's event list in an Arrow-batched mapInPandas. Unlike the
    reference — which silently drops the previous session instead of
    emitting it (pspf/stream.py:415-451) — every closed session emits.

    Output: key, session_start_us, session_end_us, n_events, state_json.
    """
    value_cols = value_cols or [
        c for c in df.columns if c not in (key_col, ts_col)
    ]
    gathered = (
        df.groupBy(F.col(key_col), F.session_window(F.col(ts_col), gap).alias("_w"))
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col(ts_col).alias("_ts"), *value_cols))
            ).alias("_events")
        )
        .select(
            F.col(key_col),
            F.unix_micros(F.col("_w.start")).alias("session_start_us"),
            F.unix_micros(F.col("_w.end")).alias("session_end_us"),
            F.col("_events"),
        )
    )
    key_field = df.schema[key_col]
    out = StructType(
        [
            key_field,
            StructField("session_start_us", _LONG),
            StructField("session_end_us", _LONG),
            StructField("n_events", _LONG),
            StructField("state_json", StringType()),
        ]
    )

    def run(pdfs) -> "Iterator[pd.DataFrame]":
        for pdf in pdfs:
            rows = []
            for rec in pdf.to_dict("records"):
                st = None if init is None else json.loads(json.dumps(init))
                events = rec["_events"]
                for ev in events:
                    e = dict(ev.asDict()) if hasattr(ev, "asDict") else dict(ev)
                    st = fold(e, st)
                rows.append(
                    {
                        key_col: rec[key_col],
                        "session_start_us": rec["session_start_us"],
                        "session_end_us": rec["session_end_us"],
                        "n_events": len(events),
                        "state_json": json.dumps(st),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in out.fields])

    return gathered.mapInPandas(run, out)


def windowed_fold(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    window: WindowSpec,
    fold: FoldFn,
    init: Any = None,
) -> DataFrame:
    """Arbitrary fold per (key, event-time window) — the reference's
    windowed aggregate entry point EP3 (pspf/stream.py:325-471) with a
    user fold instead of a declarative aggregate.

    Batch shape: assign the window declaratively (tumbling: 1 row/
    window; sliding: Expand to every overlapping window), then fold per
    (key, win_start) group. Session windows can't be assigned in a
    projection (merging happens in the aggregation path); for an
    arbitrary session fold use
    `session(...).agg(collect_list(...))` + a fold over the collected
    events, or `keyed_fold_stream` with custom gap logic.
    Streaming variant: assign the window column, then `keyed_fold_stream`
    on (key, win_start) with a watermark upstream.
    """
    if window.is_session:
        raise NotImplementedError(
            "session windows merge during aggregation; use session_fold()"
        )
    win = window.column(ts_col).alias("_win")
    with_win = df.withColumn("_win", win).select(
        F.col(key_col),
        F.unix_micros(F.col("_win.start")).alias("win_start_us"),
        F.unix_micros(F.col("_win.end")).alias("win_end_us"),
        *[F.col(c) for c in df.columns if c not in (key_col,)],
    )
    return keyed_fold(with_win, [key_col, "win_start_us", "win_end_us"], ts_col, fold, init)
