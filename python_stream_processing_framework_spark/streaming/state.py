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
                         persisted in the checkpoint across micro-batches
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StringType, StructField, StructType

FoldFn = Callable[[dict, Any], Any]


def _out_schema(key_field: StructField) -> StructType:
    return StructType([key_field, StructField("state_json", StringType())])


_STATE_SCHEMA = StructType([StructField("state_json", StringType())])


def keyed_fold(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    fold: FoldFn,
    init: Any = None,
) -> DataFrame:
    """Batch fold: events per key in `ts_col` order through
    `fold(event, state) -> state`; one output row (key, state_json)
    per key. One shuffle on the key; Arrow-batched per group."""
    key_field = df.schema[key_col]
    out = _out_schema(key_field)

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        st = init
        for event in pdf.sort_values(ts_col).to_dict("records"):
            st = fold(event, st)
        return pd.DataFrame({key_col: [pdf[key_col].iloc[0]], "state_json": [json.dumps(st)]})

    return df.groupBy(key_col).applyInPandas(run, out)


def keyed_fold_stream(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    fold: FoldFn,
    init: Any = None,
) -> DataFrame:
    """Streaming fold with checkpointed state: the reference's
    per-key running state (pspf/context.py Context.state), but managed
    by Spark's state store — survives restarts, exactly-once with the
    query checkpoint. Emits the updated (key, state_json) row each
    micro-batch the key appears in (update semantics)."""
    key_field = df.schema[key_col]
    out = _out_schema(key_field)

    def run(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        st = json.loads(state.get[0]) if state.exists else init
        for pdf in pdfs:
            for event in pdf.sort_values(ts_col).to_dict("records"):
                st = fold(event, st)
        state.update((json.dumps(st),))
        yield pd.DataFrame({key_col: [key[0]], "state_json": [json.dumps(st)]})

    return df.groupBy(key_col).applyInPandasWithState(
        run, out, _STATE_SCHEMA, "update", GroupStateTimeout.NoTimeout
    )
