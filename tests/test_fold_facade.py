"""Batch+streaming duality for the analytics folds (funnel/retention)
and the generic Stream.fold facade.

The contract under test: funnel_fold/retention_fold plugged into
keyed_fold (batch) or Stream.fold (streaming, checkpointed state)
produce per-user states whose *_from_states reports EQUAL the batch
funnel_stats / retention_cohorts outputs row-for-row — the same
duality dedup has via Stream.dedupe/dedupe_near.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from tests.conftest import SF_SMOKE

from python_stream_processing_framework_spark.operators.funnel import (
    funnel_fold,
    funnel_stats,
    funnel_stats_from_states,
    retention_cohorts,
    retention_fold,
    retention_from_states,
)
from python_stream_processing_framework_spark.streaming import Stream
from python_stream_processing_framework_spark.streaming.state import keyed_fold

STEPS = ["view", "click", "purchase"]

SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("ts_ms", LongType()),
    ]
)


def _events_ms(spark, sf_dir=SF_SMOKE):
    return (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select(
            "user_id",
            "event_type",
            F.unix_millis(F.col("ts")).alias("ts_ms"),
        )
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_funnel_fold_equals_batch_on_testdata(spark):
    ev = _events_ms(spark)
    fold, init = funnel_fold(STEPS, "event_type", "ts_ms")
    states = keyed_fold(ev, "user_id", "ts_ms", fold, init)
    got = funnel_stats_from_states(states, STEPS)
    want = funnel_stats(
        spark.read.parquet(f"{SF_SMOKE}/events.parquet"),
        "user_id",
        "ts",
        "event_type",
        STEPS,
    )
    assert _rows(got) == _rows(want)


def test_funnel_fold_horizon_equals_batch(spark):
    ev = _events_ms(spark)
    horizon = 3_600_000
    fold, init = funnel_fold(STEPS, "event_type", "ts_ms", horizon_ms=horizon)
    states = keyed_fold(ev, "user_id", "ts_ms", fold, init)
    got = funnel_stats_from_states(states, STEPS)
    want = funnel_stats(
        spark.read.parquet(f"{SF_SMOKE}/events.parquet"),
        "user_id",
        "ts",
        "event_type",
        STEPS,
        horizon_ms=horizon,
    )
    assert _rows(got) == _rows(want)


def test_retention_fold_equals_batch_on_testdata(spark):
    ev = _events_ms(spark)
    fold, init = retention_fold("ts_ms", period="week", n_periods=6)
    states = keyed_fold(ev, "user_id", "ts_ms", fold, init)
    got = retention_from_states(states)
    want = retention_cohorts(
        spark.read.parquet(f"{SF_SMOKE}/events.parquet"),
        "user_id",
        "ts",
        period="week",
        n_periods=6,
    )
    assert _rows(got) == _rows(want)


def test_retention_fold_rebase_is_order_independent():
    """The rebase rule makes retention_fold exact under ANY arrival
    order — fold pure-Python, no Spark."""
    import itertools
    import json

    fold, init = retention_fold("ts_ms", period="day", n_periods=4)
    day = 86_400_000
    events = [{"ts_ms": d * day + 5} for d in (3, 0, 2, 9, 1)]
    results = set()
    for perm in itertools.permutations(events):
        st = init
        for e in perm:
            st = fold(dict(e), json.loads(json.dumps(st)) if st else st)
        results.add((st["c"], tuple(st["p"])))
    # day 9 is offset 9 from cohort day 0 — outside the 4-period
    # horizon in every order, including orders where it arrived first
    assert results == {(0, (0, 1, 2, 3))}


@pytest.mark.slow
def test_stream_fold_facade_funnel_with_restart(spark, tmp_path):
    """End-to-end: Stream.fold over two emissions with a facade
    restart between them — state survives the restart (exactly-once),
    nothing re-folds, and the final report equals the batch funnel
    over all events."""
    broker = str(tmp_path / "broker")
    fold, init = funnel_fold(STEPS, "event_type", "ts_ms")

    batch1 = [
        {"user_id": 1, "event_type": "view", "ts_ms": 1_000},
        {"user_id": 1, "event_type": "click", "ts_ms": 2_000},
        {"user_id": 2, "event_type": "view", "ts_ms": 1_500},
        {"user_id": 3, "event_type": "click", "ts_ms": 900},  # no view yet
    ]
    batch2 = [
        {"user_id": 1, "event_type": "purchase", "ts_ms": 5_000},
        {"user_id": 2, "event_type": "click", "ts_ms": 7_000},
        {"user_id": 3, "event_type": "view", "ts_ms": 8_000},
    ]

    s1 = Stream(spark, broker)
    s1.fold(
        "clicks", SCHEMA, fold, key_field="user_id", ts_field="ts_ms", init=init
    )
    s1.emit("clicks", *batch1)
    s1.run_until_idle()

    # restart: new facade over the same broker/checkpoints
    s2 = Stream(spark, broker)
    s2.fold(
        "clicks", SCHEMA, fold, key_field="user_id", ts_field="ts_ms", init=init
    )
    s2.emit("clicks", *batch2)
    s2.run_until_idle()

    states = s2.read_fold_states("clicks-state", "user_id", LongType())
    got = funnel_stats_from_states(states, STEPS)
    all_events = spark.createDataFrame(batch1 + batch2, SCHEMA).withColumn(
        "ts", F.timestamp_millis(F.col("ts_ms"))
    )
    want = funnel_stats(all_events, "user_id", "ts", "event_type", STEPS)
    assert _rows(got) == _rows(want)
    # user 1 completed the whole funnel ACROSS the restart: step-3
    # count of 1 proves checkpointed state carried t1/t2 over
    by_step = {r["step_idx"]: r["n_users"] for r in got.collect()}
    assert by_step == {1: 3, 2: 2, 3: 1}


def test_stream_fold_facade_retention(spark, tmp_path):
    broker = str(tmp_path / "broker")
    day = 86_400_000
    fold, init = retention_fold("ts_ms", period="day", n_periods=4)
    s = Stream(spark, broker)
    s.fold(
        "visits", SCHEMA, fold, key_field="user_id", ts_field="ts_ms", init=init
    )
    s.emit(
        "visits",
        {"user_id": 1, "event_type": "view", "ts_ms": 0 * day + 10},
        {"user_id": 1, "event_type": "view", "ts_ms": 2 * day + 10},
        {"user_id": 2, "event_type": "view", "ts_ms": 1 * day + 10},
    )
    s.run_until_idle()
    s.emit("visits", {"user_id": 2, "event_type": "view", "ts_ms": 3 * day + 10})
    s.run_until_idle()
    states = s.read_fold_states("visits-state", "user_id", LongType())
    got = _rows(retention_from_states(states))
    ev = spark.createDataFrame(
        [(1, 0 * day + 10), (1, 2 * day + 10), (2, 1 * day + 10), (2, 3 * day + 10)],
        "user_id long, ts_ms long",
    ).withColumn("ts", F.timestamp_millis(F.col("ts_ms")))
    want = _rows(retention_cohorts(ev, "user_id", "ts", period="day", n_periods=4))
    assert got == want
