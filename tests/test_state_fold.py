"""Arbitrary per-key fold parity: the reference's stateful handler
(`handler(event, state) -> state`, e.g. the wordcount example
examples/stateful_wordcount.py) over applyInPandas(+WithState)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from python_stream_processing_framework_spark.streaming.state import (
    keyed_fold,
    keyed_fold_stream,
)

SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("ts", DoubleType()),
        StructField("value", LongType()),
    ]
)

ROWS = [
    ("a", 1.0, 5),
    ("a", 2.0, 7),
    ("b", 1.5, 1),
    ("a", 0.5, 2),  # out of order on purpose: fold must sort by ts
]


def make_fold():
    # defined per-test (not module-level) so cloudpickle ships it by
    # value to executor workers, which can't import the tests package.
    def fold(event, state):
        state = state or {"n": 0, "total": 0, "last": None}
        return {
            "n": state["n"] + 1,
            "total": state["total"] + event["value"],
            "last": event["value"],  # order-sensitive: proves ts ordering
        }

    return fold


def test_batch_keyed_fold(spark):
    fold = make_fold()
    df = spark.createDataFrame(ROWS, SCHEMA)
    out = {
        r["key"]: json.loads(r["state_json"])
        for r in keyed_fold(df, "key", "ts", fold).collect()
    }
    assert out["a"] == {"n": 3, "total": 14, "last": 7}
    assert out["b"] == {"n": 1, "total": 1, "last": 1}


def test_streaming_keyed_fold_state_survives_batches(spark, tmp_path):
    fold = make_fold()
    src_dir = tmp_path / "src"
    src_dir.mkdir()
    ckpt = str(tmp_path / "ckpt")
    collected: list[dict] = []

    def write_rows(name, rows):
        lines = [
            json.dumps({"key": k, "ts": t, "value": v}) for k, t, v in rows
        ]
        (src_dir / f"{name}.json").write_text("\n".join(lines) + "\n")

    def run_once():
        src = spark.readStream.schema(SCHEMA).json(str(src_dir))
        out = keyed_fold_stream(src, "key", "ts", fold)

        def sink(batch, _bid):
            collected.extend(r.asDict() for r in batch.collect())

        q = (
            out.writeStream.foreachBatch(sink)
            .outputMode("update")  # must match the stateful op's mode
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    write_rows("b1", [("a", 1.0, 5), ("b", 1.0, 3)])
    run_once()
    write_rows("b2", [("a", 2.0, 7)])
    run_once()

    states = {}
    for r in collected:  # later updates overwrite earlier ones
        states[r["key"]] = json.loads(r["state_json"])
    # 'a' accumulated ACROSS micro-batches => checkpointed state worked
    assert states["a"] == {"n": 2, "total": 12, "last": 7}
    assert states["b"] == {"n": 1, "total": 3, "last": 3}


def test_session_fold_arbitrary(spark):
    """Arbitrary fold per merged session (SURVEY §7 hard part #1):
    order-sensitive state over engine-merged session windows."""
    from pyspark.sql import functions as F

    from python_stream_processing_framework_spark.streaming.state import session_fold

    fold = make_fold()
    df = spark.createDataFrame(
        [
            ("u", 0.0, 1),
            ("u", 3.0, 2),   # within 5s gap of 0.0: same session
            ("u", 6.0, 4),   # within 5s of 3.0: session extends (merge)
            ("u", 30.0, 8),  # new session
            ("v", 1.0, 16),
        ],
        SCHEMA,
    ).withColumn("ts", F.timestamp_seconds(F.col("ts")))

    out = {
        (r["key"], r["session_start_us"]): (
            r["session_end_us"],
            r["n_events"],
            json.loads(r["state_json"]),
        )
        for r in session_fold(df, "key", "ts", "5 seconds", fold).collect()
    }
    # u session 1: events at 0,3,6 merged; end = 6s + 5s gap
    assert out[("u", 0)] == (11_000_000, 3, {"n": 3, "total": 7, "last": 4})
    assert out[("u", 30_000_000)] == (35_000_000, 1, {"n": 1, "total": 8, "last": 8})
    assert out[("v", 1_000_000)] == (6_000_000, 1, {"n": 1, "total": 16, "last": 16})
