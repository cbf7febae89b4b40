"""Watermarked streaming semantics on real streaming plans:
stream-stream windowed join, watermark late-drop, streaming dedup
within watermark — the engine-managed forms of the reference's Joiner
buffers, late-event routing, and idempotent consumption."""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from python_stream_processing_framework_spark.operators.joins import (
    windowed_join_stream,
)

SCHEMA = StructType(
    [
        StructField("event_id", StringType()),
        StructField("user_id", LongType()),
        StructField("ts", DoubleType()),  # epoch seconds
        StructField("value", DoubleType()),
    ]
)


def _write(dirpath, name, rows):
    lines = [
        json.dumps({"event_id": e, "user_id": u, "ts": t, "value": v})
        for e, u, t, v in rows
    ]
    (dirpath / f"{name}.json").write_text("\n".join(lines) + "\n")


def _stream(spark, d):
    return (
        spark.readStream.schema(SCHEMA)
        .json(str(d))
        .withColumn("ts", F.timestamp_seconds(F.col("ts")))
    )


def _run(df, ckpt, mode="append"):
    collected = []

    def sink(batch, _):
        collected.extend(r.asDict() for r in batch.collect())

    q = (
        df.writeStream.foreachBatch(sink)
        .outputMode(mode)
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return collected


def test_stream_stream_windowed_join(spark, tmp_path):
    ldir, rdir = tmp_path / "l", tmp_path / "r"
    ldir.mkdir(), rdir.mkdir()
    _write(ldir, "b1", [("p1", 1, 5.0, 10.0), ("p2", 1, 65.0, 20.0), ("p3", 2, 8.0, 5.0)])
    _write(rdir, "b1", [("c1", 1, 8.0, 0.0), ("c2", 1, 61.0, 0.0), ("c3", 3, 9.0, 0.0)])

    joined = windowed_join_stream(
        _stream(spark, ldir), _stream(spark, rdir), "user_id", "ts", "60 seconds", "30 seconds"
    )
    rows = _run(joined, tmp_path / "ck1")
    pairs = {(r["l_event_id"], r["r_event_id"]) for r in rows}
    # same user AND same 60s window only; user 2/3 have no counterpart
    assert pairs == {("p1", "c1"), ("p2", "c2")}


def test_watermark_drops_late_rows(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    ckpt = tmp_path / "ck"
    agg = (
        _stream(spark, src)
        .withWatermark("ts", "10 seconds")
        .groupBy(F.window("ts", "10 seconds"), F.col("user_id"))
        .agg(F.count("*").alias("n"))
        .select(
            F.unix_timestamp("window.start").alias("ws"), "user_id", "n"
        )
    )
    # batch 1 advances the watermark to 200-10=190
    _write(src, "b1", [("a", 1, 5.0, 1.0), ("b", 1, 200.0, 1.0)])
    out1 = _run(agg, ckpt)
    # append mode emits only finalized windows: [0,10) is final, [200,..) not yet
    assert {(r["ws"], r["n"]) for r in out1} == {(0, 1)}

    # batch 2: ts=7 is behind the watermark -> silently dropped (Spark);
    # ts=205 joins the open window
    _write(src, "b2", [("late", 1, 7.0, 1.0), ("c", 1, 205.0, 1.0)])
    _write(src, "b3", [("adv", 1, 400.0, 1.0)])  # advance watermark, finalize
    out2 = _run(agg, ckpt)
    finalized = {(r["ws"], r["n"]) for r in out2}
    assert (200, 2) in finalized  # b=200 and c=205 together, late 'a' absent
    assert all(ws != 0 for ws, _ in finalized), "late row must not reopen [0,10)"


def test_drop_duplicates_within_watermark(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    ckpt = tmp_path / "ck"
    dedup = (
        _stream(spark, src)
        .withWatermark("ts", "1 minute")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id", "user_id")
    )
    _write(src, "b1", [("e1", 1, 10.0, 1.0), ("e1", 1, 11.0, 1.0), ("e2", 2, 12.0, 1.0)])
    out1 = _run(dedup, ckpt)
    _write(src, "b2", [("e1", 1, 15.0, 1.0), ("e3", 3, 20.0, 1.0)])  # e1 again
    out2 = _run(dedup, ckpt)
    ids = [r["event_id"] for r in out1 + out2]
    assert sorted(ids) == ["e1", "e2", "e3"], f"duplicate escaped: {ids}"


def test_mid_batch_crash_exactly_once(spark, tmp_path):
    """The reference's strongest behavioral spec, kill-driven
    (tests/test_crash_recovery.py:20-130): worker 1 applies 5 of 10
    side effects then the query DIES mid-batch (an error thrown from
    the batch body — not a graceful stop — so the batch never
    commits); worker 2 restarts on the same checkpoint, the whole
    batch replays, and the idempotent sink suppresses the 5
    already-applied effects. Final sum exact; every effect applied
    exactly once."""
    import pytest

    from python_stream_processing_framework_spark.streaming.dlq import IdempotentSink
    from python_stream_processing_framework_spark.streaming.stream import Stream

    class SumSink(IdempotentSink):
        """Durable side effect: append (token, val) lines — append-only,
        so a double-apply would be VISIBLE, not averaged away."""

        def __init__(self, name, token_dir, effects_file):
            super().__init__(name, token_dir)
            self.effects = effects_file

        def on_write(self, event, token):
            with open(self.effects, "a") as f:
                f.write(f"{event['tx_id']} {int(event['val'])}\n")

    broker = tmp_path / "broker"
    effects = tmp_path / "effects.log"
    effects.touch()
    ev_schema = StructType(
        [
            StructField("event_id", StringType()),
            StructField("tx_id", StringType()),
            StructField("val", LongType()),
        ]
    )

    # seed the topic through the facade (also creates the broker dirs)
    seed = Stream(spark, str(broker))
    seed.emit("txs", *[{"tx_id": f"tx_{i:02d}", "val": i} for i in range(10)])

    # ---- worker 1: same reader + SAME checkpoint path the facade's
    # group 'eos' uses; crashes after 5 applied effects
    sink1 = SumSink("s", str(tmp_path / "tokens"), str(effects))
    ckpt = str(broker / "_checkpoints" / "txs-eos")

    def crashy(batch, _bid):
        rows = sorted((r.asDict() for r in batch.collect()), key=lambda r: r["tx_id"])
        for i, ev in enumerate(rows):
            if i >= 5:
                raise RuntimeError("worker crashed abruptly mid-batch")
            sink1.write(ev)

    q = (
        seed.stream_topic("txs", ev_schema)
        .writeStream.foreachBatch(crashy)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="crashed abruptly|Streaming"):
        q.awaitTermination()

    lines = effects.read_text().splitlines()
    assert len(lines) == 5  # five effects landed, batch did NOT commit

    # ---- worker 2: the facade, same group -> same checkpoint, fresh
    # sink instance over the same durable token store
    sink2 = SumSink("s", str(tmp_path / "tokens"), str(effects))
    st2 = Stream(spark, str(broker))
    w2_applied: list[str] = []

    @st2.subscribe("txs", ev_schema, group="eos")
    def handle(ev):
        if sink2.write(ev):
            w2_applied.append(ev["tx_id"])

    st2.run_until_idle()

    lines = effects.read_text().splitlines()
    assert len(lines) == 10  # each tx applied EXACTLY once overall
    assert sum(int(ln.split()[1]) for ln in lines) == sum(range(10))  # 45
    applied = [ln.split()[0] for ln in lines]
    assert len(set(applied)) == 10  # disjoint: no tx applied twice
    assert sorted(w2_applied) == [f"tx_{i:02d}" for i in range(5, 10)]
