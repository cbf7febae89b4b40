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
