"""End-to-end facade demo: produce -> route -> windowed aggregate ->
stateful count -> DLQ, mirroring the reference's stateful wordcount
example on Structured Streaming.

Run: python examples/stateful_wordcount.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from python_stream_processing_framework_spark.session import get_spark
from python_stream_processing_framework_spark.streaming import Stream, TumblingWindow

SCHEMA = StructType(
    [
        StructField("event_id", StringType()),
        StructField("key", StringType()),
        StructField("timestamp", DoubleType()),
        StructField("value", DoubleType()),
        StructField("_attempt", LongType()),
    ]
)


def main() -> None:
    spark = get_spark("wordcount-demo", cpus=4)
    broker = tempfile.mkdtemp(prefix="pspf-demo-")
    stream = Stream(spark, broker)

    # 1. stateful per-key counting via ctx.state (reference wordcount)
    @stream.subscribe("words", SCHEMA, group="counts")
    def count(msg_id, data, ctx):
        if data["value"] < 0:
            raise ValueError("negative word weight")  # -> retry -> DLQ
        ctx.state.put(data["key"], ctx.state.get(data["key"], 0) + 1)

    # 2. windowed sum of weights per word
    stream.window(
        "words",
        TumblingWindow(10_000),
        SCHEMA,
        key_field="key",
        aggs={"weight": F.sum("value"), "n": F.count(F.lit(1))},
    )

    stream.emit(
        "words",
        {"key": "spark", "timestamp": 1.0, "value": 1.0},
        {"key": "spark", "timestamp": 4.0, "value": 2.0},
        {"key": "stream", "timestamp": 6.0, "value": 1.0},
        {"key": "broken", "timestamp": 7.0, "value": -1.0},
    )
    stream.run_until_idle(rounds=5)  # drain retries

    print("word counts:", json.loads((Path(broker) / "_state" / "counts.json").read_text()))
    agg_schema = StructType(
        [
            StructField("key", StringType()),
            StructField("win_start_us", LongType()),
            StructField("win_end_us", LongType()),
            StructField("weight", DoubleType()),
            StructField("n", LongType()),
        ]
    )
    print("windowed sums:")
    stream.read_topic("words-agg", agg_schema).show()
    print("DLQ:")
    stream.read_topic(
        "words-dlq",
        StructType(SCHEMA.fields + [StructField("_error", StringType())]),
    ).select("event_id", "key", "_error", "_attempt").show(truncate=False)


if __name__ == "__main__":
    main()
