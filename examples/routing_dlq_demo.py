"""Predicate routing + retry/DLQ/replay, end to end on the facade —
the PySpark mirror of the reference's advanced_topology.py and
dlq_demo.py examples:

    emit transactions -> Router fan-out (first-match-wins, one
    when/otherwise pass per micro-batch) -> per-sub-topic subscribers
    -> a failing handler exhausts retries into {topic}-dlq with
    `_error` metadata -> inspect -> replay back onto the main topic.

Run: python examples/routing_dlq_demo.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F
from pyspark.sql.types import DoubleType, StringType, StructField, StructType

from python_stream_processing_framework_spark.operators.routing import Router
from python_stream_processing_framework_spark.session import get_spark
from python_stream_processing_framework_spark.streaming import Stream
from python_stream_processing_framework_spark.streaming.dlq import (
    replay_dead_letters,
)

TX_SCHEMA = StructType(
    [
        StructField("id", StringType()),
        StructField("amount", DoubleType()),
        StructField("user_id", StringType()),
    ]
)


def main() -> None:
    spark = get_spark("routing-dlq-demo")
    stream = Stream(spark, tempfile.mkdtemp(prefix="demo-broker-"))

    # 1. route transactions into sub-topics, first match wins
    router = (
        Router()
        .add_route(F.col("amount") > 10000, "high_value_tx")
        .default_route("standard_tx")
    )
    stream.route("transactions", TX_SCHEMA, router)

    # 2. sub-topic subscribers; the high-value handler fails on one
    # poisoned transaction, which retries then dead-letters
    processed: list[str] = []

    @stream.subscribe("high_value_tx", TX_SCHEMA, max_retries=2)
    def on_high(event):
        if event["id"] == "tx-poison":
            raise ValueError("fraud check crashed")
        processed.append(f"ALERT {event['id']} ${event['amount']}")

    @stream.subscribe("standard_tx", TX_SCHEMA)
    def on_standard(event):
        processed.append(f"ok {event['id']} ${event['amount']}")

    # 3. emit and drain (round 1 routes, later rounds drain sub-topics
    # and the retry topic)
    stream.emit(
        "transactions",
        {"id": "tx-1", "amount": 50.0, "user_id": "u1"},
        {"id": "tx-2", "amount": 15000.0, "user_id": "u2"},
        {"id": "tx-poison", "amount": 99999.0, "user_id": "u3"},
        {"id": "tx-3", "amount": 500.0, "user_id": "u3"},
    )
    stream.run_until_idle(rounds=4)
    for line in sorted(processed):
        print(line)

    # 4. the poisoned tx exhausted retries: inspect its DLQ record
    dlq = stream.read_topic(
        "high_value_tx-dlq",
        StructType(
            list(TX_SCHEMA.fields)
            + [
                StructField("_error", StringType()),
                StructField("_original_stream", StringType()),
            ]
        ),
    ).collect()
    for r in dlq:
        print(f"DLQ: {r['id']} from {r['_original_stream']}: {r['_error']}")
    assert [r["id"] for r in dlq] == ["tx-poison"]

    # 5. replay: strip DLQ metadata, re-emit onto the original topic
    # (the handler would fail again here — a real operator fixes the
    # handler or patches the payload first)
    n = replay_dead_letters(stream, "high_value_tx", schema=TX_SCHEMA)
    print(f"replayed {n} message(s) back onto high_value_tx")

    spark.stop()


if __name__ == "__main__":
    main()
