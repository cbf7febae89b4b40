"""Map/filter DSL + idempotent sink, end to end on the facade — the
PySpark mirror of the reference's dsl_demo.py and
idempotent_sink_demo.py examples:

    emit raw events -> StreamBuilder-style map/filter chain (arbitrary
    Python, executor-side mapInPandas — never a driver loop) -> sink
    topic -> idempotent external writes (per-event tokens survive a
    replay: re-delivering the whole topic re-runs ZERO side effects).

Run: python examples/dsl_pipeline_demo.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql.types import DoubleType, StringType, StructField, StructType

from python_stream_processing_framework_spark.session import get_spark
from python_stream_processing_framework_spark.streaming import Stream
from python_stream_processing_framework_spark.streaming.dlq import IdempotentSink

IN_SCHEMA = StructType(
    [
        StructField("event_id", StringType()),
        StructField("value", DoubleType()),
    ]
)
OUT_SCHEMA = StructType(
    [
        StructField("event_id", StringType()),
        StructField("value", DoubleType()),
        StructField("message", StringType()),
    ]
)


class MockExternalApiSink(IdempotentSink):
    """Pretend external API (reference idempotent_sink_demo's
    MockExternalApiSink): counts real calls so the demo can show the
    dedup working."""

    call_count = 0

    def on_write(self, event: dict, token: str) -> None:
        type(self).call_count += 1
        print(f"  external API call for {event['event_id']} (token {token})")


def main() -> None:
    spark = get_spark("dsl-demo")
    stream = Stream(spark, tempfile.mkdtemp(prefix="demo-broker-"))

    # 1. the reference's StreamBuilder chain: map -> filter -> map -> sink
    (
        stream.pipeline("dsl_demo", IN_SCHEMA)
        .map(lambda e: {**e, "message": "seen"})
        .filter(lambda e: (e.get("value") or 0) > 5)
        .map(lambda e: {**e, "message": f"High Value Event: {e['event_id']}"})
        .sink("dsl_output", output_schema=OUT_SCHEMA)
    )

    stream.emit(
        "dsl_demo", *[{"event_id": f"e{i}", "value": float(i)} for i in range(10)]
    )
    stream.run_until_idle()

    survivors = stream.read_topic("dsl_output", OUT_SCHEMA).collect()
    print(f"pipeline kept {len(survivors)} of 10 events (value > 5):")
    for r in sorted(survivors, key=lambda r: r["event_id"]):
        print(f"  {r['message']}")

    # 2. idempotent external writes: phase 1 runs the side effect once
    # per event; a full replay of the topic re-runs NONE of them
    sink = MockExternalApiSink("ExternalApi", tempfile.mkdtemp(prefix="tokens-"))
    print("--- phase 1: first delivery ---")
    for r in survivors:
        sink.write(r.asDict())
    print("--- phase 2: replaying the whole topic ---")
    replayed = sum(1 for r in survivors if sink.write(r.asDict()))
    print(
        f"side effects: {MockExternalApiSink.call_count} total calls for "
        f"{len(survivors)} events; replay re-ran {replayed} (expected 0)"
    )
    assert MockExternalApiSink.call_count == len(survivors)
    assert replayed == 0
    spark.stop()


if __name__ == "__main__":
    main()
