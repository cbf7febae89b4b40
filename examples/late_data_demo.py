"""Late-data handling end to end: the three tiers on one broker.

    drop      — windowed agg excludes the straggler (Spark bookkeeping)
    route     — Stream.window(late_topic=...) lands it in {topic}-late
    attribute — Stream.sessionize(grace_ms=...) emits it WITH the
                closed session it belonged to

The reference routes late events to a `-late` DLQ before any session
attribution exists (pspf/stream.py:402-413); tier 3 is this engine's
upgrade. Run: python examples/late_data_demo.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F
from pyspark.sql.types import DoubleType, LongType, StringType, StructField, StructType

from python_stream_processing_framework_spark.session import get_spark
from python_stream_processing_framework_spark.streaming import Stream, TumblingWindow

EVENTS = StructType(
    [
        StructField("key", StringType()),
        StructField("timestamp", DoubleType()),
        StructField("value", DoubleType()),
    ]
)
AGG = StructType(
    [
        StructField("key", StringType()),
        StructField("win_start_us", LongType()),
        StructField("win_end_us", LongType()),
        StructField("total", DoubleType()),
    ]
)
SESSIONS = StructType(
    [
        StructField("key", StringType()),
        StructField("session_start_ms", LongType()),
        StructField("session_end_ms", LongType()),
        StructField("n_events", LongType()),
        StructField("state_json", StringType()),
    ]
)
LATE = StructType(
    [
        StructField("key", StringType()),
        StructField("_ts_ms", LongType()),
        StructField("_session_start_ms", LongType()),
        StructField("_session_end_ms", LongType()),
        StructField("_event_json", StringType()),
    ]
)


def main() -> None:
    spark = get_spark("late-data-demo")
    stream = Stream(spark, tempfile.mkdtemp(prefix="late-demo-"))

    def sum_fold(event, state):
        return (state or 0.0) + float(event["value"])

    stream.window(
        "clicks",
        TumblingWindow(10_000),
        EVENTS,
        key_field="key",
        aggs={"total": F.sum("value")},
        watermark_delay_ms=2_000,
        late_topic="clicks-late",
    )
    stream.sessionize(
        "visits",
        EVENTS,
        key_field="key",
        gap_ms=5_000,
        fold=sum_fold,
        watermark_delay_ms=2_000,
        grace_ms=20_000,
    )

    # wave 1: on-time traffic; the 100s/30s events advance watermarks
    stream.emit(
        "clicks",
        {"key": "u", "timestamp": 5.0, "value": 1.0},
        {"key": "u", "timestamp": 100.0, "value": 2.0},
    )
    stream.emit(
        "visits",
        {"key": "u", "timestamp": 10.0, "value": 1.0},
        {"key": "u", "timestamp": 14.0, "value": 2.0},
        {"key": "v", "timestamp": 30.0, "value": 9.0},
    )
    stream.run_until_idle()

    # wave 2: one straggler on each topic
    stream.emit("clicks", {"key": "u", "timestamp": 7.0, "value": 9.0})
    stream.emit("visits", {"key": "u", "timestamp": 13.0, "value": 7.0})
    stream.run_until_idle()

    agg = {
        (r["key"], r["win_start_us"] // 1_000_000): r["total"]
        for r in stream.read_topic("clicks-agg", AGG).collect()
    }
    print("window [0,10)s total:", agg.get(("u", 0)), "(straggler's 9.0 EXCLUDED)")
    routed = stream.read_topic("clicks-late", EVENTS).collect()
    print(
        "routed to clicks-late:",
        [(r["key"], r["timestamp"], r["value"]) for r in routed],
    )
    assert agg.get(("u", 0)) == 1.0 and len(routed) == 1

    sessions = sorted(
        (r["key"], r["session_start_ms"], r["session_end_ms"], r["n_events"])
        for r in stream.read_topic("visits-sessions", SESSIONS).collect()
    )
    print("closed sessions:", sessions)
    lates = stream.read_topic("visits-late", LATE).collect()
    for r in lates:
        ev = json.loads(r["_event_json"])
        print(
            f"attributed straggler: ts={r['_ts_ms']}ms value={ev['value']} "
            f"-> session [{r['_session_start_ms']}, {r['_session_end_ms']})ms"
        )
    assert any(s[:3] == ("u", 10_000, 19_000) for s in sessions)
    assert len(lates) == 1 and lates[0]["_session_start_ms"] == 10_000
    spark.stop()


if __name__ == "__main__":
    main()
