"""Live-broker deployment demo: Valkey at the edges, the facade as
the exactly-once substrate — the reference's default-broker shape
(pspf/connectors/valkey.py) on Structured Streaming.

Producers XADD to a live stream; `Stream.ingest_valkey` pages it in
with checkpointed entry-id offsets; a pipeline filters/transforms;
`Stream.deliver_valkey` XADDs results back out; the ops CLI inspects
the live streams by URL. Uses $VALKEY_URL when set (real daemon),
else starts the embedded MiniValkeyServer (sources/resp.py) — the
same code path either way.

Run: python examples/valkey_bridge.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from python_stream_processing_framework_spark.session import get_spark
from python_stream_processing_framework_spark.sources.resp import (
    MiniValkeyServer,
    client_from_url,
)
from python_stream_processing_framework_spark.sources.valkey import flatten_entry
from python_stream_processing_framework_spark.streaming import Stream

SCHEMA = StructType(
    [
        StructField("event_id", StringType()),
        StructField("kind", StringType()),
        StructField("value", DoubleType()),
        StructField("n", LongType()),
    ]
)


def main() -> None:
    url = os.environ.get("VALKEY_URL")
    server = None
    if not url:
        server = MiniValkeyServer().start()
        url = server.url
        print(f"started embedded broker at {url}")

    client = client_from_url(url)
    # a producer fills the live input stream (any language, any
    # process — it's plain XADD with the flattened wire format)
    for i in range(20):
        client.xadd(
            "orders",
            flatten_entry(
                {
                    "event_id": f"o{i}",
                    "kind": "purchase" if i % 4 == 0 else "view",
                    "value": float(i),
                    "n": i,
                }
            ),
        )

    spark = get_spark("valkey-bridge-demo", cpus=4)
    stream = Stream(spark, tempfile.mkdtemp(prefix="bridge-broker-"),
                    state_partitions=4)
    stream.ingest_valkey(url, "orders", topic="orders")
    stream.pipeline("orders", SCHEMA).filter(
        lambda ev: ev["kind"] == "purchase"
    ).map(lambda ev: {**ev, "value": round(ev["value"] * 1.2, 2)}).sink(
        "purchases"
    )
    stream.deliver_valkey("purchases", SCHEMA, url, "purchases-out")
    stream.run_until_idle(rounds=3)

    out = client.xrange("purchases-out")
    print(f"delivered {len(out)} purchase events to the live stream:")
    for eid, fields in out:
        print(f"  {eid}  {fields}")
    assert {f["event_id"] for _id, f in out} == {f"o{i}" for i in range(0, 20, 4)}

    # the ops CLI addresses the SAME streams by URL:
    #   python -m python_stream_processing_framework_spark.cli inspect \
    #       --broker {url} --topic purchases-out
    if server is not None:
        server.stop()
    print("ok")


if __name__ == "__main__":
    main()
