"""Facade-level Router fan-out (Stream.route) — the PySpark mirror of
the reference's advanced_topology example (router.route(event)
publishes to sub-topics, subscribers consume them,
/root/reference/examples/advanced_topology.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
)

from python_stream_processing_framework_spark.operators.routing import Router
from python_stream_processing_framework_spark.streaming import Stream

TX_SCHEMA = StructType(
    [
        StructField("id", StringType()),
        StructField("amount", DoubleType()),
        StructField("user_id", StringType()),
    ]
)


@pytest.fixture()
def stream(spark, tmp_path):
    return Stream(spark, str(tmp_path / "broker"))


def test_route_first_match_to_subtopics_and_subscribers(stream):
    stream.emit(
        "transactions",
        {"id": "tx-1", "amount": 50.0, "user_id": "u1"},
        {"id": "tx-2", "amount": 15000.0, "user_id": "u2"},
        {"id": "tx-3", "amount": 500.0, "user_id": "u3"},
        {"id": "tx-4", "amount": 99999.0, "user_id": "u4"},
    )
    router = (
        Router()
        .add_route(F.col("amount") > 10000, "high_value_tx")
        .default_route("standard_tx")
    )
    stream.route("transactions", TX_SCHEMA, router)

    seen: dict[str, list[str]] = {"high": [], "standard": []}

    @stream.subscribe("high_value_tx", TX_SCHEMA)
    def on_high(event):
        seen["high"].append(event["id"])

    @stream.subscribe("standard_tx", TX_SCHEMA)
    def on_standard(event):
        seen["standard"].append(event["id"])

    # round 1 routes; round 2 lets the sub-topic subscribers drain
    stream.run_until_idle(rounds=2)

    assert sorted(seen["high"]) == ["tx-2", "tx-4"]
    assert sorted(seen["standard"]) == ["tx-1", "tx-3"]


def test_route_drops_unroutable_without_default(stream):
    stream.emit(
        "tx2",
        {"id": "a", "amount": 5.0, "user_id": "u"},
        {"id": "b", "amount": 50000.0, "user_id": "u"},
    )
    router = Router().add_route(F.col("amount") > 10000, "big_only")
    stream.route("tx2", TX_SCHEMA, router)
    stream.run_until_idle()

    rows = stream.read_topic("big_only", TX_SCHEMA).collect()
    assert [r["id"] for r in rows] == ["b"]
    # the small tx matched nothing and there is no default: dropped
    # (reference pspf/topology.py:40-46)


def test_route_exactly_once_across_reruns(stream):
    """Re-running the topology must not re-deliver routed events: the
    route query's checkpoint makes the fan-out itself exactly-once."""
    stream.emit("tx3", {"id": "x", "amount": 20000.0, "user_id": "u"})
    router = Router().add_route(F.col("amount") > 10000, "hv3")
    stream.route("tx3", TX_SCHEMA, router)
    stream.run_until_idle(rounds=3)

    rows = stream.read_topic("hv3", TX_SCHEMA).collect()
    assert [r["id"] for r in rows] == ["x"]
