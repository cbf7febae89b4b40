"""Bucketed co-located join: the exchange-free plan, machine-checked.

Writes orders/lineitem bucketed on the orderkey, joins them, and pins
the SCALE.md claim: zero shuffle Exchange nodes on either side of the
SortMergeJoin, with results identical to the plain (shuffled) join.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

from python_stream_processing_framework_spark.catalog import load
from python_stream_processing_framework_spark.operators.bucketing import (
    bucketed_join,
    write_bucketed,
)
from python_stream_processing_framework_spark.plans.explain import plan_text


@pytest.fixture()
def bucketed_tables(spark, tmp_path):
    orders, lineitem = load(spark, SF_SMOKE, "orders", "lineitem")
    write_bucketed(
        orders.select("o_orderkey", "o_custkey", "o_totalprice"),
        "bkt_orders",
        "o_orderkey",
        8,
        path=str(tmp_path / "bkt_orders"),
    )
    write_bucketed(
        lineitem.select("l_orderkey", "l_extendedprice", "l_discount"),
        "bkt_lineitem",
        "l_orderkey",
        8,
        path=str(tmp_path / "bkt_lineitem"),
    )
    yield "bkt_orders", "bkt_lineitem"
    spark.sql("DROP TABLE IF EXISTS bkt_orders")
    spark.sql("DROP TABLE IF EXISTS bkt_lineitem")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    left, right = bucketed_tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(
            spark,
            left,
            right,
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        text = plan_text(joined)
        assert "SortMergeJoin" in text
        # The whole point: bucket co-location removes BOTH shuffle
        # exchanges. BroadcastExchange is disabled above, so any
        # Exchange node here is a regression.
        assert not re.search(r"\(\d+\) Exchange\b", text), text[:2000]

        # Same rows as the plain DataFrame join over the raw parquet.
        orders, lineitem = load(spark, SF_SMOKE, "orders", "lineitem")
        plain = orders.join(
            lineitem, F.col("o_orderkey") == F.col("l_orderkey")
        ).select("o_orderkey", "l_extendedprice")
        got = sorted(
            (r["o_orderkey"], r["l_extendedprice"])
            for r in joined.select("o_orderkey", "l_extendedprice").collect()
        )
        want = sorted((r["o_orderkey"], r["l_extendedprice"]) for r in plain.collect())
        assert got == want and len(got) > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_groupby_has_no_exchange(spark, bucketed_tables):
    """Bucketing also removes the aggregation shuffle: a groupBy on
    the bucket key reads pre-partitioned buckets."""
    _, right = bucketed_tables
    agg = (
        spark.table(right)
        .groupBy("l_orderkey")
        .agg(F.sum("l_extendedprice").alias("revenue"))
    )
    text = plan_text(agg)
    assert not re.search(r"\(\d+\) Exchange\b", text), text[:2000]
    n = agg.count()
    assert n > 0


def test_unbucketed_join_pays_two_exchanges(spark):
    """Control: the same join over raw parquet shuffles both sides —
    the cost bucketing deletes."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders, lineitem = load(spark, SF_SMOKE, "orders", "lineitem")
        joined = orders.join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        text = plan_text(joined)
        assert len(re.findall(r"\(\d+\) Exchange\b", text)) >= 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
