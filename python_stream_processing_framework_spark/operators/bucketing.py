"""Bucketed-table layout: pay the join shuffle once, at write time.

At 100 TB the dominant cost of a fact-fact equi-join (lineitem x
orders on orderkey) is shuffling BOTH sides on the key — neither fits
a broadcast, so every downstream join repeats the same multi-TB
exchange. Spark's bucketed tables move that shuffle to WRITE time:
``bucketBy(n, key)`` hash-partitions the files on disk and records
the bucket spec in table metadata, so every later equi-join or
aggregation on the key reads co-located buckets with NO Exchange on
either side — Catalyst trusts the on-disk partitioning. One shuffle,
amortized across every join/agg in the table's lifetime. This is the
charter's "bucketing for co-located joins" scale lever; the reference
(single-process asyncio, /root/reference/pspf) has no table-layout
surface at all, so this is a beyond-reference Spark-native operator.

Rules that make the exchange-free plan actually fire (all pinned by
tests/test_bucketing.py):

- Both sides must be bucketed on their join key with the SAME bucket
  count (or divisible counts with
  ``spark.sql.bucketing.coalesceBucketsInJoin.enabled``).
- The join keys must be exactly the bucket columns — wrap the key in
  an expression and the bucket info is discarded.
- ``sortBy`` inside buckets lets SortMergeJoin skip or shrink the
  per-task Sort when each bucket is a single file.

Sizing at 100 TB: target ~128-256 MB per bucket per partition.
Bucketing composes with date partitioning (``partitionBy('ship_date')
.bucketBy(1024, 'orderkey')``) — partition pruning cuts the scan,
bucketing kills the join exchange; 100 TB / 365 days / 1024 buckets
~ 270 MB files. Do NOT bucket the raw corpus by a high-cardinality
key alone: n_buckets is a file count per write, not a row hash space.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int,
    *,
    path: str | None = None,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a parquet table bucketed (and bucket-sorted)
    on ``key``.

    ``path`` makes the table external (files live there, only the
    bucket-spec metadata goes to the warehouse catalog) — required in
    ephemeral environments where the warehouse dir is shared. This is
    the one-time shuffle purchase; every later equi-join/groupBy on
    ``key`` against a co-bucketed table is exchange-free.
    """
    writer = df.write.mode(mode).format("parquet").bucketBy(n_buckets, key)
    if sort:
        writer = writer.sortBy(key)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on,
    how: str = "inner",
) -> DataFrame:
    """Join two previously bucketed tables.

    Nothing special happens here by design — the point is that a
    PLAIN join is enough: Catalyst reads both tables' bucket specs
    and plans SortMergeJoin over co-located buckets with zero shuffle
    exchanges (each task reads bucket i of both sides). Keep ``on``
    as bare column equality on the bucket keys; any expression around
    the key invalidates the bucket-distribution proof and the
    exchanges come back.
    """
    return spark.table(left_table).join(spark.table(right_table), on, how)
