"""Robust per-key anomaly statistics (operators/robust.py).

Exact median/MAD in histogram form — no per-group sort, no value
buffering (Spark's `percentile()` buffers whole groups; a hot key at
100 TB is an executor OOM). Values are exact integer cents
(functions/exact.py), so the continuous median (even n: mean of the
two middle values — a lossless /2) and the 0.5-step deviations are
dyadic rationals both engines compare bit-exact; the oracle replays
the whole chain with DuckDB's own MEDIAN.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_stream_processing_framework_spark.catalog import load
from python_stream_processing_framework_spark.functions.exact import cents
from python_stream_processing_framework_spark.operators.robust import mad_anomalies
from python_stream_processing_framework_spark.queries.base import query

_K = 2.0

_ORACLE = f"""
    WITH v AS (
      SELECT o_orderpriority AS priority,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders),
    med AS (
      SELECT priority, CAST(MEDIAN(cents) AS DOUBLE) AS med
      FROM v GROUP BY priority),
    dev AS (
      SELECT v.priority, ABS(CAST(v.cents AS DOUBLE) - med.med) AS dev,
             med.med AS med
      FROM v JOIN med USING (priority)),
    mad AS (
      SELECT priority, CAST(MEDIAN(dev) AS DOUBLE) AS mad
      FROM dev GROUP BY priority)
    SELECT dev.priority AS priority,
           MIN(dev.med) AS med,
           MIN(mad.mad) AS mad,
           CAST(SUM(CASE WHEN dev.dev > {_K} * mad.mad THEN 1 ELSE 0 END)
                AS BIGINT) AS n_anomalies,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM dev JOIN mad USING (priority)
    GROUP BY dev.priority
    ORDER BY priority
    """


@query(
    "mad_anomalies",
    _ORACLE,
    doc="Robust per-key anomaly flags (operators/robust.py): exact "
    "per-priority median and MAD of order totals in integer cents via "
    "order-statistic histograms (state bounded by the value DOMAIN, "
    "never the group row count — the scale-safe exact form), then "
    "|x - med| > 2*MAD flags with the 50%-breakdown robustness "
    "mean/stddev z-scores lack. Stat-table joins are size-gated "
    "broadcasts (common.maybe_broadcast). Output is the per-key "
    "summary (med, mad, anomaly count, row count); the oracle replays "
    "median/MAD/flags with DuckDB's MEDIAN over the same cents.",
)
def mad_anomalies_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = load(spark, sf_dir, "orders")
    v = orders.select(
        F.col("o_orderpriority").alias("priority"),
        cents("o_totalprice").alias("cents"),
    )
    flagged = mad_anomalies(v, "priority", "cents", k=_K)
    return (
        flagged.groupBy("priority")
        .agg(
            F.min("med").alias("med"),
            F.min("mad").alias("mad"),
            F.sum(F.when(F.col("is_anomaly"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_anomalies"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        )
        .orderBy("priority")
    )
