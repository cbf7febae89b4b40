"""Time-series gap-filling — hypertable-style rollups on Spark.

A metrics/feature pipeline that rolls events into fixed time buckets
needs a DENSE grid: downstream models and dashboards treat a missing
bucket as "no row" unless someone materializes the gap. This is
TimescaleDB's `time_bucket_gapfill` + `locf` reshaped for Spark; the
reference's windowed aggregation (`/root/reference/pspf/stream.py:
325-471`) emits only observed windows, so gap synthesis is a
beyond-reference capability.

Plan shape (3 shuffles, all on the key column family):
1. bucket aggregate: groupBy(key, bucket) with map-side partial agg —
   integer-cents sums so results are order-free and engine-exact;
2. per-key span: groupBy(key) min/max bucket, then `explode(sequence)`
   generates the dense grid EXECUTOR-side (rows never touch the
   driver; grid size = span/bucket per key, independent of event
   count);
3. left join grid<-aggregates + a per-key ordered window for LOCF.

At 100 TB the dominant cost is step 1 over the raw events; the grid
and window run on the (much smaller) bucket table. Skewed keys hit
the same mitigation as any keyed agg (AQE skew join, salting).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from python_stream_processing_framework_spark.functions.exact import cents_sum, money


def bucket_gapfill(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    value_col: str,
    bucket_seconds: int,
    *,
    locf: bool = True,
) -> DataFrame:
    """Dense per-key bucket rollup with optional last-value carry-forward.

    Returns one row per (key, bucket) for EVERY bucket between the
    key's first and last event:
    - ``bucket_start_s``: epoch seconds (bigint, timezone-proof);
    - ``n_events``: events in the bucket (0 for synthesized gaps);
    - ``sum_value``: exact cents-sum of `value_col` as currency; for
      gap rows, the most recent preceding bucket's value when
      `locf=True` (never null — a key's first bucket always has data),
      else NULL;
    - ``filled``: True on synthesized rows.
    """
    bucket_us = bucket_seconds * 1_000_000
    # Integer floor-division (matches DuckDB `//`); double-divide then
    # cast would ROUND in some engines.
    b = F.expr(f"unix_micros(cast({ts_col} as timestamp)) div {bucket_us}")
    agg = df.groupBy(F.col(key_col), b.alias("_b")).agg(
        F.count(F.lit(1)).alias("_n"), cents_sum(value_col).alias("_cents")
    )
    span = agg.groupBy(key_col).agg(
        F.min("_b").alias("_mn"), F.max("_b").alias("_mx")
    )
    grid = span.select(
        F.col(key_col), F.explode(F.sequence("_mn", "_mx")).alias("_b")
    )
    joined = grid.join(agg, [key_col, "_b"], "left")
    if locf:
        w = (
            Window.partitionBy(key_col)
            .orderBy("_b")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        value = money(F.last("_cents", ignorenulls=True).over(w))
    else:
        value = money(F.col("_cents"))
    return joined.select(
        F.col(key_col),
        (F.col("_b") * F.lit(bucket_seconds)).cast("bigint").alias("bucket_start_s"),
        F.coalesce(F.col("_n"), F.lit(0)).cast("bigint").alias("n_events"),
        value.alias("sum_value"),
        F.col("_n").isNull().alias("filled"),
    )
