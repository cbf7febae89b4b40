"""Event-time windowing queries — the reference's streaming core as
deterministic batch plans (same operators run streaming with
`withWatermark`; see streaming/ and tests/test_streaming_facade.py).

Window-boundary outputs are epoch seconds/micros (bigint) so results
are timezone-proof and oracle-exact. Oracle bucketing mirrors Spark's
epoch-aligned windows: start = (epoch_us // size_us) * size_s.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_stream_processing_framework_spark.catalog import load
from python_stream_processing_framework_spark.functions.exact import cents, cents_sum, money
from python_stream_processing_framework_spark.operators.joins import windowed_join
from python_stream_processing_framework_spark.operators.routing import Router
from python_stream_processing_framework_spark.operators.windows import (
    session,
    sliding,
    split_late,
    tumbling,
)
from python_stream_processing_framework_spark.queries.base import query

_SUM_VALUE = "CAST(sum(CAST(round(value*100) AS BIGINT)) AS DOUBLE)/100.0"


@query(
    "tumbling_window_sum",
    f"""
    SELECT user_id,
           CAST((epoch_us(ts) // 600000000) * 600 AS BIGINT) AS win_start_s,
           count(*) AS n_events,
           {_SUM_VALUE} AS sum_value,
           CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
    FROM events GROUP BY 1, 2
    """,
    doc="Tumbling per-key windowed aggregate — the reference's flagship "
    "computation (pspf/stream.py:325-471, tests/test_stream_windowing.py).",
)
def tumbling_window_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = load(spark, sf_dir, "events")
    return tumbling(events, "ts", "10 minutes", "user_id").agg_with_bounds(
        F.count("*").alias("n_events"),
        money(cents_sum("value")).alias("sum_value"),
        F.countDistinct("event_type").alias("n_types"),
    )


@query(
    "sliding_window_stats",
    f"""
    SELECT event_type,
           CAST((epoch_us(ts) // 300000000) * 300 - off AS BIGINT) AS win_start_s,
           count(*) AS n_events,
           {_SUM_VALUE} AS sum_value
    FROM events, (VALUES (0), (300)) t(off)
    GROUP BY 1, 2
    """,
    doc="Sliding windows (10 min size / 5 min slide): every event lands "
    "in exactly two epoch-aligned windows (pspf/processing/windows.py:32-49).",
)
def sliding_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = load(spark, sf_dir, "events")
    return sliding(events, "ts", "10 minutes", "5 minutes", "event_type").agg_with_bounds(
        F.count("*").alias("n_events"),
        money(cents_sum("value")).alias("sum_value"),
    )


@query(
    "session_windows",
    f"""
    WITH e AS (
      SELECT user_id, value, epoch_us(ts) AS us FROM events),
    marked AS (
      SELECT user_id, value, us,
             CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us)
                       >= 1800000000
                  OR lag(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL
                  THEN 1 ELSE 0 END AS brk
      FROM e),
    sessions AS (
      SELECT user_id, value, us,
             sum(brk) OVER (PARTITION BY user_id ORDER BY us
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS sid
      FROM marked)
    SELECT user_id,
           CAST(min(us) AS BIGINT) AS session_start_us,
           CAST(max(us) + 1800000000 AS BIGINT) AS session_end_us,
           count(*) AS n_events,
           {_SUM_VALUE} AS sum_value
    FROM sessions GROUP BY user_id, sid
    """,
    doc="Session windows, 30-min gap. Spark session_window merges and "
    "closes sessions correctly (end = last event + gap) — unlike the "
    "reference, which never emits/closes (pspf/stream.py:415-451); "
    "documented upgrade per SURVEY §7.",
)
def session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = load(spark, sf_dir, "events")
    return session(events, "ts", "30 minutes", "user_id").agg_with_bounds(
        F.count("*").alias("n_events"),
        money(cents_sum("value")).alias("sum_value"),
        start_col="session_start_us",
        end_col="session_end_us",
        micros=True,
    )


@query(
    "router_counts",
    f"""
    SELECT CASE WHEN value > 180 THEN 'high_value'
                WHEN event_type = 'error' THEN 'error'
                WHEN user_id % 2 = 0 THEN 'even_user'
                ELSE 'other' END AS route,
           count(*) AS n_events,
           {_SUM_VALUE} AS sum_value,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY 1
    """,
    doc="Predicate routing, first-match-wins with default "
    "(pspf/topology.py:10-46) — one when/otherwise pass, no rescans.",
)
def router_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = load(spark, sf_dir, "events")
    router = (
        Router()
        .add_route(F.col("value") > 180, "high_value")
        .add_route(F.col("event_type") == "error", "error")
        .add_route(F.col("user_id") % 2 == 0, "even_user")
        .default_route("other")
    )
    return router.apply(events).groupBy("route").agg(
        F.count("*").alias("n_events"),
        money(cents_sum("value")).alias("sum_value"),
        F.countDistinct("user_id").alias("n_users"),
    )


@query(
    "windowed_pair_join",
    """
    WITH p AS (SELECT user_id, (epoch_us(ts) // 600000000) * 600 AS w, value
               FROM events WHERE event_type = 'purchase'),
         c AS (SELECT user_id, (epoch_us(ts) // 600000000) * 600 AS w
               FROM events WHERE event_type = 'click')
    SELECT CAST(p.w AS BIGINT) AS win_start_s,
           count(*) AS n_pairs,
           CAST(sum(CAST(round(p.value*100) AS BIGINT)) AS DOUBLE)/100.0
             AS sum_purchase_value
    FROM p JOIN c ON p.user_id = c.user_id AND p.w = c.w
    GROUP BY 1
    """,
    doc="Windowed co-partitioned stream-stream join "
    "(pspf/topology.py:49-102 Joiner): equi-join on (key, window bucket) "
    "— one shuffle; streaming variant uses watermarked state.",
)
def windowed_pair_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = load(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    clicks = events.filter(F.col("event_type") == "click").select("user_id", "ts")
    joined = windowed_join(purchases, clicks, "user_id", "ts", "10 minutes")
    return joined.groupBy("win_start_s").agg(
        F.count("*").alias("n_pairs"),
        money(F.sum(cents("l_value"))).alias("sum_purchase_value"),
    )


@query(
    "late_data_counts",
    """
    WITH m AS (SELECT max(epoch_us(ts)) - 3600000000 AS wm FROM events),
         tagged AS (
           SELECT event_type,
                  CASE WHEN ((epoch_us(ts) // 600000000) * 600 + 600) * 1000000
                            < wm
                       THEN 'late' ELSE 'on_time' END AS status
           FROM events, m)
    SELECT status, event_type, count(*) AS n_events
    FROM tagged GROUP BY 1, 2
    """,
    doc="Late-data split against watermark = max(ts) - 1h: the reference "
    "routes late events to a '-late' DLQ instead of dropping "
    "(pspf/stream.py:402-413); batch shape of streaming/dlq.py.",
)
def late_data_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = load(spark, sf_dir, "events")
    on_time, late = split_late(events, "ts", "10 minutes", "1 hour")
    return (
        on_time.groupBy("event_type")
        .agg(F.count("*").alias("n_events"))
        .select(F.lit("on_time").alias("status"), "event_type", "n_events")
        .unionAll(
            late.groupBy("event_type")
            .agg(F.count("*").alias("n_events"))
            .select(F.lit("late").alias("status"), "event_type", "n_events")
        )
    )


@query(
    "gapfill_locf",
    """
    WITH agg AS (
      SELECT user_id, epoch_us(ts) // 1800000000 AS b,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY 1, 2),
    span AS (
      SELECT user_id, min(b) AS mn, max(b) AS mx FROM agg GROUP BY 1),
    grid AS (
      SELECT user_id, unnest(range(mn, mx + 1)) AS b FROM span),
    j AS (
      SELECT g.user_id, g.b, a.n, a.cents
      FROM grid g LEFT JOIN agg a ON a.user_id = g.user_id AND a.b = g.b)
    SELECT user_id,
           CAST(b * 1800 AS BIGINT) AS bucket_start_s,
           COALESCE(n, 0) AS n_events,
           CAST(last_value(cents IGNORE NULLS) OVER (
                  PARTITION BY user_id ORDER BY b
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) / 100.0 AS sum_value,
           n IS NULL AS filled
    FROM j
    """,
    doc="Hypertable-style dense rollup (operators/timeseries.py): 30-min "
    "buckets per user with every gap bucket synthesized executor-side "
    "(explode(sequence)) and LOCF-filled via an ordered window over "
    "exact integer cents. TimescaleDB time_bucket_gapfill+locf "
    "semantics; the reference emits only observed windows.",
)
def gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from python_stream_processing_framework_spark.operators.timeseries import (
        bucket_gapfill,
    )

    (events,) = load(spark, sf_dir, "events")
    return bucket_gapfill(events, "ts", "user_id", "value", 1800, locf=True)
