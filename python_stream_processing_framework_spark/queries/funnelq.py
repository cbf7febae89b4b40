"""Funnel catalog query (operators/funnel.py).

The oracle replays the strict-order earliest-valid-next rule as
chained CTEs: per-user min epoch-ms per step, each step's events
joined against the previous step's per-user frame with a strict
time inequality. Counts and hop-lag sums are exact BIGINTs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from python_stream_processing_framework_spark.catalog import load
from python_stream_processing_framework_spark.operators.funnel import funnel_stats
from python_stream_processing_framework_spark.queries.base import query

_ORACLE = """
    WITH s1 AS (
      SELECT user_id, min(epoch_ms(ts)) AS t1
      FROM events WHERE event_type = 'view' GROUP BY user_id),
    s2 AS (
      SELECT e.user_id, min(s1.t1) AS t1, min(epoch_ms(e.ts)) AS t2
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'click' AND epoch_ms(e.ts) > s1.t1
      GROUP BY e.user_id),
    s3 AS (
      SELECT e.user_id, min(s2.t2) AS t2, min(epoch_ms(e.ts)) AS t3
      FROM events e JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase' AND epoch_ms(e.ts) > s2.t2
      GROUP BY e.user_id)
    SELECT CAST(1 AS INTEGER) AS step_idx, 'view' AS step,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(0 AS BIGINT) AS total_lag_ms
    FROM s1
    UNION ALL
    SELECT CAST(2 AS INTEGER), 'click', CAST(count(*) AS BIGINT),
           CAST(coalesce(sum(t2 - t1), 0) AS BIGINT)
    FROM s2
    UNION ALL
    SELECT CAST(3 AS INTEGER), 'purchase', CAST(count(*) AS BIGINT),
           CAST(coalesce(sum(t3 - t2), 0) AS BIGINT)
    FROM s3
    ORDER BY step_idx
    """


@query(
    "funnel_conversion",
    _ORACLE,
    doc="Ordered funnel analysis (operators/funnel.funnel_stats): of "
    "the users who viewed, how many then clicked strictly later, then "
    "purchased strictly later still — with the exact total hop "
    "latency per step. Step k is one filtered scan reduced to narrow "
    "(user, ms) rows, an equi-join against the previous step's "
    "shrinking per-user frame, and a per-user min with map-side "
    "partials — no window sort over the raw stream. Timestamps "
    "compare as epoch-ms BIGINTs, so counts and lag sums are "
    "engine-exact; the oracle replays the earliest-valid-next rule "
    "as chained CTEs.",
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = load(spark, sf_dir, "events")
    return funnel_stats(
        events, "user_id", "ts", "event_type", ["view", "click", "purchase"]
    ).orderBy("step_idx")
