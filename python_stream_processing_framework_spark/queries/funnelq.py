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


_RETENTION_ORACLE = """
    WITH pe AS (
      SELECT user_id, epoch_ms(ts) // 604800000 AS p FROM events),
    firsts AS (
      SELECT user_id, min(p) AS cohort_period FROM pe GROUP BY user_id),
    activity AS (SELECT DISTINCT user_id, p FROM pe),
    cells AS (
      SELECT f.cohort_period,
             CAST(a.p - f.cohort_period AS INTEGER) AS "offset",
             CAST(count(*) AS BIGINT) AS n_active
      FROM activity a JOIN firsts f USING (user_id)
      WHERE a.p - f.cohort_period >= 0 AND a.p - f.cohort_period < 6
      GROUP BY 1, 2),
    sizes AS (
      SELECT cohort_period, CAST(count(*) AS BIGINT) AS n_cohort
      FROM firsts GROUP BY 1)
    SELECT c.cohort_period, c."offset", s.n_cohort, c.n_active
    FROM cells c JOIN sizes s USING (cohort_period)
    ORDER BY cohort_period, "offset"
    """


@query(
    "retention_weekly",
    _RETENTION_ORACLE,
    doc="Weekly cohort retention (operators/funnel.retention_cohorts; "
    "the analytics pair to funnel_conversion): bucket each user into "
    "the epoch-week of their first event, count how many of each "
    "cohort were active 0..5 weeks later. One per-user min scan + one "
    "DISTINCT (user, week) scan — both narrow BIGINT frames — an "
    "equi-join on the user id, and a (cohort, offset) count; no "
    "window functions, nothing at the driver. All-integer epoch-week "
    "arithmetic; the oracle replays it exactly.",
)
def retention_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from python_stream_processing_framework_spark.operators.funnel import (
        retention_cohorts,
    )

    (events,) = load(spark, sf_dir, "events")
    out = retention_cohorts(
        events, "user_id", "ts", period="week", n_periods=6
    )
    return out.orderBy("cohort_period", "offset")
