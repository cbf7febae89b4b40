"""Funnel analysis — ordered multi-step conversion over an event
stream.

Beyond-reference capability (SURVEY §2.7 charter adjacency): the
classic product-analytics query every event pipeline serves — "of the
users who VIEWED, how many then CLICKED, then PURCHASED, and how long
did each hop take?" — with strict event-time ordering (each step must
occur strictly after the user's previous step) and an optional
per-hop horizon.

Semantics (deterministic): a user's step-1 time is their EARLIEST
step-1 event; their step-k time is their earliest step-k event
STRICTLY AFTER their step-(k-1) time (and within ``horizon_ms`` of it
when set). "Earliest valid next" is the standard funnel definition
and makes the result a pure function of the event set — no
order-of-processing dependence.

Scale shape: step k is ONE filtered scan of the events reduced to
narrow (user, ms) rows, an equi-join on the user id against the
previous step's per-user frame (one row per surviving user — shrinks
monotonically down the funnel), and a per-user min aggregation with
map-side partials. No window sort over the raw stream, no
applyInPandas, no driver data. Timestamps compare as epoch
milliseconds (exact BIGINTs), so lags sum order-free and any engine
reproduces them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_users(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    *,
    horizon_ms: int | None = None,
) -> DataFrame:
    """Per-user completion times for the FULL funnel: (user, t1_ms ..
    tk_ms) — one row per user who completed every step in order.
    Intermediate frames (users who stalled at step j) are what
    `funnel_stats` counts."""
    if len(steps) < 1:
        raise ValueError("steps must name at least one event type")
    cur = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(F.unix_millis(F.col(ts_col))).alias("t1_ms"))
    )
    for i, step in enumerate(steps[1:], start=2):
        prev = f"t{i - 1}_ms"
        nxt = events.filter(F.col(type_col) == step).select(
            user_col, F.unix_millis(F.col(ts_col)).alias("_ts")
        )
        joined = nxt.join(cur, [user_col]).filter(F.col("_ts") > F.col(prev))
        if horizon_ms is not None:
            joined = joined.filter(
                F.col("_ts") <= F.col(prev) + F.lit(int(horizon_ms))
            )
        carried = [F.min(f"t{j}_ms").alias(f"t{j}_ms") for j in range(1, i)]
        cur = joined.groupBy(user_col).agg(
            *carried, F.min("_ts").alias(f"t{i}_ms")
        )
    return cur


def funnel_stats(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    *,
    horizon_ms: int | None = None,
) -> DataFrame:
    """The funnel report: one row per step — (step_idx, step,
    n_users, total_lag_ms) where n_users is how many users reached
    the step under the ordered rule and total_lag_ms the exact sum of
    their hop latencies from the previous step (0 for step 1). All
    BIGINT; engine-exact."""
    if len(steps) < 1:
        raise ValueError("steps must name at least one event type")
    # build each level ONCE (funnel_users' loop, shared): level i's
    # frame derives from level i-1, not a from-scratch prefix rerun
    levels = []
    cur = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(F.unix_millis(F.col(ts_col))).alias("t1_ms"))
    )
    levels.append(cur)
    for i, step in enumerate(steps[1:], start=2):
        prev = f"t{i - 1}_ms"
        nxt = events.filter(F.col(type_col) == step).select(
            user_col, F.unix_millis(F.col(ts_col)).alias("_ts")
        )
        joined = nxt.join(cur, [user_col]).filter(F.col("_ts") > F.col(prev))
        if horizon_ms is not None:
            joined = joined.filter(
                F.col("_ts") <= F.col(prev) + F.lit(int(horizon_ms))
            )
        carried = [F.min(f"t{j}_ms").alias(f"t{j}_ms") for j in range(1, i)]
        cur = joined.groupBy(user_col).agg(
            *carried, F.min("_ts").alias(f"t{i}_ms")
        )
        levels.append(cur)
    out = None
    for i, frame in enumerate(levels, start=1):
        lag = (
            F.lit(0).cast("bigint")
            if i == 1
            else F.coalesce(
                F.sum(F.col(f"t{i}_ms") - F.col(f"t{i - 1}_ms")), F.lit(0)
            ).cast("bigint")
        )
        row = frame.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            lag.alias("total_lag_ms"),
        ).select(
            F.lit(i).cast("int").alias("step_idx"),
            F.lit(steps[i - 1]).alias("step"),
            "n_users",
            "total_lag_ms",
        )
        out = row if out is None else out.unionByName(row)
    return out


#: Milliseconds per cohort period.
PERIOD_MS = {"day": 86_400_000, "week": 604_800_000}


def retention_cohorts(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    *,
    period: str = "week",
    n_periods: int = 8,
) -> DataFrame:
    """Cohort retention — the other half of the product-analytics
    pair (funnel = conversion, retention = comeback): bucket every
    user into the period of their FIRST event (their cohort), then
    count how many of each cohort were active 0, 1, ... n-1 periods
    later.

    Returns (cohort_period, offset, n_cohort, n_active): epoch-period
    index of the cohort (epoch_ms DIV period_ms — fixed epoch
    alignment, documented), the period offset, the cohort's size, and
    how many of its users had any event in cohort+offset. All-integer
    arithmetic; engine-exact.

    Scale shape: one scan to per-user first-event periods (groupBy
    min, map-side partials), one scan to DISTINCT (user, period)
    activity rows — both narrow BIGINT frames — an equi-join on the
    user id, and a (cohort, offset) count. No window functions, no
    driver data."""
    if period not in PERIOD_MS:
        raise ValueError(f"period must be one of {sorted(PERIOD_MS)}, got {period}")
    if n_periods < 1:
        raise ValueError(f"n_periods must be >= 1, got {n_periods}")
    pms = PERIOD_MS[period]
    pcol = F.expr(f"unix_millis({ts_col}) DIV {pms}").cast("bigint")
    firsts = events.groupBy(user_col).agg(
        F.min(pcol).alias("cohort_period")
    )
    activity = events.select(
        F.col(user_col), pcol.alias("p")
    ).distinct()
    cells = (
        activity.join(firsts, [user_col])
        .withColumn("offset", (F.col("p") - F.col("cohort_period")).cast("int"))
        .filter((F.col("offset") >= 0) & (F.col("offset") < n_periods))
        .groupBy("cohort_period", "offset")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_active"))
    )
    sizes = firsts.groupBy("cohort_period").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cohort")
    )
    return cells.join(sizes, ["cohort_period"]).select(
        "cohort_period", "offset", "n_cohort", "n_active"
    )
