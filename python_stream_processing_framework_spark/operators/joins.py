"""Join operators beyond plain equi-joins.

- `windowed_join`: the reference's co-partitioned windowed stream-stream
  join (pspf/topology.py:49-102 buffers both sides per (key, window) in
  a state store and merges). Spark-first: an equi-join on
  (key, window-bucket) — one shuffle on the composite key, state
  handled by the engine in streaming mode.
- `as_of_join`: not in the reference (SURVEY §2.4 notes its absence);
  standard capability for event/dimension alignment. Implemented as a
  union + window fill, not a per-row UDF: scales as one shuffle +
  sort within key partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def windowed_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts_col: str,
    window_size: str,
    how: str = "inner",
    prefixes: tuple[str, str] = ("l_", "r_"),
) -> DataFrame:
    """Equi-join two event sets that share `key` within the same
    tumbling window of `window_size`.

    Output carries the join key, the window bucket (`win_start_s`,
    epoch seconds) and both sides' payload columns prefixed.
    """
    lp, rp = prefixes

    def bucketed(df: DataFrame, prefix: str) -> DataFrame:
        win = F.window(F.col(ts_col), window_size)
        out = df.select(
            F.col(key),
            F.unix_timestamp(win["start"]).alias("win_start_s"),
            *[
                F.col(c).alias(f"{prefix}{c}")
                for c in df.columns
                if c not in (key,)
            ],
        )
        return out

    lb = bucketed(left, lp)
    rb = bucketed(right, rp)
    return lb.join(rb, on=[key, "win_start_s"], how=how)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    *,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with key salting — the manual fix for a hot key that
    overwhelms one shuffle partition (AQE's skew-join splitting is the
    automatic tier; salting is for when one key alone exceeds an
    executor).

    The big/skewed side gets an arbitrary per-row salt in [0, salt);
    the other side is replicated once per salt value; the join key
    becomes (key, salt). The result set is identical to the plain join
    for any salt assignment — we derive it from a hash of the row so
    plans stay deterministic. Replication multiplies the small side by
    `salt`, so keep it broadcast-sized or keep `salt` modest.

    Only inner/left-flavored joins are equivalence-preserving: with a
    right or full outer join every unmatched right row would surface
    once per salt value (it was replicated). Those are rejected.
    """
    normalized = how.replace("_", "").lower()
    if normalized in ("right", "rightouter", "full", "fullouter", "outer"):
        raise ValueError(
            f"salted_join(how={how!r}): right/full outer joins are not "
            "equivalence-preserving under salting (unmatched right rows "
            "are replicated once per salt value); salt the other side or "
            "use a plain join with AQE skew handling"
        )
    salt_col = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt))
    l_salted = left.withColumn("_salt", salt_col.cast("int"))
    r_replicated = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = l_salted.join(r_replicated, on=[key, "_salt"], how=how)
    return out.drop("_salt")


def windowed_join_stream(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts_col: str,
    window_size: str,
    watermark_delay: str,
    prefixes: tuple[str, str] = ("l_", "r_"),
) -> DataFrame:
    """Streaming form of `windowed_join`: watermark both sides and join
    on (key, window STRUCT). Joining on the event-time window column
    gives Spark the time constraint it needs to expire join state —
    the engine-managed version of the reference Joiner's buffer
    cleanup (pspf/topology.py:49-102, which never cleans up at all).
    """
    lp, rp = prefixes

    def prep(df: DataFrame, prefix: str) -> DataFrame:
        # the raw ts column must not survive the projection: it carries
        # watermark metadata, and a stream may have at most ONE event
        # time column — the window struct takes that role here.
        return (
            df.withWatermark(ts_col, watermark_delay)
            .select(
                F.col(key),
                F.window(F.col(ts_col), window_size).alias("window"),
                *[
                    F.col(c).alias(f"{prefix}{c}")
                    for c in df.columns
                    if c not in (key, ts_col)
                ],
            )
        )

    return prep(left, lp).join(prep(right, rp), on=[key, "window"], how="inner")


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_start: str,
    right_end: str,
    *,
    bucket: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Interval-containment join: each left row pairs with every right
    interval where ``right_start <= left_ts < right_end`` (half-open).

    Not in the reference (its Joiner is equi-key only,
    pspf/topology.py:49-102); standard capability for event-vs-interval
    alignment (promo windows, incident ranges, maintenance periods).

    Strategy — bucketed equi-join, the same shape Databricks' range-join
    hint produces: quantize time into `bucket`-sized cells, explode each
    interval over the cells it overlaps, equi-join on the cell id, then
    apply the exact range predicate. A point falls in exactly one cell,
    so no dedup is needed. Cost is |left| + sum(interval_len/bucket)
    shuffle rows instead of the |left|*|right| of a naive
    theta-join (which Spark would execute as BroadcastNestedLoop or
    cartesian). Pick `bucket` near the typical interval length: too
    small explodes the right side, too large degrades the equi-join's
    selectivity toward all-pairs.

    Right-side intervals with ``end <= start`` are empty under half-open
    semantics and are dropped (they would otherwise make the cell
    `sequence()` descend).
    """
    from python_stream_processing_framework_spark.operators.windows import _duration_us

    normalized = how.replace("_", "").lower()
    if normalized in ("right", "rightouter", "full", "fullouter", "outer"):
        raise ValueError(
            f"range_join(how={how!r}): right/full outer joins are not "
            "equivalence-preserving here (an unmatched interval was "
            "exploded once per bucket cell it spans); swap the sides or "
            "anti-join separately"
        )

    bucket_us = _duration_us(bucket)
    s_us = F.unix_micros(F.col(right_start))
    e_us = F.unix_micros(F.col(right_end))
    l_us = F.unix_micros(F.col(left_ts))

    lb = left.withColumn("_lcell", F.floor(l_us / F.lit(bucket_us)))
    rb = (
        right.filter(e_us > s_us)
        .withColumn(
            "_rcell",
            F.explode(
                F.sequence(
                    F.floor(s_us / F.lit(bucket_us)),
                    # end is exclusive: the last occupied cell is the one
                    # containing end_us - 1.
                    F.floor((e_us - F.lit(1)) / F.lit(bucket_us)),
                )
            ),
        )
    )
    # The exact range predicate lives in the join condition (not a
    # post-filter) so left-outer semantics are correct: an unmatched
    # left row survives as one null-extended row.
    cond = (
        (lb["_lcell"] == rb["_rcell"])
        & (F.unix_micros(lb[left_ts]) >= F.unix_micros(rb[right_start]))
        & (F.unix_micros(lb[left_ts]) < F.unix_micros(rb[right_end]))
    )
    joined = lb.join(rb, on=cond, how=how)
    return joined.drop("_lcell", "_rcell")


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    tolerance: str | None = None,
) -> DataFrame:
    """Backward as-of join: for each left row, the latest right row
    with `right_ts <= left_ts` for the same key.

    Strategy: tag and union both sides, sort within key partitions by
    time, and carry the last seen right-row forward with
    `last(..., ignorenulls=True)` — one shuffle on `key`, no
    O(n*m) range join, no driver-side loop. With `tolerance`
    (e.g. ``'15 minutes'``), matches older than the tolerance are
    nulled out.
    """
    from python_stream_processing_framework_spark.operators.windows import _duration_us

    l_cols = [c for c in left.columns if c != key]
    r_cols = [c for c in right.columns if c != key]

    l_tagged = left.select(
        F.col(key),
        F.unix_micros(F.col(left_ts)).alias("_t_us"),
        F.lit(1).alias("_is_left"),
        *[F.col(c) for c in l_cols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in r_cols],
    )
    r_tagged = right.select(
        F.col(key),
        F.unix_micros(F.col(right_ts)).alias("_t_us"),
        F.lit(0).alias("_is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in l_cols],
        *[F.col(c).alias(f"_r_{c}") for c in r_cols],
    )
    unioned = l_tagged.unionByName(r_tagged)

    # Right rows sort before left rows at the same timestamp so a tie
    # (right_ts == left_ts) is a valid match.
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("_t_us"), F.col("_is_left"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.select(
        F.col(key),
        F.col("_t_us"),
        F.col("_is_left"),
        *[F.col(c) for c in l_cols],
        *[F.last(F.col(f"_r_{c}"), ignorenulls=True).over(w).alias(f"_r_{c}") for c in r_cols],
        F.last(
            F.when(F.col("_is_left") == 0, F.col("_t_us")), ignorenulls=True
        ).over(w).alias("_r_t_us"),
    ).filter(F.col("_is_left") == 1)

    if tolerance is not None:
        tol_us = _duration_us(tolerance)
        stale = F.col("_r_t_us").isNull() | (
            F.col("_t_us") - F.col("_r_t_us") > F.lit(tol_us)
        )
        filled = filled.select(
            F.col(key),
            F.col("_t_us"),
            *[F.col(c) for c in l_cols],
            *[F.when(~stale, F.col(f"_r_{c}")).alias(f"_r_{c}") for c in r_cols],
        )

    keep = [key, *l_cols] + [f"_r_{c}" for c in r_cols]
    renames = {f"_r_{c}": f"r_{c}" for c in r_cols}
    out = filled.select(*[F.col(c) for c in keep])
    for old, new in renames.items():
        out = out.withColumnRenamed(old, new)
    return out
