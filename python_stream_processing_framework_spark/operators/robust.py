"""Robust per-key statistics at histogram scale: exact median and
MAD anomaly flags without per-group sorts.

Spark's `percentile()` aggregate buffers every group's values in
executor memory — exact, but a giant key at 100 TB is an OOM. The
scalable exact form for QUANTIZED values is the order-statistic
histogram (the same trick operators/lm.perplexity_buckets uses for
CCNet terciles): group to (key, value, count) — size bounded by the
value DOMAIN, not the row count — then read the median off the
cumulative counts. Both shuffles key on the same column, so Catalyst
reuses the hash partitioning between the window and the final
aggregate.

Median semantics are the continuous ones every engine shares (odd n:
middle value; even n: mean of the two middle values — DuckDB
`median`, Spark `percentile(0.5)`), so the oracle replays bit-exact:
inputs are integers (quantize with functions/exact.cents first) and
the only division is by 2, a lossless binary scale.

Anomaly rule: |x - median| > k * MAD (median absolute deviation),
the standard robust outlier test — unlike mean/stddev z-scores, a
burst of anomalies cannot drag the baseline toward itself (50%
breakdown point). With integer inputs, deviations are multiples of
0.5 and MAD of 0.25, all dyadic — every comparison is engine-exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _median_ranks(n: Column) -> tuple[Column, Column]:
    """1-based ranks of the two middle order statistics (equal when
    n is odd): floor((n+1)/2) and floor(n/2)+1."""
    lo = F.floor((n + F.lit(1)) / F.lit(2))
    hi = F.floor(n / F.lit(2)) + F.lit(1)
    return lo, hi


def exact_median(
    df: DataFrame,
    key_col: str,
    value_col: str,
    *,
    out_col: str = "median",
) -> DataFrame:
    """(key, median) — exact continuous median per key, histogram form.

    Values must be quantized (integers, or dyadic rationals like the
    0.5-step deviations mad_anomalies feeds back in): the histogram
    groups BY VALUE, so the state per key is its distinct-value
    count, never its row count. One (key, value) exchange + one key
    exchange; no per-group sort, no value buffering.
    """
    h = df.groupBy(key_col, value_col).agg(F.count(F.lit(1)).alias("_c"))
    wk = Window.partitionBy(key_col)
    cum = (
        h.withColumn("_cum", F.sum("_c").over(wk.orderBy(value_col)))
        .withColumn("_n", F.sum("_c").over(wk))
    )
    lo_rank, hi_rank = _median_ranks(F.col("_n"))
    v = F.col(value_col).cast("double")
    return cum.groupBy(key_col).agg(
        (
            (
                F.min(F.when(F.col("_cum") >= lo_rank, v))
                + F.min(F.when(F.col("_cum") >= hi_rank, v))
            )
            / F.lit(2.0)
        ).alias(out_col)
    )


def mad_anomalies(
    df: DataFrame,
    key_col: str,
    value_col: str,
    *,
    k: float = 3.0,
    med_col: str = "med",
    mad_col: str = "mad",
    flag_col: str = "is_anomaly",
) -> DataFrame:
    """Flag rows whose |value - median(key)| exceeds k * MAD(key).

    ``value_col`` must be integral (quantize with exact.cents).
    Returns the input columns plus the per-key median, MAD, and the
    boolean flag. Keys where MAD = 0 (over half the values identical)
    flag any deviation at all — the strictest consistent reading, and
    the one an exact replay agrees on. Per-key stat tables are
    key-cardinality-sized; the broadcast hints are SIZE-GATED
    (``common.maybe_broadcast``) because key cardinality is unbounded
    in principle (per-user keys at 100 TB run ~1e9) — under the cap
    the corpus is scanned map-only around the two histogram medians,
    above it the stat joins are plain equi-joins and AQE decides.
    """
    from python_stream_processing_framework_spark.operators.common import (
        maybe_broadcast,
    )

    med = maybe_broadcast(exact_median(df, key_col, value_col, out_col=med_col))
    dev = df.join(med, key_col).withColumn(
        "_dev", F.abs(F.col(value_col).cast("double") - F.col(med_col))
    )
    mad = maybe_broadcast(exact_median(dev, key_col, "_dev", out_col=mad_col))
    return (
        dev.join(mad, key_col)
        .withColumn(flag_col, F.col("_dev") > F.lit(float(k)) * F.col(mad_col))
        .drop("_dev")
    )
