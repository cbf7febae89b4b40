"""Exact-arithmetic helpers for aggregations over floating-point columns.

Summing doubles is order-dependent; Spark's partial aggregation order
(and any other engine's) is not reproducible bit-for-bit. Every
monetary aggregate in this engine therefore rounds each row to integer
cents *before* aggregating — int64 sums are exact and order-free — and
divides back to currency only at the end. The same expression shape in
any ANSI engine (``CAST(ROUND(x*100) AS BIGINT)``) produces identical
results, which is what makes the DuckDB oracle checks exact instead of
tolerance-based. At 100 TB this also keeps aggregation entirely inside
whole-stage codegen with map-side partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cents(col: Column | str) -> Column:
    """Row-level exact cents: ``CAST(ROUND(x*100) AS BIGINT)``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * F.lit(100)).cast("bigint")


def cents_sum(col: Column | str) -> Column:
    """Exact int64 sum of row-level cents (alias it yourself)."""
    return F.sum(cents(col))


def money(cents_col: Column) -> Column:
    """Convert an exact cents aggregate back to currency as double.

    Explicit cast first so the op sequence (int->double, then one fdiv)
    is identical in every engine.
    """
    return cents_col.cast("double") / F.lit(100.0)
