"""Queries exercised through the raw SQL surface (`spark.sql` over
registered views) — the engine exposes full Spark SQL, which the
reference lacks entirely (SURVEY §2.3). Includes subquery shapes
(correlated scalar, IN) and approximate aggregates (rows-only checks:
sketch internals are engine-specific by design).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from python_stream_processing_framework_spark.catalog import register_views
from python_stream_processing_framework_spark.queries.base import query


@query(
    "customer_max_order_sql",
    """
    SELECT c_custkey, c_name,
           (SELECT max(o_totalprice) FROM orders WHERE o_custkey = c_custkey)
             AS max_order_price,
           CAST((SELECT count(*) FROM orders WHERE o_custkey = c_custkey)
             AS BIGINT) AS n_orders
    FROM customer
    WHERE c_acctbal > 0
      AND c_custkey IN (SELECT o_custkey FROM orders)
    """,
    doc="Raw-SQL surface: correlated scalar subqueries + IN subquery "
    "(Catalyst rewrites to aggregated left joins / semi joins).",
)
def customer_max_order_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey, c_name,
               (SELECT max(o_totalprice) FROM orders WHERE o_custkey = c_custkey)
                 AS max_order_price,
               (SELECT count(*) FROM orders WHERE o_custkey = c_custkey)
                 AS n_orders
        FROM customer
        WHERE c_acctbal > 0
          AND c_custkey IN (SELECT o_custkey FROM orders)
        """
    )


@query(
    "approx_distinct_users",
    None,  # HLL/quantile sketches are engine-specific: rows-only check.
    doc="Approximate aggregates (approx_count_distinct HLL++, "
    "approx_percentile) — the 100 TB substitutes for exact "
    "count-distinct / percentiles; sanity-checked in tests against "
    "exact values, rows-only in the driver gate.",
)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scalar projections (not an array column): the driver's rows-only
    # canonicalizer sorts the pandas frame, and list cells are unhashable.
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT event_type,
               approx_count_distinct(user_id) AS approx_users,
               approx_percentile(value, 0.5) AS approx_p50,
               approx_percentile(value, 0.99) AS approx_p99
        FROM events GROUP BY event_type
        """
    )
