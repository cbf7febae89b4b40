"""Driver contract for the spark-graft builder (PySpark target).

`queries()` exposes every implemented operator from SURVEY.md §2 (plus
the beyond-reference LLM-pipeline operators) as named DataFrame
builders; `oracle_sql()` gives the DuckDB-executable ANSI-SQL oracle
for each (omitted only for genuinely FP-order-dependent ops, which get
the rows-only check). Implementations live in
python_stream_processing_framework_spark/.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from python_stream_processing_framework_spark.queries import QUERY_REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's core
    computation — tumbling-window per-key aggregation over the events
    stream (pspf/stream.py:325-471)."""
    fn = QUERY_REGISTRY["tumbling_window_sum"].fn
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented query/operator."""
    return {name: spec.fn for name, spec in QUERY_REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted => rows-only check)."""
    return {
        name: spec.oracle
        for name, spec in QUERY_REGISTRY.items()
        if spec.oracle is not None
    }
