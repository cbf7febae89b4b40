"""Plan inspection: machine-checkable assertions about physical plans."""

from python_stream_processing_framework_spark.plans.explain import (
    plan_text,
    assert_pushed_filters,
    assert_broadcast_join,
    assert_no_cartesian,
    count_exchanges,
    read_schema_columns,
)

__all__ = [
    "plan_text",
    "assert_pushed_filters",
    "assert_broadcast_join",
    "assert_no_cartesian",
    "count_exchanges",
    "read_schema_columns",
]
