"""Physical-plan inspection helpers.

The scale contract in SCALE.md isn't prose-only: tests/test_plans.py
asserts the shapes on real plans — filters reach the parquet scan,
small dims broadcast, no accidental cartesian products, shuffle counts
stay at the designed minimum, scans read only the projected columns.
These assertions are what keeps a refactor from silently trading a
broadcast join for a 100 TB shuffle.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan_text(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )


def assert_pushed_filters(df: DataFrame, *fragments: str) -> None:
    """Every fragment must appear inside some PushedFilters: [...] list."""
    text = plan_text(df)
    pushed = " ".join(re.findall(r"PushedFilters: \[[^\]]*\]", text))
    missing = [f for f in fragments if f not in pushed]
    assert not missing, f"filters not pushed to scan: {missing}\n{pushed}"


def assert_broadcast_join(df: DataFrame, min_count: int = 1) -> None:
    text = plan_text(df)
    n = text.count("BroadcastHashJoin")
    assert n >= min_count, f"expected >= {min_count} broadcast joins, found {n}"


def assert_no_cartesian(df: DataFrame) -> None:
    text = plan_text(df)
    assert "CartesianProduct" not in text, "plan contains a cartesian product"


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the plan (broadcast exchanges
    excluded — those move only the small side).

    Counts node headers in formatted mode (`(N) Exchange`); the
    partitioning details live on a separate Arguments line there, and
    `\\bExchange\\b` alone would also hit BroadcastExchange.
    """
    text = plan_text(df)
    n = len(re.findall(r"\(\d+\) Exchange\b", text))
    # guard against explain-format drift silently zeroing the guard:
    # any aggregation/join plan must show SOME exchange somewhere.
    if n == 0 and "Exchange" in text and "BroadcastExchange" not in text:
        raise AssertionError("count_exchanges failed to parse plan:\n" + text[:2000])
    return n


def read_schema_columns(df: DataFrame, table_fragment: str) -> list[str]:
    """Columns actually read from the scan whose location matches
    `table_fragment` (column-pruning evidence)."""
    text = plan_text(df, "formatted")
    # formatted mode prints per scan node:
    #   Location: ...[file:...table.parquet]
    #   ...
    #   ReadSchema: struct<a:int,b:string>
    pattern = re.compile(
        r"Location:[^\n]*"
        + re.escape(table_fragment)
        + r"[^\n]*\n(?:[^\n]*\n)*?ReadSchema: struct<([^>]*)>"
    )
    m = pattern.search(text)
    if not m:
        return []
    return [c.split(":")[0] for c in m.group(1).split(",") if c]
