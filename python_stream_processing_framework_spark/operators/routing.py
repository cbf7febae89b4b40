"""Predicate routing — first-match-wins fan-out.

Capability parity with the reference's `Router` (pspf/topology.py:10-46):
an ordered list of (predicate, route) pairs, first match wins, with an
optional default route; non-matching events are dropped.

Spark-first shape: routing is a single `when/otherwise` chain evaluated
JVM-side in one pass (no per-route rescan of the input). `split()`
returns one lazily-filtered DataFrame per route sharing the tagged
plan, so a multi-sink fan-out reads the source once per sink *at most*
— and exactly once when driven through `foreachBatch` (see
streaming/stream.py), where the batch is persisted before fan-out.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DROP = "__drop__"


class Router:
    """Ordered predicate router. Columns in, route tag out."""

    def __init__(self) -> None:
        self._routes: list[tuple[Column, str]] = []
        self._default: str | None = None

    def add_route(self, predicate: Column, route: str) -> "Router":
        self._routes.append((predicate, route))
        return self

    def default_route(self, route: str) -> "Router":
        self._default = route
        return self

    @property
    def targets(self) -> list[str]:
        """Every topic this router can emit to (routes + default)."""
        routes = [r for _, r in self._routes]
        if self._default is not None and self._default not in routes:
            routes.append(self._default)
        return routes

    def tag(self) -> Column:
        """The first-match-wins route tag as a single JVM expression."""
        if not self._routes:
            return F.lit(self._default if self._default is not None else DROP)
        expr = F.when(self._routes[0][0], F.lit(self._routes[0][1]))
        for pred, route in self._routes[1:]:
            expr = expr.when(pred, F.lit(route))
        return expr.otherwise(F.lit(self._default if self._default is not None else DROP))

    def apply(self, df: DataFrame, tag_col: str = "route") -> DataFrame:
        """Tag every row with its route; unroutable rows are dropped
        (reference drops events with no matching route and no default,
        pspf/topology.py:40-46)."""
        tagged = df.withColumn(tag_col, self.tag())
        return tagged.filter(F.col(tag_col) != DROP)

    def split(self, df: DataFrame, tag_col: str = "route") -> dict[str, DataFrame]:
        """One DataFrame per route (shared tagged plan, lazy filters)."""
        tagged = self.apply(df, tag_col)
        return {r: tagged.filter(F.col(tag_col) == r) for r in self.targets}
