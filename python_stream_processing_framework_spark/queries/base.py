"""Query registry plumbing."""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None => rows-only check
    doc: str = ""


QUERY_REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None, doc: str = "") -> Callable[[QueryFn], QueryFn]:
    """Register a query implementation with its oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERY_REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco
