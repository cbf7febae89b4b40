"""Query catalog: every implemented operator exposed as a named query.

Each entry pairs a Spark implementation (`(spark, sf_dir) -> DataFrame`)
with an ANSI-SQL oracle string executable by DuckDB over the same
parquet tables. Column names and value determinism are contract: see
functions/exact.py for why aggregates over doubles go through integer
cents, and functions/hashing.py for the engine-portable hashes.
"""

from __future__ import annotations

from python_stream_processing_framework_spark.queries.base import QUERY_REGISTRY, QuerySpec

# Importing the modules registers their queries.
from python_stream_processing_framework_spark.queries import (  # noqa: F401, E402
    relational,
    windows,
    dedup,
    similarity,
    text,
    advanced,
    sql_surface,
    extras,
    sampling,
    pq,
    packing,
    mixture,
    retrieval,
    bpe,
    lm,
    spans,
    semdedup,
)

__all__ = ["QUERY_REGISTRY", "QuerySpec"]
