"""Portable deterministic hashes built on md5.

Spark's native ``hash``/``xxhash64`` are fast but engine-specific;
these helpers produce the same value in any engine with ``md5`` +
string ops, which the oracle harness relies on. They run JVM-side
(built-in expressions, whole-stage codegen) — no Python UDFs.

Layout notes:
- ``hash60`` keeps 15 hex chars (60 bits) so the value always fits a
  signed int64 without overflow games.
- ``hash28_mod`` keeps 7 hex chars (28 bits) then reduces mod a prime,
  small enough that rolling-hash folds (`acc*131 + h`) stay < 2^63.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hash60(col: Column | str) -> Column:
    """60-bit integer hash: first 15 hex chars of md5, as bigint."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def hash28_mod(col: Column | str, modulus: int = 1_000_003) -> Column:
    """28-bit md5 prefix reduced mod a prime (default 1,000,003)."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.conv(F.substring(F.md5(c), 1, 7), 16, 10).cast("bigint") % modulus)
