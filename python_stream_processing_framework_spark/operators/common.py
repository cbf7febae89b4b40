"""Execution-hygiene helpers shared across operator modules."""

from __future__ import annotations

from pyspark.sql import DataFrame


def materialize(df: DataFrame) -> DataFrame:
    """persist() + eager population (count action).

    A lazily-persisted plan that fans out into SEVERAL downstream
    stages is a scheduling race: when the scheduler launches those
    stages concurrently (it does, they share no shuffle dependency),
    each one computes the full unpersisted plan — the expensive
    signature/index work runs 2-4x and the cache blocks collide
    ("Block already exists on this machine" warnings). One count()
    forces a single computation pass before any consumer is planned;
    every branch then reads the cached blocks. The count itself does
    work we'd pay anyway exactly once.

    Project the frame down to the columns the consumers actually need
    BEFORE materializing — caching payload columns (raw text, binary)
    pins ~the whole corpus in memory at scale. The cache lives until
    the caller unpersists or clears it (bench.py clearCache()s between
    queries).
    """
    df.persist()
    df.count()
    return df
