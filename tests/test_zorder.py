"""Z-order layout: Morton-code exactness and the file-locality payoff."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

from python_stream_processing_framework_spark.catalog import load
from python_stream_processing_framework_spark.operators.zorder import (
    z_sql,
    z_value,
    zorder_write,
)


def _ref_z(xs: list[int], bits: int) -> int:
    k = len(xs)
    out = 0
    for b in range(bits):
        for i, x in enumerate(xs):
            out |= ((x >> b) & 1) << (k * b + i)
    return out


def test_z_value_matches_reference(spark):
    rows = [(a, b) for a in (0, 1, 5, 4095, 2048) for b in (0, 3, 4095, 170)]
    df = spark.createDataFrame(rows, ["a", "b"])
    got = {
        (r["a"], r["b"]): r["z"]
        for r in df.withColumn("z", z_value([F.col("a"), F.col("b")], 12)).collect()
    }
    for a, b in rows:
        assert got[(a, b)] == _ref_z([a, b], 12)


def test_z_sql_matches_z_value(spark):
    """The SQL generator and the Column generator are one algorithm:
    evaluate both in Spark and compare."""
    df = spark.range(0, 1000).select(
        (F.col("id") % 997).alias("a"), ((F.col("id") * 31) % 4096).alias("b")
    )
    out = df.select(
        z_value([F.col("a"), F.col("b")], 12).alias("z_col"),
        F.expr(z_sql(["a", "b"], 12)).alias("z_sql"),
    )
    assert out.filter(F.col("z_col") != F.col("z_sql")).count() == 0


def test_z_value_rejects_overflow():
    with pytest.raises(ValueError):
        z_value([F.col("a"), F.col("b")], 32)


def test_zorder_write_clusters_both_dimensions(spark, tmp_path):
    """Each z-clustered file must hold a small rectangle of the
    (user, minute) space: mean per-file span far below the global
    span on BOTH dimensions — the min/max data-skipping property.
    A single-dimension sort can only achieve this on one axis."""
    (events,) = load(spark, SF_SMOKE, "events")
    # Morton needs dimensions normalized to COMPARABLE ranges (module
    # docstring): sf0.001 has ~15 users, so scale user_id into the
    # 12-bit space; minutes are taken cyclic mod 4096.
    u = (F.col("user_id") * F.lit(256)).bitwiseAND(F.lit(4095))
    m = F.expr("unix_micros(ts) div 60000000").bitwiseAND(F.lit(4095))
    df = events.select(u.alias("u"), m.alias("m"))
    zorder_write(df, str(tmp_path / "z"), [F.col("u"), F.col("m")], 12, 16)

    back = spark.read.parquet(str(tmp_path / "z"))
    per_file = (
        back.groupBy(F.input_file_name().alias("f"))
        .agg(
            (F.max("u") - F.min("u")).alias("du"),
            (F.max("m") - F.min("m")).alias("dm"),
            F.min("_z").alias("z_lo"),
            F.max("_z").alias("z_hi"),
        )
        .collect()
    )
    assert len(per_file) >= 8
    glob = df.agg(
        (F.max("u") - F.min("u")).alias("du"), (F.max("m") - F.min("m")).alias("dm")
    ).collect()[0]
    mean_du = sum(r["du"] for r in per_file) / len(per_file)
    mean_dm = sum(r["dm"] for r in per_file) / len(per_file)
    assert mean_du < 0.6 * glob["du"], (mean_du, glob["du"])
    assert mean_dm < 0.6 * glob["dm"], (mean_dm, glob["dm"])

    # repartitionByRange => files own disjoint z ranges.
    spans = sorted((r["z_lo"], r["z_hi"]) for r in per_file)
    for (lo1, hi1), (lo2, _hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2
