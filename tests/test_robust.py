"""operators/robust.py: exact histogram median + MAD anomaly flags
against a brute-force Python reference, plus the size-gated broadcast
regimes. Inputs are integers so every comparison is engine-exact
(medians are x.0 or x.5, deviations 0.5-steps — all dyadic)."""

from __future__ import annotations

import statistics

from pyspark.sql import functions as F

from python_stream_processing_framework_spark.operators.common import release_caches
from python_stream_processing_framework_spark.operators.robust import (
    exact_median,
    mad_anomalies,
)

_ROWS = [
    # key a: odd n, clear outlier
    ("a", 10), ("a", 12), ("a", 11), ("a", 13), ("a", 1000),
    # key b: even n (continuous median = mean of middles)
    ("b", 1), ("b", 2), ("b", 3), ("b", 10),
    # key c: MAD = 0 (majority identical) -> any deviation flags
    ("c", 5), ("c", 5), ("c", 5), ("c", 6),
]


def _df(spark):
    return spark.createDataFrame(_ROWS, "k string, v bigint")


def _ref_median(vals):
    return float(statistics.median(vals))


def test_exact_median_matches_reference(spark):
    got = {
        r["k"]: r["median"]
        for r in exact_median(_df(spark), "k", "v").collect()
    }
    by_key = {}
    for k, v in _ROWS:
        by_key.setdefault(k, []).append(v)
    assert got == {k: _ref_median(vs) for k, vs in by_key.items()}


def test_mad_anomalies_matches_reference(spark):
    got = mad_anomalies(_df(spark), "k", "v", k=3.0).collect()
    by_key = {}
    for k, v in _ROWS:
        by_key.setdefault(k, []).append(v)
    med = {k: _ref_median(vs) for k, vs in by_key.items()}
    mad = {
        k: _ref_median([abs(x - med[k]) for x in vs])
        for k, vs in by_key.items()
    }
    for r in got:
        k, v = r["k"], r["v"]
        assert r["med"] == med[k]
        assert r["mad"] == mad[k]
        assert r["is_anomaly"] == (abs(v - med[k]) > 3.0 * mad[k])
    # the crafted facts the rows exist to pin:
    flags = {(r["k"], r["v"]): r["is_anomaly"] for r in got}
    assert flags[("a", 1000)] is True       # the outlier
    assert flags[("a", 11)] is False
    assert flags[("c", 6)] is True          # MAD=0: any deviation flags
    assert flags[("c", 5)] is False


def test_mad_anomalies_gate_exchange_regime(spark, monkeypatch):
    """Stat-table joins are size-gated: forcing the cap to 0 must not
    change a single flag (strategy changes, results don't)."""
    from python_stream_processing_framework_spark.operators import common

    def run():
        return sorted(
            (r["k"], r["v"], r["is_anomaly"])
            for r in mad_anomalies(_df(spark), "k", "v", k=3.0).collect()
        )

    try:
        default = run()
        monkeypatch.setattr(common, "BROADCAST_ROW_CAP", 0)
        assert run() == default
    finally:
        release_caches()
