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


def test_exact_median_two_exchanges(spark):
    """The histogram median is two exchanges — (key, value) for the
    histogram, key for the cumulative window — and the final per-key
    aggregate REUSES the window's hash partitioning (no third
    shuffle). A refactor that breaks the reuse shows up here before
    it shows up as a 100 TB shuffle regression."""
    from python_stream_processing_framework_spark.plans import (
        assert_no_cartesian,
        count_exchanges,
    )

    df = spark.createDataFrame([("a", i) for i in range(100)], "k string, v bigint")
    med = exact_median(df, "k", "v")
    assert count_exchanges(med) == 2
    flagged = mad_anomalies(df, "k", "v")
    assert count_exchanges(flagged) <= 8  # 2 medians x 2 + dev/stat joins
    assert_no_cartesian(flagged)


def test_url_blocklist_gate_exchange_regime(spark, monkeypatch):
    """filter_url_blocklist's list side is user-supplied and unbounded
    in principle: forcing the gate closed must not change which docs
    survive (placed here with the other r9 gate-regime tests)."""
    from python_stream_processing_framework_spark.operators import common
    from python_stream_processing_framework_spark.operators.text import (
        filter_url_blocklist,
    )

    docs = spark.createDataFrame(
        [
            (1, "see http://spam.example.com/x now"),
            (2, "clean text, no links"),
            (3, "link to https://ok.example.org/page"),
        ],
        "doc_id bigint, text string",
    )
    bl = spark.createDataFrame([("spam.example.com",)], "domain string")

    def run():
        return sorted(
            r["doc_id"]
            for r in filter_url_blocklist(docs, "doc_id", "text", bl).collect()
        )

    try:
        default = run()
        monkeypatch.setattr(common, "BROADCAST_ROW_CAP", 0)
        assert run() == default == [2, 3]
    finally:
        release_caches()
