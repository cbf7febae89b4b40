"""Streaming drift monitor (Stream.monitor_drift): per-source
total-variation distance of each micro-batch against a persisted
reference distribution — the streaming form of the token_drift /
source_drift catalog queries. Stateless per batch; exactly-once
across restarts; the reference is written once and never moved."""

from __future__ import annotations

import pytest
from pyspark.sql.types import LongType, StringType, StructField, StructType

from python_stream_processing_framework_spark.streaming import Stream

SCHEMA = StructType(
    [
        StructField("source", StringType()),
        StructField("text", StringType()),
    ]
)

OUT_SCHEMA = StructType(
    [
        StructField("batch_seq", LongType()),
        StructField("src", StringType()),
        StructField("n_tokens", LongType()),
        StructField("tv_ppm", LongType()),
    ]
)


@pytest.fixture()
def stream(spark, tmp_path):
    return Stream(spark, str(tmp_path / "broker"))


def _rows(stream, topic="docs-drift"):
    return {
        (r["batch_seq"], r["src"]): (r["n_tokens"], r["tv_ppm"])
        for r in stream.read_topic(topic, OUT_SCHEMA).collect()
    }


def _ref(spark):
    # reference distribution: a=2, b=2 (R=4)
    return spark.createDataFrame([("a a b b",)], "text string")


def test_drift_within_batch(stream, spark):
    stream.monitor_drift("docs", SCHEMA, reference=_ref(spark))
    stream.emit(
        "docs",
        {"source": "same", "text": "a a b b"},   # identical -> 0
        {"source": "new", "text": "c c"},        # disjoint -> 1e6
        # a=1 b=1 c=1 d=1, T=4: sum|c*4 - r*4| = 4+4+4+4 = 16;
        # absent-term 0; tv = 16e6 / (2*4*4) = 500000
        {"source": "half", "text": "a b c d"},
    )
    stream.run_until_idle()
    out = _rows(stream)
    assert out[(0, "same")] == (4, 0)
    assert out[(0, "new")] == (2, 1_000_000)
    assert out[(0, "half")] == (4, 500_000)


def test_drift_across_batches_stateless(stream, spark):
    """The reference never moves: the same text scores the same
    tv_ppm in every batch, no matter what earlier batches carried."""
    stream.monitor_drift("docs", SCHEMA, reference=_ref(spark))
    stream.emit("docs", {"source": "s1", "text": "c c"})
    stream.run_until_idle()
    stream.emit("docs", {"source": "s1", "text": "c c"})
    stream.run_until_idle()
    out = _rows(stream)
    assert out[(0, "s1")] == (2, 1_000_000)
    assert out[(1, "s1")] == (2, 1_000_000)


def test_drift_exactly_once_after_restart(spark, tmp_path):
    broker = str(tmp_path / "broker")
    s1 = Stream(spark, broker)
    s1.monitor_drift("docs", SCHEMA, reference=_ref(spark))
    s1.emit("docs", {"source": "s1", "text": "a a b b"})
    s1.run_until_idle()
    assert _rows(s1)[(0, "s1")] == (4, 0)

    # restart WITHOUT a reference frame: the persisted one is reused
    s2 = Stream(spark, broker)
    s2.monitor_drift("docs", SCHEMA)
    s2.emit("docs", {"source": "s2", "text": "c c"})
    s2.run_until_idle()
    out = _rows(s2)
    assert set(out) == {(0, "s1"), (1, "s2")}  # no batch-1 redelivery
    assert out[(1, "s2")] == (2, 1_000_000)


def test_drift_reference_written_once(spark, tmp_path):
    """A re-registration with a DIFFERENT reference frame must not
    move the yardstick — the persisted table wins."""
    broker = str(tmp_path / "broker")
    s1 = Stream(spark, broker)
    s1.monitor_drift("docs", SCHEMA, reference=_ref(spark))
    s1.emit("docs", {"source": "s1", "text": "c c"})
    s1.run_until_idle()

    s2 = Stream(spark, broker)
    other = spark.createDataFrame([("c c",)], "text string")
    s2.monitor_drift("docs", SCHEMA, reference=other)
    s2.emit("docs", {"source": "s1", "text": "c c"})
    s2.run_until_idle()
    out = _rows(s2)
    # still scored against the ORIGINAL a/b reference: fully disjoint
    assert out[(1, "s1")] == (2, 1_000_000)


def test_drift_requires_reference_first_time(spark, tmp_path):
    s = Stream(spark, str(tmp_path / "broker"))
    with pytest.raises(ValueError, match="reference"):
        s.monitor_drift("docs", SCHEMA)


def test_drift_redelivery_scores_identically(spark, tmp_path):
    """The exactly-once claim at the operator level: the reference is
    immutable, so re-running the same batch yields identical rows."""
    from python_stream_processing_framework_spark.operators.text import (
        drift_scores_batch,
        write_drift_reference,
    )

    ref_path = str(tmp_path / "ref")
    write_drift_reference(_ref(spark), ref_path)
    batch = spark.createDataFrame(
        [("s1", "a b c d"), ("s2", "c c")], "source string, text string"
    )
    one = sorted(tuple(r) for r in drift_scores_batch(batch, ref_path).collect())
    two = sorted(tuple(r) for r in drift_scores_batch(batch, ref_path).collect())
    assert one == two == [("s1", 4, 500_000), ("s2", 2, 1_000_000)]


def test_drift_empty_reference_convention(spark, tmp_path):
    from python_stream_processing_framework_spark.operators.text import (
        drift_scores_batch,
        write_drift_reference,
    )

    ref_path = str(tmp_path / "ref")
    empty = spark.createDataFrame([], "text string")
    assert write_drift_reference(empty, ref_path) == 0
    batch = spark.createDataFrame([("s1", "a b")], "source string, text string")
    rows = drift_scores_batch(batch, ref_path).collect()
    assert [tuple(r) for r in rows] == [("s1", 2, 1_000_000)]


def test_drift_null_text_source_still_accounted(stream, spark):
    """Every-source-accounted (r12 ADVICE), refined by the r13
    review: a source whose batch rows all carry NULL text must still
    emit its drift row — (n_tokens=0, maximal tv_ppm), from
    drift_scores_batch's own sources join, the SAME convention as
    the operator level. Null rows contribute zero tokens — the
    facade must NOT coalesce null to '' (that minted one phantom
    empty-string token per null row and distorted the TV of sources
    mixing null and real rows: 'mixed' below must score 0 against
    the matching reference, not drift upward)."""
    stream.monitor_drift("docs", SCHEMA, reference=_ref(spark))
    stream.emit(
        "docs",
        {"source": "dead", "text": None},
        {"source": "live", "text": "a a b b"},
        {"source": "mixed", "text": "a a b b"},
        {"source": "mixed", "text": None},
    )
    stream.run_until_idle()
    out = _rows(stream)
    assert out[(0, "dead")] == (0, 1_000_000)
    assert out[(0, "live")] == (4, 0)
    assert out[(0, "mixed")] == (4, 0)


def test_drift_scores_batch_tokenless_source_row(spark, tmp_path):
    """Operator-level form of the every-source-accounted rule: a
    null-text-only source explodes to zero token rows — it must
    still get a (0, 1e6) row, not silence. (The facade adds nothing
    on top: this sources join IS the accounting, r13 review.)"""
    from python_stream_processing_framework_spark.operators.text import (
        drift_scores_batch,
        write_drift_reference,
    )

    ref_path = str(tmp_path / "ref")
    write_drift_reference(_ref(spark), ref_path)
    batch = spark.createDataFrame(
        [("s1", None), ("s2", "a a b b")], "source string, text string"
    )
    rows = sorted(tuple(r) for r in drift_scores_batch(batch, ref_path).collect())
    assert rows == [("s1", 0, 1_000_000), ("s2", 4, 0)]


def _alerts(stream, topic="docs-drift-alerts"):
    return {
        (r["batch_seq"], r["src"]): (r["n_tokens"], r["tv_ppm"])
        for r in stream.read_topic(topic, OUT_SCHEMA).collect()
    }


@pytest.mark.slow
def test_drift_alert_hysteresis_planted_flip(stream, spark):
    """The r13 alarm contract (reference surfaces lag as threshold
    alerts, pspf/processor.py:260-281 — same posture for data
    drift): a planted distribution flip alerts only after
    `hysteresis` CONSECUTIVE exceeding batches, keeps firing while
    the shift holds (level-triggered), and stops when the source
    recovers. A steady control source never alerts."""
    stream.monitor_drift(
        "docs", SCHEMA, reference=_ref(spark),
        threshold_ppm=400_000, hysteresis=2,
    )
    flips = ["a a b b", "c c", "c c", "c c", "a a b b"]
    for text in flips:  # batch i: drifting source flips at batch 1
        stream.emit(
            "docs",
            {"source": "hot", "text": text},
            {"source": "ctl", "text": "a a b b"},
        )
        stream.run_until_idle()
    alerts = _alerts(stream)
    # batch 0: in-band; batch 1: first exceed (streak 1 < 2) — quiet;
    # batches 2-3: streak confirmed — fires each batch; batch 4:
    # recovery — quiet. Control never appears.
    assert set(alerts) == {(2, "hot"), (3, "hot")}
    assert alerts[(2, "hot")] == (2, 1_000_000)
    assert alerts[(3, "hot")] == (2, 1_000_000)


def test_drift_alert_absence_preserves_streak(stream, spark):
    """Streak counts a source's OWN observations: a batch the source
    sits out neither resets nor extends the run, so exceed /
    absent / exceed still confirms at hysteresis=2."""
    stream.monitor_drift(
        "docs", SCHEMA, reference=_ref(spark),
        threshold_ppm=400_000, hysteresis=2,
    )
    stream.emit("docs", {"source": "hot", "text": "c c"})
    stream.run_until_idle()
    stream.emit("docs", {"source": "other", "text": "a a b b"})
    stream.run_until_idle()
    stream.emit("docs", {"source": "hot", "text": "c c"})
    stream.run_until_idle()
    assert set(_alerts(stream)) == {(2, "hot")}


def test_drift_alert_threshold_is_strict(stream, spark):
    """tv_ppm == threshold_ppm is IN band (alerting is `>`): the
    half-shifted source scores exactly 500k and stays quiet."""
    stream.monitor_drift(
        "docs", SCHEMA, reference=_ref(spark),
        threshold_ppm=500_000, hysteresis=1,
    )
    stream.emit("docs", {"source": "edge", "text": "a b c d"})  # 500k
    stream.run_until_idle()
    stream.emit("docs", {"source": "edge", "text": "a b c d"})
    stream.run_until_idle()
    assert _alerts(stream) == {}


def test_drift_alert_no_threshold_no_topic(stream, spark):
    """Without threshold_ppm the facade is the raw gauge only — no
    alert rows are ever produced."""
    stream.monitor_drift("docs", SCHEMA, reference=_ref(spark))
    stream.emit("docs", {"source": "hot", "text": "c c"})
    stream.run_until_idle()
    assert _alerts(stream) == {}


def test_drift_alert_hysteresis_validated(stream, spark):
    with pytest.raises(ValueError, match="hysteresis"):
        stream.monitor_drift(
            "docs", SCHEMA, reference=_ref(spark),
            threshold_ppm=1, hysteresis=0,
        )


def test_drift_alert_target_must_differ_from_drift_target(stream, spark):
    """r13 ADVICE: alert rows share the drift topic's 4-column shape,
    so alerts pointed at the drift topic itself would be read back by
    the hysteresis history glob and corrupt the streak computation.
    Refused at registration — and BEFORE the write-once reference
    side effect, so the corrected retry starts clean."""
    with pytest.raises(ValueError, match="alert_target"):
        stream.monitor_drift(
            "docs", SCHEMA, reference=_ref(spark),
            threshold_ppm=1, alert_target="docs-drift",
        )
    # the failed registration wrote nothing: the retry still needs
    # (and accepts) the reference
    stream.monitor_drift(
        "docs", SCHEMA, reference=_ref(spark),
        threshold_ppm=1, alert_target="docs-alerts",
    )


@pytest.mark.slow
def test_drift_alert_edge_only_emits_streak_starts(stream, spark):
    """edge_only=True (r13 verdict #6): the pager contract — only
    STREAK-START rows. A flip that holds for three batches emits ONE
    edge (at confirmation); recovery emits nothing; a second flip
    emits exactly one more edge. Level-triggered rows for the same
    feed would be 5 (batches 2,3,4 then 7,8)."""
    stream.monitor_drift(
        "docs", SCHEMA, reference=_ref(spark),
        threshold_ppm=400_000, hysteresis=2, edge_only=True,
    )
    texts = [
        "a a b b",  # 0 in-band
        "c c", "c c", "c c",  # 1-3: exceed; streak confirms at 2
        "a a b b",  # 4 recover
        "c c", "c c", "c c",  # 5-7: second flip; confirms at 6
    ]
    for text in texts:
        stream.emit(
            "docs",
            {"source": "hot", "text": text},
            {"source": "ctl", "text": "a a b b"},
        )
        stream.run_until_idle()
    alerts = _alerts(stream)
    assert set(alerts) == {(2, "hot"), (6, "hot")}


def test_drift_alert_edge_only_redelivery_stable(spark, tmp_path):
    """The edge decision is a pure function of the drift topic up to
    the batch: a restart mid-stream redelivers byte-identical edge
    rows, never duplicates."""
    broker = str(tmp_path / "broker")
    kw = dict(threshold_ppm=400_000, hysteresis=2, edge_only=True)
    s1 = Stream(spark, broker)
    s1.monitor_drift("docs", SCHEMA, reference=_ref(spark), **kw)
    for text in ["c c", "c c"]:
        s1.emit("docs", {"source": "hot", "text": text})
        s1.run_until_idle()
    assert set(_alerts(s1)) == {(1, "hot")}
    s2 = Stream(spark, broker)
    s2.monitor_drift("docs", SCHEMA, **kw)
    s2.emit("docs", {"source": "hot", "text": "c c"})
    s2.run_until_idle()
    # batch 2 continues the streak: level would fire, edge stays quiet
    assert set(_alerts(s2)) == {(1, "hot")}
