"""Streaming paragraph-grain near-dup admission
(Stream.dedupe_near(granularity="paragraph"), r13 verdict #4): a live
feed's paragraphs fuzzy-dedup against everything previously admitted,
and documents forward REBUILT without their losing paragraphs.

Paragraph arithmetic mirrors tests/test_dedup_index.py: 40-token
paragraphs, a one-word edit replaces 3 of the 38 3-shingles, Jaccard
= 35/41 = 0.854 (a near-dup at 0.8); bands=8 x rows=2 makes band
recall at that similarity effectively certain (and md5 minhash is
deterministic, so the assertion is stable).
"""

from __future__ import annotations

import pytest
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from python_stream_processing_framework_spark.streaming import Stream

SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("text", StringType()),
    ]
)

OUT_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("text", StringType()),
        StructField("n_paras", LongType()),
        StructField("n_removed", LongType()),
    ]
)


_KW = dict(num_hashes=16, bands=8, shingle_k=3, threshold=0.8)


def _para(changes: dict[int, str] | None = None, prefix: str = "alpha") -> str:
    toks = [f"{prefix}{i}" for i in range(40)]
    for pos, word in (changes or {}).items():
        toks[pos] = word
    return " ".join(toks)


_P = _para()                      # the templated banner
_PE = _para({20: "edit"})         # ~P (j = 35/41 = 0.854)
_Q = _para(prefix="beta")         # distinct
_R = _para(prefix="gamma")        # distinct
_S = _para(prefix="delta")        # distinct


@pytest.fixture()
def stream(spark, tmp_path):
    return Stream(spark, str(tmp_path / "broker"))


def _docs(stream, topic="docs-unique"):
    return {
        r["doc_id"]: (r["text"], r["n_paras"], r["n_removed"])
        for r in stream.read_topic(topic, OUT_SCHEMA).collect()
    }


def test_paragraph_dedupe_within_and_across_batches(stream):
    stream.dedupe_near("docs", SCHEMA, granularity="paragraph", **_KW)
    # Batch 0: doc 1 carries the banner + unique content; doc 2
    # carries a one-word-edited banner (near-dup, positionally later)
    # + its own content
    stream.emit(
        "docs",
        {"doc_id": "1", "text": _P + "\n" + _Q},
        {"doc_id": "2", "text": _PE + "\n" + _R},
    )
    stream.run_until_idle()
    out = _docs(stream)
    # doc 1 keeps both paragraphs (positionally first banner wins)
    assert out["1"] == (_P + "\n" + _Q, 2, 0)
    # doc 2 loses its banner variant, keeps its content
    assert out["2"] == (_R, 2, 1)

    # Batch 1: a fresh doc re-sends another banner edit (near-dups
    # the ADMITTED batch-0 banner) + new content
    stream.emit(
        "docs", {"doc_id": "3", "text": _para({10: "other"}) + "\n" + _S}
    )
    stream.run_until_idle()
    out = _docs(stream)
    assert out["3"] == (_S, 2, 1)


def test_paragraph_dedupe_exactly_once_after_restart(spark, tmp_path):
    """Facade restart over the same broker: committed batches replay
    nothing; the paragraph index keeps adjudicating."""
    broker = str(tmp_path / "broker")
    s1 = Stream(spark, broker)
    s1.dedupe_near("docs", SCHEMA, granularity="paragraph", **_KW)
    s1.emit("docs", {"doc_id": "1", "text": _P + "\n" + _Q})
    s1.run_until_idle()
    assert set(_docs(s1)) == {"1"}

    s2 = Stream(spark, broker)
    s2.dedupe_near("docs", SCHEMA, granularity="paragraph", **_KW)
    s2.emit("docs", {"doc_id": "9", "text": _PE + "\n" + _R})
    s2.run_until_idle()
    out = _docs(s2)
    assert set(out) == {"1", "9"}  # batch 0 not re-delivered
    assert out["9"] == (_R, 2, 1)


@pytest.mark.slow
def test_paragraph_admit_redelivery_self_excludes(spark, tmp_path):
    """Crash-window contract at the operator level: re-running the
    SAME batch tag (a foreachBatch redelivery after the index write
    landed but the sink commit did not) re-adjudicates against all
    OTHER batches only — its own partial write never collides, so
    the rebuilt output is byte-identical."""
    from python_stream_processing_framework_spark.operators.common import (
        release_caches,
    )
    from python_stream_processing_framework_spark.operators.paragraphs import (
        dedup_paragraphs_near_admit,
    )

    idx = str(tmp_path / "pidx")
    batch = spark.createDataFrame(
        [("1", _P + "\n" + _Q), ("2", _PE + "\n" + _R)],
        "doc_id string, text string",
    )
    try:
        first = sorted(
            tuple(r)
            for r in dedup_paragraphs_near_admit(batch, idx, "0", **_KW).collect()
        )
        again = sorted(
            tuple(r)
            for r in dedup_paragraphs_near_admit(batch, idx, "0", **_KW).collect()
        )
        assert first == again
        assert [t[3] for t in first] == [0, 1]  # doc 2 lost its banner
    finally:
        release_caches()


def test_paragraph_dedupe_positional_survivor_numeric_ids(spark, tmp_path):
    """The batch operator keeps the POSITIONALLY first member of a
    near-dup component; the streaming index keeps the string-min
    composite key. The zero-padded composite makes these agree even
    for numeric ids where 2 < 10 but '2' > '10'."""
    from python_stream_processing_framework_spark.operators.common import (
        release_caches,
    )
    from python_stream_processing_framework_spark.operators.paragraphs import (
        dedup_paragraphs_near_admit,
    )

    idx = str(tmp_path / "pidx")
    batch = spark.createDataFrame(
        [(2, _P), (10, _PE)], "doc_id bigint, text string"
    )
    try:
        out = {
            r["doc_id"]: r["n_removed"]
            for r in dedup_paragraphs_near_admit(batch, idx, "0", **_KW).collect()
        }
        # doc 2 is positionally first (numeric order), so IT survives
        assert out == {2: 0, 10: 1}
    finally:
        release_caches()


def test_paragraph_dedupe_positional_survivor_prefix_string_ids(
    spark, tmp_path
):
    """Prefix-related STRING ids ('doc1' < 'doc10' positionally):
    with a printable separator the composite inverts (':' > '0' so
    'doc1:...' > 'doc10...'), which made the streaming admit keep
    doc10 while the batch operator keeps doc1 — the r14 ADVICE
    finding. The \\x01 separator sorts below every printable char,
    restoring the string-min == positional-min contract."""
    from python_stream_processing_framework_spark.operators.common import (
        release_caches,
    )
    from python_stream_processing_framework_spark.operators.paragraphs import (
        dedup_paragraphs_near,
        dedup_paragraphs_near_admit,
    )

    idx = str(tmp_path / "pidx")
    batch = spark.createDataFrame(
        [("doc1", _P), ("doc10", _PE)], "doc_id string, text string"
    )
    try:
        admit = {
            r["doc_id"]: r["n_removed"]
            for r in dedup_paragraphs_near_admit(
                batch, idx, "0", **_KW
            ).collect()
        }
        ref = {
            r["doc_id"]: r["n_removed"]
            for r in dedup_paragraphs_near(batch, **_KW).collect()
        }
        # 'doc1' < 'doc10' in struct order, so doc1's paragraph
        # survives in BOTH tiers
        assert admit == ref == {"doc1": 0, "doc10": 1}
    finally:
        release_caches()


def test_paragraph_dedupe_negative_numeric_id_refused(spark, tmp_path):
    """Zero-padding cannot positionally order a leading '-': negative
    numeric doc ids are refused at execution rather than silently
    degrading to a non-positional survivor (r14 verdict #6)."""
    from python_stream_processing_framework_spark.operators.common import (
        release_caches,
    )
    from python_stream_processing_framework_spark.operators.paragraphs import (
        dedup_paragraphs_near_admit,
    )

    idx = str(tmp_path / "pidx")
    batch = spark.createDataFrame(
        [(-2, _P), (10, _PE)], "doc_id bigint, text string"
    )
    try:
        with pytest.raises(Exception, match="negative numeric doc id"):
            dedup_paragraphs_near_admit(batch, idx, "0", **_KW).collect()
    finally:
        release_caches()


def test_paragraph_dedupe_short_paragraphs_never_drop(spark, tmp_path):
    """Paragraphs shorter than shingle_k tokens carry no signature:
    admitted verbatim, never indexed, never dropped — the module-wide
    MinHash recall floor, inherited from the batch operator."""
    from python_stream_processing_framework_spark.operators.common import (
        release_caches,
    )
    from python_stream_processing_framework_spark.operators.paragraphs import (
        dedup_paragraphs_near_admit,
    )

    idx = str(tmp_path / "pidx")
    b0 = spark.createDataFrame([("1", "hi there")], "doc_id string, text string")
    b1 = spark.createDataFrame([("2", "hi there")], "doc_id string, text string")
    try:
        dedup_paragraphs_near_admit(b0, idx, "0", **_KW).collect()
        (r,) = dedup_paragraphs_near_admit(b1, idx, "1", **_KW).collect()
        assert (r["text"], r["n_removed"]) == ("hi there", 0)
    finally:
        release_caches()


def test_paragraph_dedupe_granularity_validated(stream):
    with pytest.raises(ValueError, match="granularity"):
        stream.dedupe_near("docs", SCHEMA, granularity="sentence")
