"""Streaming near-dup admission (Stream.dedupe_near): content-level
dedup across micro-batches via the persisted MinHash index.

Same crafted-text arithmetic as tests/test_dedup_index.py: 40-token
docs, one-word edit = Jaccard 0.854 (near-dup at 0.8), distinct
prefixes = unrelated.
"""

from __future__ import annotations

import pytest
from pyspark.sql.types import StringType, StructField, StructType

from python_stream_processing_framework_spark.streaming import Stream

SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("text", StringType()),
    ]
)


def _text(changes: dict[int, str] | None = None, prefix: str = "alpha") -> str:
    toks = [f"{prefix}{i}" for i in range(40)]
    for pos, word in (changes or {}).items():
        toks[pos] = word
    return " ".join(toks)


_A = _text()
_B = _text({20: "editB"})        # ~A
_D = _text({10: "editD"})        # ~A
_C = _text(prefix="beta")        # distinct
_E = _text(prefix="gamma")       # distinct


@pytest.fixture()
def stream(spark, tmp_path):
    return Stream(spark, str(tmp_path / "broker"))


def _ids(stream, topic):
    return sorted(r["doc_id"] for r in stream.read_topic(topic, SCHEMA).collect())


def test_dedupe_near_within_and_across_batches(stream):
    stream.dedupe_near("docs", SCHEMA)
    # Batch 1: A~B collapse to the min id; C distinct.
    stream.emit(
        "docs",
        {"doc_id": "1", "text": _A},
        {"doc_id": "2", "text": _B},
        {"doc_id": "3", "text": _C},
    )
    stream.run_until_idle()
    assert _ids(stream, "docs-unique") == ["1", "3"]

    # Batch 2: D near-dups ADMITTED doc 1 (content changed, id new —
    # key-level dedupe would pass it); E is genuinely new.
    stream.emit(
        "docs",
        {"doc_id": "4", "text": _D},
        {"doc_id": "5", "text": _E},
    )
    stream.run_until_idle()
    assert _ids(stream, "docs-unique") == ["1", "3", "5"]


def test_dedupe_near_compacts_index_and_keeps_admitting(spark, tmp_path):
    """compact_every folds committed batch partitions; admission
    decisions afterwards are unchanged (doc ~ a pre-compaction admit
    still drops) and delivered output is unaffected."""
    import os

    broker = str(tmp_path / "broker")
    s = Stream(spark, broker)
    # compact after every batch (batch_id 1, 2, ... all trigger)
    s.dedupe_near("docs", SCHEMA, compact_every=1)
    s.emit("docs", {"doc_id": "1", "text": _A}, {"doc_id": "3", "text": _C})
    s.run_until_idle()
    s.emit("docs", {"doc_id": "5", "text": _E})
    s.run_until_idle()  # batch_id 1 -> compaction runs after admit
    s.emit("docs", {"doc_id": "9", "text": _B})  # ~A (admitted in batch 0)
    s.run_until_idle()
    assert _ids(s, "docs-unique") == ["1", "3", "5"]
    sigs = os.path.join(broker, "_indexes", f"{s.name}-dedupe-near", "sigs")
    dirs = sorted(d for d in os.listdir(sigs) if d.startswith("batch="))
    # generations fold: compacted partitions + at most the retained
    # current tag — never one directory per historical batch
    assert len(dirs) <= 2, dirs
    assert any(d.startswith("batch=zz-compact-") for d in dirs), dirs


def test_dedupe_near_exactly_once_after_restart(spark, tmp_path):
    """A rebuilt facade over the same broker dir must not re-deliver
    or re-admit: the index and the sink both key on batch_id."""
    broker = str(tmp_path / "broker")
    s1 = Stream(spark, broker)
    s1.dedupe_near("docs", SCHEMA)
    s1.emit("docs", {"doc_id": "1", "text": _A}, {"doc_id": "3", "text": _C})
    s1.run_until_idle()
    assert _ids(s1, "docs-unique") == ["1", "3"]

    # "Restart": new facade instance, same broker/checkpoints. The
    # processed batch replays nothing; a near-dup of an indexed doc
    # still drops.
    s2 = Stream(spark, broker)
    s2.dedupe_near("docs", SCHEMA)
    s2.emit("docs", {"doc_id": "9", "text": _B})  # ~A, admitted earlier
    s2.run_until_idle()
    assert _ids(s2, "docs-unique") == ["1", "3"]
