"""Streaming semantic near-dup admission (Stream.dedupe_semantic):
embedding-level dedup across micro-batches via the persisted sign-LSH
index — the embedding twin of tests/test_dedupe_near_facade.py.

Same crafted-vector arithmetic as tests/test_embed_index.py: a basis
vector and its 0.04-perturbation have cosine ~0.9992 (near-dup at the
0.9 threshold); orthogonal basis vectors are never near-dups."""

from __future__ import annotations

import pytest
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

from python_stream_processing_framework_spark.streaming import Stream

SCHEMA = StructType(
    [
        StructField("vec_id", StringType()),
        StructField("embedding", ArrayType(DoubleType())),
    ]
)

_DIM = 16


def _vec(axis: int, eps_axis: int | None = None) -> list[float]:
    v = [0.0] * _DIM
    v[axis] = 1.0
    if eps_axis is not None:
        v[eps_axis] = 0.04
    return v


@pytest.fixture()
def stream(spark, tmp_path):
    return Stream(spark, str(tmp_path / "broker"))


def _ids(stream, topic):
    return sorted(r["vec_id"] for r in stream.read_topic(topic, SCHEMA).collect())


def test_dedupe_semantic_within_and_across_batches(stream):
    stream.dedupe_semantic("vecs", SCHEMA)
    # Batch 1: 1 ~ 2 collapse to the min id; 3 orthogonal.
    stream.emit(
        "vecs",
        {"vec_id": "1", "embedding": _vec(0)},
        {"vec_id": "2", "embedding": _vec(0, 5)},
        {"vec_id": "3", "embedding": _vec(1)},
    )
    stream.run_until_idle()
    assert _ids(stream, "vecs-unique") == ["1", "3"]

    # Batch 2: 4 near-dups ADMITTED vec 1 (cross-index); 5 is new.
    stream.emit(
        "vecs",
        {"vec_id": "4", "embedding": _vec(0, 7)},
        {"vec_id": "5", "embedding": _vec(2)},
    )
    stream.run_until_idle()
    assert _ids(stream, "vecs-unique") == ["1", "3", "5"]


def test_dedupe_semantic_null_vectors_pass_through(stream):
    """Null embeddings are admitted verbatim, never indexed — and a
    later real vector is still adjudicated against the index."""
    stream.dedupe_semantic("vecs", SCHEMA)
    stream.emit(
        "vecs",
        {"vec_id": "1", "embedding": None},
        {"vec_id": "2", "embedding": _vec(0)},
    )
    stream.run_until_idle()
    assert _ids(stream, "vecs-unique") == ["1", "2"]
    stream.emit("vecs", {"vec_id": "9", "embedding": _vec(0, 5)})  # ~2
    stream.run_until_idle()
    assert _ids(stream, "vecs-unique") == ["1", "2"]


@pytest.mark.slow
def test_dedupe_semantic_compacts_index_and_keeps_admitting(spark, tmp_path):
    import os

    broker = str(tmp_path / "broker")
    s = Stream(spark, broker)
    s.dedupe_semantic("vecs", SCHEMA, compact_every=1)
    s.emit(
        "vecs",
        {"vec_id": "1", "embedding": _vec(0)},
        {"vec_id": "3", "embedding": _vec(1)},
    )
    s.run_until_idle()
    s.emit("vecs", {"vec_id": "5", "embedding": _vec(2)})
    s.run_until_idle()  # batch_id 1 -> compaction after admit
    s.emit("vecs", {"vec_id": "9", "embedding": _vec(0, 7)})  # ~1 (batch 0)
    s.run_until_idle()
    assert _ids(s, "vecs-unique") == ["1", "3", "5"]
    sigs = os.path.join(broker, "_indexes", f"{s.name}-dedupe-semantic", "sigs")
    dirs = sorted(d for d in os.listdir(sigs) if d.startswith("batch="))
    assert len(dirs) <= 2, dirs
    assert any(d.startswith("batch=zz-compact-") for d in dirs), dirs


def test_dedupe_semantic_exactly_once_after_restart(spark, tmp_path):
    """A rebuilt facade over the same broker dir must not re-deliver
    or re-admit: the index and the sink both key on batch_id."""
    broker = str(tmp_path / "broker")
    s1 = Stream(spark, broker)
    s1.dedupe_semantic("vecs", SCHEMA)
    s1.emit(
        "vecs",
        {"vec_id": "1", "embedding": _vec(0)},
        {"vec_id": "3", "embedding": _vec(1)},
    )
    s1.run_until_idle()
    assert _ids(s1, "vecs-unique") == ["1", "3"]

    s2 = Stream(spark, broker)
    s2.dedupe_semantic("vecs", SCHEMA)
    s2.emit("vecs", {"vec_id": "9", "embedding": _vec(0, 5)})  # ~1
    s2.run_until_idle()
    assert _ids(s2, "vecs-unique") == ["1", "3"]
