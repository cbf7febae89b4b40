"""Streaming semantic decontamination (Stream.decontaminate_semantic):
the embedding-space member of the decontamination family as a facade —
held-out signatures persisted once at registration, every micro-batch
adjudicated statelessly against them, clean/flagged split delivered
exactly-once. Mirrors tests/test_dedupe_semantic_facade.py's crafted
vectors: a basis vector and its 0.04-perturbation have cosine ~0.9992
(contaminated at the 0.9 threshold); orthogonal vectors never flag.
"""

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


def _heldout(spark, *axes: int):
    return spark.createDataFrame(
        [(f"h{a}", _vec(a)) for a in axes], SCHEMA
    )


@pytest.fixture()
def stream(spark, tmp_path):
    return Stream(spark, str(tmp_path / "broker"))


def _ids(stream, topic):
    return sorted(r["vec_id"] for r in stream.read_topic(topic, SCHEMA).collect())


def test_decontaminate_semantic_within_batch_split(spark, stream):
    """Paraphrase-shaped near-dups of held-out vectors flag; the
    orthogonal rest flows clean — both topics populated from one
    batch."""
    stream.decontaminate_semantic("vecs", SCHEMA, _heldout(spark, 0, 1))
    stream.emit(
        "vecs",
        {"vec_id": "1", "embedding": _vec(0, 5)},  # ~ h0: flagged
        {"vec_id": "2", "embedding": _vec(1)},     # == h1: flagged
        {"vec_id": "3", "embedding": _vec(2)},     # orthogonal: clean
    )
    stream.run_until_idle()
    assert _ids(stream, "vecs-clean") == ["3"]
    assert _ids(stream, "vecs-contaminated") == ["1", "2"]


def test_decontaminate_semantic_across_batches_same_signatures(spark, stream):
    """The persisted held-out signatures adjudicate EVERY batch the
    same way — a later batch's near-dup still flags."""
    stream.decontaminate_semantic("vecs", SCHEMA, _heldout(spark, 0))
    stream.emit("vecs", {"vec_id": "1", "embedding": _vec(2)})
    stream.run_until_idle()
    stream.emit(
        "vecs",
        {"vec_id": "2", "embedding": _vec(0, 7)},  # ~ h0: flagged
        {"vec_id": "3", "embedding": _vec(3)},
    )
    stream.run_until_idle()
    assert _ids(stream, "vecs-clean") == ["1", "3"]
    assert _ids(stream, "vecs-contaminated") == ["2"]


def test_decontaminate_semantic_null_vectors_pass_clean(spark, stream):
    stream.decontaminate_semantic("vecs", SCHEMA, _heldout(spark, 0))
    stream.emit(
        "vecs",
        {"vec_id": "1", "embedding": None},
        {"vec_id": "2", "embedding": _vec(0)},
    )
    stream.run_until_idle()
    assert _ids(stream, "vecs-clean") == ["1"]
    assert _ids(stream, "vecs-contaminated") == ["2"]


def test_decontaminate_semantic_empty_heldout_passthrough(spark, stream):
    """An all-null held-out set can flag nothing: everything clean,
    no signatures persisted."""
    heldout = spark.createDataFrame([("h", None)], SCHEMA)
    stream.decontaminate_semantic("vecs", SCHEMA, heldout)
    stream.emit("vecs", {"vec_id": "1", "embedding": _vec(0)})
    stream.run_until_idle()
    assert _ids(stream, "vecs-clean") == ["1"]


@pytest.mark.slow
def test_decontaminate_semantic_exactly_once_after_restart(spark, tmp_path):
    """A rebuilt facade over the same broker dir re-reads the
    persisted signatures and must not re-deliver: sink writes key on
    batch_id, the checkpoint carries the source offsets."""
    broker = str(tmp_path / "broker")
    s1 = Stream(spark, broker)
    s1.decontaminate_semantic("vecs", SCHEMA, _heldout(spark, 0))
    s1.emit(
        "vecs",
        {"vec_id": "1", "embedding": _vec(0, 5)},  # flagged
        {"vec_id": "2", "embedding": _vec(1)},     # clean
    )
    s1.run_until_idle()
    assert _ids(s1, "vecs-clean") == ["2"]
    assert _ids(s1, "vecs-contaminated") == ["1"]

    s2 = Stream(spark, broker)
    s2.decontaminate_semantic("vecs", SCHEMA, _heldout(spark, 0))
    s2.emit("vecs", {"vec_id": "3", "embedding": _vec(0, 7)})  # flagged
    s2.run_until_idle()
    assert _ids(s2, "vecs-clean") == ["2"]
    assert _ids(s2, "vecs-contaminated") == ["1", "3"]
