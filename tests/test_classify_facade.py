"""Streaming probe serving (Stream.classify): per-document argmax
class under a persisted trained linear probe — the live form of the
probe_confusion serve step. Weights written once at registration;
pure-map stateless scoring; exactly-once across restarts; null and
wrong-dimension embeddings classify as the zero vector."""

from __future__ import annotations

import pytest
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    LongType,
    StructField,
    StructType,
)

from python_stream_processing_framework_spark.streaming import Stream

SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
    ]
)

OUT_SCHEMA = StructType(
    [
        StructField("batch_seq", LongType()),
        StructField("doc_id", LongType()),
        StructField("pred", LongType()),
        StructField("z_nano", LongType()),
    ]
)


@pytest.fixture()
def stream(spark, tmp_path):
    return Stream(spark, str(tmp_path / "broker"))


def _rows(stream, topic="docs-classes"):
    return {
        (r["batch_seq"], r["doc_id"]): (r["pred"], r["z_nano"])
        for r in stream.read_topic(topic, OUT_SCHEMA).collect()
    }


def _weights(spark):
    """Probe trained on the separable 2-class corpus from
    tests/test_probe.py (class 0 points at +e1, class 1 at +e2)."""
    from python_stream_processing_framework_spark.operators.probe import (
        linear_probe_train,
    )

    rows = [
        (0, 0, [0.9, 0.1, 0.05, -0.02]),
        (1, 0, [0.8, -0.1, 0.0, 0.03]),
        (2, 0, [1.0, 0.0, -0.04, 0.01]),
        (3, 1, [0.1, 0.9, -0.03, 0.02]),
        (4, 1, [-0.05, 0.95, 0.01, -0.01]),
        (5, 1, [0.0, 0.85, 0.04, 0.0]),
    ]
    df = spark.createDataFrame(
        rows, "vec_id bigint, label int, embedding array<float>"
    )
    return linear_probe_train(df, rounds=6, lr_ppb=800_000_000)


def test_classify_scores_and_zero_vector_fallback(stream, spark):
    stream.classify("docs", SCHEMA, weights=_weights(spark))
    stream.emit(
        "docs",
        {"doc_id": 1, "embedding": [0.95, 0.0, 0.0, 0.0]},   # class 0
        {"doc_id": 2, "embedding": [0.0, 0.9, 0.0, 0.0]},    # class 1
        {"doc_id": 3, "embedding": None},                     # zero vec
        {"doc_id": 4, "embedding": [1.0, 2.0]},              # wrong dim
    )
    stream.run_until_idle()
    out = _rows(stream)
    assert out[(0, 1)][0] == 0 and out[(0, 1)][1] > 0
    assert out[(0, 2)][0] == 1 and out[(0, 2)][1] > 0
    # null and wrong-dim both classify as the zero vector: z=0,
    # smallest label
    assert out[(0, 3)] == (0, 0)
    assert out[(0, 4)] == (0, 0)


def test_classify_weights_written_once(spark, tmp_path):
    """A re-registration with DIFFERENT weights must not swap the
    model — the persisted table wins (the tokenize discipline)."""
    broker = str(tmp_path / "broker")
    s1 = Stream(spark, broker)
    s1.classify("docs", SCHEMA, weights=_weights(spark))
    s1.emit("docs", {"doc_id": 1, "embedding": [0.95, 0.0, 0.0, 0.0]})
    s1.run_until_idle()
    assert _rows(s1)[(0, 1)][0] == 0

    # adversarial second registration: weights that would flip the
    # prediction (class 1 on dim 0)
    flipped = spark.createDataFrame(
        [(0, j, 0) for j in range(4)]
        + [(1, 0, 10**9)] + [(1, j, 0) for j in range(1, 4)],
        "label bigint, dim int, w_nano bigint",
    )
    s2 = Stream(spark, broker)
    s2.classify("docs", SCHEMA, weights=flipped)
    s2.emit("docs", {"doc_id": 2, "embedding": [0.95, 0.0, 0.0, 0.0]})
    s2.run_until_idle()
    out = _rows(s2)
    assert out[(1, 2)][0] == 0  # ORIGINAL model still serving
    assert set(out) == {(0, 1), (1, 2)}  # and no batch-0 redelivery


def test_classify_requires_weights_first_time(spark, tmp_path):
    s = Stream(spark, str(tmp_path / "broker"))
    with pytest.raises(ValueError, match="weights"):
        s.classify("docs", SCHEMA)


def test_classify_element_null_vector_falls_back_to_zero(stream, spark):
    """r13 ADVICE: a correct-LENGTH embedding containing null
    elements used to pass the guard, null the dot product, and
    degrade pred via null-struct ordering. It now classifies as the
    zero vector like null/wrong-dim inputs: (pred=0, z=0)."""
    stream.classify("docs", SCHEMA, weights=_weights(spark))
    stream.emit(
        "docs",
        {"doc_id": 1, "embedding": [0.95, None, 0.0, 0.0]},
        {"doc_id": 2, "embedding": [0.0, 0.9, 0.0, 0.0]},
    )
    stream.run_until_idle()
    out = _rows(stream)
    assert out[(0, 1)] == (0, 0)
    assert out[(0, 2)][0] == 1 and out[(0, 2)][1] > 0
