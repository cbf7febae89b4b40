"""Streaming char-n-gram classifier serving (Stream.classify_text):
per-document argmax class under a persisted trained charclf model —
the TEXT-side sibling of Stream.classify (which gates on frozen
embeddings). Model written once at registration with the
featurization knobs stamped in; stateless one-shuffle scoring;
exactly-once across restarts; null/zero-gram text scores on priors."""

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
        StructField("batch_seq", LongType()),
        StructField("doc_id", StringType()),
        StructField("pred", StringType()),
        StructField("score_nano", LongType()),
    ]
)

TRAIN = [
    (0, "the cat sat on the mat and the dog slept", "en"),
    (1, "a small house with three rooms and a garden", "en"),
    (2, "le chat dort sur le lit dans la maison", "fr"),
    (3, "un petit jardin avec des fleurs et des arbres", "fr"),
]


@pytest.fixture()
def stream(spark, tmp_path):
    return Stream(spark, str(tmp_path / "broker"))


def _model(spark):
    from python_stream_processing_framework_spark.operators.charclf import (
        charclf_train,
    )

    df = spark.createDataFrame(TRAIN, "doc_id bigint, text string, lang string")
    return charclf_train(df, "doc_id", "text", "lang", n=3, n_buckets=256)


def _rows(stream, topic="docs-textclass"):
    return {
        r["doc_id"]: (r["pred"], r["score_nano"])
        for r in stream.read_topic(topic, OUT_SCHEMA).collect()
    }


def test_classify_text_matches_batch_predict(stream, spark):
    """Streamed verdicts equal the batch operator's on identical
    inputs — including the null-text prior-only row."""
    from python_stream_processing_framework_spark.operators.charclf import (
        charclf_predict,
    )

    stream.classify_text(
        "docs", SCHEMA, model=_model(spark), n=3, n_buckets=256
    )
    docs = [
        ("a", "the cats sleep on the warm mat"),
        ("b", "le chats dorment sur le lit"),
        ("c", None),  # zero-gram: priors alone
    ]
    stream.emit("docs", *[{"doc_id": i, "text": t} for i, t in docs])
    stream.run_until_idle()
    got = _rows(stream)
    batch = spark.createDataFrame(docs, "doc_id string, text string")
    want = {
        r["doc_id"]: (r["pred"], r["score_nano"])
        for r in charclf_predict(
            batch,
            _model(spark),
            "doc_id",
            "text",
            n=3,
            n_buckets=256,
        ).collect()
    }
    assert got == want
    assert got["a"][0] == "en" and got["b"][0] == "fr"


def test_classify_text_model_written_once_and_knobs_stamped(spark, tmp_path):
    """Restarts reuse the persisted model (no retrain drift); a
    re-registration under DIFFERENT featurization knobs is refused —
    grams would hash into the wrong bucket space."""
    broker = str(tmp_path / "broker")
    s1 = Stream(spark, broker)
    s1.classify_text("docs", SCHEMA, model=_model(spark), n=3, n_buckets=256)
    s1.emit("docs", {"doc_id": "a", "text": "the cat sat"})
    s1.run_until_idle()

    # same broker, no model passed: persisted table reused
    s2 = Stream(spark, broker)
    s2.classify_text("docs", SCHEMA, n=3, n_buckets=256)
    s2.emit("docs", {"doc_id": "b", "text": "le chat dort"})
    s2.run_until_idle()
    got = _rows(s2)
    assert set(got) == {"a", "b"}  # batch 0 not re-delivered
    assert got["b"][0] == "fr"

    s3 = Stream(spark, broker)
    with pytest.raises(ValueError, match="n_buckets"):
        s3.classify_text("docs", SCHEMA, n=4, n_buckets=256)
    with pytest.raises(ValueError, match="n_buckets"):
        s3.classify_text("docs", SCHEMA, n=3, n_buckets=512)


def test_classify_text_requires_model_first_time(spark, tmp_path):
    s = Stream(spark, str(tmp_path / "broker"))
    with pytest.raises(ValueError, match="trained `model`"):
        s.classify_text("docs", SCHEMA)
