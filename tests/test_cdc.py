"""Content-defined chunking (operators/cdc.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_cdc_chunks_reconstruct_and_skip_blank(spark):
    """Chunks concatenate back to the normalized text; blank docs
    yield no rows."""
    from python_stream_processing_framework_spark.operators.cdc import cdc_chunks

    docs = _docs(
        spark,
        [
            (1, "Alpha beta " + " ".join(f"w{i}" for i in range(60))),
            (2, "   "),
            (3, "single"),
        ],
    )
    ch = cdc_chunks(docs).collect()
    assert not any(r["doc_id"] == 2 for r in ch)
    for d in (1, 3):
        txt = (
            docs.filter(F.col("doc_id") == d).collect()[0]["text"].strip().lower()
        )
        joined = " ".join(
            r["chunk_text"]
            for r in sorted(
                (x for x in ch if x["doc_id"] == d),
                key=lambda r: r["chunk_idx"],
            )
        )
        assert joined == txt
    idx1 = sorted(r["chunk_idx"] for r in ch if r["doc_id"] == 1)
    assert idx1 == list(range(len(idx1)))


def test_cdc_shift_invariance_marks_shared_passage(spark):
    """The CDC property: the same long passage embedded at DIFFERENT
    offsets in two docs produces identical interior chunks — dup_chunks
    catches it where fixed windows would mis-align."""
    from python_stream_processing_framework_spark.operators.cdc import (
        cdc_chunks,
        cdc_dup_stats,
    )

    shared = " ".join(f"p{i}" for i in range(150))
    docs = _docs(
        spark,
        [
            (1, "intro text here " + shared + " tail one"),
            (2, "completely different preamble words go first " + shared),
            (3, "no reuse at all " + " ".join(f"u{i}" for i in range(30))),
        ],
    )
    ch = cdc_chunks(docs).collect()
    h1 = {r["chunk_hash"] for r in ch if r["doc_id"] == 1}
    h2 = {r["chunk_hash"] for r in ch if r["doc_id"] == 2}
    n_shared = len(h1 & h2)
    assert n_shared >= 5, "interior chunks of the shared passage must align"
    st = {
        r["doc_id"]: (r["n_chunks"], r["dup_chunks"])
        for r in cdc_dup_stats(docs).collect()
    }
    assert st[1][1] == n_shared and st[2][1] == n_shared
    assert st[3] == (st[3][0], 0)


def test_cdc_validates(spark):
    from python_stream_processing_framework_spark.operators.cdc import cdc_chunks

    docs = _docs(spark, [(1, "a b c")])
    with pytest.raises(ValueError, match="w must be"):
        cdc_chunks(docs, w=0)
    with pytest.raises(ValueError, match="divisor"):
        cdc_chunks(docs, divisor=1)


def test_cdc_chunking_is_map_only(spark):
    from python_stream_processing_framework_spark.operators.cdc import cdc_chunks
    from python_stream_processing_framework_spark.plans import count_exchanges

    docs = _docs(spark, [(1, "a b c d e f g h i j")])
    assert count_exchanges(cdc_chunks(docs)) == 0
