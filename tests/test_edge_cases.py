"""Degenerate-input robustness: empty text, single tokens, whitespace —
the inputs that break sequence()/slice() arithmetic if unguarded."""

from __future__ import annotations

import pytest

from python_stream_processing_framework_spark.operators.dedup import (
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_fingerprints,
    simhash_pairs,
)
from python_stream_processing_framework_spark.operators.text import (
    fingerprint,
    lang_id,
    quality_stats,
)

EDGE_DOCS = [
    (1, ""),
    (2, "   "),
    (3, "one"),
    (4, "two words"),
    (5, "three little words"),
    (6, "a much longer document with enough words for every shingle size"),
    (7, "a much longer document with enough words for every shingle size"),  # exact dup of 6
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(EDGE_DOCS, ["doc_id", "text"])


def test_minhash_survives_short_docs(docs):
    pairs = minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.5).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in pairs} == {(6, 7)}
    assert pairs[0]["jaccard"] == 1.0


def test_simhash_survives_short_docs(docs):
    fps = {r["doc_id"]: r["fingerprint"] for r in simhash_fingerprints(docs, "doc_id", "text").collect()}
    assert set(fps) == {1, 2, 3, 4, 5, 6, 7}  # even empty docs fingerprint
    assert fps[6] == fps[7]
    pairs = {(r["doc_a"], r["doc_b"]) for r in simhash_pairs(docs, "doc_id", "text").collect()}
    assert (6, 7) in pairs


def test_ngram_jaccard_survives_short_docs(docs):
    pairs = ngram_jaccard_pairs(docs, "doc_id", "text", shingle_k=2, threshold=0.8).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in pairs} == {(6, 7)}


def test_text_ops_survive_edge_docs(docs):
    q = {r["doc_id"]: r.asDict() for r in quality_stats(docs, "doc_id", "text").collect()}
    # empty text still yields a row (split('') -> ['']): n_tokens 1, 0 chars
    assert q[1]["n_tokens"] == 1 and q[1]["n_chars_trim"] == 0
    assert q[3]["n_tokens"] == 1 and q[3]["chars_per_token"] == 3.0
    lang = {r["doc_id"]: r["pred_lang"] for r in lang_id(docs, "doc_id", "text").collect()}
    assert set(lang) == {1, 2, 3, 4, 5, 6, 7}
    fp = {r["doc_id"]: r["fingerprint"] for r in fingerprint(docs, "doc_id", "text").collect()}
    assert fp[6] == fp[7] and fp[4] != fp[5]
