"""DSIR importance resampling (operators/dsir.py): discrimination on
crafted corpora, empty-doc handling, determinism, and selection
modes."""

from __future__ import annotations

import math

import pytest

from python_stream_processing_framework_spark.operators.dsir import (
    dsir_log_ratios,
    dsir_scores,
    dsir_select,
    hashed_ngram_features,
)


@pytest.fixture(scope="module")
def corpora(spark):
    """Target: medical-flavored text. Raw pool: two lookalikes, two
    junk docs, one empty."""
    target = spark.createDataFrame(
        [
            (100, "patient dose trial clinical outcome"),
            (101, "dose outcome patient clinical measure"),
        ],
        "doc_id bigint, text string",
    )
    raw = spark.createDataFrame(
        [
            (1, "patient dose outcome clinical"),     # lookalike
            (2, "clinical trial dose patient"),       # lookalike
            (3, "buy cheap pills online casino now"), # junk
            (4, "click here free spins jackpot"),     # junk
            (5, ""),                                  # empty
        ],
        "doc_id bigint, text string",
    )
    return target, raw


@pytest.fixture(scope="module")
def scored(corpora):
    target, raw = corpora
    tf = hashed_ngram_features(target, "doc_id", "text", n_buckets=500)
    rf = hashed_ngram_features(raw, "doc_id", "text", n_buckets=500)
    ratios, unseen = dsir_log_ratios(tf, rf, n_buckets=500)
    return dsir_scores(raw, ratios, unseen, "doc_id", "text", n_buckets=500)


def test_lookalikes_outscore_junk(scored):
    w = {r["doc_id"]: r["log_weight"] for r in scored.collect()}
    assert len(w) == 5
    assert min(w[1], w[2]) > max(w[3], w[4])


def test_empty_doc_scores_zero(scored):
    row = {r["doc_id"]: r for r in scored.collect()}[5]
    assert row["n_grams"] == 0
    assert row["log_weight"] == 0.0


def test_topk_mode_selects_lookalikes(scored):
    # the empty doc's 0.0 weight can sit between a lookalike's small
    # positive/negative weight and the junk docs' strongly negative
    # ones (no evidence beats bad evidence) — exclude it to test the
    # evidence ranking itself
    sel = sorted(
        r["doc_id"]
        for r in dsir_select(
            scored.filter("doc_id != 5"), "doc_id", n=2, mode="topk"
        ).collect()
    )
    assert sel == [1, 2]
    with pytest.raises(ValueError, match="mode"):
        dsir_select(scored, "doc_id", n=2, mode="bogus")


def test_gumbel_deterministic_and_seed_sensitive(scored):
    a = [tuple(r) for r in dsir_select(scored, "doc_id", n=3, seed="s1").collect()]
    b = [tuple(r) for r in dsir_select(scored, "doc_id", n=3, seed="s1").collect()]
    assert a == b
    keys_s1 = {r["doc_id"]: r["sel_key"] for r in
               dsir_select(scored, "doc_id", n=5, seed="s1").collect()}
    keys_s2 = {r["doc_id"]: r["sel_key"] for r in
               dsir_select(scored, "doc_id", n=5, seed="s2").collect()}
    assert keys_s1 != keys_s2  # the Gumbel draw depends on the seed


def test_scores_partition_invariant(corpora):
    target, raw = corpora
    def run(t, r):
        tf = hashed_ngram_features(t, "doc_id", "text", n_buckets=500)
        rf = hashed_ngram_features(r, "doc_id", "text", n_buckets=500)
        ratios, unseen = dsir_log_ratios(tf, rf, n_buckets=500)
        out = dsir_scores(r, ratios, unseen, "doc_id", "text", n_buckets=500)
        return sorted(tuple(x) for x in out.collect())

    assert run(target, raw) == run(target.repartition(7), raw.repartition(5))


def test_scores_match_python_reference(spark):
    """Exact parity with a sequential reference over a corpus with
    bucket collisions forced (16 buckets): features, smoothing,
    nano quantization, unseen fallback, empty docs."""
    from collections import Counter

    docs = [
        (0, "a b a"), (1, "b c"), (2, "c a b c"), (3, ""),
        (4, "d d e"), (5, "a e d"), (6, "f"), (7, "b b b a"),
    ]
    n_buckets, add_k = 16, 0.5
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    target = df.filter("doc_id % 2 = 0")
    raw = df.filter("doc_id % 2 = 1")

    import hashlib

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:7], 16) % n_buckets

    def feats(text):
        toks = text.strip().lower().split()
        grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        return Counter(bucket(g) for g in grams)

    tgt = Counter()
    for i, t in docs:
        if i % 2 == 0:
            tgt.update(feats(t))
    rawc = Counter()
    for i, t in docs:
        if i % 2 == 1:
            rawc.update(feats(t))
    tt, tr = sum(tgt.values()), sum(rawc.values())

    def lr_nano(b):
        return round(
            (math.log((tgt.get(b, 0) + add_k) / (tt + add_k * n_buckets))
             - math.log((rawc.get(b, 0) + add_k) / (tr + add_k * n_buckets)))
            * 1e9
        )

    want = {}
    for i, t in docs:
        if i % 2 == 1:
            f = feats(t)
            s = sum(c * lr_nano(b) for b, c in f.items())
            want[i] = (sum(f.values()), round(s / 1e9, 6))

    tf = hashed_ngram_features(target, "doc_id", "text", n_buckets=n_buckets)
    rf = hashed_ngram_features(raw, "doc_id", "text", n_buckets=n_buckets)
    ratios, unseen = dsir_log_ratios(tf, rf, n_buckets=n_buckets, add_k=add_k)
    got = {
        r["doc_id"]: (r["n_grams"], r["log_weight"])
        for r in dsir_scores(
            raw, ratios, unseen, "doc_id", "text", n_buckets=n_buckets
        ).collect()
    }
    assert got == want
