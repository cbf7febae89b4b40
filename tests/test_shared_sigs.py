"""Signature-reuse contract (r9): minhash_signatures shared between
pair mining and cross-corpus joins must be EXACTLY output-equivalent
to each operator signing for itself — the MinHash twin of
similarity.sign_signatures sharing. Uses the crafted 40-token corpus
arithmetic of tests/test_dedup_index.py (one-word edit = Jaccard
35/41 = 0.854)."""

from __future__ import annotations

from pyspark.sql import functions as F

from python_stream_processing_framework_spark.operators.common import release_caches
from python_stream_processing_framework_spark.operators.dedup import (
    decontaminate,
    dedup_corpus,
    minhash_lsh_join,
    minhash_lsh_pairs,
    minhash_signatures,
)

_KW = dict(num_hashes=16, bands=8, shingle_k=3, threshold=0.8)


def _text(changes: dict[int, str] | None = None, prefix: str = "alpha") -> str:
    toks = [f"{prefix}{i}" for i in range(40)]
    for pos, word in (changes or {}).items():
        toks[pos] = word
    return " ".join(toks)


def _docs(spark, items):
    return spark.createDataFrame(list(items), ["doc_id", "text"])


def test_pairs_with_shared_sigs_identical(spark):
    docs = _docs(
        spark,
        [
            (1, _text()),
            (2, _text({20: "editB"})),          # ~1
            (3, _text(prefix="beta")),
            (4, _text()),                        # exact copy of 1
        ],
    )
    try:
        direct = sorted(
            (r["doc_a"], r["doc_b"], r["jaccard"])
            for r in minhash_lsh_pairs(docs, "doc_id", "text", **_KW).collect()
        )
        sigs = minhash_signatures(
            docs, "doc_id", "text", num_hashes=16, shingle_k=3
        )
        shared = sorted(
            (r["doc_a"], r["doc_b"], r["jaccard"])
            for r in minhash_lsh_pairs(
                docs, "doc_id", "text", sigs=sigs, **_KW
            ).collect()
        )
        assert shared == direct and direct  # non-empty: 1~2, 1=4, 2~4
    finally:
        release_caches()


def test_decontaminate_with_kept_sigs_identical(spark):
    """The composed dedup -> decontaminate chain reusing the corpus
    signature frame (kept-filtered, _members reset) must keep exactly
    the docs the self-signing chain keeps. Sound because dedup keeps
    each component's MIN id, which is always its exact-cluster
    representative — so every kept doc has its own signature row."""
    corpus = _docs(
        spark,
        [
            (1, _text()),
            (2, _text({20: "editB"})),           # ~1 -> loser
            (3, _text(prefix="beta")),           # survives, contaminated
            (5, _text(prefix="gamma")),          # survives, clean
            (6, _text()),                        # exact copy of 1 -> loser
        ],
    )
    heldout = _docs(spark, [(100, _text(prefix="beta", changes={7: "editH"}))])
    try:
        def chain(shared: bool):
            if shared:
                sigs = minhash_signatures(
                    corpus, "doc_id", "text", num_hashes=16, shingle_k=3
                )
                pairs = minhash_lsh_pairs(
                    corpus, "doc_id", "text", sigs=sigs, expand="star", **_KW
                )
                kept = dedup_corpus(corpus, pairs, "doc_id")
                kept_sigs = sigs.join(
                    kept.select("doc_id"), "doc_id", "semi"
                ).withColumn("_members", F.array(F.col("doc_id")))
                out = decontaminate(
                    kept, heldout, "doc_id", "text",
                    threshold=0.8, corpus_sigs=kept_sigs,
                    num_hashes=16, bands=8, shingle_k=3,
                )
            else:
                pairs = minhash_lsh_pairs(
                    corpus, "doc_id", "text", expand="star", **_KW
                )
                kept = dedup_corpus(corpus, pairs, "doc_id")
                out = decontaminate(
                    kept, heldout, "doc_id", "text",
                    threshold=0.8, num_hashes=16, bands=8, shingle_k=3,
                )
            return sorted(r["doc_id"] for r in out.collect())

        assert chain(shared=True) == chain(shared=False) == [1, 5]
    finally:
        release_caches()


def test_lsh_join_with_precomputed_sides_identical(spark):
    left = _docs(spark, [(1, _text()), (3, _text(prefix="beta"))])
    right = _docs(spark, [(9, _text({20: "editR"}))])  # ~1
    try:
        direct = sorted(
            (r["id_left"], r["id_right"])
            for r in minhash_lsh_join(left, right, **_KW).collect()
        )
        ls = minhash_signatures(left, "doc_id", "text", num_hashes=16, shingle_k=3)
        rs = minhash_signatures(right, "doc_id", "text", num_hashes=16, shingle_k=3)
        shared = sorted(
            (r["id_left"], r["id_right"])
            for r in minhash_lsh_join(
                left, right, left_sigs=ls, right_sigs=rs, **_KW
            ).collect()
        )
        assert shared == direct == [(1, 9)]
    finally:
        release_caches()
