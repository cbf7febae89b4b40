"""End-to-end LLM training-data pipeline on the documents table:

    quality filter -> near-dup detection (MinHash+LSH) -> cluster
    collapse (connected components) -> deterministic train/val/test
    split -> decontaminate train against val/test -> sequence
    packing -> audit stats

Every step is the scale-path operator (bucketed equi-joins, map-only
hashing, grouped greedy packing) — no O(n^2) stage, no driver-side
data. Run: python examples/llm_corpus_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from python_stream_processing_framework_spark.catalog import load
from python_stream_processing_framework_spark.operators.dedup import (
    decontaminate,
    dedup_corpus,
    minhash_lsh_pairs,
)
from python_stream_processing_framework_spark.operators.packing import (
    pack_sequences,
    packing_stats,
)
from python_stream_processing_framework_spark.operators.common import release_caches
from python_stream_processing_framework_spark.operators.sampling import hash_split
from python_stream_processing_framework_spark.operators.text import quality_stats
from python_stream_processing_framework_spark.session import get_spark


def main(sf_dir: str = "/root/testdata/sf0.01") -> None:
    spark = get_spark("llm-corpus-pipeline")
    (docs,) = load(spark, sf_dir, "documents")
    n0 = docs.count()

    # 1. quality gate: drop degenerate docs before paying for dedup
    quality = quality_stats(docs, "doc_id", "text")
    good = docs.join(
        quality.filter(
            (F.col("n_tokens") >= 5) & (F.col("quality_score") > 0.2)
        ).select("doc_id"),
        "doc_id",
    )
    n1 = good.count()

    # 2-3. near-dup pairs -> one canonical doc per cluster
    pairs = minhash_lsh_pairs(good, "doc_id", "text", threshold=0.5)
    deduped = dedup_corpus(good, pairs, "doc_id")
    n2 = deduped.count()

    # 4. leak-proof split (membership is a content hash, not a coin flip)
    split = hash_split(
        deduped, "doc_id", {"train": 0.9, "val": 0.05, "test": 0.05}
    )

    # 5. evaluation hygiene: drop train docs that near-duplicate
    # anything in val/test (the held-out data must stay unseen)
    train_docs = split.filter(F.col("split") == "train").select("doc_id", "text")
    heldout = split.filter(F.col("split") != "train").select("doc_id", "text")
    clean_train = decontaminate(train_docs, heldout, threshold=0.5)
    n3 = clean_train.count()

    # 6. pack the clean train split into 512-token training sequences
    train = clean_train.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
    )
    packed = pack_sequences(train, max_tokens=512, num_groups=16)
    audit = packing_stats(packed, max_tokens=512).collect()[0]

    print(
        f"corpus: {n0} docs -> {n1} after quality -> {n2} after dedup; "
        f"train {train_docs.count()} -> {n3} after decontamination"
    )
    print(
        f"train packing: {audit['n_documents']} docs -> "
        f"{audit['n_sequences']} sequences, mean fill "
        f"{audit['mean_fill']:.1%}, oversized {audit['n_oversized']}"
    )
    assert audit["n_overfull_bugs"] == 0

    # cache hygiene: the dedup/decontamination operators pinned
    # signature caches for their fan-out subplans; reclaim them now
    # that every downstream action has run. (A production pipeline
    # would write each stage's output and release between stages —
    # releasing earlier here would force lineage recompute, because
    # the counts above re-walk the same lazy plans.)
    release_caches()
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])
