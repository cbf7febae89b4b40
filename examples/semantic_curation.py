"""Embedding-space curation on the embeddings table:

    l2-normalize -> k-means clusters -> SemDeDup prune
    -> cluster-balanced mixture over the survivors
    -> ANN retrieval check (exact cosine top-k vs IVF)

The embedding-side companion of examples/llm_corpus_pipeline.py
(which curates the text side): cluster structure drives both dedup
and mixing, and the retrieval check at the end is the consumer those
embeddings exist for. Run:
python examples/semantic_curation.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from python_stream_processing_framework_spark.catalog import load
from python_stream_processing_framework_spark.functions.vectors import l2_normalize
from python_stream_processing_framework_spark.operators.common import release_caches
from python_stream_processing_framework_spark.operators.mixture import (
    temperature_mixture,
)
from python_stream_processing_framework_spark.operators.semdedup import semdedup
from python_stream_processing_framework_spark.operators.similarity import (
    cosine_topk,
    ivf_topk,
)
from python_stream_processing_framework_spark.session import get_spark


def main(sf_dir: str = "/root/testdata/sf0.01") -> None:
    spark = get_spark("semantic-curation")
    (emb,) = load(spark, sf_dir, "embeddings")
    n0 = emb.count()

    # 1. normalize FIRST (the SemDeDup module contract: L2 k-means on
    # unit vectors is spherical k-means, so cosine neighbors share
    # cells and scale variants cannot split across clusters)
    unit = emb.select(
        "vec_id", "label", l2_normalize(F.col("embedding")).alias("embedding")
    )

    # 2. cluster + prune: duplicate groups inside each cell, keep the
    # most marginal member per group (the paper's diversity rule)
    pruned = semdedup(unit, k=8, iters=2, eps=0.4)
    n_dropped = pruned.filter(~F.col("keep")).count()
    survivors = unit.join(
        pruned.filter(F.col("keep")).select("vec_id", "cluster"), "vec_id"
    )

    # 3. cluster-balanced mixture: temperature-sample over the CLUSTER
    # histogram so small semantic regions keep representation
    # (tau=0.5, the multilingual-sampling rule applied to clusters)
    mixed = temperature_mixture(survivors, "cluster", 0.5, "vec_id", seed="sem")
    n_mixed = mixed.count()

    # 4. retrieval check over the curated set: exact cosine top-5 vs
    # IVF(probe=2) for the same probe vector
    probe = int(mixed.agg(F.min("vec_id")).collect()[0][0])
    exact = cosine_topk(mixed, query_id=probe, k=5)
    approx = ivf_topk(mixed, query_id=probe, k=5, n_probe=2)
    e_ids = [r["vec_id"] for r in exact.collect()]
    a_ids = [r["vec_id"] for r in approx.collect()]
    overlap = len(set(e_ids) & set(a_ids))

    print(
        f"curation: {n0} vectors -> {n0 - n_dropped} after SemDeDup "
        f"({n_dropped} pruned) -> {n_mixed} after cluster-balanced "
        f"mixture"
    )
    print(
        f"retrieval check (probe {probe}): exact top-5 {e_ids}, "
        f"ivf top-5 {a_ids}, overlap {overlap}/5"
    )
    release_caches()
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])
