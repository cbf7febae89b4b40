"""Exact set-similarity join catalog query (operators/setsim.py).

The oracle is deliberately the BRUTE-FORCE all-pairs comparison: the
Spark side runs the prefix-filtered AllPairs/PPJoin algorithm, so an
exact match against brute force proves the pruning (prefix, length,
positional filters) loses no qualifying pair — the algorithm's whole
correctness claim — in addition to the usual value parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from python_stream_processing_framework_spark.catalog import load
from python_stream_processing_framework_spark.operators.setsim import setsim_join
from python_stream_processing_framework_spark.queries.base import query


@query(
    "setsim_pairs",
    """
    WITH tt AS (
      SELECT doc_id, string_split(trim(lower(text)), ' ') AS toks
      FROM documents WHERE len(trim(text)) > 0),
    s AS (
      SELECT doc_id, list_distinct(list_transform(range(1, len(toks)),
               i -> toks[i] || ' ' || toks[i+1])) AS s
      FROM tt WHERE len(toks) >= 2),
    p AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                   / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))),
                   6) AS jaccard
      FROM s a JOIN s b ON a.doc_id < b.doc_id)
    SELECT id_a, id_b, jaccard FROM p WHERE jaccard >= 0.7
    """,
    doc="EXACT all-pairs 2-shingle-set Jaccard >= 0.7 via prefix "
    "filtering (operators/setsim.setsim_join — AllPairs/PPJoin: "
    "rarity-ordered prefixes, asymmetric index/probe lengths, length "
    "+ positional filters, all floor-bounded so pruning only ever "
    "over-keeps). The exact complement of the recall<1 LSH tiers: "
    "no qualifying pair is lost, and the oracle is brute force to "
    "prove exactly that. Hot common shingles never enter the join — "
    "they sort to the END of the rarity order, past every prefix. "
    "0.7 is the standard near-dup dedup operating point; the "
    "pruning bounds tighten as the threshold rises.",
)
def setsim_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    return setsim_join(documents, "doc_id", "text", threshold=0.7, shingle_k=2)
