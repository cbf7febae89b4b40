"""Sequence packing — assembling fixed-token-budget training sequences.

The last step of an LLM training-data pipeline: given documents with
token counts, assign each document to a training sequence of at most
``max_tokens`` tokens, wasting as little budget as possible. The
reference has no notion of this (its pipeline ends at the sink); it is
part of the beyond-reference LLM-pipeline charter (SURVEY §2.7),
sitting downstream of dedup (`dedup.py`, `graph.py`) and splitting
(`sampling.py`).

Exact greedy packing is inherently sequential — a global scan order
with running state — which at 100 TB would mean one task. The scale
design is GROUPED greedy packing: documents are hash-partitioned into
``num_groups`` independent packing groups, and the greedy walk runs
per group inside `applyInPandas` (Arrow batches, executor-side).
Groups are packed in parallel across the cluster; each group's output
sequences are identified by (pack_group, seq_idx). The only
cross-group waste is at most one partially-filled tail sequence per
group — negligible when groups hold thousands of documents (size
``num_groups`` ~ corpus_tokens / (10^4 * max_tokens) to keep tail
waste under 0.01%).

Determinism: group assignment and intra-group order both derive from
the md5 content hash of the document id (`hash60`), so the packing is
invariant to input partitioning, cluster size, and engine — the same
property the sampling operators guarantee (sampling.py).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

from python_stream_processing_framework_spark.functions.hashing import hash60


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    n_tokens_col: str = "n_tokens",
    *,
    max_tokens: int,
    num_groups: int = 64,
    seed: str = "",
) -> DataFrame:
    """Assign every document to a training sequence.

    Returns (id_col, n_tokens_col, pack_group, seq_idx, seq_pos):
    documents with the same (pack_group, seq_idx) belong to one
    training sequence; ``seq_pos`` is the document's position inside
    it. Every input document appears exactly once. A sequence's token
    total never exceeds ``max_tokens`` unless it contains a SINGLE
    oversized document (callers decide whether to truncate or drop
    those; they are easy to find: n_tokens > max_tokens).

    Greedy first-fit in deterministic hash order within each group:
    documents are ordered by md5(id, seed) and appended to the current
    sequence until the next document would overflow, which starts a
    new sequence. One shuffle (the groupBy), then pure executor-side
    Arrow-batched pandas per group.
    """
    if max_tokens <= 0:
        raise ValueError("max_tokens must be positive")
    if num_groups <= 0:
        # hash60 % 0 would evaluate to null and surface as a confusing
        # non-nullable-field error inside applyInPandas
        raise ValueError("num_groups must be positive")

    out_schema = StructType(
        [
            df.schema[id_col],
            StructField("_n", LongType(), False),
            StructField("pack_group", LongType(), False),
            StructField("seq_idx", LongType(), False),
            StructField("seq_pos", LongType(), False),
        ]
    )

    def pack_group(pdf: pd.DataFrame) -> pd.DataFrame:
        # id tie-break: 60-bit hash collisions WILL occur at corpus
        # scale (birthday bound at 1e9 docs), and without it tied rows
        # keep shuffle-dependent arrival order — breaking the
        # partition-invariance guarantee.
        pdf = pdf.sort_values(["_order", id_col]).reset_index(drop=True)
        seq_idx, seq_pos, used = [], [], 0
        cur, pos = 0, 0
        for n in pdf["_n"]:
            n = int(n)
            if pos > 0 and used + n > max_tokens:
                cur += 1
                pos = 0
                used = 0
            seq_idx.append(cur)
            seq_pos.append(pos)
            used += n
            pos += 1
        return pd.DataFrame(
            {
                id_col: pdf[id_col],
                "_n": pdf["_n"],
                "pack_group": pdf["_grp"],
                "seq_idx": seq_idx,
                "seq_pos": seq_pos,
            }
        )

    prepped = df.select(
        F.col(id_col),
        F.col(n_tokens_col).cast("long").alias("_n"),
        (hash60(F.concat(F.col(id_col).cast("string"), F.lit("#grp#" + seed))) % num_groups).alias("_grp"),
        hash60(
            F.concat(F.col(id_col).cast("string"), F.lit("#ord#" + seed))
        ).alias("_order"),
    )
    packed = prepped.groupBy("_grp").applyInPandas(pack_group, schema=out_schema)
    return packed.withColumnRenamed("_n", n_tokens_col)


def packing_stats(
    packed: DataFrame,
    n_tokens_col: str = "n_tokens",
    *,
    max_tokens: int,
) -> DataFrame:
    """One-row audit of a `pack_sequences` result: sequence count,
    document count, mean fill ratio, and how many sequences hold a
    single oversized document. Pure aggregation — safe at any scale.
    """
    per_seq = packed.groupBy("pack_group", "seq_idx").agg(
        F.sum(n_tokens_col).alias("_toks"),
        F.count("*").alias("_docs"),
    )
    return per_seq.agg(
        F.count("*").alias("n_sequences"),
        F.sum("_docs").alias("n_documents"),
        F.round(F.avg(F.least(F.col("_toks"), F.lit(max_tokens)) / max_tokens), 4).alias(
            "mean_fill"
        ),
        F.sum(
            ((F.col("_toks") > max_tokens) & (F.col("_docs") == 1)).cast("long")
        ).alias("n_oversized"),
        F.sum(((F.col("_toks") > max_tokens) & (F.col("_docs") > 1)).cast("long")).alias(
            "n_overfull_bugs"
        ),
    )
