"""Distributed connected components — the pairs→clusters dedup step.

A near-dup detector (minhash_lsh_pairs, simhash_pairs, ngram_jaccard
_pairs) emits PAIRS; an actual dedup pipeline needs CLUSTERS, so that
one canonical document survives per group of mutual near-dups (A~B and
B~C must collapse to one doc even when A~C was never emitted). The
reference has no graph operator — its dedup story stops at idempotent
sink tokens (`/root/reference/pspf/connectors/base.py:32-78`) — so
this is a beyond-reference operator mandated by the LLM-pipeline
charter (SURVEY §2.7).

Algorithm: iterative min-label propagation expressed as DataFrame ops.
Each round every node adopts the smallest component id among itself
and its neighbours; labels are monotonically non-increasing and reach
the per-component minimum in O(max cluster diameter) rounds. Near-dup
clusters are near-cliques (diameter 1-2), so 2-3 rounds in practice —
cheaper in total shuffles than the O(log n)-round large-star/small-star
of Kiveris et al. (2014), which pays ~2 shuffles per round and only
wins on long-path graphs dedup never produces.

Scale notes:
- Per round: one shuffle for the neighbour join, one for the groupBy
  min, one small join for the convergence count. All hash-partitioned
  on node id — uniform md5-derived doc ids, no planned skew.
- Plan lineage is truncated each round: fault-tolerant `checkpoint()`
  when a checkpoint dir is configured (the cluster deployment),
  `localCheckpoint()` otherwise (local dev / tests).
- The driver loop only examines a single `changed` COUNT per round;
  no row data ever reaches the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    max_iter: int = 25,
) -> DataFrame:
    """Label every node of an undirected edge list with its component.

    Returns (node, component) where `component` is the MINIMUM node id
    in the node's connected component — deterministic, so downstream
    canonical-doc selection (keep `node == component`) is reproducible
    across runs and engines. Only nodes that appear in `edges` are
    returned; isolated nodes are trivially their own component.

    Raises ValueError if the propagation has not converged after
    `max_iter` rounds (component ids would be an unconverged snapshot,
    silently wrong for dedup).

    Lineage truncation per round: when a checkpoint directory is set
    (`spark.sparkContext.setCheckpointDir`), uses fault-tolerant
    `checkpoint()` — an executor loss mid-iteration recomputes from
    the durable snapshot, not from the whole edge pipeline. Without
    one (local dev / tests), falls back to `localCheckpoint()`.
    """
    sc = edges.sparkSession.sparkContext
    durable = sc.getCheckpointDir() is not None

    def truncate(df: DataFrame) -> DataFrame:
        return df.checkpoint(eager=True) if durable else df.localCheckpoint(eager=True)

    sym = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .union(edges.select(F.col(dst).alias("s"), F.col(src).alias("d")))
        .distinct()
        .persist()
    )
    labels = truncate(
        sym.select(F.col("s").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    try:
        for _ in range(max_iter):
            nbr_min = sym.join(labels, sym["s"] == labels["node"]).select(
                F.col("d").alias("node"), F.col("component")
            )
            new = truncate(
                labels.unionByName(nbr_min)
                .groupBy("node")
                .agg(F.min("component").alias("component"))
            )
            # Labels only ever decrease: converged iff none got smaller.
            changed = (
                new.alias("n")
                .join(labels.alias("o"), "node")
                .filter(F.col("n.component") < F.col("o.component"))
                .count()
            )
            labels = new
            if changed == 0:
                return labels
    finally:
        sym.unpersist()
    raise ValueError(
        f"connected_components did not converge in {max_iter} rounds; "
        "raise max_iter (graph diameter exceeds it)"
    )
