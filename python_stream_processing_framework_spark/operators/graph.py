"""Distributed connected components — the pairs→clusters dedup step.

A near-dup detector (minhash_lsh_pairs, simhash_pairs, ngram_jaccard
_pairs) emits PAIRS; an actual dedup pipeline needs CLUSTERS, so that
one canonical document survives per group of mutual near-dups (A~B and
B~C must collapse to one doc even when A~C was never emitted). The
reference has no graph operator — its dedup story stops at idempotent
sink tokens (`/root/reference/pspf/connectors/base.py:32-78`) — so
this is a beyond-reference operator mandated by the LLM-pipeline
charter (SURVEY §2.7).

Algorithm: iterative min-label propagation with pointer doubling,
expressed as DataFrame ops. Each round every node adopts the smallest
component id among itself and its neighbours, then shortcuts through
its label's own label (doubling the effective propagation distance) —
labels are monotonically non-increasing and reach the per-component
minimum in O(log diameter) rounds. Near-dup clusters are near-cliques
(diameter 1-2), so 2-3 rounds in practice; the doubling step is what
keeps the occasional chain-shaped component from paying
O(diameter) rounds.

Scale notes:
- Per round: one shuffle for the neighbour join, one for the groupBy
  min, one node-keyed self-join for the shortcut. All hash-partitioned
  on node id — uniform md5-derived doc ids, no planned skew.
- Convergence is detected INSIDE the min aggregation (the old label
  rides along as a tagged row), so no extra join — the driver loop
  only examines a single `changed` COUNT per round; no row data ever
  reaches the driver.
- Plan lineage is truncated each round: fault-tolerant `checkpoint()`
  when a checkpoint dir is configured (the cluster deployment),
  `localCheckpoint()` otherwise (local dev / tests).
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
    double_from: int = 2,
    driver_threshold_edges: int = 100_000,
) -> DataFrame:
    """Label every node of an undirected edge list with its component.

    Returns (node, component) where `component` is the MINIMUM node id
    in the node's connected component — deterministic, so downstream
    canonical-doc selection (keep `node == component`) is reproducible
    across runs and engines. Only nodes that appear in `edges` are
    returned; isolated nodes are trivially their own component.

    Small-graph fast path: when the symmetric distinct edge count is
    at most ``driver_threshold_edges`` (default 100k rows — a few MB
    of id pairs, the same bounded-metadata contract as the DLQ replay
    threshold), the edges collect once and a driver union-find labels
    them in one pass — identical min-id labels, none of the iterative
    path's per-round job overhead, which DOMINATES wall time for the
    near-dup graphs real corpora produce (pairs are a tiny fraction
    of the corpus). Past the threshold the distributed propagation
    below runs unchanged; pass ``driver_threshold_edges=0`` to force
    it (tests do, to keep the loop covered).

    Raises ValueError if the propagation has not converged after
    `max_iter` rounds (component ids would be an unconverged snapshot,
    silently wrong for dedup).

    Lineage truncation per round: when a checkpoint directory is set
    (`spark.sparkContext.setCheckpointDir`), uses fault-tolerant
    `checkpoint()` — an executor loss mid-iteration recomputes from
    the durable snapshot, not from the whole edge pipeline. Without
    one (local dev / tests), falls back to `localCheckpoint()`.
    """
    from python_stream_processing_framework_spark.operators.common import (
        checkpoint_truncate as truncate,
        release_checkpoint as ck_unpersist,
        track_release,
    )

    # Adaptive iteration parallelism, PLAN-LOCAL: the per-round cost
    # of a SMALL graph (the common near-dup case — pairs are a tiny
    # fraction of the corpus) is dominated by task/stage overhead, not
    # data. Size the loop's frames to the edge count (~25k edges per
    # partition, floor 1) with explicit hash repartitions on the loop
    # key; the checkpointed frames then carry loop_width partitions,
    # bounding every round's map-side task count. Session conf is
    # never touched — a concurrent query on the same session keeps its
    # own width, and two interleaved components calls cannot race a
    # save/restore (the round-4 ADVICE hazard). Intermediate shuffles
    # that still plan at session width are AQE-coalesced.
    spark = edges.sparkSession
    session_width = int(spark.conf.get("spark.sql.shuffle.partitions"))
    sym = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .union(edges.select(F.col(dst).alias("s"), F.col(src).alias("d")))
        .distinct()
        .persist()
    )
    # a failure in ANY iteration job must release the persisted edge
    # frame
    try:
        n_edges = sym.count()  # also materializes the persist
        if n_edges <= driver_threshold_edges:
            from pyspark.sql.types import StructField, StructType

            parent: dict = {}

            def find(x):
                r = x
                while parent[r] != r:
                    r = parent[r]
                while parent[x] != r:  # path compression
                    parent[x], x = r, parent[x]
                return r

            for row in sym.collect():
                a, b = row["s"], row["d"]
                parent.setdefault(a, a)
                parent.setdefault(b, b)
                ra, rb = find(a), find(b)
                if ra != rb:
                    # smaller root stays root => every root is its
                    # component's MINIMUM id, matching the propagation
                    if rb < ra:
                        ra, rb = rb, ra
                    parent[rb] = ra
            ntype = edges.schema[src].dataType
            return spark.createDataFrame(
                [(n, find(n)) for n in sorted(parent)],
                StructType(
                    [
                        StructField("node", ntype, False),
                        StructField("component", ntype, False),
                    ]
                ),
            )
        loop_width = max(1, min(session_width, n_edges // 25_000 + 1))
        labels = labels_ck = truncate(
            sym.select(F.col("s").alias("node"))
            .distinct()
            .withColumn("component", F.col("node"))
            .repartition(loop_width, "node")
        )
        for it in range(max_iter):
            # Pointer doubling on the MATERIALIZED labels: shortcut
            # each label to its label's own label before propagating.
            # Both join inputs are the checkpointed `labels`, so the
            # shortcut costs one node-keyed join, no recomputation.
            # (A label's label is always <= the label — its own old
            # value rides in its min — so least() is belt-and-braces.)
            # ADAPTIVE: near-dup clusters are near-cliques that
            # converge in <= `double_from` plain rounds — for them the
            # shortcut join is a pure extra shuffle, so the first
            # rounds propagate plainly; only components still changing
            # after that (chain-shaped stragglers) pay for doubling
            # and get the O(log diameter) bound.
            if it < double_from:
                lab2 = labels
            else:
                # lab2 feeds TWO consumers (the neighbour join and the
                # union branch): persist+count so the shortcut join
                # runs once per round, not once per consumer.
                lab2 = (
                    labels.alias("x")
                    .join(
                        labels.select(
                            F.col("node").alias("_ln"), F.col("component").alias("_lc")
                        ),
                        F.col("x.component") == F.col("_ln"),
                        "left",
                    )
                    .select(
                        "node",
                        F.least(
                            F.coalesce(F.col("_lc"), F.col("x.component")),
                            F.col("x.component"),
                        ).alias("component"),
                    )
                    .persist()
                )
                lab2.count()
            # _old's null sentinel must carry the NODE type, not a
            # hardcoded long: with string doc ids (crawl corpora) a
            # long sentinel makes unionByName coerce the label column
            # to BIGINT and the round fails with CAST_INVALID_INPUT
            # under ANSI the moment the graph exceeds the driver
            # fast path.
            nbr_min = sym.join(lab2, sym["s"] == lab2["node"]).select(
                F.col("d").alias("node"),
                F.col("component"),
                F.lit(None).cast(edges.schema[src].dataType).alias("_old"),
            )
            # The pre-round label rides along as a tagged row, so one
            # groupBy yields both the new minimum and the changed flag
            # — no separate join to detect convergence.
            new = truncate(
                lab2.select("node", "component", F.col("component").alias("_old"))
                .unionByName(nbr_min)
                .repartition(loop_width, "node")
                .groupBy("node")
                .agg(
                    F.min("component").alias("component"),
                    (F.min("component") < F.min("_old")).alias("_changed"),
                )
            )
            if it >= double_from:
                # new is checkpointed (eager) — the shortcut cache is done
                lab2.unpersist()
            # new is materialized, so the previous round's checkpoint
            # storage is superseded — free it now, not at session end.
            # (labels_ck, not labels: post-drop frames are Projects
            # over the LogicalRDD and the accessor needs the
            # checkpointed frame itself.)
            ck_unpersist(labels_ck)
            labels_ck = new
            # Labels only ever decrease: converged iff no label got
            # smaller than the shortcut snapshot — then lab2 is a
            # propagation fixpoint, i.e. the per-component minimum.
            changed = new.filter(F.col("_changed")).count()
            labels = new.drop("_changed")
            if changed == 0:
                # the RESULT's checkpoint must outlive the returned
                # lazy frame; the session cache tracker reclaims it
                # once the caller has consumed the labels
                track_release(lambda df=new: ck_unpersist(df))
                return labels
    finally:
        sym.unpersist()
    raise ValueError(
        f"connected_components did not converge in {max_iter} rounds; "
        "raise max_iter (graph diameter exceeds it)"
    )


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    *,
    n_iter: int = 3,
    damping_pct: int = 85,
) -> DataFrame:
    """Integer-exact PageRank — the crawl-prioritization score.

    Production crawl pipelines rank hosts/pages by link centrality to
    decide what to fetch and keep (Common Crawl publishes harmonic
    centrality ranks for exactly this); PageRank is the canonical
    form. Returns (node, rank_nano): rank in integer NANO-units
    (sums to ~1e9 less truncation mass).

    Arithmetic is DEFINED on integers so any engine replays it
    bit-for-bit (the BPE-rounds pattern): ranks live in nano-units
    (BIGINT), each node's per-edge contribution is ``rank_nano DIV
    out_degree`` (floor), the damping step is ``(base) + (sum * d)
    DIV 100`` with ``d = damping_pct`` — no floats anywhere, and the
    truncation dust (< out_degree nano per node per round) is the
    documented price of exactness. Dangling nodes (no out-edges)
    simply leak their mass, the simplest published variant.

    Scale shape: per iteration ONE join of the narrow (node,
    rank_nano) table against edges on the source (hash-partitioned,
    no skew beyond the graph's own hubs — AQE skew-split applies) and
    ONE groupBy(dst) sum with map-side partials. The rank table is
    |nodes| narrow rows; nothing reaches the driver. ``n_iter`` is a
    fixed unrolled loop (each round extends the lazy plan; for large
    ``n_iter`` persist every few rounds — the connected_components
    checkpoint pattern).
    """
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    from python_stream_processing_framework_spark.operators.common import (
        persist_lazy,
    )

    # Persisted (r15 optimization): every unrolled round reads the
    # node table and the out-degree table again — and because rounds
    # CHAIN, the unpersisted form re-derived both from the raw source
    # multiplicatively (~48 source scans in the 3-round catalog
    # plan). Caching the two NODE-BOUNDED tables makes plan growth
    # linear (the edge projection is read once per round, a plain
    # columnar scan at any scale); the corpus-linear edge list itself
    # deliberately stays uncached — writing it to cache cost more
    # than the scans it saved (measured). The LAZY persist costs zero
    # extra jobs: nodes.count() below fills the nodes cache, outdeg
    # fills on round 1.
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    nodes = persist_lazy(
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    n = nodes.count()  # one scalar; the only driver value — and the
    # action that fills the nodes cache above
    outdeg = persist_lazy(e.groupBy("src").agg(F.count(F.lit(1)).alias("deg")))
    init = int(round(1e9 / n))
    base = int(round((100 - damping_pct) * 1e9 / n / 100))
    ranks = nodes.withColumn("rank_nano", F.lit(init).cast("bigint"))
    for _ in range(n_iter):
        contrib = (
            ranks.join(outdeg, ranks["node"] == outdeg["src"])
            .join(e, "src")
            .select(
                F.col("dst").alias("node"),
                F.expr("rank_nano DIV deg").alias("_c"),
            )
        )
        summed = contrib.groupBy("node").agg(
            F.sum("_c").cast("bigint").alias("_s")
        )
        ranks = nodes.join(summed, ["node"], "left").select(
            "node",
            (
                F.lit(base)
                + F.expr(
                    f"(coalesce(_s, CAST(0 AS BIGINT)) * {damping_pct}) DIV 100"
                )
            )
            .cast("bigint")
            .alias("rank_nano"),
        )
    return ranks


def triangle_counts(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Per-node triangle counts on the undirected simple graph.

    Triangle density is the standard structure signal over link
    graphs — spam-farm detection (link rings are triangle-dense),
    community strength, and clustering-coefficient features for crawl
    prioritization all start from it.

    Algorithm: degree orientation (the node-iterator++ / Cohen
    MapReduce form). Undirected distinct edges are oriented from the
    LOWER (degree, node) endpoint to the higher; every triangle
    {x < y < z} in that total order then materializes exactly once,
    as the wedge (x->y, x->z) closed by the oriented edge y->z. The
    orientation is the scale bound: a node's oriented out-degree is
    O(sqrt(m)) on any graph, so the wedge self-join fans out to
    O(m^1.5) candidates worst-case instead of sum(deg^2) — the hub
    that dominates an unoriented wedge join never becomes a source.

    Shuffles: edge dedup (1), degree agg (1), degree join back (hash,
    AQE-broadcast when the degree table is small), the wedge
    self-join on src (1), and the closing equi-join on (y, z) (1) —
    all on narrow (long, long) rows, never payload. Self-loops are
    dropped; multi-edges collapse in the dedup.

    Returns (node, triangles) for every node in >= 1 triangle —
    BIGINT counts, trivially engine-exact.
    """
    a, b = F.col(src_col), F.col(dst_col)
    und = (
        edges.filter(a != b)
        .select(
            F.least(a, b).alias("a"),
            F.greatest(a, b).alias("b"),
        )
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionByName(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    # orientation key: (deg, node) as one sortable struct
    da = deg.select(F.col("node").alias("a"), F.struct(F.col("deg"), F.col("node")).alias("ka"))
    db = deg.select(F.col("node").alias("b"), F.struct(F.col("deg"), F.col("node")).alias("kb"))
    keyed = und.join(da, "a").join(db, "b")
    from python_stream_processing_framework_spark.operators.common import (
        materialize,
    )

    # Materialized (r15 optimization): the oriented edge list fans out
    # into BOTH wedge sides and the closing join — unpersisted, each
    # consumer re-ran edge dedup + degree aggregation + both degree
    # joins, and since those subtrees nest (deg reads und twice), the
    # executed plan re-scanned the raw edge source ~180x at three
    # consumers cubed. One narrow (long, long, struct) corpus-linear
    # cache; release_caches() drains it.
    oriented = materialize(
        keyed.select(
            F.when(F.col("ka") < F.col("kb"), F.col("a")).otherwise(F.col("b")).alias("src"),
            F.when(F.col("ka") < F.col("kb"), F.col("b")).otherwise(F.col("a")).alias("dst"),
            F.when(F.col("ka") < F.col("kb"), F.col("kb")).otherwise(F.col("ka")).alias("kdst"),
        )
    )
    o1 = oriented.select(F.col("src"), F.col("dst").alias("y"), F.col("kdst").alias("ky"))
    o2 = oriented.select(F.col("src"), F.col("dst").alias("z"), F.col("kdst").alias("kz"))
    wedges = o1.join(o2, "src").filter(F.col("ky") < F.col("kz")).select(
        F.col("src").alias("x"), "y", "z"
    )
    closing = oriented.select(F.col("src").alias("y"), F.col("dst").alias("z"))
    tris = wedges.join(closing, ["y", "z"])
    # one corner row per triangle endpoint via a map-side explode —
    # the 3-way union evaluated the tris subtree (and its O(m^1.5)
    # wedge join) three times (r15 optimization)
    corners = tris.select(
        F.explode(F.array("x", "y", "z")).alias("node")
    )
    return corners.groupBy("node").agg(
        F.count(F.lit(1)).cast("bigint").alias("triangles")
    )
