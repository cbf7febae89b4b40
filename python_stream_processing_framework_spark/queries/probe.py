"""Linear-probe catalog queries (operators/probe.py): one-vs-rest
least-squares GD on the embeddings table, trained and served in
exact integer arithmetic so DuckDB replays every round bit-exactly.

The synthetic embeddings carry little label signal (class means sit
near zero), so — exactly like `quality_classifier` — these rows
validate the exact train/serve pipeline end-to-end; class separation
under a real signal is unit-tested on crafted separable data
(tests/test_probe.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_stream_processing_framework_spark.catalog import load
from python_stream_processing_framework_spark.queries.base import query

#: shared training replay: quantize -> round-1 gradient at w=0 ->
#: update -> round-2 scores -> round-2 gradient -> update. Every
#: division is HUGEINT `//` (truncation toward zero = Spark `div` =
#: operators/probe.tdiv); every sum is exact, so partition order and
#: CTE evaluation order cannot move a single unit.
_TRAIN_CTES = """
    q AS (
      SELECT vec_id, CAST(label AS BIGINT) AS label,
             list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))
               AS xq
      FROM embeddings),
    nn AS (SELECT COUNT(*) AS n FROM q),
    cls AS (SELECT DISTINCT label AS c FROM q),
    dims AS (SELECT UNNEST(range(1, 65)) AS j),
    g1 AS (
      SELECT cls.c, dims.j,
             SUM(CAST(CASE WHEN q.label = cls.c
                           THEN -1000000000 ELSE 0 END AS HUGEINT)
                 * q.xq[dims.j]) AS g
      FROM q, cls, dims GROUP BY cls.c, dims.j),
    w1 AS (
      SELECT c, j,
             0 - (500000000 * (CAST(g AS HUGEINT) // (SELECT n FROM nn))
                  // 1000000000000000) AS w
      FROM g1),
    z2 AS (
      SELECT q.vec_id, q.label, w1.c,
             SUM(CAST(w1.w AS HUGEINT) * q.xq[w1.j]) // 1000000 AS z
      FROM q, w1 GROUP BY q.vec_id, q.label, w1.c),
    g2 AS (
      SELECT z2.c, dims.j,
             SUM((CAST(z2.z AS HUGEINT)
                  - CASE WHEN z2.label = z2.c THEN 1000000000 ELSE 0 END)
                 * q.xq[dims.j]) AS g
      FROM z2 JOIN q USING (vec_id), dims GROUP BY z2.c, dims.j),
    w2 AS (
      SELECT g2.c, g2.j,
             w1.w - (500000000 * (CAST(g2.g AS HUGEINT) // (SELECT n FROM nn))
                     // 1000000000000000) AS w
      FROM g2 JOIN w1 USING (c, j))
"""


@query(
    "probe_weights",
    f"""
    WITH {_TRAIN_CTES}
    SELECT CAST(c AS BIGINT) AS label, CAST(j - 1 AS INT) AS dim,
           CAST(w AS BIGINT) AS w_nano
    FROM w2 ORDER BY label, dim
    """,
    doc="Linear-probe training (operators/probe.linear_probe_train): "
    "two full-batch GD rounds of a one-vs-rest least-squares head "
    "over the 64-dim embeddings table, lr=0.5, in exact nano/micro "
    "integer arithmetic — per round ONE corpus scan (residuals are "
    "map-side expressions against broadcast weight literals; the "
    "model is classes x dim driver metadata, the Lloyd-centroid "
    "discipline) plus ONE 64-row dim-keyed shuffle with map-side "
    "partial sums. Returns the full weight table; the oracle unrolls "
    "both rounds as gradient/update CTE pairs and matches every "
    "weight to the unit.",
)
def probe_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from python_stream_processing_framework_spark.operators.probe import (
        linear_probe_train,
    )

    (embeddings,) = load(spark, sf_dir, "embeddings")
    w = linear_probe_train(
        embeddings, "embedding", "label", rounds=2, lr_ppb=500_000_000
    )
    return w.orderBy("label", "dim")


@query(
    "probe_confusion",
    f"""
    WITH {_TRAIN_CTES},
    z3 AS (
      SELECT q.vec_id, q.label, w2.c,
             SUM(CAST(w2.w AS HUGEINT) * q.xq[w2.j]) // 1000000 AS z
      FROM q, w2 GROUP BY q.vec_id, q.label, w2.c),
    p AS (
      SELECT vec_id, label, c AS pred,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY z DESC, c ASC) AS rn
      FROM z3)
    SELECT label, CAST(pred AS BIGINT) AS pred,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM p WHERE rn = 1
    GROUP BY label, pred ORDER BY label, pred
    """,
    doc="Linear-probe serving (operators/probe.linear_probe_predict): "
    "train the 2-round probe, then score the corpus as a pure map — "
    "argmax over class dot products computed against weight "
    "LITERALS (no join, no shuffle; ties break to the smallest "
    "label, pinned in both engines) — and aggregate the confusion "
    "matrix. The training-set confusion of a linear probe is the "
    "standard embedding-quality report for curation filters.",
)
def probe_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from python_stream_processing_framework_spark.operators.probe import (
        linear_probe_predict,
        linear_probe_train,
    )

    (embeddings,) = load(spark, sf_dir, "embeddings")
    w = linear_probe_train(
        embeddings, "embedding", "label", rounds=2, lr_ppb=500_000_000
    )
    out = linear_probe_predict(embeddings, w, "embedding")
    return (
        out.groupBy(F.col("label").cast("long").alias("label"), "pred")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("label", "pred")
    )


@query(
    "probe_select",
    f"""
    WITH {_TRAIN_CTES},
    z3 AS (
      SELECT q.vec_id, q.label, w2.c,
             SUM(CAST(w2.w AS HUGEINT) * q.xq[w2.j]) // 1000000 AS z
      FROM q, w2 GROUP BY q.vec_id, q.label, w2.c),
    mg AS (
      SELECT vec_id, label,
             CAST(MAX(CASE WHEN c = 0 THEN z END)
                  - MAX(CASE WHEN c <> 0 THEN z END) AS BIGINT)
               AS margin_nano
      FROM z3 GROUP BY vec_id, label)
    SELECT vec_id, label, margin_nano
    FROM mg ORDER BY margin_nano DESC, vec_id LIMIT 25
    """,
    doc="Curation-gate selection (operators/probe."
    "linear_probe_margin): train the 2-round probe, then take the 25 "
    "documents whose one-vs-rest margin for class 0 (its score minus "
    "the best other class's score, exact nano-integers) is highest — "
    "the top-k half of a threshold gate, deterministic to the unit "
    "with a (margin DESC, vec_id) tie-break. Pure map scoring "
    "against weight literals + TakeOrderedAndProject; no join, no "
    "wide shuffle.",
)
def probe_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    from python_stream_processing_framework_spark.operators.probe import (
        linear_probe_margin,
        linear_probe_train,
    )

    (embeddings,) = load(spark, sf_dir, "embeddings")
    w = linear_probe_train(
        embeddings, "embedding", "label", rounds=2, lr_ppb=500_000_000
    )
    out = linear_probe_margin(embeddings, w, "embedding", positive=0)
    return (
        out.select(
            "vec_id", F.col("label").cast("long").alias("label"), "margin_nano"
        )
        .orderBy(F.col("margin_nano").desc(), "vec_id")
        .limit(25)
    )
