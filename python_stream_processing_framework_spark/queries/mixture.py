"""Domain-mixture and shard-planning queries over the documents table.

Catalog surface for operators/mixture.py: the post-dedup corpus
assembly stages (hit a target domain mixture with exact quotas, then
shard deterministically for training I/O). Membership derives from
hash60(id#seed) exactly as in queries/sampling.py, so the oracles
replay every decision.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from python_stream_processing_framework_spark.catalog import load
from python_stream_processing_framework_spark.operators.mixture import (
    assign_shards,
    curriculum_order,
    domain_mixture,
    shard_stats,
)
from python_stream_processing_framework_spark.queries.base import query

#: Target language mixture for the catalog query: overweight English,
#: equal share for the rest — the documents table's en skew (~44%)
#: makes en the binding stratum at w=0.4, so the quota math is
#: exercised off the trivial uniform case.
_MIX_WEIGHTS = {"en": 0.4, "zh": 0.15, "es": 0.15, "de": 0.15, "fr": 0.15}

_MIX_VALUES = ", ".join(
    f"('{lang}', CAST({w} AS DOUBLE))" for lang, w in _MIX_WEIGHTS.items()
)

_H_MIX = (
    "('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#mix'), 1, 15))::BIGINT"
)
_H_SHARD = (
    "('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#shard'), 1, 15))::BIGINT"
)


@query(
    "domain_mixture",
    f"""
    WITH w(lang, wt) AS (VALUES {_MIX_VALUES}),
         c AS (
           SELECT lang, count(*) AS n FROM documents
           WHERE lang IN (SELECT lang FROM w) GROUP BY lang),
         t AS (
           -- LEFT join from weights: a weighted stratum with ZERO
           -- rows must clamp T to 0 (mixture_quotas uses
           -- counts.get(s, 0)), not silently drop out of the min
           SELECT CAST(floor(min(coalesce(n, 0) / wt)) AS BIGINT) AS t
           FROM w LEFT JOIN c USING (lang)),
         q AS (
           SELECT lang, CAST(floor(wt * t) AS BIGINT) AS quota FROM w, t),
         ranked AS (
           SELECT doc_id, lang,
                  row_number() OVER (PARTITION BY lang
                                     ORDER BY {_H_MIX}, doc_id) AS rn
           FROM documents WHERE lang IN (SELECT lang FROM w))
    SELECT doc_id, lang FROM ranked JOIN q USING (lang) WHERE rn <= quota
    """,
    doc="Exact-quota domain mixture (operators/mixture.domain_mixture): "
    "keep exactly floor(w_lang * T) docs per language, T the largest "
    "feasible total, members = the quota-smallest hash60(doc_id#mix) "
    "per stratum. Spark side runs the two-phase distributed selection "
    "(bucket histogram + cutoff-bucket-only ranking — no per-stratum "
    "single-task sort); the oracle replays membership with a plain "
    "per-stratum row_number, which is the semantic contract.",
)
def domain_mixture_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    kept = domain_mixture(documents, "lang", _MIX_WEIGHTS, "doc_id", seed="mix")
    return kept.select("doc_id", "lang")


@query(
    "shard_plan",
    f"""
    SELECT CAST({_H_SHARD} % 16 AS INT) AS shard,
           count(*) AS n_rows,
           CAST(sum(n_chars) AS BIGINT) AS total_size
    FROM documents GROUP BY 1
    """,
    doc="Deterministic training-shard plan (operators/mixture."
    "assign_shards + shard_stats): shard = hash60(doc_id#shard) mod 16 "
    "— a reproducible global shuffle with multinomial-balanced shard "
    "sizes — audited per shard by row count and payload bytes "
    "(byte balance, not row balance, bounds training I/O). Map-only "
    "assignment + one 16-row aggregation.",
)
def shard_plan_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    assigned = assign_shards(documents, "doc_id", 16, seed="shard")
    return shard_stats(assigned, size_col="n_chars")


_H_CURR = (
    "('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#curr'), 1, 15))::BIGINT"
)


@query(
    "curriculum_order",
    f"""
    SELECT doc_id,
           CAST(CASE WHEN n_chars < 150 THEN 0
                     WHEN n_chars < 300 THEN 1
                     ELSE 2 END AS INT) AS curr_phase,
           {_H_CURR} AS curr_key
    FROM documents
    """,
    doc="Deterministic curriculum schedule (operators/mixture."
    "curriculum_order): phase = score band of n_chars at thresholds "
    "[150, 300] (easy short docs first), within-phase order = the "
    "reproducible hash60(doc_id#curr) shuffle key. Map-only; writers "
    "realize the order with repartitionByRange(curr_phase, curr_key), "
    "never a global single-task sort.",
)
def curriculum_order_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    ordered = curriculum_order(
        documents, "n_chars", [150.0, 300.0], "doc_id", seed="curr"
    )
    return ordered.select("doc_id", "curr_phase", "curr_key")


_H_TEMP = (
    "('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#temp'), 1, 15))::BIGINT"
)


@query(
    "temperature_mixture",
    f"""
    WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
         u AS (
           SELECT lang, n,
                  CAST(floor(pow(CAST(n AS DOUBLE), 0.5) * 1e12 + 0.5)
                       AS BIGINT) AS uu
           FROM c),
         ws AS (SELECT CAST(sum(uu) AS DOUBLE) AS total FROM u),
         w AS (SELECT lang, n, CAST(uu AS DOUBLE) / total AS wt FROM u, ws),
         t AS (SELECT CAST(floor(min(n / wt)) AS BIGINT) AS t FROM w),
         q AS (SELECT lang, CAST(floor(wt * t) AS BIGINT) AS quota FROM w, t),
         ranked AS (
           SELECT doc_id, lang,
                  row_number() OVER (PARTITION BY lang
                                     ORDER BY {_H_TEMP}, doc_id) AS rn
           FROM documents)
    SELECT doc_id, lang FROM ranked JOIN q USING (lang) WHERE rn <= quota
    """,
    doc="Temperature-scaled mixture (operators/mixture."
    "temperature_mixture; the mT5/XLM-R sampling rule): weights "
    "w_lang ∝ n_lang^0.5 over the OBSERVED language histogram — "
    "tau=0.5 up-weights low-resource languages — then the exact-quota "
    "two-phase selection. Raw pow weights quantize to integer "
    "parts-per-1e12 before one exact int64/int64 division, so the "
    "oracle reproduces every weight, T, quota, and hash-ordered "
    "member bit-for-bit.",
)
def temperature_mixture_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from python_stream_processing_framework_spark.operators.mixture import (
        temperature_mixture,
    )

    (documents,) = load(spark, sf_dir, "documents")
    kept = temperature_mixture(documents, "lang", 0.5, "doc_id", seed="temp")
    return kept.select("doc_id", "lang")


#: UniMax catalog constants: at sf0.01 (20 sources, ~27k corpus
#: tokens, per-source caps ~2.3-3.1k at 2 epochs, total caps ~54k) a
#: 50k budget saturates the small sources and waterfills the rest —
#: both branches of the closed-form scan exercise under the driver's
#: correctness run.
_UNIMAX_BUDGET = 50_000
_UNIMAX_EPOCHS = 2


@query(
    "unimax_allocation",
    f"""
    WITH t AS (
      SELECT source,
             len(string_split(trim(lower(text)), ' ')) AS ntok
      FROM documents),
    c AS (SELECT source, CAST(sum(ntok) AS BIGINT) AS tokens
          FROM t GROUP BY source),
    r AS (
      SELECT source, tokens, tokens * {_UNIMAX_EPOCHS} AS cap,
             row_number() OVER
               (ORDER BY tokens * {_UNIMAX_EPOCHS}, source) AS i,
             count(*) OVER () AS n,
             coalesce(sum(tokens * {_UNIMAX_EPOCHS}) OVER
               (ORDER BY tokens * {_UNIMAX_EPOCHS}, source
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS prefix
      FROM c),
    s AS (SELECT *,
                 cap * (n - i + 1) <= {_UNIMAX_BUDGET} - prefix AS saturated
          FROM r),
    m AS (SELECT *,
                 coalesce(sum(CASE WHEN saturated THEN cap END) OVER (), 0)
                   AS sat_mass,
                 n - coalesce(sum(CASE WHEN saturated THEN 1 END) OVER (), 0)
                   AS n_unsat
          FROM s)
    SELECT source, tokens, cap,
           CAST(CASE WHEN saturated THEN cap
                     ELSE ({_UNIMAX_BUDGET} - sat_mass) // n_unsat
                END AS BIGINT) AS alloc_tokens,
           saturated
    FROM m
    """,
    doc="UniMax token-budget allocation (operators/mixture."
    "unimax_allocation; Chung et al. 2023): waterfill a 50k-token "
    "budget across sources, each capped at 2 epochs of its tokens — "
    "the over-repeat-safe alternative to temperature sampling. "
    "All-integer closed-form scan over ascending caps (saturation "
    "test cap*(n-i+1) <= remaining, shared integer-DIV level for "
    "the unsaturated); corpus reduces to a per-source token sum, "
    "the waterfill runs on strata-bounded metadata.",
)
def unimax_allocation_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from python_stream_processing_framework_spark.operators.dedup import tokens_expr
    from python_stream_processing_framework_spark.operators.mixture import (
        unimax_allocation,
    )

    (documents,) = load(spark, sf_dir, "documents")
    with_tokens = documents.select(
        "source", F.size(tokens_expr("text")).alias("ntok")
    )
    return unimax_allocation(
        with_tokens,
        "source",
        "ntok",
        budget=_UNIMAX_BUDGET,
        max_epochs=_UNIMAX_EPOCHS,
    )
