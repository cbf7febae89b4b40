"""Sequence-packing query with an exact DuckDB oracle.

`pack_sequences` (operators/packing.py) is deterministic by
construction — group assignment and intra-group order derive from
md5 content hashes, and the greedy first-fit walk is a pure function
of that order — so the oracle can replay the ENTIRE packing, document
by document, with a recursive CTE that carries the walk state
(seq_idx, seq_pos, used) down each group's hash order. This checks
strictly more than aggregate invariants: every document's exact
(pack_group, seq_idx, seq_pos) must match.

The recursion advances all groups breadth-first, one document per
group per step, so its depth is max docs-per-group (~n/num_groups) —
trivially cheap at the driver's correctness SF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_stream_processing_framework_spark.catalog import load
from python_stream_processing_framework_spark.operators.dedup import tokens_expr
from python_stream_processing_framework_spark.operators.packing import pack_sequences
from python_stream_processing_framework_spark.queries.base import query

_MAX_TOKENS, _NUM_GROUPS = 512, 8

_H60 = "('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '{salt}'), 1, 15))::BIGINT"


@query(
    "packing_assignments",
    f"""
    WITH RECURSIVE docs AS (
      SELECT doc_id,
             CAST(len(string_split(trim(lower(text)), ' ')) AS BIGINT) AS n_tokens,
             {_H60.format(salt='#grp#')} % {_NUM_GROUPS} AS grp,
             {_H60.format(salt='#ord#')} AS ord
      FROM documents),
    ordered AS (
      SELECT doc_id, n_tokens, grp,
             row_number() OVER (PARTITION BY grp ORDER BY ord, doc_id) AS rn
      FROM docs),
    walk AS (
      SELECT grp, rn, doc_id, n_tokens,
             CAST(0 AS BIGINT) AS seq_idx,
             CAST(0 AS BIGINT) AS seq_pos,
             n_tokens AS used
      FROM ordered WHERE rn = 1
      UNION ALL
      SELECT o.grp, o.rn, o.doc_id, o.n_tokens,
             CASE WHEN w.used + o.n_tokens > {_MAX_TOKENS}
                  THEN w.seq_idx + 1 ELSE w.seq_idx END,
             CASE WHEN w.used + o.n_tokens > {_MAX_TOKENS}
                  THEN 0 ELSE w.seq_pos + 1 END,
             CASE WHEN w.used + o.n_tokens > {_MAX_TOKENS}
                  THEN o.n_tokens ELSE w.used + o.n_tokens END
      FROM walk w JOIN ordered o ON o.grp = w.grp AND o.rn = w.rn + 1)
    SELECT doc_id, n_tokens, grp AS pack_group, seq_idx, seq_pos FROM walk
    """,
    doc="Greedy fixed-budget sequence packing (max_tokens=512, 8 "
    "hash-partitioned packing groups) of the documents table by "
    "whitespace token count. Every document's exact sequence "
    "assignment is replayed by the oracle's recursive-CTE walk over "
    "the same md5 order — full per-row verification of the "
    "applyInPandas greedy first-fit, including overflow boundaries.",
)
def packing_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    docs = documents.select(
        "doc_id", F.size(tokens_expr("text")).cast("long").alias("n_tokens")
    )
    return pack_sequences(
        docs, "doc_id", "n_tokens", max_tokens=_MAX_TOKENS, num_groups=_NUM_GROUPS
    )
