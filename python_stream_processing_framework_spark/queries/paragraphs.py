"""CCNet paragraph-dedup catalog query (operators/paragraphs.py).

The synthetic documents table is single-line, so the query first
builds paragraph structure deterministically (the pii_redaction
pattern): a shared subscription banner on every third document, the
document body, and a per-source copyright footer — exactly the
boilerplate CCNet's paragraph pass exists to remove. The oracle
replays segmentation, the lower(trim) hash, the canonical-first
window, and the positional rebuild in DuckDB; every value is an
exact integer or string, so the compare is bit-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_stream_processing_framework_spark.catalog import load
from python_stream_processing_framework_spark.operators.paragraphs import (
    dedup_paragraphs,
)
from python_stream_processing_framework_spark.queries.base import query

_ORACLE = """
    WITH built AS (
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0
                  THEN 'Subscribe to our newsletter' || chr(10) ELSE '' END
             || substr(text, 1, 120) || chr(10)
             || 'copyright ' || source || ' all rights reserved' AS text
      FROM documents),
    segs AS (
      SELECT doc_id, i AS idx, trim(s[i]) AS para
      FROM (SELECT doc_id, string_split(text, chr(10)) AS s FROM built),
           unnest(range(1, len(s) + 1)) AS u(i)),
    keyed AS (
      SELECT doc_id, idx,
             ('0x' || substr(md5(lower(para)), 1, 15))::BIGINT AS h
      FROM segs WHERE para <> ''),
    ranked AS (
      SELECT doc_id, idx,
             row_number() OVER (PARTITION BY h ORDER BY doc_id, idx) AS rn
      FROM keyed),
    rem AS (SELECT doc_id, idx FROM ranked WHERE rn > 1),
    kept AS (
      SELECT s.doc_id, s.idx, s.para
      FROM segs s LEFT JOIN rem r USING (doc_id, idx)
      WHERE s.para <> '' AND r.idx IS NULL),
    outt AS (
      SELECT doc_id, string_agg(para, chr(10) ORDER BY idx) AS text,
             count(*) AS n_kept
      FROM kept GROUP BY doc_id),
    base AS (
      SELECT doc_id,
             count(*) FILTER (WHERE para <> '') AS n_paras
      FROM segs GROUP BY doc_id)
    SELECT b.doc_id, coalesce(o.text, '') AS text,
           CAST(b.n_paras AS BIGINT) AS n_paras,
           CAST(b.n_paras - coalesce(o.n_kept, 0) AS BIGINT) AS n_removed
    FROM base b LEFT JOIN outt o USING (doc_id)
    ORDER BY n_removed DESC, doc_id LIMIT 40
    """


@query(
    "paragraph_dedup",
    _ORACLE,
    doc="CCNet paragraph-level dedup (Wenzek et al. 2020; operators/"
    "paragraphs.dedup_paragraphs): plant a shared banner + per-source "
    "copyright footer, then drop every duplicate paragraph occurrence "
    "corpus-wide, keeping each group's canonical first (lowest "
    "(doc_id, position) over the lower(trim) 60-bit hash). Returns "
    "the 40 documents losing the most paragraphs with their rebuilt "
    "text. The dedup shuffle carries (id, idx, hash) BIGINTs only; "
    "the rebuild re-splits map-side against the per-doc removed-index "
    "arrays — the corpus text is scanned twice, shuffled never. "
    "Oracle replays segmentation, hashing, the keep-first rule, and "
    "the rebuild exactly (all-integer/string).",
)
def paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    built = documents.select(
        "doc_id",
        F.concat(
            F.when(
                F.col("doc_id") % 3 == 0,
                F.lit("Subscribe to our newsletter\n"),
            ).otherwise(F.lit("")),
            F.substring(F.col("text"), 1, 120),
            F.lit("\n"),
            F.concat_ws(
                " ", F.lit("copyright"), F.col("source"), F.lit("all rights reserved")
            ),
        ).alias("text"),
    )
    out = dedup_paragraphs(built, "doc_id", "text", sep="\n", min_count=2)
    return out.orderBy(F.col("n_removed").desc(), F.col("doc_id").asc()).limit(40)
