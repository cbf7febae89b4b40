"""Line-corrections catalog query (operators/paragraphs.py
line_corrections).

Plants the RefinedWeb G.2 noise shapes deterministically — an
all-caps sponsor header, a social counter, a nav phrase, a
numeric-only date row — around each document's body, then runs the
real rule battery. The oracle replays segmentation and every rule
(RE2/Java-regex common subset; exact phrase list inlined from the
operator's NAV_PHRASES constant) plus the 5% document-keep rule;
rebuilt text, counts, and the keep flag all value-compare.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_stream_processing_framework_spark.catalog import load
from python_stream_processing_framework_spark.operators.paragraphs import (
    NAV_PHRASES,
    line_corrections,
)
from python_stream_processing_framework_spark.queries.base import query

_NAV_SQL = ", ".join(f"'{p}'" for p in NAV_PHRASES)

_ORACLE = f"""
    WITH built AS (
      SELECT doc_id,
             CASE WHEN doc_id % 2 = 0 THEN 'SPONSORED CONTENT' || chr(10)
                  ELSE '' END
             || substr(text, 1, 80) || chr(10)
             || CASE WHEN doc_id % 3 = 0
                     THEN CAST(doc_id % 97 AS VARCHAR) || ' likes' || chr(10)
                     ELSE '' END
             || CASE WHEN doc_id % 5 = 0 THEN 'Click Here' || chr(10)
                     ELSE '' END
             || '2024 11 05' AS text
      FROM documents),
    segs AS (
      SELECT doc_id, i AS idx, trim(s[i]) AS line
      FROM (SELECT doc_id, string_split(text, chr(10)) AS s FROM built),
           unnest(range(1, len(s) + 1)) AS u(i)
      WHERE trim(s[i]) <> ''),
    flagged AS (
      SELECT doc_id, idx, line,
             (regexp_matches(line, '^[^a-z]*[A-Z][^a-z]*$')
              OR regexp_matches(line, '^[0-9 .,%:/-]+$')
              OR regexp_matches(lower(trim(line)),
                                '^[0-9]+ (likes?|comments?|shares?|views?)$')
              OR lower(trim(line)) IN ({_NAV_SQL})) AS drop_it
      FROM segs),
    agg AS (
      SELECT doc_id,
             coalesce(string_agg(CASE WHEN NOT drop_it THEN line END,
                                 chr(10) ORDER BY idx), '') AS text,
             CAST(count(*) AS BIGINT) AS n_lines,
             CAST(count(*) FILTER (WHERE drop_it) AS BIGINT) AS n_removed
      FROM flagged GROUP BY doc_id),
    base AS (SELECT doc_id FROM built)
    SELECT b.doc_id,
           coalesce(a.text, '') AS text,
           coalesce(a.n_lines, 0) AS n_lines,
           coalesce(a.n_removed, 0) AS n_removed,
           (coalesce(a.n_lines, 0) = 0
            OR CAST(coalesce(a.n_removed, 0) AS DOUBLE)
               / greatest(coalesce(a.n_lines, 0), 1) <= 0.05) AS keep_doc
    FROM base b LEFT JOIN agg a USING (doc_id)
    ORDER BY doc_id
    """


@query(
    "line_corrections",
    _ORACLE,
    doc="RefinedWeb line-wise corrections (Penedo et al. 2023 G.2; "
    "operators/paragraphs.line_corrections): plant an all-caps "
    "sponsor header, a social counter, a nav phrase, and a "
    "numeric-only date row, then delete boilerplate lines under the "
    "fixed rule battery and flag documents where corrections removed "
    "more than 5% of lines (RefinedWeb drops those). Pure map-only "
    "JVM higher-order filter — zero shuffles. Oracle replays "
    "segmentation, every rule (common regex subset; phrase list "
    "inlined from the operator's constant), the rebuild, and the "
    "keep rule; strings, counts, and flags value-compare.",
)
def line_corrections_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    built = documents.select(
        "doc_id",
        F.concat(
            F.when(F.col("doc_id") % 2 == 0, F.lit("SPONSORED CONTENT\n"))
            .otherwise(F.lit("")),
            F.substring(F.col("text"), 1, 80),
            F.lit("\n"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat((F.col("doc_id") % 97).cast("string"), F.lit(" likes\n")),
            ).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 5 == 0, F.lit("Click Here\n")).otherwise(
                F.lit("")
            ),
            F.lit("2024 11 05"),
        ).alias("text"),
    )
    return line_corrections(built, "doc_id", "text")
