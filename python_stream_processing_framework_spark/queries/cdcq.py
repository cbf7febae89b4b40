"""Content-defined-chunking catalog query (operators/cdc.py).

The oracle replays the rolling-hash boundary rule, chunk slicing,
chunk hashing, and the cross-document frequency join in DuckDB list
lambdas — every step engine-portable (md5-prefix hash28, 1-based
slices), so (n_chunks, dup_chunks) compare exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from python_stream_processing_framework_spark.catalog import load
from python_stream_processing_framework_spark.operators.cdc import cdc_dup_stats
from python_stream_processing_framework_spark.queries.base import query

_W, _DIV = 4, 16

_H28 = (
    "(('0x' || substr(md5(array_to_string(toks[i-{wm1}:i], ' ')), 1, 7))::BIGINT"
    " % 1000003)"
).format(wm1=_W - 1)


@query(
    "cdc_dup_stats",
    f"""
    WITH toksrc AS (
      SELECT doc_id, string_split(trim(lower(text)), ' ') AS toks
      FROM documents WHERE len(trim(text)) > 0),
    bounded AS (
      SELECT doc_id, toks,
             list_concat(
               list_filter(range(1, len(toks) + 1),
                 i -> i >= {_W} AND i < len(toks)
                      AND {_H28} % {_DIV} = 0),
               [len(toks)]) AS bpos
      FROM toksrc),
    chunks AS (
      SELECT doc_id,
             list_transform(range(1, len(bpos) + 1),
               j -> array_to_string(
                 toks[(CASE WHEN j = 1 THEN 1 ELSE bpos[j-1] + 1 END):bpos[j]],
                 ' ')) AS cs
      FROM bounded),
    cg AS (
      SELECT doc_id, md5(c) AS h
      FROM (SELECT doc_id, unnest(cs) AS c FROM chunks) x),
    freq AS (SELECT h, count(DISTINCT doc_id) AS docs FROM cg GROUP BY h)
    SELECT cg.doc_id,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(sum(CASE WHEN freq.docs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS dup_chunks
    FROM cg JOIN freq USING (h)
    GROUP BY cg.doc_id
    """,
    doc="Content-defined chunking + chunk-level cross-doc dedup "
    "(operators/cdc.cdc_chunks / cdc_dup_stats): boundaries wherever "
    "the rolling 4-token window's hash28 % 16 == 0 (LBFS/FastCDC rule "
    "on token streams), so identical passages chunk identically at "
    "ANY position — the positional-shift-proof passage-reuse signal "
    "fixed windows mis-align and whole-doc MinHash dilutes. Chunking "
    "is map-side HOFs (no token explode, no Python); only chunk "
    "hashes shuffle. Oracle replays boundaries, slices, hashes, and "
    "the frequency join verbatim.",
)
def cdc_dup_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    return cdc_dup_stats(documents, "doc_id", "text", w=_W, divisor=_DIV)
