"""Repeated-span masking catalog query (operators/spans.py).

The oracle replays the whole pipeline in DuckDB: same dedup-family
tokenizer, the same 60-bit md5-prefix gram hashes, the occurrence
count, the gaps-and-islands merge (window running-max formulation),
and the positional rebuild — every value is an exact integer or
string, so the compare is bit-exact with no rounding at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_stream_processing_framework_spark.catalog import load
from python_stream_processing_framework_spark.operators.spans import (
    mask_repeated_spans,
)
from python_stream_processing_framework_spark.queries.base import query

_ORACLE = """
    WITH tok AS (
      SELECT doc_id, string_split(trim(lower(text)), ' ') AS toks
      FROM documents),
    g AS (
      SELECT doc_id, i AS s, i + 12 AS e,
             ('0x' || substr(md5(array_to_string(toks[i:i+12], ' ')), 1, 15))::BIGINT AS g
      FROM tok, unnest(range(1, len(toks) - 11)) AS u(i)
      WHERE len(toks) >= 13),
    rep AS (SELECT g FROM g GROUP BY g HAVING count(*) >= 2),
    fl AS (SELECT doc_id, s, e FROM g JOIN rep USING (g)),
    brk AS (
      SELECT doc_id, s, e,
             CASE WHEN max(e) OVER w IS NULL OR s > max(e) OVER w + 1
                  THEN 1 ELSE 0 END AS b
      FROM fl
      WINDOW w AS (PARTITION BY doc_id ORDER BY s
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
    isl AS (
      SELECT doc_id, s, e,
             sum(b) OVER (PARTITION BY doc_id ORDER BY s
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS k
      FROM brk),
    sp AS (SELECT doc_id, min(s) AS ss, max(e) AS se FROM isl GROUP BY doc_id, k),
    tokpos AS (
      SELECT doc_id, toks[i] AS t, i
      FROM tok, unnest(range(1, len(toks) + 1)) AS u(i)),
    kept AS (
      SELECT tp.doc_id, tp.t, tp.i FROM tokpos tp
      WHERE NOT EXISTS (SELECT 1 FROM sp
                        WHERE sp.doc_id = tp.doc_id
                          AND tp.i BETWEEN sp.ss AND sp.se)),
    outt AS (
      SELECT doc_id, string_agg(t, ' ' ORDER BY i) AS text,
             count(*) AS n_kept
      FROM kept GROUP BY doc_id),
    base AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens FROM tok)
    SELECT b.doc_id, coalesce(o.text, '') AS text, b.n_tokens,
           b.n_tokens - coalesce(o.n_kept, 0) AS n_removed
    FROM base b LEFT JOIN outt o USING (doc_id)
    WHERE b.n_tokens - coalesce(o.n_kept, 0) > 0
    ORDER BY n_removed DESC, doc_id LIMIT 25
    """


@query(
    "repeated_span_mask",
    _ORACLE,
    doc="Exact-substring dedup, distributed approximation (operators/"
    "spans.mask_repeated_spans; Lee et al. 2021's ExactSubstr): flag "
    "every 13-token window occurring >= 2 times corpus-wide by 60-bit "
    "gram hash, merge overlapping windows per doc (gaps-and-islands), "
    "delete the merged spans from the token stream. Returns the 25 "
    "documents losing the most tokens with their masked text. Narrow "
    "BIGINT gram shuffle with map-side partial counts; the corpus "
    "text never shuffles. Oracle replays hashing, counting, the "
    "island merge, and the positional rebuild exactly (all-integer/"
    "string values, no rounding).",
)
def repeated_span_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    masked = mask_repeated_spans(documents, "doc_id", "text", n=13, min_count=2)
    return (
        masked.filter(F.col("n_removed") > 0)
        .orderBy(F.col("n_removed").desc(), F.col("doc_id").asc())
        .limit(25)
    )


_KEEP_FIRST_ORACLE = """
    WITH tok AS (
      SELECT doc_id, string_split(trim(lower(text)), ' ') AS toks
      FROM documents),
    g AS (
      SELECT doc_id, i AS s, i + 12 AS e,
             ('0x' || substr(md5(array_to_string(toks[i:i+12], ' ')), 1, 15))::BIGINT AS g
      FROM tok, unnest(range(1, len(toks) - 11)) AS u(i)
      WHERE len(toks) >= 13),
    -- keep-first: flag every occurrence except the per-gram earliest
    -- ((doc_id, s) order; occurrences are unique, so no ties)
    fl AS (
      SELECT doc_id, s, e FROM (
        SELECT doc_id, s, e,
               row_number() OVER (PARTITION BY g ORDER BY doc_id, s) AS rk
        FROM g) WHERE rk >= 2),
    brk AS (
      SELECT doc_id, s, e,
             CASE WHEN max(e) OVER w IS NULL OR s > max(e) OVER w + 1
                  THEN 1 ELSE 0 END AS b
      FROM fl
      WINDOW w AS (PARTITION BY doc_id ORDER BY s
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
    isl AS (
      SELECT doc_id, s, e,
             sum(b) OVER (PARTITION BY doc_id ORDER BY s
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS k
      FROM brk),
    sp AS (SELECT doc_id, min(s) AS ss, max(e) AS se FROM isl GROUP BY doc_id, k),
    tokpos AS (
      SELECT doc_id, toks[i] AS t, i
      FROM tok, unnest(range(1, len(toks) + 1)) AS u(i)),
    kept AS (
      SELECT tp.doc_id, tp.t, tp.i FROM tokpos tp
      WHERE NOT EXISTS (SELECT 1 FROM sp
                        WHERE sp.doc_id = tp.doc_id
                          AND tp.i BETWEEN sp.ss AND sp.se)),
    outt AS (
      SELECT doc_id, string_agg(t, ' ' ORDER BY i) AS text,
             count(*) AS n_kept
      FROM kept GROUP BY doc_id),
    base AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens FROM tok)
    SELECT b.doc_id, coalesce(o.text, '') AS text, b.n_tokens,
           b.n_tokens - coalesce(o.n_kept, 0) AS n_removed
    FROM base b LEFT JOIN outt o USING (doc_id)
    WHERE b.n_tokens - coalesce(o.n_kept, 0) > 0
    ORDER BY n_removed DESC, doc_id LIMIT 25
    """


@query(
    "span_dedup_keep_first",
    _KEEP_FIRST_ORACLE,
    doc="Exact-substring dedup with the paper's KEEP-ONE contract "
    "(operators/spans.mask_duplicate_spans_keep_first; Lee et al. "
    "2021 ExactSubstr): a 13-token window masks iff its exact "
    "content occurs anywhere EARLIER in the corpus ((doc, start) "
    "order), so each repeated substring survives in exactly its "
    "first occurrence — where repeated_span_mask deletes every "
    "occurrence past the count threshold. The first occurrence is a "
    "partial-aggregable per-gram MIN of a (doc, start) struct, never "
    "a per-gram window sort (hot boilerplate grams arrive at their "
    "reducer as partials). Oracle replays hashing, the keep-first "
    "rank, the island merge, and the positional rebuild exactly.",
)
def span_dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    from python_stream_processing_framework_spark.operators.spans import (
        mask_duplicate_spans_keep_first,
    )

    (documents,) = load(spark, sf_dir, "documents")
    masked = mask_duplicate_spans_keep_first(documents, "doc_id", "text", n=13)
    return (
        masked.filter(F.col("n_removed") > 0)
        .orderBy(F.col("n_removed").desc(), F.col("doc_id").asc())
        .limit(25)
    )


_MAXIMAL_ORACLE = """
    WITH tok AS (
      SELECT doc_id, string_split(trim(lower(text)), ' ') AS toks
      FROM documents),
    g AS (
      SELECT doc_id, i AS s,
             ('0x' || substr(md5(array_to_string(toks[i:i+12], ' ')), 1, 15))::BIGINT AS g
      FROM tok, unnest(range(1, len(toks) - 11)) AS u(i)
      WHERE len(toks) >= 13),
    ranked AS (
      SELECT doc_id, s, g,
             row_number() OVER (PARTITION BY g ORDER BY doc_id, s) AS rk
      FROM g),
    firsts AS (SELECT g, doc_id AS d0, s AS s0 FROM ranked WHERE rk = 1),
    m AS (
      SELECT r.doc_id, r.s AS start, f.d0 AS src_id, r.s - f.s0 AS diag
      FROM g r JOIN firsts f USING (g)
      WHERE NOT (r.doc_id = f.d0 AND r.s = f.s0)),
    brk AS (
      SELECT doc_id, src_id, diag, start,
             CASE WHEN lag(start) OVER w IS NULL
                    OR start > lag(start) OVER w + 1
                  THEN 1 ELSE 0 END AS b
      FROM m
      WINDOW w AS (PARTITION BY doc_id, src_id, diag ORDER BY start)),
    run AS (
      SELECT doc_id, src_id, diag, start,
             sum(b) OVER (PARTITION BY doc_id, src_id, diag ORDER BY start
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS k
      FROM brk)
    SELECT doc_id,
           min(start) AS span_start,
           max(start) + 12 AS span_end,
           src_id,
           min(start) - diag AS src_start
    FROM run GROUP BY doc_id, src_id, diag, k
    ORDER BY doc_id, span_start, src_id, src_start LIMIT 200
    """


@query(
    "maximal_dup_spans",
    _MAXIMAL_ORACLE,
    doc="Maximal matched runs — the seed-and-extend refinement of the "
    "fixed-window ExactSubstr tier (operators/spans."
    "maximal_duplicate_spans, r14 verdict #3): align every later "
    "occurrence of a repeated 13-token window against the gram's "
    "EARLIEST corpus occurrence and extend runs of consecutive "
    "matches along each (source, offset) diagonal via "
    "gaps-and-islands — per-span provenance (src doc + position) and "
    "pairwise-maximal boundaries, where the island merge fuses "
    "adjacent unrelated duplicates into pseudo-spans. Pairing is "
    "LINEAR (struct-min earliest, never all-pairs); shuffled rows "
    "stay (id, position, BIGINT). Oracle replays hashing, the "
    "earliest-occurrence rank, diagonal islands, and boundary "
    "arithmetic exactly.",
)
def maximal_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from python_stream_processing_framework_spark.operators.spans import (
        maximal_duplicate_spans,
    )

    (documents,) = load(spark, sf_dir, "documents")
    spans = maximal_duplicate_spans(documents, "doc_id", "text", n=13)
    return spans.orderBy(
        "doc_id", "span_start", "src_id", "src_start"
    ).limit(200)
