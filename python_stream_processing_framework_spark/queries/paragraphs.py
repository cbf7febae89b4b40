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


#: r13, the NEAR form. Banner construction: a 10-token subscription
#: banner whose LAST token varies per doc (doc_id % 7) — exact
#: hashing sees 7 unrelated paragraphs, 3-shingle Jaccard between
#: variants is 7/9 = 0.78, squarely the templated-boilerplate-with-
#: small-edits case (Dolma / RefinedWeb G.3) the fuzzy pass exists
#: for. The oracle replays the full pipeline AT THE SAME SHAPE the
#: Spark operator runs it: exact-copy mass collapses BEFORE banding
#: (signatures/bands/candidates over DISTINCT normalized paragraph
#: strings — identical strings have identical shingle sets, hence
#: identical signatures, so banding representatives is exactly
#: output-equivalent to banding occurrences while the candidate join
#: never sees the O(copies^2) blow-up of a banner repeated across
#: every doc), then the 16-hash md5 MinHash + 4x4 banding +
#: exact-Jaccard verify of dedup_minhash_lsh's oracle,
#: recursive-CTE components over the string graph (seeded with ALL
#: distinct strings so exact-dup clusters with no fuzzy partner
#: still collapse — the star edges of expand='star'), the
#: POSITIONAL keep-first (row_number over (doc_id, idx) within each
#: component — the component label's string order never decides),
#: and the same rebuild tail as the exact form.
_NEAR_ORACLE = """
    WITH RECURSIVE built AS (
      SELECT doc_id,
             substr(text, 1, 120) || chr(10)
             || 'subscribe to our newsletter for weekly updates and offers variant'
             || CAST(doc_id % 7 AS VARCHAR) || chr(10)
             || 'copyright ' || source || ' all rights reserved' AS text
      FROM documents),
    segs AS (
      SELECT doc_id, i AS idx, trim(s[i]) AS para
      FROM (SELECT doc_id, string_split(text, chr(10)) AS s FROM built),
           unnest(range(1, len(s) + 1)) AS u(i)),
    p AS (
      SELECT doc_id, idx, para
      FROM segs WHERE para <> ''),
    d AS (
      SELECT np,
             list_distinct(list_transform(range(1, len(toks) - 1),
               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
      FROM (SELECT np, string_split(np, ' ') AS toks
            FROM (SELECT DISTINCT trim(lower(para)) AS np FROM p)) t
      WHERE len(toks) >= 3),
    sigs AS (
      SELECT np, sh,
             list_transform(range(0, 16), s ->
               list_min(list_transform(sh, x ->
                 md5(x || '#' || CAST(s AS VARCHAR))))) AS sig
      FROM d),
    banded AS (
      SELECT np, j,
             array_to_string(sig[j*4+1 : j*4+4], '') AS band_val
      FROM sigs, range(0, 4) t(j)),
    cand AS (
      SELECT DISTINCT x.np AS pa, y.np AS pb
      FROM banded x JOIN banded y
        ON x.j = y.j AND x.band_val = y.band_val AND x.np < y.np),
    pairs AS (
      SELECT pa, pb
      FROM cand JOIN sigs a ON a.np = pa
                JOIN sigs b ON b.np = pb
      WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
            / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
            >= 0.5),
    edges AS (
      SELECT pa AS s, pb AS dd FROM pairs
      UNION SELECT pb, pa FROM pairs),
    reach(node, lab) AS (
      SELECT np, np FROM d
      UNION
      SELECT e.dd, r.lab FROM reach r JOIN edges e ON e.s = r.node),
    comp AS (SELECT node, MIN(lab) AS component FROM reach GROUP BY node),
    labeled AS (
      SELECT p.doc_id, p.idx, c.component
      FROM p JOIN comp c ON c.node = trim(lower(p.para))),
    ranked AS (
      SELECT doc_id, idx,
             row_number() OVER (PARTITION BY component
                                ORDER BY doc_id, idx) AS rn
      FROM labeled),
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
    "paragraph_dedup_near",
    _NEAR_ORACLE,
    doc="Paragraph-level NEAR-dup collapse (operators/paragraphs."
    "dedup_paragraphs_near, r13): templated boilerplate with small "
    "edits — here a 10-token banner whose last token varies per doc "
    "— survives exact paragraph hashing (7 variants, pairwise "
    "3-shingle Jaccard 0.78) and is caught by MinHash-LSH at "
    "paragraph grain: split -> 16-hash/4-band LSH pairs on the "
    "paragraph frame (composite doc:idx node ids, exact-copy mass "
    "collapsed before banding, star expansion) -> connected "
    "components -> positional keep-first -> the shared map-only "
    "rebuild. Returns the 40 documents losing the most paragraphs "
    "with rebuilt text; the oracle replays banding, verify, "
    "recursive-CTE components, and the rebuild bit-exactly.",
)
def paragraph_dedup_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    from python_stream_processing_framework_spark.operators.paragraphs import (
        dedup_paragraphs_near,
    )

    (documents,) = load(spark, sf_dir, "documents")
    built = documents.select(
        "doc_id",
        F.concat(
            F.substring(F.col("text"), 1, 120),
            F.lit(
                "\nsubscribe to our newsletter for weekly updates"
                " and offers variant"
            ),
            (F.col("doc_id") % 7).cast("string"),
            F.lit("\n"),
            F.concat_ws(
                " ",
                F.lit("copyright"),
                F.col("source"),
                F.lit("all rights reserved"),
            ),
        ).alias("text"),
    )
    out = dedup_paragraphs_near(built, "doc_id", "text", threshold=0.5)
    return out.orderBy(
        F.col("n_removed").desc(), F.col("doc_id").asc()
    ).limit(40)
