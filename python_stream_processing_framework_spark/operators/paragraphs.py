"""Paragraph-level dedup — the CCNet pre-filter stage.

Beyond-reference capability (SURVEY §2.7 charter): CCNet (Wenzek et
al. 2020, "CCNet: Extracting High Quality Monolingual Datasets from
Web Crawl Data") deduplicates Common Crawl at the PARAGRAPH level
before any model-based filtering: every paragraph's normalized hash
is compared corpus-wide and all but the first occurrence are dropped,
which removes boilerplate (headers, nav bars, cookie banners) as a
side effect. This sits between whole-doc dedup (dedup.py — too
coarse: the page around the banner is unique) and repeated-span
masking (spans.py — token-window granularity; paragraphs are the
natural unit when the corpus HAS structure).

Semantics: a paragraph occurrence is identified by (id, position);
occurrences sharing a normalized-content hash form a group, and every
occurrence except the group's canonical first — the lexicographically
smallest (id, position) — is deleted when the group has at least
``min_count`` members. ``scope="doc"`` restricts groups to a single
document (the Dolma/Gopher within-doc duplicate-line rule).

Scale shape:

- the paragraph explode is map-only and emits NARROW rows: the dedup
  decision travels as (id, idx, hash60) BIGINTs, never paragraph
  text. The canonical-first reduction is a groupBy(hash) with
  map-side partial min/count — a boilerplate banner repeated 1e8
  times arrives at its reducer as per-partition partials.
- the removed set is only the duplicate occurrences — in a typical
  crawl a few percent of paragraph positions — so the per-doc
  removed-index arrays are a small build side the rebuild join can
  broadcast (AQE decides; same shape as spans.mask_repeated_spans).
- the rebuild is map-only: re-split the text where it lives, drop the
  removed positions with a JVM higher-order filter, re-join. The
  corpus text is scanned twice and shuffled never.

Normalization: hashing lowercases the trimmed paragraph (the CCNet
normalization, minus its digit stripping — see ``normalize_text`` in
operators/text.py for the full NFKC path when the corpus needs it);
output text is the trimmed paragraphs re-joined with the separator,
the operator's canonical form (a projection of the paragraph stream,
like spans.mask_repeated_spans is of the token stream).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from python_stream_processing_framework_spark.functions.hashing import hash60


def _segments_expr(text_col: str, sep: str) -> Column:
    """Array of (para, idx) structs: the sep-split segments of the
    text, trimmed, each carrying its 1-based ORIGINAL position (so
    both the explode path and the rebuild path agree on idx even
    around blank segments). The separator is literal (\\Q...\\E), not
    a regex."""
    segs = F.split(F.col(text_col), "\\Q" + sep + "\\E")
    return F.zip_with(
        segs,
        F.sequence(F.lit(1), F.size(segs)),
        lambda s, i: F.struct(F.trim(s).alias("para"), i.alias("idx")),
    )


def split_paragraphs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    sep: str = "\n",
) -> DataFrame:
    """(id, idx, para): one row per non-empty trimmed paragraph, idx
    the 1-based position among the original sep-split segments."""
    return (
        df.select(F.col(id_col), F.explode(_segments_expr(text_col, sep)).alias("_p"))
        .select(id_col, F.col("_p.idx").alias("idx"), F.col("_p.para").alias("para"))
        .filter(F.col("para") != "")
    )


def dedup_paragraphs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    sep: str = "\n",
    min_count: int = 2,
    scope: str = "corpus",
) -> DataFrame:
    """Drop duplicate paragraphs, keeping each group's canonical first.

    Returns (id, text, n_paras, n_removed): the rebuilt text (kept
    paragraphs re-joined with ``sep``), the pre-dedup non-empty
    paragraph count, and how many occurrences were deleted. Documents
    with nothing removed pass through with n_removed = 0 (text still
    canonicalized — trimmed paragraphs, blank segments dropped).

    ``scope="corpus"`` (CCNet): groups span the whole corpus.
    ``scope="doc"``: groups are per-document (within-doc line dedup).
    """
    if scope not in ("corpus", "doc"):
        raise ValueError(f"scope must be 'corpus' or 'doc', got {scope}")
    paras = split_paragraphs(df, id_col, text_col, sep=sep)
    # narrow rows: the text never enters the dedup shuffle
    keyed = paras.select(
        id_col, "idx", hash60(F.lower(F.col("para"))).alias("_h")
    )
    grp = ["_h"] if scope == "corpus" else [id_col, "_h"]
    firsts = keyed.groupBy(*grp).agg(
        F.min(F.struct(F.col(id_col).alias("i"), F.col("idx").alias("x"))).alias("_k"),
        F.count(F.lit(1)).alias("_c"),
    )
    removed = (
        keyed.join(firsts, grp)
        .filter(
            (F.col("_c") >= min_count)
            & ~((F.col(id_col) == F.col("_k.i")) & (F.col("idx") == F.col("_k.x")))
        )
        .select(id_col, "idx")
    )
    per_doc = removed.groupBy(id_col).agg(
        F.collect_list("idx").alias("_rm")
    )
    rebuilt = df.join(per_doc, [id_col], "left").select(
        F.col(id_col),
        _segments_expr(text_col, sep).alias("_segs"),
        F.coalesce(F.col("_rm"), F.array().cast("array<int>")).alias("_rm"),
    )
    nonblank = F.filter(F.col("_segs"), lambda p: p["para"] != F.lit(""))
    kept = F.filter(
        nonblank, lambda p: ~F.array_contains(F.col("_rm"), p["idx"])
    )
    return rebuilt.select(
        id_col,
        F.array_join(F.transform(kept, lambda p: p["para"]), sep).alias(text_col),
        F.size(nonblank).cast("long").alias("n_paras"),
        F.size("_rm").cast("long").alias("n_removed"),
    )
