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
    return _rebuild_dropping(df, removed, id_col, text_col, sep)


def _rebuild_dropping(
    df: DataFrame, removed: DataFrame, id_col: str, text_col: str, sep: str
) -> DataFrame:
    """Shared rebuild tail (exact + near paragraph dedup): drop the
    (id, idx) occurrences in ``removed`` and re-join the survivors.
    Map-only over the corpus: the per-doc removed-index arrays are a
    small build side (duplicate occurrences only), the text re-splits
    where it lives, and a JVM higher-order filter drops positions —
    the corpus text is scanned twice and shuffled never."""
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


def dedup_paragraphs_near(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    sep: str = "\n",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    threshold: float = 0.5,
    max_band_freq: int | None = None,
) -> DataFrame:
    """Paragraph-level NEAR-dup collapse — the fuzzy sibling of
    :func:`dedup_paragraphs` (Dolma / RefinedWeb G.3: templated
    boilerplate with small edits — a dateline, a counter, a name —
    survives exact paragraph hashing; fuzzy dedup at paragraph grain
    catches it).

    Composition, not new machinery: split_paragraphs →
    ``minhash_lsh_pairs`` on the PARAGRAPH frame (node id = the
    collision-free composite string ``doc:idx``; ``expand='star'`` so
    exact-copy clusters span linearly) → connected components →
    keep-first collapse (the canonical survivor of each near-dup
    component is its smallest (id, idx) occurrence, re-derived from
    the members, NOT the component label — the label is a string min
    over composite ids, deterministic but not positional) → the
    shared positional rebuild (:func:`_rebuild_dropping`).

    Returns (id, text, n_paras, n_removed), same contract as the
    exact form. Paragraphs shorter than ``shingle_k`` tokens carry no
    signature and are never dropped (the module-wide MinHash recall
    floor — pair with the exact form, which this operator does NOT
    subsume, for short-paragraph mass). ``max_band_freq`` is the same
    hot-bucket guard as the document-level path: a banner repeated
    1e8 times is exactly the hot-band scenario at crawl scale.

    Scale shape: the paragraph frame is corpus-linear but NARROW
    (id, idx, para); exact-copy mass collapses before banding
    (collapse_exact inside minhash_lsh_pairs), so the band join sees
    one representative per identical banner; components run on the
    near-dup subgraph only (duplicate occurrences, a few percent of
    positions); the rebuild never shuffles the corpus text."""
    paras = split_paragraphs(df, id_col, text_col, sep=sep)
    pframe = paras.select(
        F.concat(
            F.col(id_col).cast("string"), F.lit(":"), F.col("idx").cast("string")
        ).alias("_pid"),
        F.col(id_col),
        "idx",
        "para",
    )
    from python_stream_processing_framework_spark.operators.dedup import (
        minhash_lsh_pairs,
    )
    from python_stream_processing_framework_spark.operators.graph import (
        connected_components,
    )

    pairs = minhash_lsh_pairs(
        pframe,
        "_pid",
        "para",
        num_hashes=num_hashes,
        bands=bands,
        shingle_k=shingle_k,
        threshold=threshold,
        expand="star",
        max_band_freq=max_band_freq,
    )
    comp = connected_components(pairs, "doc_a", "doc_b")
    from python_stream_processing_framework_spark.operators.common import (
        persist_lazy,
    )

    # labeled (paragraphs IN near-dup components only — a few percent
    # of positions) feeds BOTH the per-component firsts aggregate and
    # the removed probe; unpersisted, each consumer re-ran the corpus
    # paragraph explode under the comp join (r15, guide §2.4). Lazy:
    # the firsts broadcast build populates the blocks, the probe
    # reads them.
    labeled = persist_lazy(
        pframe.join(comp, pframe["_pid"] == comp["node"]).select(
            id_col, "idx", "component"
        )
    )
    firsts = labeled.groupBy("component").agg(
        F.min(
            F.struct(F.col(id_col).alias("i"), F.col("idx").alias("x"))
        ).alias("_k")
    )
    removed = (
        labeled.join(firsts, "component")
        .filter(
            ~(
                (F.col(id_col) == F.col("_k.i"))
                & (F.col("idx") == F.col("_k.x"))
            )
        )
        .select(id_col, "idx")
    )
    return _rebuild_dropping(df, removed, id_col, text_col, sep)


def _positional_pid(df: DataFrame, id_col: str) -> Column:
    """Composite paragraph key whose STRING order equals the batch
    operator's positional (id, idx) struct order: idx is always
    zero-padded; a numeric doc id is zero-padded too (string ids
    already compare in their native order). The admission index's
    within-batch keep rule is the string-min node id, so this padding
    is what makes the streaming survivor choice match
    :func:`dedup_paragraphs_near`'s keep-first-positional collapse.

    The separator is ``\\x01``, which sorts BELOW every printable
    character: with a printable separator such as ':', prefix-related
    string ids invert ('doc1' < 'doc10' positionally, but
    'doc1:...' > 'doc10...' string-wise since ':' > '0' — the r14
    ADVICE finding). Ids containing ``\\x01`` themselves are out of
    contract. Negative numeric ids are REFUSED at execution
    (zero-padding cannot order a leading '-'; mirroring the probe
    trainer's ragged-input refusal rather than silently falling back
    to a non-positional survivor)."""
    from pyspark.sql.types import NumericType

    idc = F.col(id_col).cast("string")
    if isinstance(df.schema[id_col].dataType, NumericType):
        idc = F.when(
            F.col(id_col) >= 0, F.lpad(idc, 24, "0")
        ).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        "_positional_pid: negative numeric doc id "
                    ),
                    idc,
                    F.lit(
                        " cannot be positionally ordered by "
                        "zero-padding; use non-negative ids"
                    ),
                )
            )
        )
    return F.concat(
        idc, F.lit("\x01"), F.lpad(F.col("idx").cast("string"), 10, "0")
    )


def dedup_paragraphs_near_admit(
    batch: DataFrame,
    index_path: str,
    batch_tag: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    threshold: float = 0.5,
    max_band_freq: int | None = None,
) -> DataFrame:
    """Incremental paragraph-grain NEAR-dup admission (the streaming
    tier of :func:`dedup_paragraphs_near`, r13 verdict #4): fuzzy-
    dedup this batch's paragraphs against each other AND against
    every paragraph ADMITTED by earlier batches, then rebuild each
    document without its losing paragraphs. Returns (id, text,
    n_paras, n_removed) — the batch operator's contract, computed
    batch-incrementally.

    Composition, not new machinery: split_paragraphs → the persisted
    MinHash admission index (operators/dedup_index.minhash_index_admit)
    at paragraph grain — node ids are positional composite keys
    (:func:`_positional_pid`), signatures land in
    ``sigs/batch=<batch_tag>`` idempotently (a redelivery
    re-adjudicates against all OTHER batches and rewrites its own
    partition, the facade-wide write-twice contract) — → the shared
    positional rebuild (:func:`_rebuild_dropping`).

    Inherited semantics: within-batch near-dup components keep their
    positionally-first member (the padding makes string-min ==
    positional min); a paragraph near-dupping any earlier-admitted
    paragraph is removed; paragraphs shorter than ``shingle_k``
    tokens carry no signature — admitted verbatim, never indexed,
    never dropped (the module-wide MinHash recall floor). Exact-copy
    mass inside a batch collapses before banding exactly as the batch
    operator does (minhash_lsh_pairs' collapse-first shape rides
    inside the admit).

    Scale shape: the paragraph frame is batch-linear and NARROW; the
    cross-index band join is banded, never all-pairs; the rebuild is
    map-only over the batch. Caller releases caches after consuming
    (the minhash_index_admit contract)."""
    from python_stream_processing_framework_spark.operators.dedup_index import (
        minhash_index_admit,
    )

    paras = split_paragraphs(batch, id_col, text_col, sep=sep)
    pframe = paras.select(
        _positional_pid(paras, id_col).alias("_pid"),
        F.col(id_col),
        "idx",
        "para",
    )
    admitted = minhash_index_admit(
        pframe,
        index_path,
        batch_tag,
        id_col="_pid",
        text_col="para",
        num_hashes=num_hashes,
        bands=bands,
        shingle_k=shingle_k,
        threshold=threshold,
        max_band_freq=max_band_freq,
    )
    removed = pframe.join(
        admitted.select("_pid"), "_pid", "left_anti"
    ).select(id_col, "idx")
    return _rebuild_dropping(batch, removed, id_col, text_col, sep)


#: Exact nav/boilerplate phrases removed line-wise (lower(trim)
#: match) — the RefinedWeb G.2 list's shape.
NAV_PHRASES = (
    "sign in",
    "sign up",
    "log in",
    "click here",
    "read more",
    "accept cookies",
    "share this",
    "advertisement",
)


def _line_drop_expr(line: Column) -> Column:
    """True when a line is boilerplate under the fixed rule battery:
    all-caps (has uppercase, no lowercase), numeric-only, a social
    counter ("12 likes"), or an exact nav phrase."""
    low = F.lower(F.trim(line))
    return (
        line.rlike("^[^a-z]*[A-Z][^a-z]*$")
        | line.rlike("^[0-9 .,%:/-]+$")
        | low.rlike("^[0-9]+ (likes?|comments?|shares?|views?)$")
        | low.isin(*NAV_PHRASES)
    )


def line_corrections(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    sep: str = "\n",
    max_removed_ratio: float = 0.05,
) -> DataFrame:
    """RefinedWeb-style line-wise corrections (Penedo et al. 2023,
    Appendix G.2): delete boilerplate LINES — all-caps headers,
    numeric-only rows, social counters, exact nav phrases — and flag
    documents the corrections gutted (removed fraction above
    ``max_removed_ratio``: RefinedWeb drops those outright).

    Returns (id, text, n_lines, n_removed, keep_doc): rebuilt text
    (kept lines re-joined, blank lines dropped throughout), the
    non-blank line count, how many lines the battery deleted, and the
    document-level keep flag. Pure map-only JVM expressions — the
    rules run inside a higher-order filter where the text lives, no
    shuffle at all (compare dedup_paragraphs, whose corpus-wide rule
    needs one narrow exchange)."""
    segs = F.filter(
        _segments_expr(text_col, sep), lambda p: p["para"] != F.lit("")
    )
    kept = F.filter(segs, lambda p: ~_line_drop_expr(p["para"]))
    n_lines = F.size(segs).cast("long")
    n_removed = (F.size(segs) - F.size(kept)).cast("long")
    return df.select(
        F.col(id_col),
        F.array_join(F.transform(kept, lambda p: p["para"]), sep).alias(
            text_col
        ),
        n_lines.alias("n_lines"),
        n_removed.alias("n_removed"),
        (
            (n_lines == 0)
            | (
                n_removed.cast("double") / F.greatest(n_lines, F.lit(1)).cast("double")
                <= F.lit(float(max_removed_ratio))
            )
        ).alias("keep_doc"),
    )
