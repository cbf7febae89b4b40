"""Content-defined chunking (CDC) for chunk-level dedup.

Beyond-reference capability (SURVEY §2.7 charter): fixed-window
chunking (text.chunk_documents) breaks at arbitrary token offsets, so
ONE inserted sentence shifts every downstream chunk and chunk-level
dedup misses everything after the edit. Content-defined boundaries —
the rolling-hash rule behind storage dedup (LBFS/Rabin, FastCDC) —
cut wherever the LOCAL content's hash satisfies a condition, so an
edit only perturbs the chunks it touches and identical passages in
different documents chunk identically regardless of position. That
makes chunk-hash equality a positional-shift-proof near-dup signal:
the standard trick for catching template reuse / syndicated passages
that whole-doc MinHash dilutes and fixed windows mis-align.

Boundary rule (deterministic, engine-portable): position i (1-based,
i >= w) ends a chunk iff

    hash28(concat_ws(' ', toks[i-w+1 .. i])) % divisor == 0

with hash28 the md5-prefix hash of functions/hashing.py. Expected
chunk length is ~``divisor`` tokens; the final position always closes
the last chunk. Everything runs as map-side higher-order functions
over the token array — no explode of the token stream, no Python, no
shuffle; per-doc work is O(len * w) hashing plus O(len) slicing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from python_stream_processing_framework_spark.operators.dedup import tokens_expr


def _boundary_positions(toks_col: str, w: int, divisor: int) -> Column:
    """Sorted 1-based positions that END a chunk (last position always
    included, earlier duplicates filtered out)."""
    gram_hash = (
        f"cast(conv(substr(md5(concat_ws(' ', slice({toks_col}, i - {w - 1}, {w}))),"
        f" 1, 7), 16, 10) as bigint) % 1000003"
    )
    return F.expr(
        f"concat(filter(sequence(1, size({toks_col})),"
        f"  i -> i >= {w} AND i < size({toks_col})"
        f"       AND ({gram_hash}) % {divisor} = 0),"
        f" array(size({toks_col})))"
    )


def cdc_chunks(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    w: int = 4,
    divisor: int = 16,
) -> DataFrame:
    """Split each document into content-defined chunks.

    Returns one row per chunk: (id_col, chunk_idx, chunk_text,
    chunk_hash) with chunk_idx 0-based in document order and
    chunk_hash the md5 of the chunk text. Empty documents yield no
    rows. Map-side HOFs end to end; the only fan-out is the chunk
    explode (~len/divisor rows per doc), which every chunk consumer
    pays anyway.
    """
    if w < 1:
        raise ValueError(f"w must be >= 1, got {w}")
    if divisor < 2:
        raise ValueError(f"divisor must be >= 2, got {divisor}")
    # blank docs yield no rows (split('') is [''], so guard on the
    # trimmed text, not the token-array size)
    toks = (
        df.filter(F.length(F.trim(F.col(text_col))) > 0)
        .select(F.col(id_col), tokens_expr(text_col).alias("_toks"))
    )
    bounded = toks.withColumn(
        "_bpos", _boundary_positions("_toks", w, divisor)
    )
    chunks = bounded.select(
        F.col(id_col),
        F.posexplode(
            F.expr(
                "transform(sequence(1, size(_bpos)),"
                " j -> concat_ws(' ', slice(_toks,"
                "   if(j = 1, 1, element_at(_bpos, j - 1) + 1),"
                "   element_at(_bpos, j)"
                "     - if(j = 1, 1, element_at(_bpos, j - 1) + 1) + 1)))"
            )
        ).alias("chunk_idx", "chunk_text"),
    )
    return chunks.withColumn("chunk_hash", F.md5("chunk_text"))


def cdc_dup_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    w: int = 4,
    divisor: int = 16,
) -> DataFrame:
    """Per-document duplicated-chunk mass under CDC chunking.

    A chunk is `duplicated` when its hash appears in >= 2 DISTINCT
    documents — the positional-shift-proof passage-reuse signal.
    Returns (id_col, n_chunks, dup_chunks) per non-empty document.

    Shuffles: chunk-hash frequency aggregation (narrow hash rows,
    map-side partials) and the per-doc rollup; the frequency table is
    joined back on the hash (equi-join, AQE-broadcast when the
    duplicated set is small). Corpus text never shuffles — only
    hashes and counts do.
    """
    chunks = cdc_chunks(df, id_col, text_col, w=w, divisor=divisor).select(
        F.col(id_col), "chunk_hash"
    )
    freq = chunks.groupBy("chunk_hash").agg(
        F.count_distinct(F.col(id_col)).alias("_docs")
    )
    return (
        chunks.join(freq, "chunk_hash")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
            F.sum((F.col("_docs") >= 2).cast("bigint")).alias("dup_chunks"),
        )
    )
