"""Text-analysis + multimodal queries with exact DuckDB oracles."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from python_stream_processing_framework_spark.catalog import load
from python_stream_processing_framework_spark.operators.dedup import (
    simhash_fingerprints,
)
from python_stream_processing_framework_spark.operators.multimodal import (
    binarize,
    binary_meta,
)
from python_stream_processing_framework_spark.operators.text import (
    LANG_MARKERS,
    STOPWORDS,
    fingerprint,
    lang_id,
    quality_stats,
    repetition_stats,
)
from python_stream_processing_framework_spark.queries.base import query
from python_stream_processing_framework_spark.queries.dedup import _SIMHASH_FP

_TOKS = "string_split(trim(lower(text)), ' ')"
_STOP_LIST = ", ".join(f"'{w}'" for w in STOPWORDS)


@query(
    "text_quality",
    f"""
    WITH t AS (
      SELECT doc_id, text, {_TOKS} AS toks FROM documents
      WHERE len({_TOKS}) >= 1),
    c AS (
      SELECT doc_id,
             CAST(len(toks) AS BIGINT) AS n_tokens,
             CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
             CAST(len(list_filter(toks, x -> x IN ({_STOP_LIST}))) AS BIGINT)
               AS n_stop,
             CAST(length(trim(text)) AS BIGINT) AS n_chars_trim
      FROM t)
    SELECT c.doc_id, n_tokens, n_distinct, n_stop, n_chars_trim,
           CAST(n_distinct AS DOUBLE)/n_tokens AS type_token_ratio,
           CAST(n_stop AS DOUBLE)/n_tokens AS stopword_ratio,
           CAST(n_chars_trim - (n_tokens - 1) AS DOUBLE)/n_tokens
             AS chars_per_token,
           CAST(n_distinct AS DOUBLE)/n_tokens * 0.5
             + (1.0 - CAST(n_stop AS DOUBLE)/n_tokens) * 0.3
             + CAST(least(n_tokens, 100) AS DOUBLE)/100.0 * 0.2
             AS quality_score,
           CAST((length(t.text) + 3) // 4 AS BIGINT) AS est_bpe_tokens,
           CAST(greatest(len(string_split(trim(t.text), ' ')),
                         (length(t.text) + 3) // 4) AS BIGINT) AS est_tokens
    FROM c JOIN t ON t.doc_id = c.doc_id
    """,
    doc="Per-document token stats + deterministic quality score "
    "(length/stopword/type-token features) + token-budget estimates "
    "(whitespace words vs the chars/4 BPE heuristic).",
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    return quality_stats(documents, "doc_id", "text", token_estimates=True)


def _lang_oracle() -> str:
    counts = ",\n             ".join(
        f"CAST(len(list_filter(toks, x -> x IN "
        f"({', '.join(chr(39) + w + chr(39) for w in words)}))) AS BIGINT) AS n_{lang}"
        for lang, words in LANG_MARKERS.items()
    )
    langs = list(LANG_MARKERS)
    cases = []
    for i, lang in enumerate(langs[:-1]):
        conds = " AND ".join(f"n_{lang} >= n_{other}" for other in langs[i + 1 :])
        cases.append(f"WHEN {conds} THEN '{lang}'")
    case_sql = "CASE " + " ".join(cases) + f" ELSE '{langs[-1]}' END"
    return f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    c AS (SELECT doc_id,
             {counts}
          FROM t)
    SELECT doc_id, n_en, n_es, n_de, n_fr, n_zh,
           {case_sql} AS pred_lang
    FROM c
    """


@query(
    "lang_id",
    _lang_oracle(),
    doc="Heuristic language ID: marker-token counts, argmax with fixed "
    "tie-break priority.",
)
def lang_id_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    return lang_id(documents, "doc_id", "text")


@query(
    "doc_fingerprints",
    f"""
    SELECT doc_id,
           CAST(list_reduce(
             list_concat(CAST([0] AS BIGINT[]),
               list_transform(toks, t ->
                 CAST('0x' || substr(md5(t), 1, 7) AS BIGINT) % 1000003)),
             (acc, h) -> (acc * 131 + h) % 2147483647) AS BIGINT)
             AS rolling_fp,
           {_SIMHASH_FP} AS simhash_fp
    FROM (SELECT doc_id, toks,
                 list_transform(list_distinct(toks), t ->
                   CAST('0x' || substr(md5(t), 1, 15) AS BIGINT)) AS hs
          FROM (SELECT doc_id, {_TOKS} AS toks FROM documents) x
          WHERE len(toks) >= 1) t
    """,
    doc="Both document fingerprint families in one per-doc pass: the "
    "order-sensitive polynomial rolling hash (left fold, exact int64 "
    "arithmetic) and the 60-bit SimHash (Charikar-style majority vote "
    "over md5 token hashes — the near-dup fingerprint that "
    "simhash_pairs bands). Map-only; both engines fold identically.",
)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    rolled = fingerprint(documents, "doc_id", "text").withColumnRenamed(
        "fingerprint", "rolling_fp"
    )
    return simhash_fingerprints(rolled, "doc_id", "text").select(
        "doc_id", "rolling_fp", F.col("fingerprint").alias("simhash_fp")
    )


@query(
    "binary_meta",
    """
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS content_md5,
           CAST((octet_length(encode(text)) + 999) // 1000 AS BIGINT)
             AS n_chunks
    FROM documents
    """,
    doc="Multimodal plumbing: opaque binary payload column + typed "
    "metadata (byte length, digest, storage chunk count). The decode "
    "path (mapInPandas) is exercised in tests/test_multimodal.py.",
)
def binary_meta_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    return binary_meta(binarize(documents, "doc_id", "text"), "doc_id")


@query(
    "repetition_stats",
    f"""
    WITH d AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    base AS (
      SELECT doc_id, toks,
             list_transform(range(1, len(toks)),
                            i -> toks[i] || ' ' || toks[i+1]) AS bi
      FROM d WHERE len(toks) >= 2),
    tokpos0 AS (
      SELECT doc_id, toks, unnest(range(1, len(toks)+1)) AS i FROM base),
    tokpos AS (
      SELECT doc_id, i, toks[i] AS tok,
             i - row_number() OVER (PARTITION BY doc_id, toks[i] ORDER BY i)
               AS island
      FROM tokpos0),
    runs AS (
      SELECT doc_id, CAST(MAX(cnt) AS BIGINT) AS max_run FROM (
        SELECT doc_id, tok, island, COUNT(*) AS cnt
        FROM tokpos GROUP BY doc_id, tok, island) t
      GROUP BY doc_id)
    SELECT b.doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(toks) - len(list_distinct(toks)) AS DOUBLE) / len(toks)
             AS dup_word_frac,
           CAST(list_max(list_transform(list_distinct(bi),
                  x -> len(list_filter(bi, y -> y = x)))) AS DOUBLE) / len(bi)
             AS top_bigram_frac,
           r.max_run
    FROM base b JOIN runs r ON r.doc_id = b.doc_id
    """,
    doc="Gopher-style repetition quality signals per doc: duplicate-word "
    "fraction, most-frequent-bigram share, longest identical-token run "
    "(sequential struct fold). Spark side is map-only row-local exprs; "
    "the oracle rebuilds max_run with a gaps-and-islands window.",
)
def repetition_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    return repetition_stats(documents, "doc_id", "text")
