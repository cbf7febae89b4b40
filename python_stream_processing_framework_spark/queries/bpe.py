"""BPE vocabulary-induction queries with exact DuckDB oracles.

The oracle unrolls the ENTIRE training loop in SQL — the word-
frequency pass, then per round: weighted adjacent-pair count, the
(count DESC, left, right) argmax, and the literal block-aligned
merge rewrite — exactly the way queries/pq.py unrolls Lloyd rounds.
That is possible because operators/bpe.py defines every step over
engine-portable primitives: integer counts, binary-collation string
ordering, and left-to-right non-overlapping literal replacement.

Non-degeneracy note: the unrolled SQL assumes every round finds at
least one pair (true for any corpus whose words aren't all fused
within n_merges rounds — trivially true here); bpe_train itself
stops early on a degenerate corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from python_stream_processing_framework_spark.catalog import load
from python_stream_processing_framework_spark.operators.bpe import (
    bpe_encode,
    bpe_segment_counts,
    bpe_train,
)
from python_stream_processing_framework_spark.queries.base import query

_N_MERGES = 8

_TOKS = "string_split(trim(lower(text)), ' ')"


def _bpe_ctes(n_merges: int) -> str:
    """CTE chain: word frequencies -> v0 (char sequences) -> per
    round r: p{r} pair counts, b{r} argmax, v{r+1} rewrite."""
    parts = [
        f"""
    wf AS MATERIALIZED (SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt
           FROM (SELECT unnest({_TOKS}) AS word FROM documents) z
           GROUP BY word),
    v0 AS MATERIALIZED (SELECT ' ' || array_to_string(regexp_extract_all(word, '.'), '  ')
                    || ' ' AS seq,
                  cnt
           FROM wf)"""
    ]
    for r in range(n_merges):
        parts.append(
            f"""
    p{r} AS MATERIALIZED (SELECT pr[1] AS l, pr[2] AS r_, SUM(cnt) AS total
             FROM (SELECT cnt,
                          unnest(list_transform(range(1, len(syms)),
                            i -> [syms[i], syms[i+1]])) AS pr
                   FROM (SELECT cnt, string_split(trim(seq), '  ') AS syms
                         FROM v{r}) z) zz
             GROUP BY 1, 2),
    b{r} AS MATERIALIZED (SELECT l, r_, total FROM p{r}
             ORDER BY total DESC, l, r_ LIMIT 1),
    v{r + 1} AS MATERIALIZED (SELECT replace(seq,
                   ' ' || (SELECT l FROM b{r}) || '  ' || (SELECT r_ FROM b{r}) || ' ',
                   ' ' || (SELECT l FROM b{r}) || (SELECT r_ FROM b{r}) || ' ') AS seq,
                 cnt FROM v{r})"""
        )
    return ",".join(parts)


def _merges_union(n_merges: int) -> str:
    return " UNION ALL ".join(
        f"SELECT CAST({r} AS INTEGER) AS merge_idx, l AS \"left\","
        f" r_ AS \"right\", CAST(total AS BIGINT) AS pair_count FROM b{r}"
        for r in range(n_merges)
    )


@query(
    "bpe_merges",
    f"""
    WITH {_bpe_ctes(_N_MERGES)}
    {_merges_union(_N_MERGES)}
    """,
    doc="Distributed BPE vocabulary induction (Sennrich et al. 2016, "
    "operators/bpe.py): ONE corpus pass collapses the text to a "
    "word-frequency table, then each of the 8 merge rounds runs two "
    "vocabulary-bounded shuffles (weighted adjacent-pair count + "
    "deterministic argmax) and a literal block-aligned rewrite — the "
    "corpus is never touched again. The oracle unrolls all 8 rounds "
    "in SQL and value-compares the full merge table (order, pairs, "
    "counts).",
)
def bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    return bpe_train(documents, "text", n_merges=_N_MERGES)


@query(
    "bpe_token_counts",
    f"""
    WITH {_bpe_ctes(_N_MERGES)},
    mm AS ({_merges_union(_N_MERGES)}),
    pat AS (SELECT list(
              ' ' || "left" || '  ' || "right" || ' ' || chr(31) ||
              ' ' || "left" || "right" || ' '
              ORDER BY merge_idx) AS ps
            FROM mm)
    SELECT doc_id,
           CAST(len(words) AS BIGINT) AS n_words,
           CAST(list_sum(list_transform(words, w ->
             len(string_split(trim(
               list_reduce(
                 list_prepend(
                   ' ' || array_to_string(regexp_extract_all(w, '.'), '  ')
                       || ' ',
                   ps),
                 (acc, p) -> replace(acc, split_part(p, chr(31), 1),
                                     split_part(p, chr(31), 2)))),
               '  ')))) AS BIGINT) AS n_pieces
    FROM (SELECT doc_id, {_TOKS} AS words FROM documents) d, pat
    """,
    doc="Apply the learned BPE merges back to the corpus and count "
    "each document's pieces under the induced vocabulary — the "
    "token-budget number once a real tokenizer exists (operators/"
    "bpe.bpe_segment_counts). Map-only: the 8-merge chain rides in "
    "the plan as literals and every word folds through it in order "
    "inside a transform lambda. The oracle re-derives the merges "
    "(same unrolled CTEs) and replays the identical fold via "
    "list_reduce.",
)
def bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    merges = bpe_train(documents, "text", n_merges=_N_MERGES)
    return bpe_segment_counts(documents, "doc_id", "text", merges)


@query(
    "bpe_encode_pieces",
    f"""
    WITH {_bpe_ctes(_N_MERGES)},
    mm AS ({_merges_union(_N_MERGES)}),
    pat AS (SELECT list(
              ' ' || "left" || '  ' || "right" || ' ' || chr(31) ||
              ' ' || "left" || "right" || ' '
              ORDER BY merge_idx) AS ps
            FROM mm),
    enc AS (SELECT doc_id,
              flatten(list_transform(words, w ->
                string_split(trim(
                  list_reduce(
                    list_prepend(
                      ' ' || array_to_string(regexp_extract_all(w, '.'), '  ')
                          || ' ',
                      ps),
                    (acc, p) -> replace(acc, split_part(p, chr(31), 1),
                                        split_part(p, chr(31), 2)))),
                  '  '))) AS pieces
            FROM (SELECT doc_id, {_TOKS} AS words FROM documents
                  WHERE doc_id % 20 = 0) d, pat)
    SELECT doc_id, CAST(gs - 1 AS BIGINT) AS piece_idx, pieces[gs] AS piece
    FROM enc, LATERAL (SELECT unnest(generate_series(1, len(enc.pieces))) AS gs) g
    """,
    doc="The ENCODE step a training pipeline runs once the vocabulary "
    "exists: tokenize every document into its BPE piece sequence under "
    "the learned merges (operators/bpe.bpe_encode). Map-only — the "
    "merge chain rides in the plan as literal replaces, one corpus "
    "scan, zero exchanges (plan-pinned); the oracle re-derives the "
    "merges and replays the identical fold, exploding pieces with "
    "ordinality. A deterministic 5% doc sample (doc_id % 20 = 0) "
    "bounds the compared row count.",
)
def bpe_encode_pieces(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    (documents,) = load(spark, sf_dir, "documents")
    merges = bpe_train(documents, "text", n_merges=_N_MERGES)
    enc = bpe_encode(
        documents.filter(F.col("doc_id") % 20 == 0), "doc_id", "text", merges
    )
    return enc.select(
        "doc_id",
        F.posexplode("pieces").alias("piece_idx", "piece"),
    ).select("doc_id", F.col("piece_idx").cast("bigint").alias("piece_idx"), "piece")
