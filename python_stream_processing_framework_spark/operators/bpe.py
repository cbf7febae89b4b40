"""Distributed BPE vocabulary induction (Sennrich et al. 2016) —
the tokenizer-training step of an LLM data pipeline, Spark-first.

Beyond-reference capability (SURVEY §2.7). The published algorithm
is inherently sequential in its merge choices but NOT in its data:
after ONE corpus pass collapses the corpus to a word-frequency
table, every round of the merge loop runs on that vocabulary-bounded
table (two small shuffles: pair count + argmax), never on the corpus
again. That is the published shape — reference BPE trainers operate
on word counts, not raw text — distributed.

Determinism contract: symbol sequences are DOUBLE-space-delimited
strings with single-space ends (`' a  b  c '`); a merge of pair
(l, r) is the literal replacement ``' l  r ' -> ' lr '``. The
2-char separators make every match block-aligned on BOTH sides —
a one-sided delimiter is subtly wrong when one symbol is a string
prefix of another (`' a ab'` contains `' a a'`: the leading-space
form merged across the symbol boundary; caught by the hypothesis
parity test against sequential BPE) — while left-to-right
non-overlapping replacement still gives the standard
greedy-leftmost application (`' a  a  a '` under (a,a) ->
`' aa  a '`; runs of any length pair off left-to-right because
consumed matches end on the first char of the next separator).
String replacement and the (count DESC, left, right) argmax
tie-break behave identically in Spark and DuckDB, so the whole
training loop unrolls into SQL CTEs bit-exactly (queries/bpe.py),
the same way the PQ Lloyd trainer does.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from python_stream_processing_framework_spark.operators.common import materialize
from python_stream_processing_framework_spark.operators.dedup import tokens_expr

#: Schema of the learned merge table.
MERGES_SCHEMA = "merge_idx int, left string, right string, pair_count bigint"


def _seq_expr(word: Column) -> Column:
    """Initial symbol sequence of a word: characters joined by DOUBLE
    spaces with single-space ends (the block-aligned merge-pattern
    anchors — see the module docstring)."""
    chars = F.regexp_extract_all(word, F.lit("."), F.lit(0))
    return F.concat(F.lit(" "), F.array_join(chars, "  "), F.lit(" "))


def _pairs_expr(syms: Column) -> Column:
    """Adjacent symbol pairs as 'l<US>r' strings (every occurrence —
    the standard BPE count); empty for single-symbol sequences."""
    n = F.size(syms)
    return F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat_ws(
                "\x1f", F.element_at(syms, i), F.element_at(syms, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def word_frequency_table(df: DataFrame, text_col: str) -> DataFrame:
    """The one corpus pass: (word, cnt) over whitespace tokens.
    Output size is VOCABULARY-bounded; everything downstream (the
    whole merge loop) runs on this table, never on the corpus."""
    return (
        df.select(F.explode(tokens_expr(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def bpe_train(
    df: DataFrame,
    text_col: str,
    *,
    n_merges: int = 8,
) -> DataFrame:
    """Learn ``n_merges`` BPE merges from the corpus.

    Returns the merge table (merge_idx, left, right, pair_count) —
    merge_idx is application order. Each round: count every adjacent
    symbol pair weighted by word frequency, pick the most frequent
    (ties: count DESC, then (left, right) ascending — fully
    deterministic), rewrite the vocabulary with the merge. Training
    stops early if no pair remains (every word fused to one symbol).

    Scale shape: after `word_frequency_table`'s single corpus pass,
    each round is two vocabulary-bounded shuffles plus a 1-row
    argmax collect; the vocabulary is re-materialized per round (the
    PQ-trainer pattern — one full pass per round, nothing replayed)
    and each round's cache is released as soon as the next is built.
    Driver traffic: one (pair, count) row per round.
    """
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    vocab = materialize(
        word_frequency_table(df, text_col).select(
            _seq_expr(F.col("word")).alias("seq"), F.col("cnt")
        )
    )
    spark = df.sparkSession
    merges: list[tuple[int, str, str, int]] = []
    prev = vocab
    for i in range(n_merges):
        syms = F.split(F.trim(F.col("seq")), "  ")
        best = (
            prev.select(F.explode(_pairs_expr(syms)).alias("pair"), "cnt")
            .groupBy("pair")
            .agg(F.sum("cnt").alias("total"))
            # tie-break on the (left, right) TUPLE, not the joined
            # pair string — identical to ORDER BY (total DESC, l, r)
            # in the SQL oracle regardless of symbol contents
            .select(
                F.split_part(F.col("pair"), F.lit("\x1f"), F.lit(1)).alias("l"),
                F.split_part(F.col("pair"), F.lit("\x1f"), F.lit(2)).alias("r"),
                "total",
            )
            .orderBy(F.col("total").desc(), F.col("l"), F.col("r"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        left, right = best[0]["l"], best[0]["r"]
        merges.append((i, left, right, int(best[0]["total"])))
        nxt = materialize(
            prev.withColumn(
                "seq",
                F.replace(
                    F.col("seq"),
                    F.lit(f" {left}  {right} "),
                    F.lit(f" {left}{right} "),
                ),
            )
        )
        # the new round's cache is eagerly populated; the previous
        # round's blocks are dead — release them now, not at the end
        prev.unpersist()
        prev = nxt
    prev.unpersist()
    return spark.createDataFrame(merges, MERGES_SCHEMA)


def bpe_segment_counts(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges,
) -> DataFrame:
    """Apply a learned merge table to the corpus and count the BPE
    pieces each document tokenizes to.

    ``merges`` is the DataFrame `bpe_train` returns (collected here —
    bounded by n_merges) or a list of (left, right) tuples. Output:
    (id, n_words, n_pieces) — n_pieces is the document's token count
    under the learned vocabulary, the number a token-budget planner
    actually wants once a tokenizer exists.

    Scale shape: pure map-only column expressions — each word's
    symbol sequence runs the merge chain IN ORDER inside a transform
    lambda, then piece counts sum per document. No shuffle, no
    Python, one corpus scan; the merge chain rides in the plan as
    literals.
    """
    if isinstance(merges, DataFrame):
        rows = merges.orderBy("merge_idx").collect()
        pairs = [(r["left"], r["right"]) for r in rows]
    else:
        pairs = [(l, r) for l, r in merges]

    def _pieces(word: Column) -> Column:
        acc = _seq_expr(word)
        for left, right in pairs:
            acc = F.replace(
                acc, F.lit(f" {left}  {right} "), F.lit(f" {left}{right} ")
            )
        return F.size(F.split(F.trim(acc), "  ")).cast("bigint")

    words = tokens_expr(text_col)
    return df.select(
        F.col(id_col),
        F.size(words).cast("bigint").alias("n_words"),
        F.aggregate(
            F.transform(words, _pieces),
            F.lit(0).cast("bigint"),
            lambda a, x: a + x,
        ).alias("n_pieces"),
    )
