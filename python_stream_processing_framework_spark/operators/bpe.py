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

from python_stream_processing_framework_spark.operators.dedup import tokens_expr

#: Schema of the learned merge table.
MERGES_SCHEMA = "merge_idx int, left string, right string, pair_count bigint"


#: Lineage-truncation cadence for the training loops (r15): a
#: localCheckpoint every N rounds bounds the replace chain at
#: N*batch literal rewrites while cutting the per-round eager
#: checkpoint jobs ~4x. 1 restores the old truncate-every-round
#: behavior (tests pin identical merge tables either way).
_CKPT_EVERY = 4


def _bytes_to_unicode() -> list[str]:
    """The GPT-2 reversible byte<->unicode table (Radford et al.
    2019, the published `bytes_to_unicode`): printable latin-1 bytes
    map to themselves, every other byte to an unused codepoint
    256 + n — so any byte sequence renders as a printable string and
    decodes back losslessly. Index b holds byte b's surface char."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    out: list[str] = [""] * 256
    for b in bs:
        out[b] = chr(b)
    n = 0
    for b in range(256):
        if not out[b]:
            out[b] = chr(256 + n)
            n += 1
    return out


_BYTE_CHARS = _bytes_to_unicode()
#: codepoints of _BYTE_CHARS — the SQL oracle rebuilds the identical
#: table from these ints (no string-literal escaping concerns)
_BYTE_CODEPOINTS = [ord(c) for c in _BYTE_CHARS]


def _seq_expr(word: Column) -> Column:
    """Initial symbol sequence of a word: characters joined by DOUBLE
    spaces with single-space ends (the block-aligned merge-pattern
    anchors — see the module docstring)."""
    chars = F.regexp_extract_all(word, F.lit("."), F.lit(0))
    return F.concat(F.lit(" "), F.array_join(chars, "  "), F.lit(" "))


def _byte_seq_expr(word: Column) -> Column:
    """Byte-level initial sequence (the GPT-2 deployed contract): the
    word's UTF-8 BYTES, each rendered through the reversible
    byte<->unicode table, double-space delimited. Every byte is a
    seed symbol, so every word is segmentable — no UNK exists at any
    vocabulary size. JVM-side: hex the encoded word and fold 2-char
    chunks through the 256-entry literal array."""
    hexs = F.hex(F.encode(word, "UTF-8"))
    # the empty-word guard matters: sequence(1, 0) counts DOWN in
    # Spark, which would index byte -1 instead of yielding no symbols
    syms = F.when(
        F.length(hexs) >= 2,
        F.transform(
            F.sequence(F.lit(1), (F.length(hexs) / F.lit(2)).cast("int")),
            lambda i: F.element_at(
                F.lit(_BYTE_CHARS),
                F.conv(F.substr(hexs, i * 2 - 1, F.lit(2)), 16, 10).cast(
                    "int"
                )
                + 1,
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(F.lit(" "), F.array_join(syms, "  "), F.lit(" "))


def _seed_expr(level: str):
    if level == "char":
        return _seq_expr
    if level == "byte":
        return _byte_seq_expr
    raise ValueError(f"level must be 'char' or 'byte', got {level!r}")


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
    batch: int = 1,
    level: str = "char",
) -> DataFrame:
    """Learn ``n_merges`` BPE merges from the corpus.

    ``level``: ``"char"`` (default — symbols are the word's
    characters) or ``"byte"`` — the GPT-2 deployed contract: symbols
    are the word's UTF-8 bytes rendered through the standard
    reversible byte<->unicode table (_bytes_to_unicode), so no UNK
    can ever exist (all 256 byte symbols seed the vocabulary) and
    learned pieces decode back to exact byte sequences. On pure
    printable-ASCII corpora byte == char bit-exactly (the table maps
    printable ASCII to itself — pinned by test).

    Returns the merge table (merge_idx, left, right, pair_count) —
    merge_idx is application order. Each round: count every adjacent
    symbol pair weighted by word frequency, pick the most frequent
    (ties: count DESC, then (left, right) ascending — fully
    deterministic), rewrite the vocabulary with the merge. Training
    stops early if no pair remains (every word fused to one symbol).

    ``batch > 1`` is the distributed-vocabulary-training shape: each
    round greedily selects up to ``batch`` pairs from the count
    ranking such that no selected pair shares a symbol with a
    higher-ranked selected pair (and no pair's symbol equals a
    higher-ranked selection's MERGED token — that token can gain new
    occurrences mid-round, which would make its measured count
    stale). Symbol-disjoint merges commute: merging (a, b) only
    creates/destroys adjacencies touching ``a`` or ``b``, so every
    selected pair's count and every selected pattern's match set are
    EXACTLY what the round measured, and the chained rewrite applies
    each merge precisely as if it ran alone. The learned table can
    differ from sequential BPE (sequential re-ranks after every
    merge); the hypothesis test pins segmentation-quality parity.
    ``batch=1`` is bit-identical to the published sequential
    algorithm and is what the SQL oracle replays.

    Scale shape: after `word_frequency_table`'s single corpus pass,
    each round is two vocabulary-bounded shuffles plus a bounded
    (``3*batch + 8``-row) top-k collect; the vocabulary is
    re-checkpointed per round — lineage truncation, NOT just caching,
    because an iterative rewrite chain grows the analyzed plan and
    per-round planning cost compounds — and each round's blocks are
    released as soon as the next is built. Driver round-trips are
    O(n_merges / batch), the knob that makes a real 32k-merge
    vocabulary ~2k Spark jobs instead of ~64k.
    """
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    if batch < 1:
        raise ValueError(f"batch must be >= 1, got {batch}")
    seed = _seed_expr(level)
    spark = df.sparkSession
    # Lineage truncation per round (the shared iterative-loop
    # helpers; see checkpoint_truncate's docstring for the measured
    # compounding-analysis-cost rationale)
    from python_stream_processing_framework_spark.operators.common import (
        checkpoint_truncate as _truncate,
        release_checkpoint as _release,
    )

    merges: list[tuple[int, str, str, int]] = []
    prev = _truncate(
        word_frequency_table(df, text_col).select(
            seed(F.col("word")).alias("seq"), F.col("cnt")
        )
    )
    # Truncate lineage every few rounds, not every round (r15): the
    # eager per-round localCheckpoint was one full vocab-table job per
    # merge — a stage barrier at cluster scale — while the thing it
    # guards against (compounding analyzed-plan growth) only needs the
    # chain BOUNDED. Rounds in between stay lazy on the last
    # checkpoint: their collect does the (map-only, vocab-bounded)
    # replace chain in the same job, and the chain never exceeds
    # _CKPT_EVERY * batch literal rewrites. Results are identical —
    # the rewrites applied are the same expressions in the same order.
    anchor = prev  # the last checkpointed frame (owns blocks)
    lazy_rounds = 0
    while len(merges) < n_merges:
        want = min(batch, n_merges - len(merges))
        syms = F.split(F.trim(F.col("seq")), "  ")
        top = (
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
            # overfetch so conflicts rarely starve a round; anything
            # skipped is re-ranked (fresh counts) next round
            .limit(want if want == 1 else 3 * want + 8)
            .collect()
        )
        if not top:
            break
        used: set[str] = set()
        selected: list[tuple[str, str, int]] = []
        for row in top:
            if len(selected) == want:
                break
            left, right = row["l"], row["r"]
            if left in used or right in used:
                continue
            selected.append((left, right, int(row["total"])))
            used.update((left, right, left + right))
        # the top-ranked pair is always conflict-free, so every
        # round selects >= 1 merge and the loop terminates
        rewritten = F.col("seq")
        for i, (left, right, total) in enumerate(selected):
            merges.append((len(merges), left, right, total))
            rewritten = F.replace(
                rewritten,
                F.lit(f" {left}  {right} "),
                F.lit(f" {left}{right} "),
            )
        prev = prev.withColumn("seq", rewritten)
        lazy_rounds += 1
        if lazy_rounds >= _CKPT_EVERY and len(merges) < n_merges:
            nxt = _truncate(prev)
            # the new checkpoint is eager; the previous anchor's
            # blocks are dead — release them now, not at the end
            _release(anchor)
            anchor = prev = nxt
            lazy_rounds = 0
    _release(anchor)
    return spark.createDataFrame(merges, MERGES_SCHEMA)


def bpe_segment_counts(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges,
    *,
    level: str = "char",
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

    seed = _seed_expr(level)

    def _pieces(word: Column) -> Column:
        acc = seed(word)
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


def bpe_encode(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges,
    *,
    level: str = "char",
) -> DataFrame:
    """Tokenize the corpus under a learned merge table — the encode
    step a training pipeline actually runs at 100 TB once the
    vocabulary exists. Output: (id, pieces array<string>) — each
    document's full BPE piece sequence in reading order.

    Scale shape: identical to :func:`bpe_segment_counts` — pure
    map-only column expressions, the merge chain unrolled as literal
    `replace` rewrites inside a transform lambda over the word array,
    flattened per document. No shuffle, no Python, ONE corpus scan;
    plan-pinned exchange-free in tests/test_plans.py. For integer
    token ids downstream, join the distinct pieces against a
    vocabulary table once (the standard id-assignment job) — ids are
    deliberately not baked in here so the piece strings stay
    engine-replayable.
    """
    if isinstance(merges, DataFrame):
        rows = merges.orderBy("merge_idx").collect()
        pairs = [(r["left"], r["right"]) for r in rows]
    else:
        pairs = [(l, r) for l, r in merges]

    seed = _seed_expr(level)

    def _segmented(word: Column) -> Column:
        acc = seed(word)
        for left, right in pairs:
            acc = F.replace(
                acc, F.lit(f" {left}  {right} "), F.lit(f" {left}{right} ")
            )
        return F.split(F.trim(acc), "  ")

    words = tokens_expr(text_col)
    return df.select(
        F.col(id_col),
        F.flatten(F.transform(words, _segmented)).alias("pieces"),
    )
