"""Distributed WordPiece vocabulary induction + greedy encode
(Schuster & Nakajima 2012; the BERT tokenizer family) — completing
the engine's tokenizer trio: BPE (operators/bpe.py, GPT lineage),
unigram-LM (operators/unigram.py, T5/SentencePiece lineage), and
WordPiece here.

Training is the BPE merge loop with a different objective: each
round merges the adjacent symbol pair maximizing the unigram-LM
likelihood gain ``count(ab) / (count(a) * count(b))`` instead of the
raw pair count, and word-internal continuation symbols carry the
``##`` prefix (merging (l, r) produces ``l + strip_##(r)``). The
corpus collapses to a word-frequency table in ONE pass; every round
after that is three vocabulary-bounded shuffles (pair count, symbol
count, deterministic argmax) plus a literal block-aligned rewrite —
the double-space sequence discipline and lineage-truncation loop are
bpe.py's, unchanged.

Score determinism contract: the rational score quantizes to
``score_q = tdiv(count(ab) * 1e12, count(a) * count(b))`` — exact
decimal(38,0) / HUGEINT arithmetic with truncating division, so the
(score_q DESC, left, right) argmax is bit-identical in Spark and
DuckDB (ties after quantization break lexicographically; the same
one-quantization-then-exact pattern as unigram's nano log-probs).

ENCODE is where WordPiece genuinely differs from BPE: the deployed
tokenizer does NOT replay merges — it greedily takes the LONGEST
vocabulary piece matching at the cursor (word-initial pieces plain,
continuations matched with the ``##`` form), and a word with no
match at any cursor is UNK as a whole. Greedy longest-match is a
fold, not a DP: per DISTINCT word, the lattice join (all substrings
x vocabulary — unigram's one-join shape) reduces to the single best
(longest) edge per start offset, and a map-side ``F.aggregate`` walk
advances the cursor through at most ``word_length`` steps. The
corpus never carries the walk: distinct words segment once, the
corpus hash-joins the result (the unigram_encode contract).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from python_stream_processing_framework_spark.operators.bpe import _pairs_expr
from python_stream_processing_framework_spark.operators.common import (
    maybe_broadcast,
)
from python_stream_processing_framework_spark.operators.dedup import tokens_expr
from python_stream_processing_framework_spark.operators.unigram import (
    unigram_word_table,
)

#: Learned merge table: application order, the merged pair (right in
#: its ## surface form), its count and quantized likelihood score.
WP_MERGES_SCHEMA = (
    "merge_idx int, left string, right string,"
    " pair_count bigint, score_q bigint"
)

_SCORE_SCALE = 10**12


def _wp_seq_expr(word: Column) -> Column:
    """Initial WordPiece symbol sequence: first character plain,
    every later character ``##``-prefixed, double-space delimited
    with single-space ends (bpe.py's block-aligned discipline)."""
    syms = F.transform(
        F.sequence(F.lit(1), F.length(word)),
        lambda i: F.when(i == 1, F.substr(word, i, F.lit(1))).otherwise(
            F.concat(F.lit("##"), F.substr(word, i, F.lit(1)))
        ),
    )
    return F.concat(F.lit(" "), F.array_join(syms, "  "), F.lit(" "))


def _merged_form(left: str, right: str) -> str:
    return left + (right[2:] if right.startswith("##") else right)


def wordpiece_train(
    df: DataFrame,
    text_col: str,
    *,
    n_merges: int = 6,
    max_word_len: int = 16,
) -> DataFrame:
    """Learn ``n_merges`` WordPiece merges; returns WP_MERGES_SCHEMA
    rows in application order. Stops early when no pair remains.

    Scale shape: identical to bpe_train (whose loop this reuses
    structurally) with one extra vocabulary-bounded shuffle per round
    for the symbol counts the likelihood denominator needs; the
    vocabulary re-checkpoints per round (lineage truncation) and dead
    rounds release eagerly. ``batch>1`` merge batching is deliberately
    not replicated here — the WordPiece score's denominators change
    whenever EITHER symbol is touched, so the symbol-disjoint
    commutation argument bpe.py documents covers counts but not
    scores; sequential selection is the honest contract."""
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    spark = df.sparkSession
    from python_stream_processing_framework_spark.operators.common import (
        checkpoint_truncate as _truncate,
        release_checkpoint as _release,
    )

    merges: list[tuple[int, str, str, int, int]] = []
    prev = _truncate(
        unigram_word_table(df, text_col, max_word_len=max_word_len).select(
            _wp_seq_expr(F.col("word")).alias("seq"), F.col("cnt")
        )
    )
    while len(merges) < n_merges:
        syms = F.split(F.trim(F.col("seq")), "  ")
        symcnt = (
            prev.select(F.explode(syms).alias("sym"), "cnt")
            .groupBy("sym")
            .agg(F.sum("cnt").alias("c"))
        )
        pairs = (
            prev.select(F.explode(_pairs_expr(syms)).alias("pair"), "cnt")
            .groupBy("pair")
            .agg(F.sum("cnt").alias("total"))
            .select(
                F.split_part(F.col("pair"), F.lit("\x1f"), F.lit(1)).alias("l"),
                F.split_part(F.col("pair"), F.lit("\x1f"), F.lit(2)).alias("r"),
                "total",
            )
        )
        num = F.col("total").cast("decimal(38,0)") * F.lit(_SCORE_SCALE)
        den = F.col("_cl").cast("decimal(19,0)") * F.col("_cr").cast(
            "decimal(19,0)"
        )
        top = (
            pairs.join(
                symcnt.select(F.col("sym").alias("l"), F.col("c").alias("_cl")),
                "l",
            )
            .join(
                symcnt.select(F.col("sym").alias("r"), F.col("c").alias("_cr")),
                "r",
            )
            # counts are positive, so trunc-div == the (a - a%d)/d
            # identity == DuckDB HUGEINT `//`
            .withColumn(
                "score_q",
                ((num - num % den) / den).cast("long"),
            )
            .orderBy(F.col("score_q").desc(), "l", "r")
            .limit(1)
            .collect()
        )
        if not top:
            break
        left, right = top[0]["l"], top[0]["r"]
        merges.append(
            (
                len(merges),
                left,
                right,
                int(top[0]["total"]),
                int(top[0]["score_q"]),
            )
        )
        nxt = _truncate(
            prev.withColumn(
                "seq",
                F.replace(
                    F.col("seq"),
                    F.lit(f" {left}  {right} "),
                    F.lit(f" {_merged_form(left, right)} "),
                ),
            )
        )
        _release(prev)
        prev = nxt
    _release(prev)
    return spark.createDataFrame(merges, WP_MERGES_SCHEMA)


def wordpiece_vocab(
    df: DataFrame,
    text_col: str,
    merges,
    *,
    max_word_len: int = 16,
) -> DataFrame:
    """The serving vocabulary a merge table induces: apply the merges
    to the word table's symbol sequences and count the surviving
    symbols — (piece, cnt), ## continuation forms included. One
    corpus pass (the word table), then map-only rewrites; output is
    vocabulary-bounded."""
    pairs = _merge_pairs(merges)
    seq = _wp_seq_expr(F.col("word"))
    for left, right in pairs:
        seq = F.replace(
            seq,
            F.lit(f" {left}  {right} "),
            F.lit(f" {_merged_form(left, right)} "),
        )
    words = unigram_word_table(df, text_col, max_word_len=max_word_len)
    return (
        words.select(F.explode(F.split(F.trim(seq), "  ")).alias("piece"), "cnt")
        .groupBy("piece")
        .agg(F.sum("cnt").alias("cnt"))
    )


def _merge_pairs(merges) -> list[tuple[str, str]]:
    if isinstance(merges, DataFrame):
        rows = merges.orderBy("merge_idx").collect()
        return [(r["left"], r["right"]) for r in rows]
    return [(l, r) for l, r in merges]


def greedy_segment(words: DataFrame, vocab: DataFrame) -> DataFrame:
    """Greedy longest-match-first segmentation (the deployed
    WordPiece encode) of each word in ``words`` (word, cnt, wl)
    under ``vocab``'s pieces: returns (word, cnt, path) with path
    space-joined (## forms kept — the BERT surface convention).
    Words with no match at some cursor yield NO row (UNK is the
    consumer's join-miss, exactly viterbi_segment's contract).

    Shape: the unigram lattice join (all substrings x vocabulary,
    word-initial spans matched plain, continuations matched as
    ``##`` + substring), reduced to ONE edge per (word, start) — the
    longest — then a map-side fold walks the cursor. Never rides a
    corpus frame."""
    # span cap: the raw max piece length (no ##-stripping — a PLAIN
    # piece can itself start with '##' when words contain '#', and
    # overshooting the cap only adds join-filtered candidates)
    max_len = vocab.agg(F.max(F.length("piece")).alias("m")).head()["m"]
    if max_len is None:
        return words.select(
            "word", "cnt", F.lit(None).cast("string").alias("path")
        ).filter(F.lit(False))
    spans = F.flatten(
        F.transform(
            F.sequence(F.lit(0), F.col("wl") - 1),
            lambda s: F.transform(
                F.sequence(
                    F.lit(1), F.least(F.lit(int(max_len)), F.col("wl") - s)
                ),
                lambda p: F.struct(
                    s.cast("int").alias("s"),
                    (s + p).cast("int").alias("e"),
                    F.when(
                        s == 0, F.substr(F.col("word"), s + 1, p)
                    )
                    .otherwise(
                        F.concat(
                            F.lit("##"), F.substr(F.col("word"), s + 1, p)
                        )
                    )
                    .alias("form"),
                ),
            ),
        )
    )
    cand = (
        words.select("word", "cnt", "wl", F.explode(spans).alias("c"))
        .select("word", "cnt", "wl", "c.s", "c.e", F.col("c.form").alias("form"))
        .join(
            maybe_broadcast(
                vocab.select(F.col("piece").alias("form")).distinct()
            ),
            "form",
        )
    )
    # the single longest edge per (word, start): for a fixed start,
    # e determines the form, so max on struct(e, form) is max(e)
    best = cand.groupBy("word", "cnt", "wl", "s").agg(
        F.max(F.struct("e", "form")).alias("_b")
    )
    per = best.groupBy("word", "cnt", "wl").agg(
        F.collect_list(
            F.struct("s", F.col("_b.e").alias("e"), F.col("_b.form").alias("form"))
        ).alias("cs")
    )

    def _step(acc, _i):
        nx = F.get(F.filter(F.col("cs"), lambda c: c["s"] == acc["pos"]), 0)
        return F.when(
            (acc["pos"] == F.col("wl")) | (acc["pos"] < 0), acc
        ).otherwise(
            F.when(
                nx.isNull(),
                F.struct(
                    F.lit(-1).cast("int").alias("pos"),
                    acc["path"].alias("path"),
                ),
            ).otherwise(
                F.struct(
                    nx["e"].cast("int").alias("pos"),
                    F.concat(acc["path"], F.lit(" "), nx["form"]).alias(
                        "path"
                    ),
                )
            )
        )

    walk = F.aggregate(
        F.sequence(F.lit(1), F.col("wl")),
        F.struct(
            F.lit(0).cast("int").alias("pos"), F.lit("").alias("path")
        ),
        _step,
    )
    return (
        per.select("word", "cnt", "wl", walk.alias("_w"))
        .filter(F.col("_w.pos") == F.col("wl"))
        .select("word", "cnt", F.trim(F.col("_w.path")).alias("path"))
    )


def wordpiece_segment_counts(
    df: DataFrame,
    id_col: str,
    text_col: str,
    vocab: DataFrame,
    *,
    max_word_len: int = 16,
) -> DataFrame:
    """Token-budget counts under a TRAINED WordPiece vocabulary
    (the (piece, cnt) table :func:`wordpiece_vocab` builds from the
    TRAINING corpus — passing the serve-time corpus itself would
    mint char pieces the trained tokenizer never had, silently
    un-UNKing unseen characters): (id, n_words, n_pieces);
    unsegmentable or over-length words count 1 (UNK). One
    vocabulary-bounded segmentation of the DISTINCT words, one
    corpus hash join on `word` — the unigram consumer contract."""
    seg = greedy_segment(
        unigram_word_table(df, text_col, max_word_len=max_word_len), vocab
    ).select(
        "word",
        F.size(F.split(F.col("path"), " ")).cast("bigint").alias("_np"),
    )
    words = df.select(
        F.col(id_col), F.explode(tokens_expr(text_col)).alias("word")
    )
    return (
        words.join(seg, "word", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum(F.coalesce(F.col("_np"), F.lit(1)))
            .cast("bigint")
            .alias("n_pieces"),
        )
    )


def wordpiece_encode(
    df: DataFrame,
    id_col: str,
    text_col: str,
    vocab: DataFrame,
    *,
    max_word_len: int = 16,
) -> DataFrame:
    """Tokenize the corpus under a TRAINED WordPiece vocabulary (see
    :func:`wordpiece_segment_counts` on why the vocab is explicit):
    (id, pieces array<string>) in reading order, ## continuation
    forms kept. UNK convention: unsegmentable or over-length words
    pass through verbatim as one piece (lossless, the unigram_encode
    default; BERT's literal '[UNK]' is a lossy rendering downstream
    can apply trivially). Same one-join scale shape as
    :func:`wordpiece_segment_counts`."""
    seg = greedy_segment(
        unigram_word_table(df, text_col, max_word_len=max_word_len), vocab
    ).select("word", F.split(F.col("path"), " ").alias("_ps"))
    words = df.select(
        F.col(id_col),
        F.posexplode(tokens_expr(text_col)).alias("word_pos", "word"),
    )
    joined = words.join(seg, "word", "left").select(
        id_col,
        "word_pos",
        F.coalesce(F.col("_ps"), F.array(F.col("word"))).alias("_wp"),
    )
    return joined.groupBy(id_col).agg(
        F.flatten(
            F.transform(
                F.array_sort(F.collect_list(F.struct("word_pos", "_wp"))),
                lambda x: x["_wp"],
            )
        ).alias("pieces")
    )
