"""Unigram-LM tokenizer-induction query with an exact DuckDB oracle.

The oracle unrolls the ENTIRE Viterbi-EM training loop in SQL — the
word-frequency pass, the frequent-substring seed, then per EM round:
the span/vocab candidate join, the Viterbi DP, the best-path piece
counts, and the nano-unit re-normalization — exactly the way
queries/bpe.py unrolls its merge rounds. The one non-relational step,
the per-word Viterbi DP, unrolls as ``max_word_len`` Bellman-Ford
iterations (each path gains one piece per iteration, so max-word-len
iterations reach every segmentation): per (word, position) the best
(score, path) struct is kept by ``max`` — field-by-field struct
comparison with binary string order, the SAME total order Spark's
fold evaluates, so both engines converge to the identical argmax
(see operators/unigram.py's determinism contract; suffix-extension
preserves the tie-break because two paths compared at one position
cover the same word prefix and neither can be a string-prefix of the
other)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from python_stream_processing_framework_spark.catalog import load
from python_stream_processing_framework_spark.operators.unigram import (
    unigram_segment_counts,
    unigram_train,
)
from python_stream_processing_framework_spark.queries.base import query

_SEED = 24
_MAXP = 3
_MAXW = 10
_ROUNDS = 2

_TOKS = "string_split(trim(lower(text)), ' ')"

#: all substrings up to _MAXP chars, as plain piece strings (seed pass)
_PIECES = (
    "flatten(list_transform(range(0, wl), s -> "
    f"list_transform(range(1, least({_MAXP}, wl - s) + 1), p -> "
    "substr(word, CAST(s AS INT) + 1, CAST(p AS INT)))))"
)

#: the same spans as (s, e, piece) structs (the DP's lattice edges)
_SPANS = (
    "flatten(list_transform(range(0, wl), s -> "
    f"list_transform(range(1, least({_MAXP}, wl - s) + 1), p -> "
    "{'s': CAST(s AS INT), 'e': CAST(s + p AS INT), "
    "'piece': substr(word, CAST(s AS INT) + 1, CAST(p AS INT))})))"
)

_NORM = (
    "CAST(round(ln(CAST(cnt AS DOUBLE) / CAST(t AS DOUBLE)) * 1e9) AS BIGINT)"
)


def _dp_ctes(tag: str, vocab: str, maxw: int) -> list[str]:
    """One Viterbi pass under vocabulary CTE ``vocab``: the candidate
    join + ``maxw`` Bellman-Ford iterations; ``d{tag}_{maxw}`` rows
    with pos = wl carry each word's best (score, path)."""
    parts = [
        f"""
    cand{tag} AS MATERIALIZED (
           SELECT y.word, y.cnt, y.wl,
                  struct_extract(y.u, 's') AS s,
                  struct_extract(y.u, 'e') AS e,
                  struct_extract(y.u, 'piece') AS piece, v.lp
           FROM (SELECT word, cnt, wl, unnest({_SPANS}) AS u FROM wf) y
           JOIN {vocab} v ON v.piece = struct_extract(y.u, 'piece')),
    d{tag}_0 AS (SELECT word, cnt, wl, 0 AS pos, CAST(0 AS BIGINT) AS sc,
                      '' AS path FROM wf)"""
    ]
    for k in range(1, maxw + 1):
        parts.append(
            f"""
    d{tag}_{k} AS MATERIALIZED (
           SELECT word, cnt, wl, pos,
                  struct_extract(st, 'sc') AS sc,
                  struct_extract(st, 'path') AS path
           FROM (SELECT word, cnt, wl, pos,
                        max({{'sc': sc, 'path': path}}) AS st
                 FROM (SELECT word, cnt, wl, pos, sc, path FROM d{tag}_{k - 1}
                       UNION ALL
                       SELECT d.word, d.cnt, d.wl, c.e AS pos,
                              d.sc + c.lp AS sc,
                              d.path || ' ' || c.piece AS path
                       FROM d{tag}_{k - 1} d
                       JOIN cand{tag} c ON c.word = d.word AND c.s = d.pos) u
                 GROUP BY word, cnt, wl, pos) g)"""
        )
    return parts


def _encode_ctes(rounds: int, maxw: int) -> str:
    """The shared encode block both token-count queries append to the
    training CTEs: one more Bellman-Ford pass (tag 'e') under the
    final vocabulary, then ``wp`` = (word, np) — the SQL mirror of
    operators/unigram.word_piece_counts. One definition so the UNK /
    path-split conventions cannot desync between consumers."""
    return (
        ",".join(_dp_ctes("e", f"v{rounds}", maxw))
        + f""",
    wp AS MATERIALIZED (
        SELECT word,
               CAST(len(string_split(trim(path), ' ')) AS BIGINT) AS np
        FROM de_{maxw} WHERE pos = wl)"""
    )


def _unigram_ctes(rounds: int, maxw: int) -> str:
    parts = [
        f"""
    wf AS MATERIALIZED (SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt,
                  CAST(len(word) AS INT) AS wl
           FROM (SELECT unnest({_TOKS}) AS word FROM documents) z
           WHERE len(word) BETWEEN 1 AND {maxw}
           GROUP BY word),
    occ AS MATERIALIZED (SELECT piece, SUM(cnt) AS cnt
           FROM (SELECT cnt, unnest({_PIECES}) AS piece FROM wf) z
           GROUP BY piece),
    sd AS MATERIALIZED (
           SELECT piece, cnt FROM occ WHERE len(piece) = 1
           UNION ALL
           SELECT piece, cnt FROM (SELECT piece, cnt FROM occ
                  WHERE len(piece) >= 2
                  ORDER BY cnt DESC, piece LIMIT {_SEED}) zz),
    v0 AS MATERIALIZED (SELECT piece, {_NORM} AS lp
           FROM sd, (SELECT SUM(cnt) AS t FROM sd) tt)"""
    ]
    for r in range(rounds):
        parts.extend(_dp_ctes(str(r), f"v{r}", maxw))
        parts.append(
            f"""
    c{r} AS MATERIALIZED (SELECT piece, SUM(cnt) AS cnt
           FROM (SELECT cnt, unnest(string_split(trim(path), ' ')) AS piece
                 FROM d{r}_{maxw} WHERE pos = wl) z
           GROUP BY piece),
    v{r + 1} AS MATERIALIZED (SELECT piece, cnt, {_NORM} AS lp
           FROM c{r}, (SELECT SUM(cnt) AS t FROM c{r}) tt)"""
        )
    return ",".join(parts)


@query(
    "unigram_vocab",
    f"""
    WITH {_unigram_ctes(_ROUNDS, _MAXW)}
    SELECT piece, CAST(cnt AS BIGINT) AS cnt, lp AS logp_nano
    FROM v{_ROUNDS}
    """,
    doc="Unigram-LM (SentencePiece-style) tokenizer induction (Kudo "
    "2018, operators/unigram.py): one corpus pass collapses the text "
    "to a word-frequency table; the seed vocabulary is every "
    "character plus the top-24 frequent substrings; each of 2 "
    "Viterbi-EM rounds is two vocabulary-bounded shuffles (span/"
    "vocab candidate join + per-word regroup) with the DP itself a "
    "map-side integer fold over nano-quantized log-probs, then a "
    "vocabulary-bounded count aggregation. The oracle unrolls both "
    "EM rounds (DP as 10 Bellman-Ford CTE iterations) and "
    "value-compares the full surviving vocabulary (pieces, Viterbi "
    "counts, nano log-probs).",
)
def unigram_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    (documents,) = load(spark, sf_dir, "documents")
    return unigram_train(
        documents,
        "text",
        seed_size=_SEED,
        max_piece_len=_MAXP,
        max_word_len=_MAXW,
        em_rounds=_ROUNDS,
    )


@query(
    "unigram_token_counts",
    f"""
    WITH {_unigram_ctes(_ROUNDS, _MAXW)},
    {_encode_ctes(_ROUNDS, _MAXW)}
    SELECT d.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(coalesce(wp.np, 1)) AS BIGINT) AS n_pieces
    FROM (SELECT doc_id, unnest({_TOKS}) AS word FROM documents) d
    LEFT JOIN wp ON wp.word = d.word
    GROUP BY d.doc_id
    """,
    doc="Tokenize the corpus under the learned unigram-LM vocabulary "
    "and count each document's pieces — the token-budget number once "
    "the tokenizer exists (operators/unigram.unigram_segment_counts, "
    "the unigram counterpart of bpe_token_counts). Each DISTINCT word "
    "is Viterbi-segmented once under the final vocabulary (two "
    "vocabulary-bounded shuffles), then one hash join of the exploded "
    "corpus against that word-to-piece-count table yields per-doc "
    "sums; unsegmentable or over-length words count 1 piece (UNK). "
    "The oracle re-derives the vocabulary (same unrolled EM CTEs), "
    "replays one more Bellman-Ford encode pass under it, and "
    "value-compares (doc_id, n_words, n_pieces).",
)
def unigram_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from python_stream_processing_framework_spark.operators.common import (
        persist_lazy,
    )
    from python_stream_processing_framework_spark.operators.unigram import (
        unigram_word_table,
    )

    (documents,) = load(spark, sf_dir, "documents")
    # ONE corpus word pass shared by training and encoding (r15): the
    # train phase and the segment phase both run on this cached table
    wt = persist_lazy(
        unigram_word_table(documents, "text", max_word_len=_MAXW)
    )
    vocab = unigram_train(
        documents,
        "text",
        seed_size=_SEED,
        max_piece_len=_MAXP,
        max_word_len=_MAXW,
        em_rounds=_ROUNDS,
        words=wt,
    )
    return unigram_segment_counts(
        documents,
        "doc_id",
        "text",
        vocab,
        max_piece_len=_MAXP,
        max_word_len=_MAXW,
        words=wt,
    )


@query(
    "source_fertility",
    f"""
    WITH {_unigram_ctes(_ROUNDS, _MAXW)},
    {_encode_ctes(_ROUNDS, _MAXW)}
    SELECT d.source AS src,
           CAST(COUNT(DISTINCT d.doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(coalesce(wp.np, 1)) AS BIGINT) AS n_pieces,
           CAST(SUM(coalesce(wp.np, 1)) * 1000000
                // COUNT(*) AS BIGINT) AS fertility_ppm
    FROM (SELECT doc_id, source, unnest({_TOKS}) AS word
          FROM documents) d
    LEFT JOIN wp ON wp.word = d.word
    GROUP BY d.source
    """,
    doc="Per-source tokenizer fertility under the learned unigram-LM "
    "vocabulary: pieces-per-word in exact integer ppm — the number "
    "that prices each source's token budget when planning a mixture "
    "(a source whose fertility runs high costs more tokens per word "
    "of content; read next to unimax_allocation / domain_mixture). "
    "Composes the unigram encoder with a per-source rollup: each "
    "DISTINCT word Viterbi-segments once, the corpus joins that "
    "word table (UNK=1), and everything after is exact integer "
    "arithmetic, so the oracle (same unrolled EM + encode CTEs, "
    "grouped by source) value-compares bit-for-bit.",
)
def source_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from python_stream_processing_framework_spark.operators.dedup import (
        tokens_expr,
    )
    from python_stream_processing_framework_spark.operators.common import (
        persist_lazy,
    )
    from python_stream_processing_framework_spark.operators.unigram import (
        unigram_word_table,
        word_piece_counts,
    )

    (documents,) = load(spark, sf_dir, "documents")
    # ONE corpus word pass shared by training and encoding (r15)
    wt = persist_lazy(
        unigram_word_table(documents, "text", max_word_len=_MAXW)
    )
    vocab = unigram_train(
        documents,
        "text",
        seed_size=_SEED,
        max_piece_len=_MAXP,
        max_word_len=_MAXW,
        em_rounds=_ROUNDS,
        words=wt,
    )
    seg = word_piece_counts(
        documents,
        "text",
        vocab,
        max_piece_len=_MAXP,
        max_word_len=_MAXW,
        words=wt,
    )
    words = documents.select(
        "doc_id", "source", F.explode(tokens_expr("text")).alias("word")
    )
    return (
        words.join(seg, "word", "left")
        .groupBy(F.col("source").alias("src"))
        .agg(
            F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum(F.coalesce(F.col("_np"), F.lit(1)))
            .cast("bigint")
            .alias("n_pieces"),
        )
        # cross-multiply in decimal(38,0) (the token_drift discipline):
        # n_pieces * 1e6 wraps int64 past ~9.2e12 pieces, exactly the
        # web-corpus scale a per-source rollup reaches; the DuckDB
        # side already rides HUGEINT
        .withColumn(
            "fertility_ppm",
            F.expr(
                "CAST(CAST(n_pieces AS DECIMAL(38,0)) * 1000000"
                " DIV n_words AS BIGINT)"
            ),
        )
    )


#: DuckDB mirror of operators/unigram._char_pieces: substr
#: enumeration (NOT an empty-pattern regex split — RE2 and Java
#: disagree there), empty words keeping the verbatim pass-through.
_FALLBACK = (
    "CASE WHEN len(dw.word) >= 1 THEN "
    "list_transform(range(1, len(dw.word) + 1), "
    "i -> substr(dw.word, CAST(i AS INT), 1)) "
    "ELSE [dw.word] END"
)


@query(
    "unigram_encode_fallback",
    f"""
    WITH {_unigram_ctes(1, _MAXW)},
    {_encode_ctes(1, _MAXW)},
    wseg AS MATERIALIZED (
        SELECT word, string_split(trim(path), ' ') AS ps
        FROM de_{_MAXW} WHERE pos = wl),
    dw AS (SELECT doc_id, CAST(u.s AS INT) AS word_pos,
                  toks[CAST(u.s AS INT) + 1] AS word
           FROM (SELECT doc_id, {_TOKS} AS toks FROM documents
                 WHERE doc_id % 20 = 1) z,
                UNNEST(range(0, len(toks))) AS u(s)),
    dwp AS (SELECT dw.doc_id, dw.word_pos,
                   coalesce(w.ps, {_FALLBACK}) AS ps
            FROM dw LEFT JOIN wseg w ON w.word = dw.word),
    enc AS (SELECT doc_id, flatten(list(ps ORDER BY word_pos)) AS pieces
            FROM dwp GROUP BY doc_id)
    SELECT doc_id, CAST(gs - 1 AS BIGINT) AS piece_idx, pieces[gs] AS piece
    FROM enc, LATERAL (SELECT unnest(generate_series(1, len(enc.pieces))) AS gs) g
    """,
    doc="The encode step with CHARACTER FALLBACK — the deployed "
    "SentencePiece byte_fallback contract at character granularity "
    "(operators/unigram.unigram_encode(byte_fallback=True)): a word "
    "the vocabulary cannot segment decomposes to its single "
    "characters instead of passing through verbatim, so a consumer "
    "counting vocabulary pieces can price UNK words (every fallback "
    "char is in the vocabulary whenever the trainer saw the word — "
    "chars seed unconditionally and survive every prune; only "
    "over-max_word_len words can carry unseen chars, documented). "
    "One EM round (the fallback convention, not the trainer, is "
    "under test); every 20th+1 document; the oracle replays the "
    "same substr-enumeration decomposition and value-compares the "
    "exploded (doc_id, piece_idx, piece) stream.",
)
def unigram_encode_fallback(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from python_stream_processing_framework_spark.operators.unigram import (
        unigram_encode,
    )

    (documents,) = load(spark, sf_dir, "documents")
    vocab = unigram_train(
        documents,
        "text",
        seed_size=_SEED,
        max_piece_len=_MAXP,
        max_word_len=_MAXW,
        em_rounds=1,
    )
    enc = unigram_encode(
        documents.filter(F.col("doc_id") % 20 == 1),
        "doc_id",
        "text",
        vocab,
        max_piece_len=_MAXP,
        max_word_len=_MAXW,
        byte_fallback=True,
    )
    return enc.select(
        "doc_id", F.posexplode("pieces").alias("piece_idx", "piece")
    ).select(
        "doc_id", F.col("piece_idx").cast("bigint").alias("piece_idx"), "piece"
    )


@query(
    "unigram_encode_pieces",
    f"""
    WITH {_unigram_ctes(_ROUNDS, _MAXW)},
    {_encode_ctes(_ROUNDS, _MAXW)},
    wseg AS MATERIALIZED (
        SELECT word, string_split(trim(path), ' ') AS ps
        FROM de_{_MAXW} WHERE pos = wl),
    dw AS (SELECT doc_id, CAST(u.s AS INT) AS word_pos,
                  toks[CAST(u.s AS INT) + 1] AS word
           FROM (SELECT doc_id, {_TOKS} AS toks FROM documents
                 WHERE doc_id % 20 = 0) z,
                UNNEST(range(0, len(toks))) AS u(s)),
    dwp AS (SELECT dw.doc_id, dw.word_pos,
                   coalesce(w.ps, [dw.word]) AS ps
            FROM dw LEFT JOIN wseg w ON w.word = dw.word),
    enc AS (SELECT doc_id, flatten(list(ps ORDER BY word_pos)) AS pieces
            FROM dwp GROUP BY doc_id)
    SELECT doc_id, CAST(gs - 1 AS BIGINT) AS piece_idx, pieces[gs] AS piece
    FROM enc, LATERAL (SELECT unnest(generate_series(1, len(enc.pieces))) AS gs) g
    """,
    doc="The ENCODE step under the learned unigram-LM vocabulary: "
    "every 20th document's full piece sequence in reading order "
    "(operators/unigram.unigram_encode, the counterpart of "
    "bpe_encode_pieces). Each DISTINCT word Viterbi-segments once; "
    "the corpus's only join is word-keyed against that "
    "vocabulary-bounded piece table, then pieces regroup per doc in "
    "word order (UNK words pass through verbatim). The oracle "
    "re-derives the vocabulary, replays the encode pass, and "
    "value-compares the exploded (doc_id, piece_idx, piece) stream.",
)
def unigram_encode_pieces(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from python_stream_processing_framework_spark.operators.unigram import (
        unigram_encode,
    )

    (documents,) = load(spark, sf_dir, "documents")
    vocab = unigram_train(
        documents,
        "text",
        seed_size=_SEED,
        max_piece_len=_MAXP,
        max_word_len=_MAXW,
        em_rounds=_ROUNDS,
    )
    enc = unigram_encode(
        documents.filter(F.col("doc_id") % 20 == 0),
        "doc_id",
        "text",
        vocab,
        max_piece_len=_MAXP,
        max_word_len=_MAXW,
    )
    return enc.select(
        "doc_id", F.posexplode("pieces").alias("piece_idx", "piece")
    ).select(
        "doc_id", F.col("piece_idx").cast("bigint").alias("piece_idx"), "piece"
    )
