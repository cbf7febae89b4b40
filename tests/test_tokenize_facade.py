"""Streaming token-budget meter (Stream.tokenize): per-document piece
counts under a persisted trained unigram-LM vocabulary — the streaming
form of the unigram_token_counts catalog query. Vocabulary written
once at registration; stateless per batch; exactly-once across
restarts; UNK=1 for words the vocabulary cannot segment."""

from __future__ import annotations

import pytest
from pyspark.sql.types import LongType, StringType, StructField, StructType

from python_stream_processing_framework_spark.streaming import Stream

SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
    ]
)

OUT_SCHEMA = StructType(
    [
        StructField("batch_seq", LongType()),
        StructField("doc_id", LongType()),
        StructField("n_words", LongType()),
        StructField("n_pieces", LongType()),
    ]
)


@pytest.fixture()
def stream(spark, tmp_path):
    return Stream(spark, str(tmp_path / "broker"))


def _rows(stream, topic="docs-tokens"):
    return {
        (r["batch_seq"], r["doc_id"]): (r["n_words"], r["n_pieces"])
        for r in stream.read_topic(topic, OUT_SCHEMA).collect()
    }


def _vocab(spark):
    """Train on 'abab'x3 'cd'x3 'ab' — learns {'ab','c','d'} (the
    test_unigram_known_corpus case): abab -> 2 pieces, cd -> 2."""
    from python_stream_processing_framework_spark.operators.unigram import (
        unigram_train,
    )

    train = spark.createDataFrame(
        [(1, "abab abab cd"), (2, "abab cd cd ab")],
        "doc_id bigint, text string",
    )
    return unigram_train(
        train, "text", seed_size=4, max_piece_len=3, max_word_len=8,
        em_rounds=2,
    )


def test_tokenize_counts_and_unk(stream, spark):
    stream.tokenize("docs", SCHEMA, vocab=_vocab(spark), max_piece_len=3,
                    max_word_len=8)
    stream.emit(
        "docs",
        {"doc_id": 1, "text": "abab cd"},      # 2 + 2 = 4 pieces
        {"doc_id": 2, "text": "zz abab"},      # UNK 1 + 2 = 3
        {"doc_id": 3, "text": "abababababab"}, # > max_word_len -> UNK 1
    )
    stream.run_until_idle()
    out = _rows(stream)
    assert out[(0, 1)] == (2, 4)
    assert out[(0, 2)] == (2, 3)
    assert out[(0, 3)] == (1, 1)


def test_tokenize_exactly_once_after_restart(spark, tmp_path):
    broker = str(tmp_path / "broker")
    s1 = Stream(spark, broker)
    s1.tokenize("docs", SCHEMA, vocab=_vocab(spark), max_piece_len=3,
                max_word_len=8)
    s1.emit("docs", {"doc_id": 1, "text": "abab cd"})
    s1.run_until_idle()
    assert _rows(s1)[(0, 1)] == (2, 4)

    # restart WITHOUT a vocab frame: the persisted one is reused
    s2 = Stream(spark, broker)
    s2.tokenize("docs", SCHEMA, max_piece_len=3, max_word_len=8)
    s2.emit("docs", {"doc_id": 9, "text": "cd cd"})
    s2.run_until_idle()
    out = _rows(s2)
    assert set(out) == {(0, 1), (1, 9)}  # no batch-0 redelivery
    assert out[(1, 9)] == (2, 4)


def test_tokenize_vocab_written_once(spark, tmp_path):
    """A re-registration with a DIFFERENT vocab must not swap
    tokenizers mid-stream — the persisted table wins."""
    broker = str(tmp_path / "broker")
    s1 = Stream(spark, broker)
    s1.tokenize("docs", SCHEMA, vocab=_vocab(spark), max_piece_len=3,
                max_word_len=8)
    s1.emit("docs", {"doc_id": 1, "text": "abab"})
    s1.run_until_idle()

    other = spark.createDataFrame(
        [("a", 4, -100), ("b", 4, -100)], "piece string, cnt bigint, logp_nano bigint"
    )
    s2 = Stream(spark, broker)
    s2.tokenize("docs", SCHEMA, vocab=other, max_piece_len=3, max_word_len=8)
    s2.emit("docs", {"doc_id": 2, "text": "abab"})
    s2.run_until_idle()
    out = _rows(s2)
    # still the ORIGINAL vocab: abab -> 'ab ab' = 2 pieces (the char
    # vocab would read 4)
    assert out[(1, 2)] == (1, 2)


def test_tokenize_requires_vocab_first_time(spark, tmp_path):
    s = Stream(spark, str(tmp_path / "broker"))
    with pytest.raises(ValueError, match="vocab"):
        s.tokenize("docs", SCHEMA)


def test_tokenize_failed_registration_does_not_poison_claim(spark, tmp_path):
    """r12 review regression: the missing-vocab ValueError fired AFTER
    _claim recorded (topic, group), so the corrected retry on the same
    Stream died with 'consumer group already registered'."""
    s = Stream(spark, str(tmp_path / "broker"))
    with pytest.raises(ValueError, match="vocab"):
        s.tokenize("docs", SCHEMA)
    # corrected call on the SAME instance must succeed
    s.tokenize("docs", SCHEMA, vocab=_vocab(spark), max_piece_len=3,
               max_word_len=8)
    s.emit("docs", {"doc_id": 1, "text": "abab"})
    s.run_until_idle()
    assert _rows(s)[(0, 1)] == (1, 2)


def test_tokenize_null_text_still_yields_a_row(stream, spark):
    """The every-doc-yields-a-row contract: null text meters as empty
    (one UNK token) instead of silently vanishing from the feed."""
    stream.tokenize("docs", SCHEMA, vocab=_vocab(spark), max_piece_len=3,
                    max_word_len=8)
    stream.emit(
        "docs",
        {"doc_id": 1, "text": None},
        {"doc_id": 2, "text": "abab"},
    )
    stream.run_until_idle()
    out = _rows(stream)
    assert out[(0, 1)] == (1, 1)
    assert out[(0, 2)] == (1, 2)


def _wp_vocab(spark):
    """WordPiece vocab trained on the hugs corpus (5 merges — the
    test_wordpiece canonical example): 'hugging' -> hu ##g ##g ##in
    ##g (5 pieces), 'the' -> 1, 'hug' -> 2."""
    from python_stream_processing_framework_spark.operators.wordpiece import (
        wordpiece_train,
        wordpiece_vocab,
    )

    train = spark.createDataFrame(
        [(1, "hugging hugs the hug"), (2, "hugging hugging pugs hug bug")],
        "doc_id bigint, text string",
    )
    return wordpiece_vocab(
        train, "text", wordpiece_train(train, "text", n_merges=5)
    )


def test_tokenize_wordpiece_counts_and_unk(stream, spark):
    """r13: the meter under the WordPiece lineage — greedy
    longest-match counts, UNK=1 for words with unseen characters,
    null text still yields the (1, 1) row."""
    stream.tokenize(
        "docs", SCHEMA, vocab=_wp_vocab(spark), tokenizer="wordpiece"
    )
    stream.emit(
        "docs",
        {"doc_id": 1, "text": "hugging the hug"},   # 5 + 1 + 2
        {"doc_id": 2, "text": "xyz hug"},           # UNK(1) + 2
        {"doc_id": 3, "text": None},                # empty -> 1 UNK
    )
    stream.run_until_idle()
    out = _rows(stream)
    assert out[(0, 1)] == (3, 8)
    assert out[(0, 2)] == (2, 3)
    assert out[(0, 3)] == (1, 1)


def test_tokenize_kind_is_write_once(spark, tmp_path):
    """The persisted vocabulary carries its tokenizer kind: a
    re-registration under a different tokenizer= must fail loudly
    (silently re-scoring a unigram table as WordPiece — or vice
    versa — would corrupt the meter), and the original keeps
    working."""
    broker = str(tmp_path / "broker")
    s1 = Stream(spark, broker)
    s1.tokenize("docs", SCHEMA, vocab=_vocab(spark), max_piece_len=3,
                max_word_len=8)
    s1.emit("docs", {"doc_id": 1, "text": "abab"})
    s1.run_until_idle()

    s2 = Stream(spark, broker)
    with pytest.raises(ValueError, match="tokenizer='unigram'"):
        s2.tokenize(
            "docs", SCHEMA, vocab=_wp_vocab(spark), tokenizer="wordpiece"
        )
    s3 = Stream(spark, broker)
    s3.tokenize("docs", SCHEMA)  # same kind: persisted table reused
    s3.emit("docs", {"doc_id": 2, "text": "abab"})
    s3.run_until_idle()
    assert _rows(s3)[(1, 2)] == (1, 2)


def test_tokenize_wordpiece_rejects_byte_fallback(spark, tmp_path):
    s = Stream(spark, str(tmp_path / "broker"))
    with pytest.raises(ValueError, match="byte_fallback"):
        s.tokenize(
            "docs", SCHEMA, vocab=_wp_vocab(spark),
            tokenizer="wordpiece", byte_fallback=True,
        )


def test_tokenize_rejects_unknown_tokenizer(spark, tmp_path):
    s = Stream(spark, str(tmp_path / "broker"))
    with pytest.raises(ValueError, match="tokenizer"):
        s.tokenize("docs", SCHEMA, tokenizer="sentencepiece")


def _bpe_merges(spark, level="char"):
    from python_stream_processing_framework_spark.operators.bpe import (
        bpe_train,
    )

    train = spark.createDataFrame(
        [(1, "hug hug hugs pug pug bug"), (2, "hugging bugs hug")],
        "doc_id bigint, text string",
    )
    return bpe_train(train, "text", n_merges=4, level=level)


def test_tokenize_bpe_counts_match_operator(stream, spark):
    """r14: the meter under the BPE lineage completes the streaming
    trio — merge-replay counts per batch against the persisted merge
    table, matching the batch operator exactly; BPE never UNKs (char
    seeds cover every word) and null text meters as empty."""
    from python_stream_processing_framework_spark.operators.bpe import (
        bpe_segment_counts,
    )

    merges = _bpe_merges(spark)
    stream.tokenize("docs", SCHEMA, vocab=merges, tokenizer="bpe")
    probe = [
        {"doc_id": 1, "text": "hugging the hug"},
        {"doc_id": 2, "text": "xyz hug"},
        {"doc_id": 3, "text": None},
    ]
    stream.emit("docs", *probe)
    stream.run_until_idle()
    out = _rows(stream)
    want = {
        r["doc_id"]: (r["n_words"], r["n_pieces"])
        for r in bpe_segment_counts(
            spark.createDataFrame(
                [(p["doc_id"], p["text"] or "") for p in probe],
                "doc_id bigint, text string",
            ),
            "doc_id",
            "text",
            merges,
        ).collect()
    }
    assert {d: out[(0, d)] for d in (1, 2, 3)} == want
    # 'xyz' has no learned merges but never UNKs: 3 char pieces
    assert out[(0, 2)][1] == want[2][1] >= 3 + 1


def test_tokenize_bpe_byte_level_stamped(spark, tmp_path):
    """The persisted BPE table carries its LEVEL: byte and char merge
    tables are not interchangeable, so re-registration under the
    other level fails loudly and the surviving meter stays
    byte-level."""
    broker = str(tmp_path / "broker")
    s1 = Stream(spark, broker)
    s1.tokenize(
        "docs", SCHEMA, vocab=_bpe_merges(spark, level="byte"),
        tokenizer="bpe", level="byte",
    )
    s1.emit("docs", {"doc_id": 1, "text": "hug"})
    s1.run_until_idle()
    assert _rows(s1)[(0, 1)][0] == 1

    s2 = Stream(spark, broker)
    with pytest.raises(ValueError, match="level"):
        s2.tokenize(
            "docs", SCHEMA, vocab=_bpe_merges(spark), tokenizer="bpe"
        )


def test_tokenize_bpe_rejects_bad_options(spark, tmp_path):
    s = Stream(spark, str(tmp_path / "broker"))
    with pytest.raises(ValueError, match="byte_fallback"):
        s.tokenize(
            "docs", SCHEMA, vocab=_bpe_merges(spark), tokenizer="bpe",
            byte_fallback=True,
        )
    with pytest.raises(ValueError, match="level"):
        s.tokenize(
            "docs", SCHEMA, vocab=_vocab(spark), level="byte"
        )
    with pytest.raises(ValueError, match="level"):
        s.tokenize(
            "docs", SCHEMA, vocab=_bpe_merges(spark), tokenizer="bpe",
            level="word",
        )
