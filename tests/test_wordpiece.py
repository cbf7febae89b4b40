"""WordPiece (operators/wordpiece.py): hypothesis parity of the
distributed trainer against a sequential reference, the canonical
likelihood-vs-count ranking example, greedy longest-match encode
semantics, UNK conventions, and determinism."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st

from python_stream_processing_framework_spark.operators.wordpiece import (
    greedy_segment,
    wordpiece_encode,
    wordpiece_segment_counts,
    wordpiece_train,
    wordpiece_vocab,
)

_SCALE = 10**12


def _ref_train(words: list[str], n_merges: int):
    """Sequential WordPiece trainer over a word list (each occurrence
    counted): same scoring quantization, same (score DESC, l, r)
    tie-break, same left-to-right non-overlapping rewrite."""
    counts: dict[str, int] = {}
    for w in words:
        if 1 <= len(w) <= 16:
            counts[w] = counts.get(w, 0) + 1
    seqs = {
        w: [w[0]] + ["##" + c for c in w[1:]] for w in counts
    }
    merges = []
    for _ in range(n_merges):
        pc: dict[tuple[str, str], int] = {}
        sc: dict[str, int] = {}
        for w, cnt in counts.items():
            syms = seqs[w]
            for s in syms:
                sc[s] = sc.get(s, 0) + cnt
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] = pc.get((a, b), 0) + cnt
        if not pc:
            break

        def score(p):
            return (pc[p] * _SCALE) // (sc[p[0]] * sc[p[1]])

        best = min(pc, key=lambda p: (-score(p), p[0], p[1]))
        merged = best[0] + (
            best[1][2:] if best[1].startswith("##") else best[1]
        )
        merges.append((best[0], best[1], pc[best], score(best)))
        for w in seqs:
            syms, out, i = seqs[w], [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == best[0]
                    and syms[i + 1] == best[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            seqs[w] = out
    vocab = sorted({s for syms in seqs.values() for s in syms})
    return merges, vocab


def _ref_encode(word: str, vocab: set[str]):
    pos, out = 0, []
    while pos < len(word):
        hit = None
        for ln in range(len(word) - pos, 0, -1):
            form = word[pos : pos + ln]
            if pos > 0:
                form = "##" + form
            if form in vocab:
                hit = (ln, form)
                break
        if hit is None:
            return None
        out.append(hit[1])
        pos += hit[0]
    return out


@settings(max_examples=6, deadline=None)
@given(
    words=st.lists(
        st.text(alphabet="ab", min_size=1, max_size=6),
        min_size=1,
        max_size=10,
    ),
    n_merges=st.integers(1, 4),
)
@pytest.mark.slow
def test_wordpiece_matches_sequential_reference(spark, words, n_merges):
    """Distributed trainer == sequential reference: identical merge
    order, pairs, counts, and quantized scores; identical induced
    vocabulary; identical greedy piece counts per word. The 'ab'
    alphabet maximizes tie pressure on the score argmax."""
    words = [w for w in words if w]
    if not words:
        words = ["a"]
    docs = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "doc_id int, text string"
    )
    m = wordpiece_train(docs, "text", n_merges=n_merges)
    got = [
        (r["left"], r["right"], r["pair_count"], r["score_q"])
        for r in m.orderBy("merge_idx").collect()
    ]
    want_merges, want_vocab = _ref_train(words, n_merges)
    assert got == want_merges, (words, n_merges)
    v = wordpiece_vocab(docs, "text", m)
    assert sorted(r["piece"] for r in v.collect()) == want_vocab
    seg = {
        r["word"]: r["path"].split(" ")
        for r in greedy_segment(
            docs.sparkSession.createDataFrame(
                [(w, 1, len(w)) for w in sorted(set(words))],
                "word string, cnt bigint, wl int",
            ),
            v,
        ).collect()
    }
    vset = set(want_vocab)
    for w in sorted(set(words)):
        assert seg.get(w) == _ref_encode(w, vset), (w, words, n_merges)


def test_wordpiece_prefers_likelihood_over_count(spark):
    """The canonical WordPiece-vs-BPE ranking: on the 'hugs' corpus
    BPE merges the most frequent pair (h, ##u — count 6) first;
    WordPiece first merges rare-denominator pairs (##h ##e -> 'the',
    score count/(1*1) = max) and reaches (h, ##u) only later."""
    docs = spark.createDataFrame(
        [(1, "hugging hugs the hug"), (2, "hugging hugging pugs hug bug")],
        "doc_id bigint, text string",
    )
    m = [
        (r["left"], r["right"], r["score_q"])
        for r in wordpiece_train(docs, "text", n_merges=5)
        .orderBy("merge_idx")
        .collect()
    ]
    assert (m[0][0], m[0][1]) == ("##h", "##e")
    assert m[0][2] == _SCALE  # count 1 / (1 * 1)
    assert ("h", "##u") == (m[4][0], m[4][1])  # count-6 pair merges LAST


def test_wordpiece_encode_greedy_longest_match(spark):
    docs = spark.createDataFrame(
        [(1, "hugging hugs the hug"), (2, "hugging hugging pugs hug bug")],
        "doc_id bigint, text string",
    )
    m = wordpiece_train(docs, "text", n_merges=5)
    v = wordpiece_vocab(docs, "text", m)
    out = {
        r["doc_id"]: r["pieces"]
        for r in wordpiece_encode(docs, "doc_id", "text", v).collect()
    }
    assert out[1] == [
        "hu", "##g", "##g", "##in", "##g",
        "hu", "##g", "##s", "the", "hu", "##g",
    ]
    counts = {
        r["doc_id"]: (r["n_words"], r["n_pieces"])
        for r in wordpiece_segment_counts(docs, "doc_id", "text", v).collect()
    }
    assert counts[1] == (4, 11)
    assert counts[2] == (5, 18)


def test_wordpiece_unk_conventions(spark):
    """A word with a character the vocabulary never saw dies at that
    cursor: greedy_segment yields no row; encode passes the word
    through verbatim; segment_counts prices it 1. Over-length words
    (>16 chars) are UNK the same way."""
    train = spark.createDataFrame(
        [(1, "abc abc ab")], "doc_id bigint, text string"
    )
    m = wordpiece_train(train, "text", n_merges=2)
    v = wordpiece_vocab(train, "text", m)
    probe = spark.createDataFrame(
        [(9, "abc xyz " + "a" * 17)], "doc_id bigint, text string"
    )
    enc = wordpiece_encode(probe, "doc_id", "text", v).head()
    assert enc["pieces"][-2:] == ["xyz", "a" * 17]
    (c,) = wordpiece_segment_counts(probe, "doc_id", "text", v).collect()
    assert c["n_words"] == 3
    # UNK words emit exactly one (verbatim) piece in encode too, so
    # the priced count equals the emitted stream length
    assert c["n_pieces"] == len(enc["pieces"])


def test_wordpiece_train_partition_invariant(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(["ab ab abc", "ba ab", "abc ba ab"])],
        "doc_id int, text string",
    )
    one = wordpiece_train(docs.coalesce(1), "text", n_merges=3).collect()
    many = wordpiece_train(docs.repartition(5), "text", n_merges=3).collect()
    assert sorted(map(tuple, one)) == sorted(map(tuple, many))


def test_wordpiece_rejects_bad_params(spark):
    docs = spark.createDataFrame([(1, "a")], "doc_id int, text string")
    with pytest.raises(ValueError, match="n_merges"):
        wordpiece_train(docs, "text", n_merges=0)


@settings(max_examples=8, deadline=None)
@given(
    words=st.lists(
        st.text(alphabet="abc", min_size=1, max_size=6),
        min_size=1,
        max_size=14,
    ),
    n_merges=st.integers(1, 5),
    batch=st.integers(2, 6),
)
@pytest.mark.slow
def test_wordpiece_batch_is_bit_identical_to_sequential(
    spark, words, n_merges, batch
):
    """batch>1 is latency, not semantics: the acceptance rule
    (string-disjoint prefix + strict score dominance over a sound
    bound on every boosted/minted score) guarantees the merge table
    is IDENTICAL to the sequential trainer's on every corpus — the
    'abc' alphabet plus random repetition stresses exactly the
    failure modes (denominator boosts, freshly-minted pairs
    outranking pre-round candidates, self-pairs, merged forms
    colliding with live symbols)."""
    words = [w for w in words if w] or ["a"]
    docs = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "doc_id int, text string"
    )
    seq = [
        tuple(r)
        for r in wordpiece_train(docs, "text", n_merges=n_merges)
        .orderBy("merge_idx")
        .collect()
    ]
    got = [
        tuple(r)
        for r in wordpiece_train(
            docs, "text", n_merges=n_merges, batch=batch
        )
        .orderBy("merge_idx")
        .collect()
    ]
    assert got == seq, (words, n_merges, batch)


def test_wordpiece_batch_reduces_driver_rounds(spark, monkeypatch):
    """The point of batch mode: symbol-disjoint dominant merges land
    in ONE driver round-trip. Two independent sub-corpora ('ab' words
    and 'cd' words, equal shape) give two equal-score disjoint top
    candidates; batch=4 must accept both in the first round. Rounds
    are observed via the trainer's rounds_out telemetry (the
    per-round checkpoint is no longer 1:1 with rounds — r15 truncates
    lineage every few rounds, so it cannot serve as the proxy)."""
    docs = spark.createDataFrame(
        [(1, "ab ab ab cd cd cd")], "doc_id bigint, text string"
    )
    seq_rounds: list = []
    seq = wordpiece_train(
        docs, "text", n_merges=2, rounds_out=seq_rounds
    ).collect()
    batch_rounds: list = []
    got = wordpiece_train(
        docs, "text", n_merges=2, batch=4, rounds_out=batch_rounds
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, seq))
    assert seq_rounds == [1, 1]
    assert batch_rounds == [2]


@pytest.mark.slow
def test_wordpiece_batch_rejects_when_minted_pair_would_outrank(spark):
    """The soundness half: merging the top pair can mint a pair a
    rare neighbor makes dominant (score S/(cnt(x)*cnt(m))), which
    sequential picks NEXT — a naive disjoint-prefix batch would
    instead take the pre-round runner-up. 'xab' plants exactly that:
    after (a, ##b) -> 'ab' merges, (##x-era) ... the rare '##a ##b'
    context mints '##ab' pairs that outrank the 'cd' family. Batch
    output must still equal sequential exactly."""
    docs = spark.createDataFrame(
        [(1, "ab ab ab ab ab ab xab cd cd")], "doc_id bigint, text string"
    )
    for n in (2, 3, 4):
        seq = [
            tuple(r)
            for r in wordpiece_train(docs, "text", n_merges=n)
            .orderBy("merge_idx")
            .collect()
        ]
        got = [
            tuple(r)
            for r in wordpiece_train(docs, "text", n_merges=n, batch=4)
            .orderBy("merge_idx")
            .collect()
        ]
        assert got == seq, n


def test_wordpiece_batch_rejects_bad_param(spark):
    docs = spark.createDataFrame([(1, "a")], "doc_id int, text string")
    with pytest.raises(ValueError, match="batch"):
        wordpiece_train(docs, "text", batch=0)


@settings(max_examples=6, deadline=None)
@given(
    words=st.lists(
        st.text(alphabet="ab#", min_size=1, max_size=5),
        min_size=1,
        max_size=12,
    ),
    n_merges=st.integers(1, 4),
    batch=st.integers(2, 6),
)
@pytest.mark.slow
def test_wordpiece_batch_parity_with_hash_symbols(
    spark, words, n_merges, batch
):
    """'#' in words makes PLAIN symbols collide with ## continuation
    surface forms (the word '##' seeds as ['#', '###'], and a merge
    of ('#', '###') mints '##' — a live plain symbol equal to the
    continuation PREFIX), stressing every string-keyed map in the
    batch simulator: merged forms, touched/minted lookups, trigram
    keys. Batch output must still equal sequential bit-exactly."""
    words = [w for w in words if w] or ["#"]
    docs = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "doc_id int, text string"
    )
    seq = [
        tuple(r)
        for r in wordpiece_train(docs, "text", n_merges=n_merges)
        .orderBy("merge_idx")
        .collect()
    ]
    got = [
        tuple(r)
        for r in wordpiece_train(
            docs, "text", n_merges=n_merges, batch=batch
        )
        .orderBy("merge_idx")
        .collect()
    ]
    assert got == seq, (words, n_merges, batch)


@pytest.mark.slow
def test_wordpiece_batch_accepts_minted_chain(spark):
    """r14 verdict #4: on the true Zipf chain the sequential argmax
    sequence RUNS THROUGH minted symbols (t+##h -> th, then
    th+##e -> the) — a bound-only simulator stops at 1 merge/round
    forever. With exact trigram evidence the batch both (a) accepts
    the minted pair when it provably wins and (b) proves collected
    siblings past the minted mass. Pin: bit-identical table AND
    strictly fewer rounds than merges (so multi-accept actually
    happened), with at least one minted-accept recorded."""
    import python_stream_processing_framework_spark.operators.wordpiece as wp

    # 'the' dominates so (t,##h) then (th,##e) chain; 'other' words
    # keep a candidate pool alive
    docs = spark.createDataFrame(
        [(1, " ".join(["the"] * 30 + ["they"] * 9 + ["then"] * 7
                      + ["cat"] * 4 + ["dog"] * 3))],
        "doc_id bigint, text string",
    )
    seq = [
        tuple(r)
        for r in wordpiece_train(docs, "text", n_merges=6)
        .orderBy("merge_idx")
        .collect()
    ]
    old_diag = wp.ACCEPT_DIAG
    wp.ACCEPT_DIAG = diag = []
    rounds: list = []
    try:
        got = [
            tuple(r)
            for r in wordpiece_train(
                docs, "text", n_merges=6, batch=6, rounds_out=rounds
            )
            .orderBy("merge_idx")
            .collect()
        ]
    finally:
        wp.ACCEPT_DIAG = old_diag
    assert got == seq
    assert len(rounds) < 6, rounds  # multi-accept happened
    assert "minted-accept" in diag, (rounds, diag)


@pytest.mark.slow
def test_ckpt_cadence_parity(spark, monkeypatch):
    """The r15 lineage-truncation cadence (_CKPT_EVERY=4) must not
    change any learned merge table: rounds between checkpoints stay
    lazy on the last anchor, so the rewrites applied are the same
    expressions in the same order. Pin bpe and wordpiece tables
    against the old truncate-every-round behavior (_CKPT_EVERY=1)."""
    from python_stream_processing_framework_spark.operators import (
        bpe as bpe_mod,
        wordpiece as wp_mod,
    )

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the thin cat ate the fat rat"),
            (3, "a rat and a cat and a hat"),
        ],
        "doc_id bigint, text string",
    )
    wp_new = [tuple(r) for r in wordpiece_train(docs, "text", n_merges=7).collect()]
    bpe_new = [
        tuple(r) for r in bpe_mod.bpe_train(docs, "text", n_merges=7).collect()
    ]
    monkeypatch.setattr(wp_mod, "_CKPT_EVERY", 1)
    monkeypatch.setattr(bpe_mod, "_CKPT_EVERY", 1)
    wp_old = [tuple(r) for r in wordpiece_train(docs, "text", n_merges=7).collect()]
    bpe_old = [
        tuple(r) for r in bpe_mod.bpe_train(docs, "text", n_merges=7).collect()
    ]
    assert wp_new == wp_old
    assert bpe_new == bpe_old
