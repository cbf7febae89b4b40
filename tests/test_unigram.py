"""Unigram-LM tokenizer induction (operators/unigram.py, Kudo 2018
Viterbi-EM form): hypothesis parity against an EXHAUSTIVE sequential
reference — the reference enumerates every segmentation and takes the
global (score, path) argmax, so any inconsistency in the distributed
DP's greedy per-position tie-break composition would surface here."""

from __future__ import annotations

import pytest

import math
from collections import Counter

from hypothesis import given, settings, strategies as st


def _round_nano(x: float) -> int:
    """HALF_UP away from zero — Spark's F.round semantics for doubles
    (Python's round() is banker's, which would diverge on exact .5)."""
    return int(math.floor(abs(x) + 0.5)) * (1 if x >= 0 else -1)


def _ref_unigram(
    words_list,
    *,
    seed_size,
    max_piece_len,
    max_word_len,
    em_rounds,
    keep_size=None,
):
    """Pure-Python reference: frequent-substring seed (all chars +
    top-k multi), then hard-EM rounds where the E-step is an
    exhaustive global argmax over all segmentations."""
    wf = Counter(w for w in words_list if 1 <= len(w) <= max_word_len)

    def spans(w):
        return [
            w[s : s + p]
            for s in range(len(w))
            for p in range(1, min(max_piece_len, len(w) - s) + 1)
        ]

    occ = Counter()
    for w, c in wf.items():
        for piece in spans(w):
            occ[piece] += c
    counts = {p: c for p, c in occ.items() if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in occ.items() if len(p) >= 2),
        key=lambda kv: (-kv[1], kv[0]),
    )[:seed_size]
    counts.update(dict(multi))

    def with_logp(cnts):
        t = sum(cnts.values())
        return {p: _round_nano(math.log(c / t) * 1e9) for p, c in cnts.items()}

    def best_seg(w, lp):
        best = None

        def rec(i, score, path):
            nonlocal best
            if i == len(w):
                if best is None or (score, path) > best:
                    best = (score, path)
                return
            for p in range(1, min(max_piece_len, len(w) - i) + 1):
                piece = w[i : i + p]
                if piece in lp:
                    rec(i + p, score + lp[piece], path + " " + piece)

        rec(0, 0, "")
        return best

    def prune(cnts):
        chars = {p: c for p, c in cnts.items() if len(p) == 1}
        room = max(0, keep_size - len(chars))
        multi = sorted(
            ((p, c) for p, c in cnts.items() if len(p) >= 2),
            key=lambda kv: (-kv[1], kv[0]),
        )[:room]
        out = dict(chars)
        out.update(dict(multi))
        return out

    lp = with_logp(counts)
    for _ in range(em_rounds):
        counts = Counter()
        for w, c in wf.items():
            b = best_seg(w, lp)
            if b is None:
                continue
            for piece in b[1].split():
                counts[piece] += c
        counts = dict(counts)
        if keep_size is not None:
            counts = prune(counts)
        lp = with_logp(counts)
    return {p: (counts[p], lp[p]) for p in counts}


@settings(max_examples=6, deadline=None)
@given(
    words=st.lists(
        st.text(alphabet="ab", min_size=1, max_size=6),
        min_size=1,
        max_size=10,
    ),
    seed_size=st.integers(1, 4),
    max_piece_len=st.integers(2, 3),
    em_rounds=st.integers(1, 2),
    keep_size=st.one_of(st.none(), st.integers(1, 5)),
)
@pytest.mark.slow
def test_unigram_matches_exhaustive_reference(
    spark, words, seed_size, max_piece_len, em_rounds, keep_size
):
    """Distributed Viterbi-EM == sequential exhaustive-argmax EM on
    the same corpus: identical surviving vocabulary, counts, and
    nano-unit log-probs. The 'ab' alphabet maximizes tie pressure on
    the (score, path) tie-break."""
    from python_stream_processing_framework_spark.operators.unigram import (
        unigram_train,
    )

    docs = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "doc_id int, text string"
    )
    got = {
        r["piece"]: (r["cnt"], r["logp_nano"])
        for r in unigram_train(
            docs,
            "text",
            seed_size=seed_size,
            max_piece_len=max_piece_len,
            max_word_len=6,
            em_rounds=em_rounds,
            keep_size=keep_size,
        ).collect()
    }
    want = _ref_unigram(
        words,
        seed_size=seed_size,
        max_piece_len=max_piece_len,
        max_word_len=6,
        em_rounds=em_rounds,
        keep_size=keep_size,
    )
    assert got == want, (words, seed_size, max_piece_len, em_rounds, keep_size)


def test_unigram_known_corpus(spark):
    """Hand-computed case: 'abab'x3 'cd'x3 'ab'x1 with a 4-piece
    multi seed — 'cd' loses the seed cut (count ties broken piece
    ASC put aba/ba/bab ahead), so cd segments as chars while abab
    fuses to 'ab ab'; zero-count seed pieces leave the vocab."""
    from python_stream_processing_framework_spark.operators.unigram import (
        unigram_segment_counts,
        unigram_train,
    )

    df = spark.createDataFrame(
        [(1, "abab abab cd"), (2, "abab cd cd ab")],
        "doc_id bigint, text string",
    )
    v = unigram_train(
        df, "text", seed_size=4, max_piece_len=3, max_word_len=8, em_rounds=2
    )
    assert sorted(tuple(r) for r in v.collect()) == [
        ("ab", 7, -619039208),
        ("c", 3, -1466337069),
        ("d", 3, -1466337069),
    ]
    seg = unigram_segment_counts(
        df, "doc_id", "text", v, max_piece_len=3, max_word_len=8
    )
    # doc 1: abab->2 + abab->2 + cd->2 = 6; doc 2: 2+2+2+1 = 7
    assert sorted(tuple(r) for r in seg.collect()) == [(1, 3, 6), (2, 4, 7)]


def test_unigram_segment_counts_unk_convention(spark):
    """Words the vocabulary cannot segment — or longer than
    max_word_len — count 1 piece (UNK), never drop the document."""
    from python_stream_processing_framework_spark.operators.unigram import (
        unigram_segment_counts,
        unigram_train,
    )

    train = spark.createDataFrame([(1, "aa aa")], "doc_id bigint, text string")
    v = unigram_train(
        train, "text", seed_size=2, max_piece_len=2, max_word_len=4, em_rounds=1
    )
    # vocab is {'a'} after EM: seed counts weight every occurrence,
    # so ln(4/6)*2 for 'a a' beats ln(2/6) for 'aa' and the unused
    # 'aa' piece leaves the vocabulary
    assert {r["piece"] for r in v.collect()} == {"a"}
    apply = spark.createDataFrame(
        [(1, "aa zz aaaaaa")], "doc_id bigint, text string"
    )
    seg = unigram_segment_counts(
        apply, "doc_id", "text", v, max_piece_len=2, max_word_len=4
    )
    # aa -> 'a a' 2 pieces; zz unsegmentable -> UNK 1; aaaaaa over the
    # length cap -> UNK 1
    assert [tuple(r) for r in seg.collect()] == [(1, 3, 4)]


def test_unigram_rejects_bad_params(spark):
    import pytest

    from python_stream_processing_framework_spark.operators.unigram import (
        unigram_train,
    )

    df = spark.createDataFrame([(1, "a")], "doc_id bigint, text string")
    with pytest.raises(ValueError):
        unigram_train(df, "text", em_rounds=0)
    with pytest.raises(ValueError):
        unigram_train(df, "text", max_piece_len=0)


def test_unigram_keep_size_prunes_multi_keeps_chars(spark):
    """keep_size (the paper's prune schedule, hard-EM form): the
    vocabulary caps at keep_size by Viterbi count with single chars
    retained unconditionally, and probabilities re-normalize over the
    survivors."""
    from python_stream_processing_framework_spark.operators.unigram import (
        unigram_train,
    )

    df = spark.createDataFrame(
        [(1, "abab abab cd"), (2, "abab cd cd ab")],
        "doc_id bigint, text string",
    )
    # unpruned run learns {'ab', 'c', 'd'} (test_unigram_known_corpus);
    # keep_size=2 leaves room for zero multi pieces after the two live
    # chars — 'ab' is pruned, abab re-segments via chars next round
    v = unigram_train(
        df, "text", seed_size=4, max_piece_len=3, max_word_len=8,
        em_rounds=2, keep_size=2,
    )
    rows = {r["piece"]: r["cnt"] for r in v.collect()}
    assert set(rows) <= {"a", "b", "c", "d"}
    assert all(len(p) == 1 for p in rows)

    import pytest

    with pytest.raises(ValueError):
        unigram_train(df, "text", keep_size=0)


def test_unigram_encode_order_and_unk_passthrough(spark):
    """unigram_encode: pieces come back in reading order across words,
    and words the vocabulary cannot segment (or over-length) pass
    through verbatim as one piece — the stream stays lossless."""
    from python_stream_processing_framework_spark.operators.unigram import (
        unigram_encode,
        unigram_train,
    )

    train = spark.createDataFrame(
        [(1, "abab abab cd"), (2, "abab cd cd ab")],
        "doc_id bigint, text string",
    )
    v = unigram_train(
        train, "text", seed_size=4, max_piece_len=3, max_word_len=8,
        em_rounds=2,
    )  # vocab {'ab','c','d'}
    apply = spark.createDataFrame(
        [(1, "cd abab zz"), (2, "abababababab ab")],
        "doc_id bigint, text string",
    )
    out = {
        r["doc_id"]: r["pieces"]
        for r in unigram_encode(
            apply, "doc_id", "text", v, max_piece_len=3, max_word_len=8
        ).collect()
    }
    assert out[1] == ["c", "d", "ab", "ab", "zz"]
    # over-length word (12 chars > cap 8) passes through whole
    assert out[2] == ["abababababab", "ab"]


def test_unigram_encode_byte_fallback(spark):
    """byte_fallback=True (r13, the deployed SentencePiece contract
    at character granularity): unsegmentable and over-length words
    decompose to single characters instead of passing through
    verbatim — still lossless (concat of pieces reconstructs the
    word), and a downstream consumer counting vocabulary pieces can
    price them. Segmentable words are unaffected."""
    from python_stream_processing_framework_spark.operators.unigram import (
        unigram_encode,
        unigram_train,
    )

    train = spark.createDataFrame(
        [(1, "abab abab cd"), (2, "abab cd cd ab")],
        "doc_id bigint, text string",
    )
    v = unigram_train(
        train, "text", seed_size=4, max_piece_len=3, max_word_len=8,
        em_rounds=2,
    )  # vocab {'ab','c','d'}
    apply = spark.createDataFrame(
        [(1, "cd abab zz"), (2, "abababababab ab")],
        "doc_id bigint, text string",
    )
    out = {
        r["doc_id"]: r["pieces"]
        for r in unigram_encode(
            apply, "doc_id", "text", v, max_piece_len=3, max_word_len=8,
            byte_fallback=True,
        ).collect()
    }
    # zz unsegmentable (no 'z' in vocab) -> chars; chars may be
    # OUTSIDE the vocab only for words the trainer never saw — the
    # documented residual vs true byte fallback
    assert out[1] == ["c", "d", "ab", "ab", "z", "z"]
    # over-length word decomposes too (lossless: ''.join == word)
    assert out[2] == list("abababababab") + ["ab"]


def test_unigram_segment_counts_byte_fallback_prices_encode(spark):
    """The counting consumer under byte_fallback prices EXACTLY what
    unigram_encode(byte_fallback=True) emits — per doc, n_pieces ==
    len(pieces) — including empty-word split artifacts."""
    from python_stream_processing_framework_spark.operators.unigram import (
        unigram_encode,
        unigram_segment_counts,
        unigram_train,
    )

    train = spark.createDataFrame(
        [(1, "abab abab cd"), (2, "abab cd cd ab")],
        "doc_id bigint, text string",
    )
    v = unigram_train(
        train, "text", seed_size=4, max_piece_len=3, max_word_len=8,
        em_rounds=2,
    )
    apply = spark.createDataFrame(
        [(1, "cd abab zz"), (2, "abababababab  ab"), (3, "zz zz")],
        "doc_id bigint, text string",
    )  # doc 2 has a double space -> empty-word token
    kw = dict(max_piece_len=3, max_word_len=8, byte_fallback=True)
    enc = {
        r["doc_id"]: len(r["pieces"])
        for r in unigram_encode(apply, "doc_id", "text", v, **kw).collect()
    }
    cnt = {
        r["doc_id"]: r["n_pieces"]
        for r in unigram_segment_counts(
            apply, "doc_id", "text", v, **kw
        ).collect()
    }
    assert enc == cnt


def _soft_ref_unigram(
    words_list, *, seed_size, max_piece_len, max_word_len, em_rounds
):
    """Sequential SOFT-EM (forward-backward) reference — the paper's
    actual E-step (Kudo 2018 §3.2), which the shipped trainer
    simplifies to hard (Viterbi) EM. Expected piece counts via
    alpha/beta lattice sums; the seed is identical to the trainer's
    so the comparison isolates the E-step choice. Used only to
    QUANTIFY the deviation (test below + module docstring numbers),
    not as a correctness oracle."""
    from collections import defaultdict

    wf = Counter(w for w in words_list if 1 <= len(w) <= max_word_len)
    occ = Counter()
    for w, c in wf.items():
        for s in range(len(w)):
            for p in range(1, min(max_piece_len, len(w) - s) + 1):
                occ[w[s : s + p]] += c
    counts = {p: c for p, c in occ.items() if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in occ.items() if len(p) >= 2),
        key=lambda kv: (-kv[1], kv[0]),
    )[:seed_size]
    counts.update(dict(multi))
    t = sum(counts.values())
    probs = {p: v / t for p, v in counts.items()}
    for _ in range(em_rounds):
        exp = defaultdict(float)
        for w, c in wf.items():
            n = len(w)
            alpha = [0.0] * (n + 1)
            alpha[0] = 1.0
            for e in range(1, n + 1):
                for s in range(max(0, e - max_piece_len), e):
                    pc = w[s:e]
                    if pc in probs:
                        alpha[e] += alpha[s] * probs[pc]
            if alpha[n] == 0:
                continue
            beta = [0.0] * (n + 1)
            beta[n] = 1.0
            for s in range(n - 1, -1, -1):
                for e in range(s + 1, min(n, s + max_piece_len) + 1):
                    pc = w[s:e]
                    if pc in probs:
                        beta[s] += probs[pc] * beta[e]
            for s in range(n):
                for e in range(s + 1, min(n, s + max_piece_len) + 1):
                    pc = w[s:e]
                    if pc in probs:
                        exp[pc] += c * alpha[s] * probs[pc] * beta[e] / alpha[n]
        counts = {p: v for p, v in exp.items() if v > 1e-12}
        t = sum(counts.values())
        probs = {p: v / t for p, v in counts.items()}
    return {p: math.log(v) for p, v in probs.items()}


def _seq_viterbi_pieces(w, lp, max_piece_len):
    """Exhaustive-argmax piece count under log-probs ``lp``; UNK=1."""
    best = None

    def rec(i, score, path):
        nonlocal best
        if i == len(w):
            if best is None or (score, path) > best:
                best = (score, path)
            return
        for p in range(1, min(max_piece_len, len(w) - i) + 1):
            piece = w[i : i + p]
            if piece in lp:
                rec(i + p, score + lp[piece], path + " " + piece)

    rec(0, 0.0, "")
    return len(best[1].split()) if best else 1


def test_unigram_hard_vs_soft_em_deviation(spark):
    """Quantifies the hard-EM (Viterbi-EM) simplification against the
    paper's forward-backward E-step on three crafted corpora at 2 EM
    rounds (3 rounds measured identical). Pinned findings, stated in
    the module docstring:

    - the shipped trainer's surviving vocabulary is a strict SUBSET
      of soft-EM's support on every corpus (soft keeps low-posterior
      pieces alive with fractional expected counts; hard zeroes any
      piece outside a best path) — support Jaccard 0.22 / 0.67 /
      0.56;
    - Viterbi-ENCODED piece totals under the two final vocabularies
      are IDENTICAL on the templated and natural-ish corpora (36 and
      39), i.e. the extra soft-EM survivors don't change what encode
      picks there;
    - only the maximally ambiguous single-letter corpus diverges:
      hard 50 vs soft 80 pieces (ratio 0.625 — hard commits to 'aa'
      and reuses it; soft's spread mass leaves char paths winning at
      encode time)."""
    from python_stream_processing_framework_spark.operators.unigram import (
        unigram_train,
    )

    CORPORA = {
        "templated": (("abab abab cd abab cd ab " * 4).strip(), 0.222, 36, 36),
        "ambiguous": (("aaa aa aaa aaaa a aaa " * 5).strip(), 0.667, 50, 80),
        "mixed": (("the cat sat on the mat the cat ran " * 3).strip(), 0.556, 39, 39),
    }
    for name, (text, exp_jac, exp_hard, exp_soft) in CORPORA.items():
        words = text.split()
        df = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
        hard = unigram_train(
            df, "text", seed_size=8, max_piece_len=3, max_word_len=8,
            em_rounds=2,
        )
        hlp = {
            r["piece"]: r["logp_nano"] / 1e9 for r in hard.collect()
        }
        slp = _soft_ref_unigram(
            words, seed_size=8, max_piece_len=3, max_word_len=8, em_rounds=2
        )
        hv, sv = set(hlp), set(slp)
        assert hv <= sv, f"{name}: hard vocab must be a soft-support subset"
        jac = len(hv & sv) / len(hv | sv)
        assert abs(jac - exp_jac) < 0.01, f"{name}: jaccard {jac}"
        wf = Counter(w for w in words if len(w) <= 8)
        tot_h = sum(_seq_viterbi_pieces(w, hlp, 3) * c for w, c in wf.items())
        tot_s = sum(_seq_viterbi_pieces(w, slp, 3) * c for w, c in wf.items())
        assert (tot_h, tot_s) == (exp_hard, exp_soft), f"{name}: {tot_h}/{tot_s}"
