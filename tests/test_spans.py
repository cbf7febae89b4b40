"""Repeated-span masking (operators/spans.py): hand-checked span
merging, cross-doc and self-repeats, and rebuild invariants.
"""

from __future__ import annotations

import pytest

from python_stream_processing_framework_spark.operators.spans import (
    mask_repeated_spans,
    repeated_spans,
)


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [
            (1, "a b c d e x1 y1 z1"),
            (2, "p q a b c d e r s"),
            (3, "unique tokens only here now"),
            (4, "m m m m m m m m"),
        ],
        "doc_id int, text string",
    )


def test_overlapping_windows_merge_to_maximal_spans(corpus):
    spans = sorted(
        tuple(r) for r in repeated_spans(corpus, n=3, min_count=2).collect()
    )
    # "a b c d e" = three overlapping repeated 3-grams -> ONE span of
    # 5 tokens in each doc; doc 4's self-repeating windows merge to
    # the whole doc (occurrences count, not distinct docs)
    assert spans == [(1, 1, 5), (2, 3, 7), (4, 1, 8)]


def test_mask_deletes_spans_keeps_rest(corpus):
    out = {
        r["doc_id"]: (r["text"], r["n_tokens"], r["n_removed"])
        for r in mask_repeated_spans(corpus, n=3, min_count=2).collect()
    }
    assert out[1] == ("x1 y1 z1", 8, 5)
    assert out[2] == ("p q r s", 9, 5)
    # untouched doc passes through canonicalized with n_removed=0
    assert out[3] == ("unique tokens only here now", 5, 0)
    # a fully-boilerplate doc masks to empty, not to a missing row
    assert out[4] == ("", 8, 8)


def test_min_count_three_spares_pairs(corpus):
    spans = repeated_spans(corpus, n=3, min_count=3).collect()
    # "a b c" etc. occur only twice; only doc 4's self-repeat (6
    # occurrences of "m m m") survives the higher threshold
    assert sorted(tuple(r) for r in spans) == [(4, 1, 8)]


def test_short_docs_never_flag(spark):
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b")], "doc_id int, text string"
    )
    assert repeated_spans(docs, n=3, min_count=2).count() == 0
    out = mask_repeated_spans(docs, n=3, min_count=2).collect()
    assert all(r["n_removed"] == 0 for r in out)


def test_disjoint_repeats_stay_separate_spans(spark):
    # the shared 3-gram appears at both ends of doc 1 with unique
    # filler between: two islands, not one doc-wide span
    docs = spark.createDataFrame(
        [
            (1, "a b c u1 u2 u3 u4 a b c"),
            (2, "a b c"),
        ],
        "doc_id int, text string",
    )
    spans = sorted(
        tuple(r) for r in repeated_spans(docs, n=3, min_count=2).collect()
    )
    assert spans == [(1, 1, 3), (1, 8, 10), (2, 1, 3)]
    out = {
        r["doc_id"]: (r["text"], r["n_removed"])
        for r in mask_repeated_spans(docs, n=3, min_count=2).collect()
    }
    assert out[1] == ("u1 u2 u3 u4", 6)
    assert out[2] == ("", 3)


def test_mask_matches_sequential_reference(spark):
    """Property pin: the distributed pipeline equals a direct
    sequential implementation (count n-gram occurrences, flag, merge
    overlapping windows, delete) on a seeded pseudo-random corpus
    with heavy gram collisions (tiny vocabulary)."""
    import random

    rng = random.Random(20240814)
    vocab = ["a", "b", "c", "d"]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 18))))
        for i in range(40)
    ]
    n, min_count = 3, 2

    # sequential reference
    from collections import Counter

    toks = {i: t.strip().lower().split(" ") for i, t in docs}
    counts = Counter(
        tuple(ts[j : j + n])
        for ts in toks.values()
        if len(ts) >= n
        for j in range(len(ts) - n + 1)
    )
    expected = {}
    for i, ts in toks.items():
        covered = set()
        for j in range(max(0, len(ts) - n + 1)):
            if len(ts) >= n and counts[tuple(ts[j : j + n])] >= min_count:
                covered.update(range(j, j + n))
        kept = [t for j, t in enumerate(ts) if j not in covered]
        expected[i] = (" ".join(kept), len(ts), len(ts) - len(kept))

    from python_stream_processing_framework_spark.operators.spans import (
        mask_repeated_spans,
    )

    df = spark.createDataFrame(docs, "doc_id int, text string")
    got = {
        r["doc_id"]: (r["text"], r["n_tokens"], r["n_removed"])
        for r in mask_repeated_spans(
            df, n=n, min_count=min_count
        ).collect()
    }
    assert got == expected


# ------------------------------------------- maximal matched runs


def test_maximal_spans_split_fused_islands(spark):
    """The crafted overlapping-repeat case (r14 verdict #3): two
    UNRELATED duplicated strings sit adjacent in one doc. The
    fixed-window island merge fuses them into one span that is not
    itself a duplicated substring; maximal_duplicate_spans reports
    the two true matches with their provenance."""
    from python_stream_processing_framework_spark.operators.spans import (
        duplicate_spans_keep_first,
        maximal_duplicate_spans,
    )

    df = spark.createDataFrame(
        [
            (1, "a b c d e q r s t u"),        # sources, doc 1 earliest
            (2, "m1 m2 a b c d e q r s t u m3"),  # S1 then S2, adjacent
        ],
        "doc_id int, text string",
    )
    fused = sorted(
        tuple(r)
        for r in duplicate_spans_keep_first(df, n=3).collect()
    )
    # windows over doc 1's FULL text all repeat in doc 2 (it embeds
    # the whole string), so keep-first flags doc 2's copy as ONE
    # island 3..12
    assert fused == [(2, 3, 12)]
    maximal = sorted(
        tuple(r) for r in maximal_duplicate_spans(df, n=3).collect()
    )
    # one run per alignment: doc 2 positions 3..12 match doc 1
    # positions 1..10 on a single diagonal — and the span is exactly
    # the duplicated substring (pairwise maximal: m2/m3 break it)
    assert maximal == [(2, 3, 12, 1, 1)]


def test_maximal_spans_true_boundaries_on_adjacent_duplicates(spark):
    """Two duplicated strings from DIFFERENT sources, adjacent in the
    target: the island merge reports one fused pseudo-span; the
    maximal operator reports each true match separately with exact
    boundaries."""
    from python_stream_processing_framework_spark.operators.spans import (
        duplicate_spans_keep_first,
        maximal_duplicate_spans,
    )

    df = spark.createDataFrame(
        [
            (1, "a b c d e k1 k2 k3"),   # S1 = a b c d e
            (2, "v w x y z k4 k5 k6"),   # S2 = v w x y z
            (3, "h1 h2 a b c d e v w x y z h3"),
        ],
        "doc_id int, text string",
    )
    fused = sorted(
        tuple(r) for r in duplicate_spans_keep_first(df, n=3).collect()
    )
    # junction windows ("d e v", "e v w") occur once -> not flagged,
    # but S1's island (3..7) and S2's (8..12) touch, so the merge
    # fuses them into 3..12 — a span duplicated NOWHERE as a whole
    assert fused == [(3, 3, 12)]
    maximal = sorted(
        tuple(r) for r in maximal_duplicate_spans(df, n=3).collect()
    )
    assert maximal == [(3, 3, 7, 1, 1), (3, 8, 12, 2, 1)]


def test_maximal_spans_self_repeat_and_exact_maximality(spark):
    """A doc repeating its own earlier paragraph reports itself as
    src; boundaries are exactly the duplicated substring (no
    extension possible on either side)."""
    from python_stream_processing_framework_spark.operators.spans import (
        maximal_duplicate_spans,
    )

    df = spark.createDataFrame(
        [(7, "s1 s2 a b c d s3 s4 a b c d s5")],
        "doc_id int, text string",
    )
    got = sorted(
        tuple(r) for r in maximal_duplicate_spans(df, n=3).collect()
    )
    # second "a b c d" at 9..12 matches the first at 3..6; windows
    # "s4 a b" / "c d s5" are unique so the run is exactly 4 tokens
    assert got == [(7, 9, 12, 7, 3)]


def test_maximal_spans_cover_keep_first_mass(spark):
    """Coverage contract: the union of maximal matched runs covers
    every position the keep-first island tier masks (masked mass is
    a superset — here equality by construction, asserted as >=)."""
    from python_stream_processing_framework_spark.operators.spans import (
        duplicate_spans_keep_first,
        maximal_duplicate_spans,
    )

    df = spark.createDataFrame(
        [
            (1, "a b c d e q r s t u a b c d e"),
            (2, "m1 m2 a b c d e q r s t u m3 q r s t u"),
            (3, "q r s t u zz a b c d e"),
            (4, "nothing shared here at all friends"),
        ],
        "doc_id int, text string",
    )

    def coverage(rows, s_field, e_field):
        cov = set()
        for r in rows:
            cov.update(
                (r["doc_id"], p)
                for p in range(r[s_field], r[e_field] + 1)
            )
        return cov

    fused = coverage(
        duplicate_spans_keep_first(df, n=3).collect(),
        "span_start",
        "span_end",
    )
    maximal = coverage(
        maximal_duplicate_spans(df, n=3).collect(),
        "span_start",
        "span_end",
    )
    assert maximal >= fused


@pytest.mark.slow
def test_maximal_spans_hypothesis_parity():
    """Property parity with a sequential reference over random tiny
    corpora (small alphabet forces repeats): per-gram earliest
    occurrence, diagonal runs, boundary arithmetic."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from python_stream_processing_framework_spark.operators.spans import (
        maximal_duplicate_spans,
    )
    from python_stream_processing_framework_spark.session import get_spark

    def ref(docs: list[tuple[int, str]], n: int):
        grams: dict[str, tuple[int, int]] = {}  # gram -> earliest (doc, start)
        per_doc = {}
        for d, text in docs:
            toks = text.strip().lower().split()
            per_doc[d] = toks
            for i in range(len(toks) - n + 1):
                g = " ".join(toks[i : i + n])
                key = (d, i + 1)
                if g not in grams or key < grams[g]:
                    grams[g] = min(grams.get(g, key), key)
        matches: dict[tuple[int, int, int], list[int]] = {}
        for d, toks in per_doc.items():
            for i in range(len(toks) - n + 1):
                g = " ".join(toks[i : i + n])
                d0, s0 = grams[g]
                start = i + 1
                if (d0, s0) == (d, start):
                    continue
                matches.setdefault((d, d0, start - s0), []).append(start)
        spans = set()
        for (d, d0, diag), starts in matches.items():
            starts.sort()
            run = [starts[0]]
            for s in starts[1:]:
                if s == run[-1] + 1:
                    run.append(s)
                else:
                    spans.add((d, run[0], run[-1] + n - 1, d0, run[0] - diag))
                    run = [s]
            spans.add((d, run[0], run[-1] + n - 1, d0, run[0] - diag))
        return spans

    @settings(max_examples=20, deadline=None)
    @given(
        st.lists(
            st.lists(
                st.sampled_from(["a", "b", "c"]), min_size=0, max_size=12
            ),
            min_size=1,
            max_size=5,
        ),
        st.sampled_from([2, 3]),
    )
    def prop(word_lists, n):
        spark = get_spark("spans-hyp")
        docs = [(i, " ".join(ws)) for i, ws in enumerate(word_lists)]
        df = spark.createDataFrame(docs, "doc_id bigint, text string")
        got = {
            tuple(r) for r in maximal_duplicate_spans(df, n=n).collect()
        }
        assert got == ref(docs, n)

    prop()
