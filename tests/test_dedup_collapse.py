"""Exact-duplicate mass guard for MinHash-LSH (operators/dedup.py).

Real web corpora are 30-50% byte-identical duplicates; c copies of one
document share every LSH band value, so an unguarded band self-join
generates O(c^2) candidates per copy-cluster. These tests pin:
  - the collapse is EXACTLY output-equivalent in pairs mode,
  - the band join only ever sees one representative per distinct text
    (candidate generation is O(#distinct), not O(#docs^2)),
  - expand='star' yields linear spanning edges with identical
    connected components,
  - the optional per-bucket occupancy cap drops hot buckets.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from python_stream_processing_framework_spark.operators.common import release_caches
from python_stream_processing_framework_spark.operators.dedup import (
    collapse_exact_dups,
    minhash_lsh_join,
    minhash_lsh_pairs,
)

# three mutually-dissimilar base texts plus a near-dup variant of the
# first (one appended word -> trigram Jaccard 10/11, and the 4-band
# collision fires deterministically for this md5 hash family)
BASE = [
    "the quick brown fox jumps over the lazy dog near the river",
    "federated learning requires careful aggregation of model updates across devices",
    "stock prices rallied sharply after the central bank cut interest rates",
]
NEAR = BASE[0] + " today"


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _pairset(rows):
    return {(r["doc_a"], r["doc_b"], r["n_common"], r["n_union"], round(r["jaccard"], 9)) for r in rows}


def test_collapse_reps_and_members(spark):
    rows = [(i, BASE[0]) for i in range(1000)]
    rows += [(1000, BASE[1]), (1001, BASE[2])]
    # case/whitespace-normalized copies collapse too
    rows += [(1002, BASE[1].upper())]
    reps = collapse_exact_dups(_docs(spark, rows), "doc_id", "text").collect()
    # 1000 copies + {B1, B1.upper()} + B2 -> 3 distinct normalized texts
    assert len(reps) == 3
    by_rep = {r["doc_id"]: sorted(r["_members"]) for r in reps}
    assert by_rep[0] == list(range(1000))
    assert by_rep[1000] == [1000, 1002]
    assert by_rep[1001] == [1001]


def test_copy_mass_star_is_linear(spark):
    """1000 exact copies: the band join sees ONE representative, and
    star mode emits exactly 999 rep->copy edges (not ~500k pairs)."""
    rows = [(i, BASE[0]) for i in range(1000)]
    rows += [(2000 + j, BASE[j]) for j in (1, 2)]
    star = minhash_lsh_pairs(
        _docs(spark, rows), "doc_id", "text", threshold=0.5, expand="star"
    ).collect()
    release_caches()
    # BASE texts are mutually dissimilar -> no rep pairs survive verify;
    # output is exactly the copy-cluster star
    assert len(star) == 999
    assert {r["doc_b"] for r in star} == set(range(1, 1000))
    assert all(r["doc_a"] == 0 and r["jaccard"] == 1.0 for r in star)


def test_pairs_mode_exact_equivalence(spark):
    """collapse_exact=True must reproduce the unguarded output exactly:
    copies of near-dup texts, copies of unrelated texts, singletons."""
    rows = (
        [(i, BASE[0]) for i in range(4)]  # 4 copies of text A
        + [(10, NEAR), (11, NEAR)]  # 2 copies of near-dup A'
        + [(20, BASE[1]), (21, BASE[2])]  # singletons
        + [(30, BASE[2])]  # copy of 21
    )
    docs = _docs(spark, rows)
    guarded = _pairset(
        minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.5).collect()
    )
    release_caches()
    unguarded = _pairset(
        minhash_lsh_pairs(
            docs, "doc_id", "text", threshold=0.5, collapse_exact=False
        ).collect()
    )
    release_caches()
    assert guarded == unguarded
    # sanity: all 8 intra-cluster pairs (C(4,2) for A, one for A', one
    # for B2) at jaccard 1.0, and all 4x2 A x A' cross-cluster pairs
    # carrying the representative pair's stats (10/11)
    intra = {p for p in guarded if p[4] == 1.0}
    cross = guarded - intra
    assert len(intra) == 6 + 1 + 1
    assert len(cross) == 8
    assert {(p[0], p[1]) for p in cross} == {(i, j) for i in range(4) for j in (10, 11)}
    assert all(p[2] == 10 and p[3] == 11 for p in cross)


def test_star_components_match_pairs_components(spark):
    from python_stream_processing_framework_spark.operators.graph import (
        connected_components,
    )

    rows = (
        [(i, BASE[0]) for i in range(5)]
        + [(10, NEAR), (11, NEAR)]
        + [(20, BASE[1]), (21, BASE[2]), (30, BASE[2])]
    )
    docs = _docs(spark, rows)
    comp = {}
    for mode in ("pairs", "star"):
        pairs = minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.5, expand=mode)
        comp[mode] = {
            (r["node"], r["component"])
            for r in connected_components(pairs, "doc_a", "doc_b").collect()
        }
        release_caches()
    assert comp["star"] == comp["pairs"]
    # A-copies and A'-copies form one component rooted at min id 0
    labels = dict(comp["star"])
    assert all(labels[i] == 0 for i in [0, 1, 2, 3, 4, 10, 11])
    assert labels[21] == labels[30] == 21


def test_max_band_freq_cap_drops_hot_buckets(spark):
    """Distinct (non-identical) near-dup texts survive the exact
    collapse; the band-occupancy cap is the guard for THAT residual
    mass. With a cap below the bucket size, the pairs disappear."""
    rows = [(i, BASE[0] + f" tail{i}") for i in range(12)]
    docs = _docs(spark, rows)
    uncapped = minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.5).collect()
    release_caches()
    capped = minhash_lsh_pairs(
        docs, "doc_id", "text", threshold=0.5, max_band_freq=5
    ).collect()
    release_caches()
    assert len(uncapped) > 0
    assert len(capped) < len(uncapped)


def test_join_collapse_equivalence(spark):
    left = _docs(
        spark,
        [(i, BASE[0]) for i in range(3)] + [(5, NEAR), (6, BASE[1])],
    )
    right = _docs(
        spark,
        [(100, BASE[0]), (101, BASE[0]), (102, NEAR), (103, BASE[2])],
    )

    def run(collapse):
        out = {
            (r["id_left"], r["id_right"], round(r["jaccard"], 9))
            for r in minhash_lsh_join(
                left, right, "doc_id", "text", threshold=0.5, collapse_exact=collapse
            ).collect()
        }
        release_caches()
        return out

    guarded, unguarded = run(True), run(False)
    assert guarded == unguarded
    # every left copy of A hits every right copy of A at jaccard 1.0
    assert {(i, j, 1.0) for i in range(3) for j in (100, 101)} <= guarded


def test_star_requires_collapse(spark):
    with pytest.raises(ValueError):
        minhash_lsh_pairs(
            _docs(spark, [(0, BASE[0])]),
            "doc_id",
            "text",
            collapse_exact=False,
            expand="star",
        )


def test_ngram_overlap_hits_exact_and_duckdb_cross_check(spark):
    """Planted 13-gram overlap + an independent DuckDB replay of the
    whole operator (tokenize, slice, md5, distinct, join, count) —
    oracle-grade verification without a driver catalog slot, since
    the catalog's corpus_decontaminate row already pins the fuzzy
    member of this family."""
    import duckdb

    from python_stream_processing_framework_spark.operators.dedup import (
        ngram_overlap_hits,
    )

    span = " ".join(f"w{i}" for i in range(13))  # the shared 13 tokens
    corpus_rows = [
        (1, f"intro text then {span} and an unrelated tail here"),
        (2, "completely unrelated document with its own words only"),
        (3, f"{span}"),  # exactly the span, nothing else
        (4, "short doc"),  # < 13 tokens: must never be flagged
    ]
    heldout_rows = [
        (100, f"benchmark question embedding {span} inside an answer"),
        (101, "held out but sharing nothing with training data"),
        (102, "tiny"),  # < 13 tokens on the held-out side
    ]
    corpus = spark.createDataFrame(corpus_rows, ["doc_id", "text"])
    heldout = spark.createDataFrame(heldout_rows, ["doc_id", "text"])

    got = sorted(
        (r["id_corpus"], r["id_heldout"], r["n_shared"])
        for r in ngram_overlap_hits(corpus, heldout, n=13).collect()
    )
    # docs 1 and 3 share exactly the one planted 13-gram with doc 100
    assert got == [(1, 100, 1), (3, 100, 1)]

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE c AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in corpus_rows)
        + ") t(doc_id, text)"
    )
    con.execute(
        "CREATE TABLE h AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in heldout_rows)
        + ") t(doc_id, text)"
    )
    expect = sorted(
        tuple(r)
        for r in con.execute(
            f"""
            WITH cg AS (SELECT DISTINCT doc_id, g FROM (
                   SELECT doc_id, md5(array_to_string(toks[i:i+12], ' ')) AS g
                   FROM (SELECT doc_id, string_split(trim(lower(text)), ' ') AS toks FROM c),
                        unnest(range(1, len(toks) - 11)) AS u(i)
                   WHERE len(toks) >= 13) x),
                 hg AS (SELECT DISTINCT doc_id, g FROM (
                   SELECT doc_id, md5(array_to_string(toks[i:i+12], ' ')) AS g
                   FROM (SELECT doc_id, string_split(trim(lower(text)), ' ') AS toks FROM h),
                        unnest(range(1, len(toks) - 11)) AS u(i)
                   WHERE len(toks) >= 13) x)
            SELECT cg.doc_id, hg.doc_id, CAST(count(*) AS BIGINT)
            FROM cg JOIN hg USING (g)
            GROUP BY cg.doc_id, hg.doc_id
            """
        ).fetchall()
    )
    assert got == expect


def test_ngram_decontaminate_drops_flagged_only(spark):
    from python_stream_processing_framework_spark.operators.dedup import (
        ngram_decontaminate,
    )

    span = " ".join(f"t{i}" for i in range(13))
    corpus = spark.createDataFrame(
        [
            (1, f"contaminated because {span} appears here"),
            (2, "clean document that shares no long span at all"),
        ],
        ["doc_id", "text"],
    )
    heldout = spark.createDataFrame(
        [(9, f"eval item with {span} in it")], ["doc_id", "text"]
    )
    kept = sorted(
        r["doc_id"] for r in ngram_decontaminate(corpus, heldout).collect()
    )
    assert kept == [2]


def test_ngram_overlap_heldout_side_broadcasts(spark):
    """The corpus must never shuffle: the benchmark-sized held-out
    gram set is the broadcast side."""
    from python_stream_processing_framework_spark.operators.dedup import (
        ngram_overlap_hits,
    )

    corpus = spark.range(0, 2000).selectExpr(
        "id AS doc_id",
        "concat_ws(' ', transform(sequence(1, 20), j -> concat('w', pmod(id*7+j, 999)))) AS text",
    )
    heldout = spark.range(0, 5).selectExpr(
        "id + 10000 AS doc_id",
        "concat_ws(' ', transform(sequence(1, 20), j -> concat('w', j))) AS text",
    )
    plan = (
        ngram_overlap_hits(corpus, heldout)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_bloom_flags_superset_of_exact_and_composition(spark):
    """The bloom guarantee: no false negatives — every doc the exact
    13-gram rule flags is bloom-flagged; bloom_decontaminate drops
    exactly the flagged set."""
    from python_stream_processing_framework_spark.operators.dedup import (
        bloom_build,
        bloom_decontaminate,
        bloom_flags,
        ngram_overlap_hits,
    )

    span = " ".join(f"t{i}" for i in range(13))
    span2 = " ".join(f"s{i}" for i in range(15))
    corpus = spark.createDataFrame(
        [
            (1, f"contaminated because {span} appears here"),
            (2, "clean document that shares no long span at all"),
            (3, f"also dirty via the longer one {span2} yes"),
            (4, "too short"),
        ],
        ["doc_id", "text"],
    )
    heldout = spark.createDataFrame(
        [(9, f"eval item with {span} in it"), (10, span2)],
        ["doc_id", "text"],
    )
    words = bloom_build(heldout, "text")
    assert len(words) == (1 << 17) // 64 and any(words)
    flags = {
        r["doc_id"]: r["bloom_flagged"]
        for r in bloom_flags(corpus, words, "doc_id", "text").collect()
    }
    exact = {
        r["id_corpus"]
        for r in ngram_overlap_hits(corpus, heldout, "doc_id", "text").collect()
    }
    assert exact == {1, 3}
    assert all(flags[d] for d in exact), "bloom produced a false negative"
    assert flags[4] is False, "sub-13-token doc can never be flagged"
    kept = sorted(
        r["doc_id"] for r in bloom_decontaminate(corpus, heldout).collect()
    )
    assert kept == sorted(d for d, f in flags.items() if not f)


def test_bloom_flags_map_only_zero_exchanges(spark):
    """The scale contract: the membership test ships only the bitmask
    and runs inside the scan stage — no join, no exchange."""
    from python_stream_processing_framework_spark.operators.dedup import (
        bloom_build,
        bloom_flags,
    )
    from python_stream_processing_framework_spark.plans import count_exchanges

    heldout = spark.createDataFrame(
        [(9, " ".join(f"h{i}" for i in range(20)))], ["doc_id", "text"]
    )
    corpus = spark.range(0, 100).selectExpr(
        "id AS doc_id",
        "concat_ws(' ', transform(sequence(1, 30), j -> concat('w', pmod(id*7+j, 999)))) AS text",
    )
    words = bloom_build(heldout, "text")
    assert count_exchanges(bloom_flags(corpus, words, "doc_id", "text")) == 0


def test_bloom_build_validates(spark):
    import pytest as _pytest

    from python_stream_processing_framework_spark.operators.dedup import bloom_build

    held = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    with _pytest.raises(ValueError, match="power of two"):
        bloom_build(held, "text", m_bits=100)
    with _pytest.raises(ValueError, match="k must be"):
        bloom_build(held, "text", k=7)


def test_select_canonical_keep_best_with_ties(spark):
    from python_stream_processing_framework_spark.operators.dedup import (
        select_canonical,
    )

    labeled = spark.createDataFrame(
        [
            # cluster 1: doc 3 longest -> canonical
            (1, 1, 5),
            (2, 1, 7),
            (3, 1, 9),
            # cluster 2: tie on score -> min id wins
            (10, 2, 4),
            (11, 2, 4),
        ],
        ["doc_id", "component", "score"],
    )
    out = {
        r["doc_id"]: r["is_canonical"]
        for r in select_canonical(labeled).collect()
    }
    assert out == {1: False, 2: False, 3: True, 10: True, 11: False}


def test_hot_bucket_cap_is_recall_neutral_outside_capped_buckets(spark):
    """The max_band_freq=256 recommendation's justifying invariant
    (SCALE.md "Hot-bucket cap"): on a planted corpus with a giant
    boilerplate bucket plus normal near-dup pairs (bucket occupancy
    ~2), capping at 256 finds EXACTLY the same planted pairs as the
    uncapped run — the cap only refuses the boilerplate cluster's
    quadratic pair mass."""
    from pyspark.sql import functions as F

    from python_stream_processing_framework_spark.operators.common import (
        release_caches,
    )
    from python_stream_processing_framework_spark.operators.dedup import (
        minhash_lsh_pairs,
    )

    n = 2_000
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.expr(
            """CASE
                 WHEN id % 5 = 0 THEN
                   concat(concat_ws(' ', transform(sequence(1, 30),
                     j -> concat('b', j))), ' u', id)
                 WHEN id % 200 = 101 THEN
                   concat_ws(' ', transform(sequence(1, 30),
                     j -> IF(j = 7, concat('edit', id),
                             concat('w', pmod(hash(id - 100, j), 100000)))))
                 ELSE
                   concat_ws(' ', transform(sequence(1, 30),
                     j -> concat('w', pmod(hash(id, j), 100000))))
               END"""
        ).alias("text"),
    ).persist()
    docs.count()
    planted = {(i - 100, i) for i in range(101, n, 200)}
    try:
        def mine(cap):
            pairs = minhash_lsh_pairs(
                docs, "doc_id", "text", num_hashes=16, bands=4,
                threshold=0.5, max_band_freq=cap,
            )
            got = {(r["doc_a"], r["doc_b"]) for r in pairs.collect()}
            release_caches()
            return got

        uncapped, capped = mine(None), mine(256)
        # identical planted-pair recall — the cap is recall-neutral
        # outside the capped bucket (and LSH must find most of them)
        assert uncapped & planted == capped & planted
        assert len(capped & planted) >= 0.7 * len(planted)
        # the boilerplate cluster's quadratic mass IS refused: the 400
        # boilerplate docs (bucket occupancy > the 256 cap) pair fully
        # uncapped, zero capped
        boiler_un = {(a, b) for a, b in uncapped if a % 5 == 0 and b % 5 == 0}
        boiler_cap = {(a, b) for a, b in capped if a % 5 == 0 and b % 5 == 0}
        # near-complete uncapped (LSH band recall ~>99% at j=27/31),
        # ZERO capped — the quadratic mass is refused, not sampled
        assert len(boiler_un) >= 0.95 * (400 * 399 // 2)
        assert not boiler_cap
    finally:
        docs.unpersist()
