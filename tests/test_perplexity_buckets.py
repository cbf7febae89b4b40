"""perplexity_buckets (operators/lm.py): exact tercile rule, ties,
small groups, generic bucket counts, NULL exclusion."""

from __future__ import annotations

import pytest

from python_stream_processing_framework_spark.operators.lm import perplexity_buckets


def _frame(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, lang string, avg_lp double")


def test_even_split_is_equal_mass(spark):
    # 9 distinct scores -> exactly 3 per bucket, ascending score
    rows = [(i, "en", -10.0 + i) for i in range(9)]
    out = {
        r["doc_id"]: r["bucket"]
        for r in perplexity_buckets(_frame(spark, rows), "lang").collect()
    }
    assert [out[i] for i in range(9)] == (
        ["tail"] * 3 + ["middle"] * 3 + ["head"] * 3
    )


def test_ties_share_a_bucket(spark):
    # 6 docs, scores [1,1,1,1,2,3]: BOTH tercile cuts land inside the
    # tie (cum(1)=4 covers k1=2 and k2=4), so all four tied docs are
    # tail and middle is empty — the rule is a pure function of the
    # score, never an arbitrary NTILE tie-split
    rows = [(i, "en", s) for i, s in enumerate([1.0, 1.0, 1.0, 1.0, 2.0, 3.0])]
    out = {
        r["doc_id"]: r["bucket"]
        for r in perplexity_buckets(_frame(spark, rows), "lang").collect()
    }
    assert [out[i] for i in range(6)] == (
        ["tail"] * 4 + ["head", "head"]
    )


def test_groups_are_independent_and_small_groups_degenerate(spark):
    rows = [(1, "en", -1.0), (2, "en", -2.0), (3, "en", -3.0),
            (4, "de", -9.0)]
    out = {
        r["doc_id"]: r["bucket"]
        for r in perplexity_buckets(_frame(spark, rows), "lang").collect()
    }
    # en's terciles use only en scores; de's single doc is its own
    # tail (cut1 = cut2 = its score)
    assert out[3] == "tail" and out[2] == "middle" and out[1] == "head"
    assert out[4] == "tail"


def test_null_scores_excluded(spark):
    rows = [(1, "en", -1.0), (2, "en", None), (3, "en", -3.0)]
    got = perplexity_buckets(_frame(spark, rows), "lang").collect()
    assert sorted(r["doc_id"] for r in got) == [1, 3]


def test_generic_bucket_count_and_validation(spark):
    rows = [(i, "en", float(i)) for i in range(4)]
    out = {
        r["doc_id"]: r["bucket"]
        for r in perplexity_buckets(
            _frame(spark, rows), "lang", n_buckets=2
        ).collect()
    }
    assert [out[i] for i in range(4)] == ["b1", "b1", "b2", "b2"]
    with pytest.raises(ValueError, match="n_buckets"):
        perplexity_buckets(_frame(spark, rows), "lang", n_buckets=1)


def test_score_micro_quantization_exact(spark):
    rows = [(1, "en", -1.2345675)]
    (r,) = perplexity_buckets(_frame(spark, rows), "lang").collect()
    assert r["score_micro"] == round(-1.2345675 * 1e6)
