"""Linear probe (operators/probe.py): one-vs-rest least-squares GD
on embedding columns in exact integer arithmetic — parity vs a
sequential integer reference, determinism/partition invariance,
separation on crafted signal, and the pinned prediction tie-break."""

from __future__ import annotations

import pytest

from python_stream_processing_framework_spark.operators.probe import (
    linear_probe_predict,
    linear_probe_train,
    tdiv,
)

_MICRO = 1_000_000
_NANO = 1_000_000_000
_FEMTO = _MICRO * _NANO


def _ref_train(rows, dim, rounds, lr_ppb):
    """Sequential reference of the module's arithmetic contract:
    same quantization, same exact integer sums, same truncating
    divisions — pure Python, no Spark."""
    classes = sorted({y for y, _ in rows})
    xq = [[round(x * _MICRO) for x in vec] for _, vec in rows]
    ys = [y for y, _ in rows]
    n = len(rows)
    w = {c: [0] * dim for c in classes}
    for _ in range(rounds):
        grads = {c: [0] * dim for c in classes}
        for y, x in zip(ys, xq):
            for c in classes:
                z = tdiv(sum(w[c][j] * x[j] for j in range(dim)), _MICRO)
                r = z - (_NANO if y == c else 0)
                for j in range(dim):
                    grads[c][j] += r * x[j]
        for c in classes:
            for j in range(dim):
                w[c][j] -= tdiv(lr_ppb * tdiv(grads[c][j], n), _FEMTO)
    return w


def test_tdiv_truncates_toward_zero():
    assert tdiv(7, 2) == 3
    assert tdiv(-7, 2) == -3
    assert tdiv(7, -2) == -3
    assert tdiv(-7, -2) == 3
    # the divergence from Python floor division this helper exists for
    assert (-7) // 2 == -4


@pytest.fixture(scope="module")
def crafted(spark):
    """Two linearly separable classes in 4 dims: class 0 points at
    +e1, class 1 at +e2, with mild noise baked into the literals
    (deterministic — no RNG in tests)."""
    rows = [
        (0, [0.9, 0.1, 0.05, -0.02]),
        (0, [0.8, -0.1, 0.0, 0.03]),
        (0, [1.0, 0.0, -0.04, 0.01]),
        (0, [0.85, 0.05, 0.02, 0.0]),
        (1, [0.1, 0.9, -0.03, 0.02]),
        (1, [-0.05, 0.95, 0.01, -0.01]),
        (1, [0.0, 0.85, 0.04, 0.0]),
        (1, [0.05, 1.0, 0.0, 0.02]),
    ]
    df = spark.createDataFrame(
        [(i, y, v) for i, (y, v) in enumerate(rows)],
        "vec_id bigint, label int, embedding array<float>",
    )
    return rows, df


def test_train_matches_sequential_reference(crafted, spark):
    rows, df = crafted
    w = {
        (r["label"], r["dim"]): r["w_nano"]
        for r in linear_probe_train(
            df, rounds=3, lr_ppb=500_000_000
        ).collect()
    }
    # reference quantizes from float32-rounded values, like parquet/
    # createDataFrame storage does
    import struct

    f32 = lambda x: struct.unpack("f", struct.pack("f", x))[0]
    ref_rows = [(y, [f32(x) for x in vec]) for y, vec in rows]
    ref = _ref_train(ref_rows, 4, rounds=3, lr_ppb=500_000_000)
    assert w == {
        (c, j): ref[c][j] for c in ref for j in range(4)
    }


def test_train_partition_invariant(crafted, spark):
    _, df = crafted
    one = sorted(
        tuple(r)
        for r in linear_probe_train(df.coalesce(1), rounds=2).collect()
    )
    many = sorted(
        tuple(r)
        for r in linear_probe_train(df.repartition(7), rounds=2).collect()
    )
    assert one == many


def test_probe_separates_crafted_classes(crafted, spark):
    """With real signal the probe must actually classify: 100%
    training accuracy on the separable corpus after a few rounds."""
    _, df = crafted
    w = linear_probe_train(df, rounds=6, lr_ppb=800_000_000)
    out = linear_probe_predict(df, w).collect()
    assert all(r["pred"] == r["label"] for r in out)
    # and the learned weights look like the planted directions:
    # class 0 weights largest on dim 0, class 1 on dim 1
    wm = {
        (r["label"], r["dim"]): r["w_nano"] for r in w.collect()
    }
    assert wm[(0, 0)] == max(wm[(0, j)] for j in range(4))
    assert wm[(1, 1)] == max(wm[(1, j)] for j in range(4))


def test_predict_tie_breaks_to_smallest_label(spark):
    """All-zero embeddings score 0 for every class: the pinned rule
    (max z, then smallest label) must pick class 0 everywhere."""
    df = spark.createDataFrame(
        [(0, 5, [0.0, 0.0]), (1, 7, [0.0, 0.0])],
        "vec_id bigint, label int, embedding array<float>",
    )
    w = linear_probe_train(df, rounds=0)
    out = linear_probe_predict(df, w).collect()
    assert all(r["pred"] == 5 for r in out)
    assert all(r["z_nano"] == 0 for r in out)


def test_train_empty_raises(spark):
    df = spark.createDataFrame(
        [], "vec_id bigint, label int, embedding array<float>"
    )
    with pytest.raises(ValueError, match="empty"):
        linear_probe_train(df)


def test_sampled_rounds_full_rate_is_full_batch(crafted, spark):
    """sample_ppb=1e9 admits every row each round, so the sampled
    path must be bit-identical to full batch (same divisor, same
    sums)."""
    _, df = crafted
    df = df.withColumn("vec_id", df["vec_id"])
    full = sorted(
        tuple(r) for r in linear_probe_train(df, rounds=3).collect()
    )
    sampled = sorted(
        tuple(r)
        for r in linear_probe_train(
            df, rounds=3, sample_ppb=1_000_000_000, sample_key="vec_id"
        ).collect()
    )
    assert full == sampled


@pytest.mark.slow
def test_sampled_rounds_deterministic_and_partition_invariant(crafted, spark):
    _, df = crafted
    kw = dict(rounds=3, sample_ppb=500_000_000, sample_key="vec_id")
    one = sorted(
        tuple(r) for r in linear_probe_train(df.coalesce(1), **kw).collect()
    )
    two = sorted(
        tuple(r)
        for r in linear_probe_train(df.repartition(5), **kw).collect()
    )
    assert one == two
    # and the half-rate sample actually trained (nonzero weights)
    assert any(t[2] != 0 for t in one)


def test_sampled_rounds_empty_sample_is_noop(crafted, spark):
    """sample_ppb=0 admits nothing: every round is an empty sample
    and the weights stay at initialization."""
    _, df = crafted
    w = linear_probe_train(
        df, rounds=2, sample_ppb=0, sample_key="vec_id"
    ).collect()
    assert all(r["w_nano"] == 0 for r in w)


def test_sample_ppb_requires_key(crafted, spark):
    _, df = crafted
    with pytest.raises(ValueError, match="sample_key"):
        linear_probe_train(df, sample_ppb=1)


def test_margin_gate_on_crafted_classes(crafted, spark):
    """The binary curation gate: class-0 rows carry positive margin,
    class-1 rows negative; validation rejects unknown positives and
    degenerate single-class tables."""
    from python_stream_processing_framework_spark.operators.probe import (
        linear_probe_margin,
    )

    rows, df = crafted
    w = linear_probe_train(df, rounds=6, lr_ppb=800_000_000)
    out = linear_probe_margin(df, w, positive=0).collect()
    for r in out:
        assert (r["margin_nano"] > 0) == (r["label"] == 0), r
    with pytest.raises(ValueError, match="not in the weight table"):
        linear_probe_margin(df, w, positive=7)
    single = w.filter("label = 0")
    with pytest.raises(ValueError, match=">= 2 classes"):
        linear_probe_margin(df, single, positive=0)


def test_train_ragged_or_null_embeddings_raise(spark):
    """r13 ADVICE: ragged embeddings make per-dim _n differ (the
    gradient divisor would depend on plan order) while short vectors
    null out of the dot yet still dilute the mean; null embeddings
    (size -1) contribute nothing. The trainer refuses both loudly."""
    ragged = spark.createDataFrame(
        [(0, 0, [1.0, 0.0]), (1, 1, [0.0, 1.0, 0.5])],
        "vec_id bigint, label int, embedding array<float>",
    )
    with pytest.raises(ValueError, match="ragged or null"):
        linear_probe_train(ragged)
    withnull = spark.createDataFrame(
        [(0, 0, [1.0, 0.0]), (1, 1, None)],
        "vec_id bigint, label int, embedding array<float>",
    )
    with pytest.raises(ValueError, match="ragged or null"):
        linear_probe_train(withnull)


def test_train_all_null_embeddings_raise_cleanly(spark):
    """r14 ADVICE: with EVERY embedding null (n>0), max(size) over
    all-null was None, so the comparison raised TypeError instead of
    the intended refusal. Both bounds now coalesce to -1."""
    allnull = spark.createDataFrame(
        [(0, 0, None), (1, 1, None)],
        "vec_id bigint, label int, embedding array<float>",
    )
    with pytest.raises(ValueError, match="ragged or null"):
        linear_probe_train(allnull)


def test_train_null_element_raises(spark):
    """r14 ADVICE: a correct-LENGTH vector with a null ELEMENT passes
    the size check, yet null-skips out of the gradient sums while _n
    still counts the row — diluting the mean. The trainer now probes
    element nulls in the same metadata aggregate and refuses."""
    elemnull = spark.createDataFrame(
        [(0, 0, [1.0, 0.0]), (1, 1, [None, 1.0])],
        "vec_id bigint, label int, embedding array<float>",
    )
    with pytest.raises(ValueError, match="null ELEMENTS"):
        linear_probe_train(elemnull)
