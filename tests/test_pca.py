"""Distributed PCA (operators/pca.py): numpy parity, variance
ordering, reconstruction properties, projection shape, guards."""

from __future__ import annotations

import numpy as np
import pytest

from python_stream_processing_framework_spark.operators.pca import (
    pca_fit,
    pca_project,
)


@pytest.fixture(scope="module")
def data():
    rng = np.random.RandomState(7)
    # anisotropic cloud: variance concentrated in two known directions
    base = rng.randn(200, 2) * np.array([10.0, 3.0])
    mix = np.array([[1.0, 0.0, 0.5, 0.0], [0.0, 1.0, 0.0, 0.25]])
    x = base @ mix + rng.randn(200, 4) * 0.1 + np.array([5.0, -2.0, 0.0, 1.0])
    return x


@pytest.fixture(scope="module")
def vecs(spark, data):
    rows = [(i, row.astype("float32").tolist()) for i, row in enumerate(data)]
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def _numpy_pca(x, k):
    mean = x.mean(axis=0)
    cov = np.cov(x, rowvar=False, ddof=1)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T
    flips = np.sign(comps[np.arange(k), np.abs(comps).argmax(axis=1)])
    comps = comps * flips[:, None]
    return mean, comps, evals[order]


def test_matches_numpy(spark, vecs, data):
    x32 = data.astype("float32").astype("float64")
    mean, comps, ev = pca_fit(vecs, "embedding", k=3)
    wm, wc, wv = _numpy_pca(x32, 3)
    np.testing.assert_allclose(mean, wm, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(ev, wv, rtol=1e-7)
    np.testing.assert_allclose(comps, wc, rtol=1e-6, atol=1e-8)


def test_variance_ordering_and_partition_invariance(spark, vecs):
    _, _, ev = pca_fit(vecs, "embedding", k=4)
    assert all(ev[i] >= ev[i + 1] for i in range(3))
    m1, c1, v1 = pca_fit(vecs, "embedding", k=2)
    m2, c2, v2 = pca_fit(vecs.repartition(7), "embedding", k=2)
    np.testing.assert_allclose(m1, m2, rtol=1e-9)
    np.testing.assert_allclose(v1, v2, rtol=1e-9)
    np.testing.assert_allclose(c1, c2, rtol=1e-6, atol=1e-9)


def test_projection_and_reconstruction(spark, vecs, data):
    x = data.astype("float32").astype("float64")
    mean, comps, _ = pca_fit(vecs, "embedding", k=2)
    out = pca_project(vecs, "embedding", mean, comps).collect()
    assert len(out) == len(data) and len(out[0]["pca"]) == 2
    proj = np.array(
        [r["pca"] for r in sorted(out, key=lambda r: r["vec_id"])]
    )
    # centered projections have ~zero mean
    np.testing.assert_allclose(proj.mean(axis=0), 0.0, atol=1e-9)
    # k=2 captures the two planted directions: reconstruction error is
    # tiny relative to total variance
    recon = proj @ comps + mean
    err = np.square(x - recon).sum()
    tot = np.square(x - x.mean(axis=0)).sum()
    assert err / tot < 0.01
    # full-rank reconstruction is exact
    m4, c4, _ = pca_fit(vecs, "embedding", k=4)
    p4 = np.array(
        [
            r["pca"]
            for r in sorted(
                pca_project(vecs, "embedding", m4, c4).collect(),
                key=lambda r: r["vec_id"],
            )
        ]
    )
    np.testing.assert_allclose(p4 @ c4 + m4, x, atol=1e-8)


def test_guards(spark, vecs):
    with pytest.raises(ValueError, match="k must be"):
        pca_fit(vecs, "embedding", k=0)
    with pytest.raises(ValueError, match="k must be"):
        pca_fit(vecs, "embedding", k=5)
    one = vecs.limit(1)
    with pytest.raises(ValueError, match="at least 2"):
        pca_fit(one, "embedding", k=1)
