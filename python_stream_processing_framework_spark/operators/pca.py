"""Distributed PCA for embedding columns — dimension reduction
before ANN / clustering.

Beyond-reference capability (SURVEY §2.7 charter): production
embedding pipelines reduce dimension before indexing (PCA to 1/2-1/4
of d routinely keeps >95% variance and halves every downstream ANN /
k-means / SemDeDup cost). The classic distributed formulation is
exact and two-phase:

1. **Fit** — one corpus pass accumulating the sufficient statistics
   per partition: ``(n, sum x, sum x x^T)`` — a (d, d) matrix per
   partition, combined on the driver. The driver payload is O(d^2)
   REGARDLESS of corpus size (64 KB at d=128 — the bounded-metadata
   contract PQ codebooks follow), the covariance and its symmetric
   eigendecomposition run on the driver in numpy, and eigenvector
   signs are fixed (largest-|entry| coordinate positive) so the
   result is a pure function of the input.
2. **Project** — map-only: broadcast the (k, d) component matrix and
   matmul each Arrow batch. No shuffle, no second pass.

Float contract: the sufficient statistics are float64 sums, so
results are numpy-reproducible to float precision but NOT bit-pinned
across partitionings (unlike the catalog operators' integer
arithmetic) — this module is test-verified (numpy parity,
variance-ordering, reconstruction properties) rather than
SQL-oracled, the same tier as the multimodal plumbing.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

_STATS_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("s", ArrayType(DoubleType())),
        StructField("ss", ArrayType(DoubleType())),
    ]
)


def pca_fit(
    df: DataFrame, vec_col: str, *, k: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Fit PCA on an ``array<float>`` column.

    Returns ``(mean, components, explained_var)``: the (d,) mean, the
    (k, d) principal axes (rows, descending variance, sign-fixed),
    and the k explained variances. One corpus scan; the collect is
    one O(d^2) row per partition."""

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n, s, ss = 0, None, None
        for pdf in batches:
            x = np.asarray(pdf[vec_col].tolist(), dtype="float64")
            if x.size == 0:
                continue
            n += x.shape[0]
            s = x.sum(axis=0) if s is None else s + x.sum(axis=0)
            g = x.T @ x
            ss = g if ss is None else ss + g
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "ss": [ss.ravel().tolist()]}
            )

    rows = df.select(vec_col).mapInPandas(partial, _STATS_SCHEMA).collect()
    if not rows:
        raise ValueError("pca_fit: empty input")
    n = sum(r["n"] for r in rows)
    s = np.sum([np.asarray(r["s"]) for r in rows], axis=0)
    d = s.shape[0]
    ss = np.sum([np.asarray(r["ss"]).reshape(d, d) for r in rows], axis=0)
    if not 1 <= k <= d:
        raise ValueError(f"k must be in [1, {d}], got {k}")
    if n < 2:
        raise ValueError("pca_fit: need at least 2 vectors")
    mean = s / n
    cov = (ss - n * np.outer(mean, mean)) / (n - 1)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T  # (k, d)
    # sign convention: the largest-|entry| coordinate of each axis is
    # positive — eigenvectors are otherwise sign-ambiguous
    flips = np.sign(comps[np.arange(k), np.abs(comps).argmax(axis=1)])
    flips[flips == 0] = 1.0
    comps = comps * flips[:, None]
    return mean, comps, evals[order]


def pca_project(
    df: DataFrame,
    vec_col: str,
    mean: np.ndarray,
    components: np.ndarray,
    *,
    out_col: str = "pca",
) -> DataFrame:
    """Project every vector onto the fitted axes: adds ``out_col``
    (array<double>, length k). Map-only broadcast matmul per Arrow
    batch — no shuffle."""
    m = np.asarray(mean, dtype="float64")
    c = np.asarray(components, dtype="float64")
    fields = [StructField(f.name, f.dataType) for f in df.schema.fields]
    schema = StructType(fields + [StructField(out_col, ArrayType(DoubleType()))])
    cols = df.columns

    def project(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            x = np.asarray(pdf[vec_col].tolist(), dtype="float64")
            proj = (x - m) @ c.T if len(pdf) else np.zeros((0, c.shape[0]))
            out = pdf[cols].copy()
            out[out_col] = [row.tolist() for row in proj]
            yield out

    return df.mapInPandas(project, schema)
