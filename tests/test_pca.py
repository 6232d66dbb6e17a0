"""U9 PCA (operators/pca.py) vs a numpy golden — sklearn-equivalent
semantics (centered, sign-normalized), reference adaptation/mapping.py:67-76."""

from __future__ import annotations

import numpy as np
import pytest


def _golden_pca(x: np.ndarray, k: int):
    """Centered SVD with the same sign convention as pca_fit."""
    xc = x - x.mean(axis=0)
    _, s, vt = np.linalg.svd(xc, full_matrices=False)
    comps = vt[:k].copy()
    for j in range(k):
        lead = int(np.argmax(np.abs(comps[j])))
        if comps[j][lead] < 0:
            comps[j] = -comps[j]
    return comps, xc @ comps.T


@pytest.fixture(scope="module")
def data():
    rng = np.random.RandomState(7)
    # anisotropic: 3 informative directions with distinct scales
    base = rng.randn(200, 6)
    base[:, 0] *= 8.0
    base[:, 1] *= 3.0
    base[:, 2] *= 1.5
    base += rng.uniform(-2, 2, size=(1, 6))  # nonzero mean => centering matters
    return base


def test_pca_matches_numpy_golden(spark, data):
    from detecting_and_addressing_change_spark.operators.pca import (
        pca_fit,
        pca_project,
    )

    rows = [(i, [float(v) for v in row]) for i, row in enumerate(data)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    comps, ev, means = pca_fit(df, vec_col="embedding", k=2)
    want_comps, want_proj = _golden_pca(data, 2)

    np.testing.assert_allclose(means, data.mean(axis=0), atol=1e-9)
    np.testing.assert_allclose(comps, want_comps, atol=1e-6)
    # orthonormal components
    np.testing.assert_allclose(comps @ comps.T, np.eye(2), atol=1e-9)
    # explained-variance proportions ordered non-increasing, in (0, 1]
    assert all(a >= b for a, b in zip(ev, ev[1:]))
    assert 0 < ev[0] <= 1.0

    proj = (
        pca_project(df, comps, means, vec_col="embedding", out_col="pc")
        .orderBy("vec_id")
        .select("pc")
        .collect()
    )
    got = np.array([r["pc"] for r in proj])
    np.testing.assert_allclose(got, want_proj, atol=1e-6)


def test_pca_fit_project_shape(spark, data):
    from detecting_and_addressing_change_spark.operators.pca import (
        pca_fit_project,
    )

    rows = [(i, [float(v) for v in row]) for i, row in enumerate(data)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = pca_fit_project(df, vec_col="embedding", k=3, out_col="pc")
    first = out.select("pc").first()["pc"]
    assert len(first) == 3
    assert out.count() == len(data)
