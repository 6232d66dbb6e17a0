"""Procrustes property tests (SURVEY §5.2.3, FIXTURES.md §3): recover a
known orthogonal map, M is orthogonal, and MSE improves (the reference's own
check at adaptation/mapping.py:107-121)."""

from __future__ import annotations

import numpy as np

from detecting_and_addressing_change_spark.operators.procrustes import (
    apply_mapping,
    gram_matrix,
    mapping_mse,
    procrustes_solve,
)


def make_pairs(spark, n=200, dim=8, seed=7, noise=0.01):
    rng = np.random.RandomState(seed)
    # random orthogonal R via QR
    q, _ = np.linalg.qr(rng.randn(dim, dim))
    source = rng.randn(n, dim)
    target = source @ q + rng.randn(n, dim) * noise
    rows = [
        (f"w{i}", source[i].tolist(), target[i].tolist()) for i in range(n)
    ]
    df = spark.createDataFrame(
        rows, "word string, source array<double>, target array<double>"
    )
    return df, q


def test_gram_matrix_matches_numpy(spark):
    df, _ = make_pairs(spark, n=50)
    rows = df.collect()
    s = np.array([r["source"] for r in rows])
    t = np.array([r["target"] for r in rows])
    g = gram_matrix(df)
    np.testing.assert_allclose(g, t.T @ s, atol=1e-9)


def test_recovers_orthogonal_map(spark):
    df, q = make_pairs(spark)
    m = procrustes_solve(df)
    # m maps source -> target i.e. m ~ q.T (x @ q == m @ x convention check)
    np.testing.assert_allclose(m @ m.T, np.eye(len(m)), atol=1e-9)
    # applying the map must reduce MSE vs identity (reference's own check)
    mapped = apply_mapping(df, m, vec_col="source", out_col="mapped")
    before = mapping_mse(df, "source", "target")
    after = mapping_mse(
        mapped.select("word", "mapped", "target"), "mapped", "target"
    )
    assert after < before / 10
    # and must be close to the known planted map
    np.testing.assert_allclose(m, q.T, atol=0.05)
