"""t-SNE operator (operators/tsne.py, SURVEY §2.7 U10): deterministic,
descends the KL objective, and preserves coarse cluster structure —
the properties the reference's visualizations depend on
(adaptation/mapping.py:71-76 separates SCIBERT / BERT / mapped stacks)."""

from __future__ import annotations

import numpy as np
import pytest

from detecting_and_addressing_change_spark.operators.tsne import (
    tsne_fit,
    tsne_project,
)


def _clusters(n_per: int = 20, dim: int = 8, sep: float = 10.0):
    """Three well-separated deterministic Gaussian-ish clusters."""
    rng = np.random.RandomState(7)
    parts, labels = [], []
    for c in range(3):
        center = np.zeros(dim)
        center[c] = sep
        parts.append(center + rng.randn(n_per, dim))
        labels += [c] * n_per
    return np.vstack(parts), np.array(labels)


def test_fit_is_deterministic():
    x, _ = _clusters()
    y1, k1a, k1b = tsne_fit(x, n_iter=120)
    y2, k2a, k2b = tsne_fit(x, n_iter=120)
    assert np.array_equal(y1, y2)
    assert (k1a, k1b) == (k2a, k2b)


def test_kl_decreases():
    x, _ = _clusters()
    _y, kl_initial, kl_final = tsne_fit(x, n_iter=150)
    assert kl_final < kl_initial


def test_clusters_stay_separated_in_2d():
    x, labels = _clusters()
    y, _, _ = tsne_fit(x, n_iter=300)
    assert y.shape == (len(labels), 2)
    assert np.isfinite(y).all()
    # mean intra-cluster distance well below mean inter-cluster distance
    d = np.sqrt(
        ((y[:, None, :] - y[None, :, :]) ** 2).sum(-1)
    )
    same = labels[:, None] == labels[None, :]
    off_diag = ~np.eye(len(labels), dtype=bool)
    intra = d[same & off_diag].mean()
    inter = d[~same].mean()
    assert intra < 0.5 * inter


def test_degenerate_constant_input_stays_finite():
    x = np.ones((10, 4))
    y, _, _ = tsne_fit(x, n_iter=50)
    assert np.isfinite(y).all()


def test_project_clamps_sample_and_carries_tag(spark):
    x, labels = _clusters(n_per=10)
    rows = [
        (i, f"c{labels[i]}", x[i].tolist()) for i in range(len(labels))
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, tag string, embedding array<double>"
    )
    coords, kl_i, kl_f = tsne_project(
        df, tag_col="tag", n_iter=80, max_points=12
    )
    got = coords.collect()
    assert len(got) == 12  # clamped to the lowest-id prefix
    assert {r["vec_id"] for r in got} == set(range(12))
    assert set(coords.columns) == {"vec_id", "tag", "dim_one", "dim_two"}
    assert kl_f < kl_i
    # deterministic end-to-end: a second projection is bit-identical
    coords2, _, _ = tsne_project(df, tag_col="tag", n_iter=80, max_points=12)
    assert [tuple(r) for r in coords2.collect()] == [tuple(r) for r in got]


def test_project_rejects_tiny_input(spark):
    df = spark.createDataFrame(
        [(i, [float(i)] * 4) for i in range(3)],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError):
        tsne_project(df)
