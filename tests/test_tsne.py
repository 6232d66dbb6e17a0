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


def test_project_preserves_id_and_tag_types(spark):
    """ADVICE r10: the output id/tag field DDL is derived from the input
    schema, not hardcoded long/string — int ids and non-string tags must
    round-trip with their types intact."""
    x, labels = _clusters(n_per=5)
    rows = [(i, int(labels[i]), x[i].tolist()) for i in range(len(labels))]
    df = spark.createDataFrame(
        rows, "vec_id int, tag int, embedding array<double>"
    )
    coords, _, _ = tsne_project(df, tag_col="tag", n_iter=40, max_points=8)
    schema = {f.name: f.dataType.simpleString() for f in coords.schema}
    assert schema["vec_id"] == "int" and schema["tag"] == "int"
    got = coords.collect()
    assert {r["vec_id"] for r in got} == set(range(8))
    # string ids work too (ordered lexicographically, the orderBy contract)
    rows_s = [
        (f"id{i:03d}", x[i].tolist()) for i in range(len(labels))
    ]
    df_s = spark.createDataFrame(rows_s, "vec_id string, embedding array<double>")
    coords_s, _, _ = tsne_project(df_s, n_iter=40, max_points=8)
    assert {r["vec_id"] for r in coords_s.collect()} == {
        f"id{i:03d}" for i in range(8)
    }


def test_project_rejects_tiny_input(spark):
    df = spark.createDataFrame(
        [(i, [float(i)] * 4) for i in range(3)],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError):
        tsne_project(df)


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(
        n=st.integers(8, 40),
        dim=st.integers(2, 12),
        seed=st.integers(0, 2**31 - 1),
    )
    @settings(max_examples=15, deadline=None)
    def test_fit_stays_finite_and_descends_property(n, dim, seed):
        """Solver stability over arbitrary small inputs: coordinates
        finite and the KL objective never ends above its init."""
        rng = np.random.RandomState(seed)
        x = rng.randn(n, dim) * rng.uniform(0.1, 10.0)
        y, kl_i, kl_f = tsne_fit(x, n_iter=120)
        assert np.isfinite(y).all()
        assert np.isfinite(kl_i) and np.isfinite(kl_f)
        assert kl_f <= kl_i

except ImportError:  # pragma: no cover
    pass


def test_mapping_stack_projection_reference_shape(spark):
    """The reference's actual t-SNE usage (adaptation/mapping.py:60-76):
    stack source / target / MAPPED embeddings with a tag column and
    project to 2-d — the visualization should show the mapped cloud
    sitting nearer the target cloud than the raw source cloud does,
    which is the entire point of the Procrustes plot. Reproduced here
    on a deterministic synthetic rotation (mapped = exactly solvable),
    asserting that geometric relation IN THE 2-D PROJECTION."""
    import numpy as np

    rng = np.random.RandomState(3)
    n, dim = 25, 6
    target = rng.randn(n, dim)
    # source = rotated target (orthogonal), so Procrustes recovers it
    q, _ = np.linalg.qr(rng.randn(dim, dim))
    source = target @ q
    rows = []
    for tag, mat in (("source", source), ("target", target)):
        for i in range(n):
            rows.append((len(rows), tag, mat[i].tolist()))
    from detecting_and_addressing_change_spark.operators.procrustes import (
        apply_mapping,
        procrustes_solve,
    )

    pairs = spark.createDataFrame(
        [
            (f"w{i}", source[i].tolist(), target[i].tolist())
            for i in range(n)
        ],
        "word string, source array<double>, target array<double>",
    )
    m = procrustes_solve(pairs)
    mapped_rows = apply_mapping(
        pairs, m, vec_col="source", out_col="mapped"
    ).select("mapped").collect()
    for r in mapped_rows:
        rows.append((len(rows), "mapped", list(r["mapped"])))
    stacked = spark.createDataFrame(
        rows, "vec_id long, tag string, embedding array<double>"
    )
    coords, _, _ = tsne_project(
        stacked, tag_col="tag", n_iter=200, max_points=3 * n
    )
    pts = {
        tag: np.array(
            [
                (r["dim_one"], r["dim_two"])
                for r in coords.filter(f"tag = '{tag}'").collect()
            ]
        )
        for tag in ("source", "target", "mapped")
    }
    # per-point: the mapped twin of target row i should sit closer to it
    # in 2-d than the raw source twin does, for most points
    d_mapped = np.linalg.norm(pts["mapped"] - pts["target"], axis=1)
    d_source = np.linalg.norm(pts["source"] - pts["target"], axis=1)
    assert np.median(d_mapped) < np.median(d_source)
