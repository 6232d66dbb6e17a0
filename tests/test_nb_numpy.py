"""Gaussian NB parity against a dependency-free numpy golden implementing
sklearn's documented GaussianNB formulas (theta/var per class, population
variance, var_smoothing = 1e-9 * max var, argmax of log prior + log pdf).
Runs in every environment — tests/test_nb.py's sklearn cross-check skips
where sklearn is absent (this container)."""

from __future__ import annotations

import numpy as np
import pytest

from detecting_and_addressing_change_spark.operators.nb import (
    nb_collect_stats,
    nb_fit,
    nb_merge,
    nb_predict,
)


def _golden_fit(x, y):
    classes = np.unique(y)
    stats = {}
    for c in classes:
        xc = x[y == c]
        stats[int(c)] = (len(xc), xc.mean(axis=0), xc.var(axis=0))
    return stats


def _golden_predict(x, stats, var_smoothing=1e-9):
    total = sum(n for n, _, _ in stats.values())
    eps = var_smoothing * max(v.max() for _, _, v in stats.values())
    preds = []
    for xi in x:
        best, best_lp = None, -np.inf
        for c in sorted(stats):
            n, mu, var = stats[c]
            v = var + eps
            lp = np.log(n / total) + np.sum(
                -0.5 * np.log(2 * np.pi * v) - (xi - mu) ** 2 / (2 * v)
            )
            if lp > best_lp:
                best, best_lp = c, lp
        preds.append(best)
    return np.array(preds)


def _make(seed=0, n=240, dim=6, classes=4):
    rng = np.random.RandomState(seed)
    y = rng.randint(0, classes, size=n)
    x = rng.randn(n, dim) + y[:, None] * 1.5
    return x, y


def _to_df(spark, x, y, start_id=0):
    rows = [
        (int(i + start_id), xi.tolist(), int(yi))
        for i, (xi, yi) in enumerate(zip(x, y))
    ]
    return spark.createDataFrame(
        rows, "doc_id long, features array<double>, label int"
    )


@pytest.mark.parametrize("dim_arg", [None, 6])
def test_fit_stats_match_numpy(spark, dim_arg):
    """Both fit paths (posexplode and wide/unrolled) produce the golden
    count/mean/population-variance per class."""
    x, y = _make()
    df = _to_df(spark, x, y)
    rows = nb_collect_stats(nb_fit(df, dim=dim_arg))
    golden = _golden_fit(x, y)
    assert {r["label"] for r in rows} == set(golden)
    for r in rows:
        n, mu, var = golden[r["label"]]
        assert r["cnt"] == n
        np.testing.assert_allclose(r["means"], mu, rtol=1e-12, atol=1e-12)
        np.testing.assert_allclose(r["vars"], var, rtol=1e-9, atol=1e-12)


@pytest.mark.parametrize("dim_arg", [None, 6])
def test_predictions_match_numpy(spark, dim_arg):
    x, y = _make(seed=3)
    df = _to_df(spark, x, y)
    stats = nb_collect_stats(nb_fit(df, dim=dim_arg))
    got = {
        r["doc_id"]: r["pred"]
        for r in nb_predict(df, stats, id_cols=("doc_id",)).collect()
    }
    want = _golden_predict(x, _golden_fit(x, y))
    assert [got[i] for i in range(len(x))] == list(want)


def test_predict_bcast_path_matches_narrow(spark):
    """The large-class broadcast-join path and the zero-shuffle narrow path
    agree prediction-for-prediction (they differ only in summation ulps)."""
    from detecting_and_addressing_change_spark.operators import nb as nb_mod

    x, y = _make(seed=5, dim=4, classes=3)
    df = _to_df(spark, x, y)
    stats = nb_collect_stats(nb_fit(df, dim=4))
    narrow = {
        r["doc_id"]: r["pred"]
        for r in nb_predict(df, stats, id_cols=("doc_id",)).collect()
    }
    total = sum(r["cnt"] for r in stats)
    eps = 1e-9 * max(max(r["vars"]) for r in stats)
    bcast = {
        r["doc_id"]: r["pred"]
        for r in nb_mod._nb_predict_bcast(
            df, stats, total, eps, 4, "features", ("doc_id",)
        ).collect()
    }
    assert narrow == bcast


def test_merge_equals_full_fit(spark):
    """partial_fit semantics: merging two batch fits equals fitting the
    concatenation (exact count/mean/M2 combine)."""
    x1, y1 = _make(seed=7, n=150)
    x2, y2 = _make(seed=8, n=90)
    d1, d2 = _to_df(spark, x1, y1), _to_df(spark, x2, y2, start_id=1000)
    merged = nb_collect_stats(nb_merge(nb_fit(d1, dim=6), nb_fit(d2, dim=6)))
    full = _golden_fit(np.vstack([x1, x2]), np.concatenate([y1, y2]))
    for r in merged:
        n, mu, var = full[r["label"]]
        assert r["cnt"] == n
        np.testing.assert_allclose(r["means"], mu, rtol=1e-12, atol=1e-12)
        np.testing.assert_allclose(r["vars"], var, rtol=1e-9, atol=1e-12)
