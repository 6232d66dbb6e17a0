"""t-SNE projection (SURVEY §2.7 U10) — the reference's visualization
embedding, dependency-free and deterministic.

Reference: ``adaptation/mapping.py:71-76`` and
``utils/visualization.py:63-349`` run sklearn
``TSNE(n_components=2, perplexity=40, n_iter=300)`` on a DRIVER-SIDE
matrix collected from the experiment's (source / target / mapped)
embedding stacks, then scatter-plot the 2-d coordinates. The plotting
is out of engine scope (matplotlib is rendering, not analytics); THIS
operator is the data product those plots consume — the last table of
the reference's visualization path the engine did not yet produce.

This is the exact O(n²) algorithm (van der Maaten & Hinton, JMLR 2008),
pure numpy, with two determinism choices sklearn does not make:

- **PCA init, sign-normalized** (largest-|loading| component positive
  per axis), scaled to 1e-4 std — no RNG anywhere, so the same input
  yields bit-identical coordinates on every run;
- fixed schedules: early exaggeration 4x for the first 50 iterations,
  momentum 0.5 -> 0.8 at iteration 20, constant learning rate.

Scale posture (the x91 rule): t-SNE is inherently quadratic and
inherently a VISUALIZATION of a bounded sample — the reference itself
collects the pair-table stacks (hundreds of rows) before calling
sklearn. ``tsne_project`` therefore clamps its input to a deterministic
``max_points`` prefix (lowest ids) and runs the solver on the driver;
at 100 TB the corpus-side cost is one ORDER BY id LIMIT k sample, never
a distributed quadratic. The operator refuses silently-unbounded input
rather than attempting a distributed t-SNE that no production pipeline
would run.
"""

from __future__ import annotations

import math

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_EPS = 1e-12


def _pairwise_sq_dists(x: np.ndarray) -> np.ndarray:
    s = (x * x).sum(axis=1)
    d = s[:, None] + s[None, :] - 2.0 * (x @ x.T)
    np.fill_diagonal(d, 0.0)
    return np.maximum(d, 0.0)


def _row_affinities(
    d_row: np.ndarray, i: int, perplexity: float, max_iter: int = 50
) -> np.ndarray:
    """Binary-search the Gaussian precision beta so the row's conditional
    distribution has entropy log(perplexity); returns p_{j|i}."""
    target = math.log(perplexity)
    beta, beta_lo, beta_hi = 1.0, 0.0, math.inf
    d = np.delete(d_row, i)
    p = np.empty_like(d)
    for _ in range(max_iter):
        np.exp(-d * beta, out=p)
        sum_p = max(p.sum(), _EPS)
        # H = log(sum_p) + beta * <d, p>/sum_p  (entropy of the row)
        h = math.log(sum_p) + beta * float((d * p).sum()) / sum_p
        if abs(h - target) < 1e-5:
            break
        if h > target:  # too flat -> raise beta
            beta_lo = beta
            beta = beta * 2.0 if beta_hi is math.inf else (beta + beta_hi) / 2
        else:
            beta_hi = beta
            beta = (beta + beta_lo) / 2
    p /= max(p.sum(), _EPS)
    return np.insert(p, i, 0.0)


def _joint_p(x: np.ndarray, perplexity: float) -> np.ndarray:
    n = x.shape[0]
    d = _pairwise_sq_dists(x)
    cond = np.vstack(
        [_row_affinities(d[i], i, perplexity) for i in range(n)]
    )
    p = (cond + cond.T) / (2.0 * n)
    return np.maximum(p, _EPS)


def _pca_init(x: np.ndarray, n_components: int) -> np.ndarray:
    xc = x - x.mean(axis=0)
    # deterministic SVD sign: the largest-|loading| entry of each
    # right-singular vector is made positive (the PCA operator's own
    # convention, operators/pca.py)
    _u, _s, vt = np.linalg.svd(xc, full_matrices=False)
    for k in range(vt.shape[0]):
        j = int(np.argmax(np.abs(vt[k])))
        if vt[k, j] < 0:
            vt[k] = -vt[k]
    y = xc @ vt[:n_components].T
    std = y[:, 0].std()
    if std < _EPS:
        # degenerate input (all rows equal / rank-0): spread the points
        # deterministically so the optimizer has gradients to work with
        y = np.arange(x.shape[0], dtype=np.float64)[:, None] * np.ones(
            (1, n_components)
        )
        std = max(y[:, 0].std(), 1.0)
    return y / std * 1e-4


def _q_matrix(y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    num = 1.0 / (1.0 + _pairwise_sq_dists(y))
    np.fill_diagonal(num, 0.0)
    q = np.maximum(num / max(num.sum(), _EPS), _EPS)
    return q, num


def _kl(p: np.ndarray, q: np.ndarray) -> float:
    mask = ~np.eye(p.shape[0], dtype=bool)
    return float((p[mask] * np.log(p[mask] / q[mask])).sum())


def tsne_fit(
    x: np.ndarray,
    n_components: int = 2,
    perplexity: float = 30.0,
    n_iter: int = 300,
    learning_rate: float | None = None,
    early_exaggeration: float = 4.0,
    exaggeration_iters: int = 50,
) -> tuple[np.ndarray, float, float]:
    """Exact t-SNE on a driver-side float64 matrix. Returns
    ``(Y, kl_initial, kl_final)`` — the KL divergences of the TRUE
    (un-exaggerated) P against Q at the PCA init and after the last
    iteration, so callers can assert the optimizer actually descended.

    ``learning_rate=None`` uses the standard auto heuristic
    ``max(n / early_exaggeration / 4, 50)``; updates carry the original
    algorithm's per-parameter adaptive gains (Jacobs' rule: grow 0.2
    when gradient and velocity disagree in sign, shrink x0.8 when they
    agree). The returned Y is the best of the SAMPLED iterates by
    true-P KL — the KL is evaluated at the init, every 5th iteration,
    and the last iterate (each a masked log-sum over the Q matrix the
    gradient already computed), not every iteration, so an
    intermediate iterate between samples can be missed. Because the
    init and the last iterate are always in the sample,
    ``kl_final <= kl_initial`` is still a guarantee of the operator,
    not an empirical hope: tiny inputs where the exaggeration phase
    overshoots a near-optimal PCA init (found by the hypothesis fuzz)
    simply return the init."""
    x = np.asarray(x, dtype=np.float64)
    n = x.shape[0]
    perplexity = min(perplexity, max((n - 1) / 3.0, 1.0))
    if learning_rate is None:
        learning_rate = max(n / early_exaggeration / 4.0, 50.0)
    p = _joint_p(x, perplexity)
    y = _pca_init(x, n_components)
    kl_initial = _kl(p, _q_matrix(y)[0])
    best_kl, best_y = kl_initial, y.copy()

    vel = np.zeros_like(y)
    gains = np.ones_like(y)
    for it in range(n_iter):
        p_eff = p * early_exaggeration if it < exaggeration_iters else p
        q, num = _q_matrix(y)
        # best-iterate tracking every 5th iteration (the masked log-sum
        # is ~40% of an iteration's cost; coarser tracking keeps the
        # kl_final <= kl_initial guarantee — init and the last iterate
        # are always evaluated — at a fraction of the overhead)
        if it > 0 and it % 5 == 0:
            kl_now = _kl(p, q)
            if kl_now < best_kl:
                best_kl, best_y = kl_now, y.copy()
        # grad_i = 4 * sum_j (p_ij - q_ij) * num_ij * (y_i - y_j)
        w = (p_eff - q) * num
        grad = 4.0 * ((np.diag(w.sum(axis=1)) - w) @ y)
        agree = np.sign(grad) == np.sign(vel)
        gains = np.where(agree, gains * 0.8, gains + 0.2)
        np.clip(gains, 0.01, None, out=gains)
        momentum = 0.5 if it < 20 else 0.8
        vel = momentum * vel - learning_rate * gains * grad
        y = y + vel
        y = y - y.mean(axis=0)
    kl_last = _kl(p, _q_matrix(y)[0])
    if kl_last < best_kl:
        best_kl, best_y = kl_last, y
    return best_y, kl_initial, best_kl


def tsne_project(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    tag_col: str | None = None,
    n_components: int = 2,
    perplexity: float = 30.0,
    n_iter: int = 300,
    max_points: int = 2000,
) -> tuple[DataFrame, float, float]:
    """DataFrame[id, (tag,) dim_one, dim_two(, ...)]: t-SNE coordinates
    of a deterministic ``max_points``-row prefix (lowest ids) of the
    input — the reference's visualization table
    (``adaptation/mapping.py:74-76`` writes the same two columns as
    'dim-one'/'dim-two'). Returns ``(coords_df, kl_initial, kl_final)``.
    Collects at most ``max_points`` vectors (the sample IS the
    operator's contract — see module docstring); everything after the
    collect is driver-side numpy with no RNG, so repeated calls are
    bit-identical. The id/tag columns keep their input types (the
    output field DDL is derived from ``df.schema``, not hardcoded), so
    int/string/uuid ids round-trip unchanged."""
    cols = [F.col(id_col), F.col(vec_col).cast("array<double>").alias("__v")]
    if tag_col is not None:
        cols.insert(1, F.col(tag_col))
    id_ddl = df.schema[id_col].dataType.simpleString()
    tag_ddl = (
        df.schema[tag_col].dataType.simpleString()
        if tag_col is not None
        else None
    )
    rows = df.select(*cols).orderBy(id_col).limit(int(max_points)).collect()
    if len(rows) < 4:
        raise ValueError(
            f"tsne_project: need >= 4 points, got {len(rows)}"
        )
    x = np.array([r["__v"] for r in rows], dtype=np.float64)
    y, kl_initial, kl_final = tsne_fit(
        x,
        n_components=n_components,
        perplexity=perplexity,
        n_iter=n_iter,
    )
    import pandas as pd

    out = {id_col: [r[id_col] for r in rows]}
    ddl = [f"{id_col} {id_ddl}"]
    if tag_col is not None:
        out[tag_col] = [r[tag_col] for r in rows]
        ddl.append(f"{tag_col} {tag_ddl}")
    for k in range(n_components):
        name = ("dim_one", "dim_two")[k] if k < 2 else f"dim_{k + 1}"
        out[name] = y[:, k]
        ddl.append(f"{name} double")
    coords = df.sparkSession.createDataFrame(
        pd.DataFrame(out), ", ".join(ddl)
    )
    return coords, kl_initial, kl_final
