"""PCA over embedding columns (SURVEY §2.7 U9).

Reference: ``adaptation/mapping.py:67-76`` — sklearn
``PCA(n_components=2).fit_transform`` over the stacked source/target/mapped
embedding matrices, used to visualize embedding spaces before/after
adaptation.

Spark-first, same shape as ``operators/procrustes.py`` (distributed Gram +
driver-side SVD, SURVEY §4.2 item 4): ONE pass computes the sufficient
statistics (n, per-dim sum, raw Gram X^T X) as per-partition numpy partials
reduced by a groupBy whose cardinality is dim^2 regardless of row count;
the centered scatter S = G - s s^T / n is dim x dim on the driver, where
numpy's SVD is exact and cheap. Nothing row-sized reaches the driver, and
the numerical path is pinned (np.linalg.svd of an explicitly-formed
scatter), so an independent numpy golden over the same rows agrees to
ulps — which is what lets x42 carry a hash-exact literal oracle.

Two deltas close the gap to the reference's sklearn semantics:

- **Centering.** sklearn mean-centers; the scatter form does it exactly
  (S = G - s s^T / n is the Gram of the centered matrix).
- **Sign normalization.** SVD signs are arbitrary (sklearn itself flips by
  an internal convention). Each component is flipped so its
  largest-|loading| coordinate is positive — deterministic across runs,
  partitionings, and library versions.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scatter_stats(
    df: DataFrame, vec_col: str
) -> tuple[int, np.ndarray, np.ndarray]:
    """Distributed sufficient statistics for PCA: (n, sum[dim],
    gram[dim x dim]) in one pass. Each partition reduces to a single
    dim x dim partial via vectorized einsum inside mapInPandas; the shuffle
    carries dim^2 + dim + 1 cells per partition, never rows."""
    import pandas as pd

    def partials(batches):
        n = 0
        s: np.ndarray | None = None
        g: np.ndarray | None = None
        for pdf in batches:
            x = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            if x.size == 0:
                continue
            n += x.shape[0]
            bs = x.sum(axis=0)
            bg = np.einsum("ni,nj->ij", x, x)
            s = bs if s is None else s + bs
            g = bg if g is None else g + bg
        if s is None:
            return
        dim = s.shape[0]
        ii, jj = np.meshgrid(np.arange(dim), np.arange(dim), indexing="ij")
        out = pd.DataFrame(
            {
                "i": ii.ravel().astype("int32"),
                "j": jj.ravel().astype("int32"),
                "v": g.ravel(),
            }
        )
        extra = pd.DataFrame(
            {
                "i": list(range(dim)) + [-1],
                "j": [-1] * dim + [-1],
                "v": list(s) + [float(n)],
            }
        )
        yield pd.concat([out, extra], ignore_index=True)

    rows = (
        df.select(F.col(vec_col).cast("array<double>").alias(vec_col))
        .mapInPandas(partials, "i int, j int, v double")
        .groupBy("i", "j")
        .agg(F.sum("v").alias("v"))
        .collect()
    )
    dim = max(r["i"] for r in rows) + 1
    n = 0
    s = np.zeros(dim)
    g = np.zeros((dim, dim))
    for r in rows:
        if r["i"] < 0:
            n = int(r["v"])
        elif r["j"] < 0:
            s[r["i"]] = r["v"]
        else:
            g[r["i"], r["j"]] = r["v"]
    return n, s, g


def _components_from_scatter(
    n: int, s: np.ndarray, g: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray, list[float]]:
    """Driver-side tail shared with the numpy golden generator: centered
    scatter -> SVD -> sign-normalized top-k components."""
    scatter = g - np.outer(s, s) / n
    u, eig, _ = np.linalg.svd(scatter)
    comps = u.T[:k].copy()
    for j in range(k):
        lead = int(np.argmax(np.abs(comps[j])))
        if comps[j][lead] < 0:
            comps[j] = -comps[j]
    total = float(eig.sum())
    explained = eig[:k] / total if total > 0 else eig[:k]
    means = [float(v) / n for v in s]
    return comps, explained, means


def pca_fit(
    df: DataFrame, vec_col: str = "embedding", k: int = 2
) -> tuple[np.ndarray, np.ndarray, list[float]]:
    """Fit sklearn-equivalent PCA. Returns (components [k x dim],
    explained_variance_ratio [k], means [dim]); components are
    sign-normalized."""
    n, s, g = scatter_stats(df, vec_col)
    return _components_from_scatter(n, s, g, k)


def pca_project(
    df: DataFrame,
    components: np.ndarray,
    means: list[float],
    vec_col: str = "embedding",
    out_col: str = "pc",
) -> DataFrame:
    """Project rows onto fitted components: (x - mean) @ components.T.

    k and dim are driver-side constants, so the projection is unrolled into
    plain arithmetic over ``element_at`` — whole-stage-codegen'd JVM work,
    no UDF, no shuffle. The fold is left-to-right over dims; the golden
    generator replicates the same order."""
    k, dim = components.shape
    projections = []
    for j in range(k):
        acc = F.lit(0.0)
        for d in range(dim):
            acc = acc + (
                F.element_at(F.col(vec_col), d + 1).cast("double")
                - F.lit(float(means[d]))
            ) * F.lit(float(components[j][d]))
        projections.append(acc)
    return df.withColumn(out_col, F.array(*projections))


def pca_fit_project(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 2,
    out_col: str = "pc",
) -> DataFrame:
    """fit_transform: the reference's one-call shape
    (adaptation/mapping.py:67-76)."""
    comps, _, means = pca_fit(df, vec_col=vec_col, k=k)
    return pca_project(df, comps, means, vec_col=vec_col, out_col=out_col)
