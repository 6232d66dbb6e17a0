"""PCA over embedding columns (SURVEY §2.7 U9).

Reference: ``adaptation/mapping.py:67-76`` — sklearn
``PCA(n_components=2).fit_transform`` over the stacked source/target/mapped
embedding matrices, used to visualize embedding spaces before/after
adaptation.

Spark-first: the ready primitive is ``pyspark.ml.feature.PCA`` (SURVEY §2.7
row U9). Two deltas close the gap to the reference's sklearn semantics:

- **Centering.** Spark ML's PCA does NOT mean-center its input; sklearn
  does. The per-dimension mean is computed distributively (posexplode +
  groupBy(dim) — cardinality dim regardless of row count) and subtracted
  before the fit, so the principal axes match sklearn's.
- **Sign normalization.** SVD signs are arbitrary (sklearn itself flips by
  an internal convention). Each component is flipped so its
  largest-|loading| coordinate is positive — deterministic across runs,
  partitionings, and library versions.

Scale: the fit reduces to a dim x dim covariance eigendecomposition inside
Spark ML (RowMatrix under the hood — distributed Gram, driver-side eigen,
same shape as operators/procrustes.py); the transform is a JVM-side
matrix-vector product per row. Nothing row-sized reaches the driver.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dim_means(df: DataFrame, vec_col: str) -> list[float]:
    """Per-dimension mean of an array column; dim-sized shuffle + collect."""
    rows = (
        df.select(F.posexplode(F.col(vec_col)).alias("d", "v"))
        .groupBy("d")
        .agg(F.avg(F.col("v").cast("double")).alias("m"))
        .collect()
    )
    means = [0.0] * (max(r["d"] for r in rows) + 1)
    for r in rows:
        means[r["d"]] = r["m"]
    return means


def pca_fit(
    df: DataFrame, vec_col: str = "embedding", k: int = 2
) -> tuple[np.ndarray, np.ndarray, list[float]]:
    """Fit sklearn-equivalent PCA. Returns (components [k x dim],
    explained_variance [k], means [dim]); components are sign-normalized."""
    from pyspark.ml.feature import PCA as MLPCA
    from pyspark.ml.functions import array_to_vector

    means = _dim_means(df, vec_col)
    means_arr = F.array(*[F.lit(float(m)) for m in means])
    centered = df.select(
        array_to_vector(
            F.zip_with(
                F.col(vec_col),
                means_arr,
                lambda x, m: x.cast("double") - m,
            )
        ).alias("__features")
    )
    model = MLPCA(k=k, inputCol="__features", outputCol="__pc").fit(centered)
    # ml gives dim x k; sklearn convention is k x dim (copy: toArray is a
    # read-only view)
    comps = model.pc.toArray().T.copy()
    # deterministic sign: largest-|loading| coordinate of each component > 0
    flips = np.ones(k)
    for j in range(k):
        lead = int(np.argmax(np.abs(comps[j])))
        if comps[j][lead] < 0:
            comps[j] = -comps[j]
            flips[j] = -1.0
    return comps, np.asarray(model.explainedVariance), means


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
    no UDF, no shuffle."""
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
