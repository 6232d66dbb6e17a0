"""Orthogonal Procrustes embedding-space mapping (SURVEY §2.7 U6).

Reference: ``adaptation/mapping.py:101-124`` — ``M = U @ Vt`` from
``svd(target.T @ source)``; maps source-space embeddings into the target
space. The pair table in the reference is at most 10k x 768.

Spark-first at scale (SURVEY §4.2 item 4): the Gram matrix
``G = target.T @ source`` (dim x dim, tiny) is computed DISTRIBUTED as a sum
of per-row outer products — a single map-side-combinable aggregation — and
only the dim x dim result is collected for the (cheap) driver-side SVD.
No row data ever reaches the driver.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.arrays import mse_col


def gram_matrix(pairs: DataFrame, source_col: str = "source", target_col: str = "target") -> np.ndarray:
    """G[i, j] = sum_rows target[i] * source[j], computed as a two-stage
    distributed aggregation (SURVEY §4.2 item 4): each partition reduces its
    rows to ONE dim x dim partial via a vectorized numpy einsum inside
    mapInPandas, partials are summed by a groupBy whose cardinality is dim^2
    regardless of row count, and only the final dim x dim matrix is
    collected. No row data crosses the shuffle or reaches the driver."""
    import pandas as pd

    def partial_gram(batches):
        acc: np.ndarray | None = None
        for pdf in batches:
            t = np.array(pdf[target_col].tolist(), dtype=np.float64)
            s = np.array(pdf[source_col].tolist(), dtype=np.float64)
            g = np.einsum("ni,nj->ij", t, s)
            acc = g if acc is None else acc + g
        if acc is not None:
            dim_t, dim_s = acc.shape
            ii, jj = np.meshgrid(
                np.arange(dim_t), np.arange(dim_s), indexing="ij"
            )
            yield pd.DataFrame(
                {
                    "i": ii.ravel().astype("int32"),
                    "j": jj.ravel().astype("int32"),
                    "g": acc.ravel(),
                }
            )

    partials = pairs.select(source_col, target_col).mapInPandas(
        partial_gram, "i int, j int, g double"
    )
    out = partials.groupBy("i", "j").agg(F.sum("g").alias("g")).collect()
    dim = max(r["i"] for r in out) + 1
    g = np.zeros((dim, dim))
    for r in out:
        g[r["i"], r["j"]] = r["g"]
    return g


def procrustes_solve(pairs: DataFrame, source_col: str = "source", target_col: str = "target") -> np.ndarray:
    """Solve for the orthogonal map M (dim x dim): M = U @ Vt of svd(G).
    Deterministic up to SVD sign convention; tests check orthogonality and
    MSE improvement (the reference's own check, adaptation/mapping.py:107-121)
    rather than raw matrix equality."""
    g = gram_matrix(pairs, source_col, target_col)
    u, _, vt = np.linalg.svd(g)
    return u @ vt


def apply_mapping(
    df: DataFrame, matrix: np.ndarray, vec_col: str, out_col: str
) -> DataFrame:
    """R6: map embeddings with the solved matrix, JVM-side (matrix embedded
    as a literal array<array<double>>; fine up to ~768^2 doubles)."""
    from ..functions.arrays import linear_map_col

    return df.withColumn(
        out_col, linear_map_col(F.col(vec_col), matrix.tolist())
    )


def mapping_mse(
    pairs: DataFrame,
    source_col: str = "source",
    target_col: str = "target",
) -> float:
    """Mean per-row MSE between source and target (A6) — used to verify
    MSE(map(source), target) <= MSE(source, target)."""
    return pairs.agg(
        F.avg(mse_col(F.col(source_col), F.col(target_col))).alias("mse")
    ).collect()[0]["mse"]
