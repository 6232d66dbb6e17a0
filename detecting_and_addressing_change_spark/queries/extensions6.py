"""Round-3 extension queries: PCA projection (U9).

PCA's eigendecomposition is not expressible in portable SQL, so
x42_pca_project registers WITHOUT a DuckDB oracle (driver records the
weaker rows-only check); the strong correctness signal is the numpy-golden
parity test in tests/test_pca.py (components, projections, centering, sign
convention all pinned against centered SVD).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import portable_round
from ..sources.tables import load_table
from .registry import query


@query("x42_pca_project")
def x42(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U9 (reference adaptation/mapping.py:67-76): project the embeddings
    table onto its top-2 principal axes — centered + sign-normalized, the
    sklearn semantics the reference's visualization uses."""
    from ..operators.pca import pca_fit_project

    emb = load_table(spark, sf_dir, "embeddings")
    out = pca_fit_project(emb, vec_col="embedding", k=2, out_col="pc")
    return out.select(
        "vec_id",
        portable_round(F.element_at("pc", 1), 4).alias("pc1"),
        portable_round(F.element_at("pc", 2), 4).alias("pc2"),
    ).orderBy("vec_id")
