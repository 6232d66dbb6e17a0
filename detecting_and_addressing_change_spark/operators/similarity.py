"""Similarity search over embedding columns — LLM-pipeline extension.

Two paths, per the driver's north star:

- brute-force cosine top-k: the exactness baseline. Query set is broadcast
  (it is small by construction); each executor scans its partition of the
  corpus and keeps top-k per query via window rank. Zero shuffle of the
  corpus; the only shuffle is the (queries x k) result.
- LSH-bucketed ANN (random hyperplane signatures): the scale path. A
  candidate meets a query only when their `plane_bits` signatures collide in
  at least one rotation, cutting the scanned fraction ~2^-bits per table.

Dot products fold left-to-right in double precision via higher-order
functions (functions.arrays.dot_col) — JVM-side, no Python worker.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.arrays import cosine_col, dot_col
from ..functions.rounding import portable_round


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors: DataFrame[query_id, cand_id, cosine, rnk].

    broadcast(queries) x corpus scan; rank window partitioned by query.
    Self-matches (same id) are excluded. Deterministic tie-break on cand_id."""
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_emb")
        )
    )
    c = corpus.select(
        F.col(id_col).alias("cand_id"), F.col(vec_col).alias("c_emb")
    )
    scored = (
        c.crossJoin(q)
        .filter(F.col("query_id") != F.col("cand_id"))
        .select(
            "query_id",
            "cand_id",
            cosine_col(F.col("q_emb"), F.col("c_emb")).alias("cos_raw"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_raw"), F.asc("cand_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            "query_id",
            "cand_id",
            portable_round(F.col("cos_raw"), 4).alias("cosine"),
            "rnk",
        )
    )


def _random_hyperplanes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim)


def lsh_signature_col(vec_col, planes: np.ndarray):
    """Signature int: bit p set iff dot(plane_p, vec) > 0. Planes are
    embedded as literals (n_planes x dim doubles — small)."""
    bits = F.lit(0)
    for p, plane in enumerate(planes):
        row = F.array(*[F.lit(float(v)) for v in plane])
        bits = bits + F.when(
            dot_col(row, vec_col) > 0, F.lit(1 << p)
        ).otherwise(F.lit(0))
    return bits.cast("int")


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: join query and corpus on any colliding
    (table, signature) bucket, then exact cosine + rank inside candidates.

    At 100 TB the bucket join replaces the full scan: shuffle keys are
    (table, signature) — 2^n_planes buckets per table spread load; skew only
    for near-duplicate clusters, which AQE skew-join splits."""
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])

    def with_sigs(df: DataFrame, role: str) -> DataFrame:
        sigs = []
        for t in range(n_tables):
            planes = _random_hyperplanes(dim, n_planes, seed + t)
            sigs.append(
                F.struct(
                    F.lit(t).alias("tbl"),
                    lsh_signature_col(F.col(vec_col), planes).alias("sig"),
                )
            )
        return df.select(
            F.col(id_col).alias(f"{role}_id"),
            F.col(vec_col).alias(f"{role}_emb"),
            F.explode(F.array(*sigs)).alias("ts"),
        ).select(
            f"{role}_id",
            f"{role}_emb",
            F.col("ts.tbl").alias("tbl"),
            F.col("ts.sig").alias("sig"),
        )

    q = F.broadcast(with_sigs(queries, "query"))
    c = with_sigs(corpus, "cand")
    candidates = (
        c.join(q, ["tbl", "sig"])
        .filter(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id", "query_emb", "cand_emb")
        .distinct()
    )
    scored = candidates.select(
        "query_id",
        "cand_id",
        cosine_col(F.col("query_emb"), F.col("cand_emb")).alias("cos_raw"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_raw"), F.asc("cand_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            "query_id", "cand_id", portable_round(F.col("cos_raw"), 4).alias("cosine"), "rnk"
        )
    )


def embedding_near_dup_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via the same LSH bucketing:
    pairs colliding in any table with cosine >= threshold."""
    dim = len(corpus.select(vec_col).first()[0])

    def with_sigs(df: DataFrame, role: str) -> DataFrame:
        sigs = []
        for t in range(n_tables):
            planes = _random_hyperplanes(dim, n_planes, seed + t)
            sigs.append(
                F.struct(
                    F.lit(t).alias("tbl"),
                    lsh_signature_col(F.col(vec_col), planes).alias("sig"),
                )
            )
        return df.select(
            F.col(id_col).alias(f"{role}_id"),
            F.col(vec_col).alias(f"{role}_emb"),
            F.explode(F.array(*sigs)).alias("ts"),
        ).select(
            f"{role}_id",
            f"{role}_emb",
            F.col("ts.tbl").alias("tbl"),
            F.col("ts.sig").alias("sig"),
        )

    a = with_sigs(corpus, "a")
    b = with_sigs(corpus, "b")
    pairs = (
        a.join(b, ["tbl", "sig"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", "a_emb", "b_emb")
        .distinct()
    )
    return (
        pairs.select(
            "a_id",
            "b_id",
            cosine_col(F.col("a_emb"), F.col("b_emb")).alias("cos_raw"),
        )
        .filter(F.col("cos_raw") >= threshold)
        .select("a_id", "b_id", portable_round(F.col("cos_raw"), 4).alias("cosine"))
    )
