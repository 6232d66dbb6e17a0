"""Idempotent build-or-load adaptation-pair cache (SURVEY §2.1 S4).

Reference: ``adaptation/dataset.py:144-179`` builds aligned (source, target)
matrices once and caches them as ``.npy``, loading on subsequent runs. The
Spark equivalent is a read-or-create parquet table: the builder callable runs
only when the table is absent (marker: parquet _SUCCESS).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from .tables import read_parquet_cached_schema


def build_or_load(
    spark: SparkSession,
    path: str,
    builder: Callable[[], DataFrame],
) -> DataFrame:
    """Return the cached table at `path`, building it with `builder` iff the
    table doesn't exist yet."""
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        builder().write.mode("overwrite").parquet(path)
    return read_parquet_cached_schema(spark, path)


def build_adaptation_pairs(
    docs: DataFrame,
    source_model: str,
    target_model: str,
    dim: int,
    top_k: int = 200,
    pooling: str = "mean",
) -> DataFrame:
    """The reference's pair pipeline (adaptation/dataset.py:181-230):
    word-count (A1) -> top-k words (A2, deterministic tie-break, SURVEY §8
    Q6) -> embed each word under BOTH models (U7 x2) -> pool (R9) -> align
    by word (J2 as an explicit equi-join).

    Returns DataFrame[word, rank, source, target]. The word-level pair set
    is <= top_k rows, so the downstream Procrustes/MLP solve stays cheap;
    the EMBEDDING of the full corpus (not these words) is where scale lives.
    """
    from ..functions.arrays import (
        first_token_pool_col,
        max_pool_col,
        mean_pool_col,
    )
    from ..operators.embedder import embed_documents
    from ..operators.topk import top_k as take_top_k
    from ..operators.topk import word_count

    pool = {
        "mean": mean_pool_col,
        "max": max_pool_col,  # real max — the reference's full-abstract
        # variant computes mean in its 'max' branch (SURVEY §8 Q1); fixed
        "first": first_token_pool_col,
    }[pooling]

    ranked = take_top_k(word_count(docs, "text"), k=top_k).select(
        "word",
        F.row_number()
        .over(Window.orderBy(F.desc("c"), F.asc("word")))
        .alias("rank"),
    )
    word_docs = ranked.select(
        F.col("rank").cast("long").alias("doc_id"),
        F.col("word").alias("text"),
    )

    def embed_side(model: str, out: str) -> DataFrame:
        emb = embed_documents(word_docs, model=model, dim=dim)
        return emb.select("doc_id", pool(F.col("tokens")).alias(out))

    pairs = embed_side(source_model, "source").join(
        embed_side(target_model, "target"), "doc_id"
    )
    return ranked.join(
        pairs, ranked["rank"].cast("long") == pairs["doc_id"]
    ).select("word", "rank", "source", "target")
