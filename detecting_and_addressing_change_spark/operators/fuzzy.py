"""Blocked fuzzy (edit-distance) matching with a skew-guarded block width
(entity-resolution family; VERDICT r1 task #5 / r2 task #7).

Blocking is what makes fuzzy joins scale: candidate pairs are generated
only within a cheap blocking key, so the Levenshtein compute never goes
all-pairs. But a pathological block (every row sharing the first word)
makes the within-block candidate set O(width²) — a scale-killer at 100x.
Two guards bound it:

1. **Tiered key**: blocks wider than ``block_cap`` are refined by a second
   deterministic key — an md5 bucket of the match text, with
   ``ceil(width / cap)`` buckets — so similar rows (equal prefixes hash
   identically) stay co-bucketed while the expected bucket width drops
   back to ~cap. md5 is engine-portable (DuckDB oracle uses the same
   bytes), unlike Spark's ``hash``.
2. **Hard cap**: within each (block, bucket) the first ``block_cap`` rows
   by id are kept (ROW_NUMBER; deterministic). This bounds the worst case
   — e.g. a block of identical texts, which content hashing cannot split —
   at the documented cost of dropping candidates beyond the cap; real
   mass-duplicate data should be exact-deduped first (operators/dedup.py).

Candidate count is therefore <= ceil(w/cap) * cap*(cap-1)/2 per block —
linear in block width, not quadratic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def fuzzy_join_blocked(
    d: DataFrame,
    id_col: str = "doc_id",
    blk_col: str = "blk",
    key_col: str = "pfx",
    max_dist: int = 8,
    block_cap: int = 64,
) -> DataFrame:
    """d[id, blk, key] -> pairs (a_id, b_id, dist) with a.id < b.id, equal
    (block, tier-bucket), rank <= cap on both ends, levenshtein <= max_dist."""
    widths = d.groupBy(blk_col).agg(F.count("*").alias("__w"))
    dd = d.join(widths, blk_col)
    nbuck = F.ceil(F.col("__w") / float(block_cap)).cast("long")
    # portable bucket: first 8 md5 hex chars as an int (always < 2^32 >= 0)
    hx = F.conv(F.substring(F.md5(F.col(key_col)), 1, 8), 16, 10).cast("long")
    dd = dd.withColumn(
        "__bkt",
        F.when(F.col("__w") <= block_cap, F.lit(0)).otherwise(hx % nbuck),
    )
    rk = F.row_number().over(
        Window.partitionBy(blk_col, "__bkt").orderBy(id_col)
    )
    dd = dd.withColumn("__rk", rk).filter(F.col("__rk") <= block_cap)
    a = dd.select(
        F.col(id_col).alias("a_id"),
        blk_col,
        "__bkt",
        F.col(key_col).alias("pa"),
    )
    b = dd.select(
        F.col(id_col).alias("b_id"),
        blk_col,
        "__bkt",
        F.col(key_col).alias("pb"),
    )
    dist = F.levenshtein(F.col("pa"), F.col("pb"))
    return (
        a.join(b, [blk_col, "__bkt"])
        .filter(F.col("a_id") < F.col("b_id"))
        .filter(dist <= max_dist)
        .select("a_id", "b_id", dist.cast("int").alias("dist"))
    )
