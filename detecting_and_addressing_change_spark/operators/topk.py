"""Word count + top-k (SURVEY §2.3 A1/A2, §2.5 O1/O2).

Reference: ``adaptation/dataset.py:193-212`` builds a defaultdict word count
and slices the sorted items. Spark-first: explode → groupBy → count is a
map-side-combinable aggregation (partial aggregation before the shuffle), and
top-k is orderBy+limit, which Spark executes as TakeOrderedAndProject — each
partition keeps only k rows, so the sort never materializes at scale.

Tie-break: the reference relies on dict insertion order (corpus order) which
is not reproducible; the rebuild orders by (count desc, word asc)
(SURVEY §8 Q6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """A1: corpus word frequencies -> DataFrame[word, c]."""
    return (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("c"))
    )


def top_k(counts: DataFrame, k: int, count_col: str = "c", key_col: str = "word") -> DataFrame:
    """A2/O1/O2: deterministic top-k (count desc, key asc)."""
    return counts.orderBy(F.desc(count_col), F.asc(key_col)).limit(k)


def topk_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    k: int,
    tiebreak_cols: tuple[str, ...] = (),
    rank_col: str = "rn",
    salt_buckets: int = 32,
) -> DataFrame:
    """Exact top-k rows per group (order_col desc, tiebreaks asc), built for
    few/skewed groups.

    A single ``row_number() OVER (PARTITION BY group)`` funnels every row of
    a group through ONE task — with a handful of groups (e.g. 5 order
    priorities) over 100 TB that is a straggler, not a plan. Top-k is
    decomposable, so phase 1 takes top-k within (group, salt) — ~k rows per
    salt survive, in parallel across ``salt_buckets × groups`` tasks — and
    phase 2 re-ranks the ≤ k·salt_buckets survivors per group, which is
    driver-trivial. The salt is a deterministic hash of the tie-break
    columns, so results are reproducible run-to-run.

    ``tiebreak_cols`` must make the ordering total (include a unique key) —
    both for deterministic output and because the salt derives from them.
    """
    if not tiebreak_cols:
        raise ValueError("tiebreak_cols must include a unique key")
    order = [F.desc(order_col)] + [F.asc(c) for c in tiebreak_cols]
    from pyspark.sql import Window

    salt = F.pmod(F.hash(*[F.col(c) for c in tiebreak_cols]), salt_buckets)
    local = Window.partitionBy(*group_cols, "_salt").orderBy(*order)
    glob = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        df.withColumn("_salt", salt)
        .withColumn("_lrn", F.row_number().over(local))
        .filter(F.col("_lrn") <= k)
        .withColumn(rank_col, F.row_number().over(glob))
        .filter(F.col(rank_col) <= k)
        .drop("_salt", "_lrn")
    )
