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
