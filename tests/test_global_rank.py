"""global_rank must equal the one-window ROW_NUMBER for any partition
count — the range bounds only affect layout, never the total order."""

from __future__ import annotations

import pytest

from pyspark.sql import Window
from pyspark.sql import functions as F

from detecting_and_addressing_change_spark.operators.order import (
    global_rank,
    grouped_global_rank,
)


@pytest.mark.parametrize("n_parts", [1, 3, 16])
def test_grouped_rank_matches_partitioned_window(spark, n_parts):
    """r18: grouped_global_rank (one staging for all groups) must equal
    ROW_NUMBER() OVER (PARTITION BY grp ORDER BY ...) for any partition
    count, including groups of very different sizes."""
    df = spark.range(1200).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).alias("grp"),  # 3 groups
        (F.col("id") % 11).cast("double").alias("v"),  # heavy ties
    ).filter((F.col("grp") != 2) | (F.col("k") < 60))  # uneven sizes
    got = grouped_global_rank(
        df, "grp", [F.desc("v"), F.asc("k")], rank_col="rk",
        num_partitions=n_parts,
    )
    w = Window.partitionBy("grp").orderBy(F.desc("v"), F.asc("k"))
    want = df.withColumn("rk", F.row_number().over(w))
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


@pytest.mark.parametrize("n_parts", [1, 3, 16])
def test_matches_single_window(spark, n_parts):
    df = spark.range(1000).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).cast("double").alias("v"),  # heavy ties
    )
    got = global_rank(
        df, [F.desc("v"), F.asc("k")], num_partitions=n_parts
    )
    w = Window.orderBy(F.desc("v"), F.asc("k"))
    want = df.withColumn("rank", F.row_number().over(w))
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_rank_is_contiguous(spark):
    df = spark.range(500).select(
        F.col("id").alias("k"), F.rand(seed=7).alias("v")
    )
    got = global_rank(df, [F.desc("v"), F.asc("k")], num_partitions=8)
    ranks = sorted(r["rank"] for r in got.select("rank").collect())
    assert ranks == list(range(1, 501))


def test_cumsum_multi_column_matches_chained_and_window(spark):
    """r17: the multi-column global_cumsum (one staging pass for N
    running sums) must be row-identical to both the chained
    single-column calls it replaces and the one-window SUM OVER."""
    from detecting_and_addressing_change_spark.operators.order import (
        global_cumsum,
    )

    df = spark.range(800).select(
        F.col("id").alias("k"),
        (F.col("id") % 5 + 1).alias("a"),
        (F.col("id") % 3).alias("b"),
    )
    multi = global_cumsum(
        df, [F.asc("k")], ["a", "b"], out_col=["ca", "cb"],
        num_partitions=7,
    )
    chained = global_cumsum(
        global_cumsum(df, [F.asc("k")], "a", out_col="ca",
                      num_partitions=7),
        [F.asc("k")], "b", out_col="cb", num_partitions=7,
    )
    w = Window.orderBy(F.asc("k")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = df.withColumn("ca", F.sum("a").over(w)).withColumn(
        "cb", F.sum("b").over(w)
    )
    got = sorted(map(tuple, multi.collect()))
    assert got == sorted(map(tuple, chained.collect()))
    assert got == sorted(map(tuple, want.collect()))


def test_cumsum_multi_column_length_mismatch_raises(spark):
    from detecting_and_addressing_change_spark.operators.order import (
        global_cumsum,
    )

    df = spark.range(10).select(F.col("id").alias("k"), F.lit(1).alias("a"))
    with pytest.raises(ValueError, match="length mismatch"):
        global_cumsum(df, [F.asc("k")], ["a"], out_col=["x", "y"])
