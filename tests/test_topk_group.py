"""topk_per_group (two-phase salted top-k) must be EXACTLY the plain
one-window top-k for any salt bucketing — top-k per group is decomposable,
so phase 1 can only ever discard rows that phase 2 would discard anyway."""

from __future__ import annotations

import pytest

from pyspark.sql import Window
from pyspark.sql import functions as F

from detecting_and_addressing_change_spark.operators.topk import (
    topk_per_group,
)


def _reference(df, group_cols, order_col, k, tiebreaks):
    order = [F.desc(order_col)] + [F.asc(c) for c in tiebreaks]
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
    )


@pytest.mark.parametrize("salt_buckets", [1, 7, 64])
@pytest.mark.parametrize("k", [1, 3, 10])
def test_matches_single_window(spark, salt_buckets, k):
    # heavy ties: value = id % 5 collides constantly, id breaks them
    df = spark.range(500).select(
        (F.col("id") % 3).alias("g"),
        (F.col("id") % 5).cast("double").alias("v"),
        F.col("id").alias("key"),
    )
    got = topk_per_group(
        df, ["g"], "v", k, tiebreak_cols=("key",), salt_buckets=salt_buckets
    )
    want = _reference(df, ["g"], "v", k, ("key",))
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_requires_tiebreak(spark):
    df = spark.range(10).select(F.lit(1).alias("g"), F.col("id").alias("v"))
    with pytest.raises(ValueError):
        topk_per_group(df, ["g"], "v", 2)


def test_groups_smaller_than_k(spark):
    df = spark.range(4).select(
        F.col("id").alias("g"), F.col("id").alias("v"), F.col("id").alias("key")
    )
    got = topk_per_group(df, ["g"], "v", 10, tiebreak_cols=("key",))
    assert got.count() == 4
