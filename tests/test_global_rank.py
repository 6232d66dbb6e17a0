"""global_rank must equal the one-window ROW_NUMBER for any partition
count — the range bounds only affect layout, never the total order."""

from __future__ import annotations

import pytest

from pyspark.sql import Window
from pyspark.sql import functions as F

from detecting_and_addressing_change_spark.operators.order import global_rank


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
