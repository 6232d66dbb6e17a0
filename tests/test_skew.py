"""Salted join: identical results to a plain join, with the hot key spread
across salt buckets."""

from __future__ import annotations

from pyspark.sql import functions as F

from detecting_and_addressing_change_spark.operators.skew import (
    key_skew_profile,
    salted_join,
)


def make_skewed(spark):
    # 90% of facts hit key 0
    facts = spark.range(2000).select(
        F.when(F.col("id") % 10 < 9, F.lit(0))
        .otherwise((F.col("id") % 50).cast("long"))
        .alias("k"),
        F.col("id").alias("fact_id"),
    )
    dim = spark.range(50).select(
        F.col("id").alias("k"),
        F.concat(F.lit("name_"), F.col("id")).alias("name"),
    )
    return facts, dim


def test_salted_join_matches_plain_join(spark):
    facts, dim = make_skewed(spark)
    plain = facts.join(dim, "k").select("fact_id", "name")
    salted = salted_join(facts, dim, "k", n_salts=8).select(
        "fact_id", "name"
    )
    a = sorted(tuple(r) for r in plain.collect())
    b = sorted(tuple(r) for r in salted.collect())
    assert a == b
    assert len(a) == 2000


def test_skew_profile_finds_hot_key(spark):
    facts, _ = make_skewed(spark)
    prof = key_skew_profile(facts, "k", top_n=3).collect()
    assert prof[0]["k"] == 0
    assert prof[0]["share"] > 0.8
