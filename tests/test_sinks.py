"""Parquet sinks (sinks/parquet.py): layout contracts that matter at scale
— partition pruning actually prunes, bucketed joins actually avoid the
shuffle, compaction bounds file counts. Round-trips go through real
tmp-dir writes."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from detecting_and_addressing_change_spark.sinks import (
    compact,
    write_bucketed_table,
    write_partitioned,
)
from detecting_and_addressing_change_spark.sources.tables import load_table

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def orders(spark):
    return load_table(spark, SF_SMOKE, "orders")


def test_partitioned_write_roundtrip_and_pruning(spark, orders, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("part") / "orders_by_priority")
    write_partitioned(
        orders, path, ["o_orderpriority"], sort_cols=["o_orderdate"]
    )
    back = spark.read.parquet(path)
    assert back.count() == orders.count()
    # hive layout: one directory per priority value
    dirs = [d for d in os.listdir(path) if d.startswith("o_orderpriority=")]
    n_prios = orders.select("o_orderpriority").distinct().count()
    assert len(dirs) == n_prios
    # a partition-column filter prunes to that directory's files only
    one = back.filter(F.col("o_orderpriority") == "1-URGENT")
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert one.count() == orders.filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).count()
    # small-file control: exactly one file per partition directory
    for d in dirs:
        files = [f for f in os.listdir(os.path.join(path, d)) if f.endswith(".parquet")]
        assert len(files) == 1


def test_bucketed_join_has_no_shuffle(spark, orders, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    cust = load_table(spark, SF_SMOKE, "customer")
    write_bucketed_table(
        orders.withColumnRenamed("o_custkey", "k"),
        "t_orders_b", str(base / "orders"), "k", 4, sort_col="k",
    )
    write_bucketed_table(
        cust.withColumnRenamed("c_custkey", "k"),
        "t_cust_b", str(base / "cust"), "k", 4, sort_col="k",
    )
    try:
        a = spark.table("t_orders_b")
        b = spark.table("t_cust_b")
        joined = a.join(b.hint("merge"), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join still shuffles"
        # and it is still CORRECT
        expect = (
            orders.join(cust, orders.o_custkey == cust.c_custkey).count()
        )
        assert joined.count() == expect
    finally:
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_cust_b")


def test_compact_bounds_file_count(spark, orders, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("compact") / "orders")
    # fragment first: many tasks -> many files
    orders.repartition(16).write.mode("overwrite").parquet(path + "_frag")
    frag = spark.read.parquet(path + "_frag")
    compact(frag, path, target_partitions=2, sort_cols=["o_orderkey"])
    files = [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert len(files) == 2
    assert spark.read.parquet(path).count() == orders.count()
