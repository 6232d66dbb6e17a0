"""Sketch operators (operators/sketches.py): the probabilistic-structure
guarantees that make them safe at scale —

- Bloom: NO false negatives (every true match survives the pre-filter);
  false-positive rate bounded well under the m/k design point.
- Count-min: one-sided error (estimate >= exact count, always).
- Stratified top-n: exactly min(n, |stratum|) rows per stratum, identical
  across repartitionings (the determinism contract of SURVEY §5.2.4).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from detecting_and_addressing_change_spark.operators.sketches import (
    bloom_build,
    bloom_prefilter,
    cms_cells,
    cms_estimate,
    stratified_topn,
)
from detecting_and_addressing_change_spark.sources.tables import load_table

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def tabs(spark):
    cust = load_table(spark, SF_SMOKE, "customer")
    orders = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_custkey"
    )
    return cust, orders


def test_bloom_no_false_negatives(spark, tabs):
    cust, orders = tabs
    build = (
        cust.filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
        .distinct()
    )
    bloom = bloom_build(build, "c_custkey", m=4096, k=4)
    passed = {
        r.o_orderkey
        for r in bloom_prefilter(orders, "o_custkey", bloom).collect()
    }
    exact = {
        r.o_orderkey
        for r in orders.join(
            build, orders.o_custkey == build.c_custkey, "left_semi"
        ).collect()
    }
    assert exact <= passed, "Bloom pre-filter dropped true matches"
    # false-positive tail bounded: with n build keys, m=4096, k=4 the FP
    # rate is (1-e^{-kn/m})^k; at sf0.001 n~30 that is < 1% — allow 5%.
    total = orders.count()
    assert (len(passed) - len(exact)) <= max(5, 0.05 * total)


def test_bloom_prefilter_keeps_schema(spark, tabs):
    cust, orders = tabs
    build = cust.select("c_custkey").limit(3)
    bloom = bloom_build(build, "c_custkey")
    out = bloom_prefilter(orders, "o_custkey", bloom)
    assert out.columns == orders.columns  # helper columns dropped


def test_bloom_prefilter_plan_is_shuffle_free(spark, tabs):
    """The whole point of the runtime-filter pattern: k broadcast semi
    joins, no Exchange anywhere above the probe scan."""
    cust, orders = tabs
    build = (
        cust.filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
        .distinct()
    )
    bloom = bloom_build(build, "c_custkey", m=4096, k=4)
    plan = (
        bloom_prefilter(orders, "o_custkey", bloom, m=4096, k=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("BroadcastHashJoin") == 4
    # build-side distinct() may hash-partition its tiny position set, but
    # the probe table must never be hash-partitioned on anything
    assert "Exchange hashpartitioning(o_" not in plan
    assert "Exchange hashpartitioning(_b" not in plan


def test_cms_one_sided_error(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    toks = docs.select(
        F.explode(F.split(F.col("text"), " ")).alias("item")
    ).filter(F.col("item") != "")
    cells = cms_cells(toks, "item", depth=3, width=1024)
    est = cms_estimate(toks, "item", cells, depth=3, width=1024)
    exact = toks.groupBy("item").agg(F.count(F.lit(1)).alias("exact_cnt"))
    joined = exact.join(est, "item").collect()
    assert joined, "no tokens"
    assert all(r.est >= r.exact_cnt for r in joined), "CMS under-counted"


def test_cms_sketch_is_bounded(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    toks = docs.select(
        F.explode(F.split(F.col("text"), " ")).alias("item")
    ).filter(F.col("item") != "")
    assert cms_cells(toks, "item", depth=3, width=64).count() <= 3 * 64


def test_stratified_topn_deterministic(spark, tabs):
    cust, _ = tabs
    a = stratified_topn(cust, "c_mktsegment", "c_custkey", 5)
    b = stratified_topn(
        cust.repartition(7, "c_custkey"), "c_mktsegment", "c_custkey", 5
    )
    rows_a = sorted(
        (r.c_mktsegment, r.c_custkey, r.srank) for r in a.collect()
    )
    rows_b = sorted(
        (r.c_mktsegment, r.c_custkey, r.srank) for r in b.collect()
    )
    assert rows_a == rows_b
    per = (
        a.groupBy("c_mktsegment").count().collect()
    )
    sizes = {
        r.c_mktsegment: r["count"]
        for r in cust.groupBy("c_mktsegment").count().collect()
    }
    for r in per:
        assert r["count"] == min(5, sizes[r.c_mktsegment])
