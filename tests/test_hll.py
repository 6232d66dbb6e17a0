"""HyperLogLog sketch (operators/hll.py): mergeability, accuracy band,
partitioning-invariance, and the exact-integer harmonic-sum arithmetic
against an independent Python reference."""

from __future__ import annotations

import hashlib

import pytest

from pyspark.sql import functions as F

from detecting_and_addressing_change_spark.operators.hll import (
    HASH_BITS,
    _alpha,
    hll_distinct,
    hll_estimate,
    hll_registers,
)

P = 6
M = 1 << P
W_BITS = HASH_BITS - P


def _py_hll(values):
    """Independent reference: same hash/rank/estimate spec, plain Python."""
    regs = {}
    for v in values:
        h = int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
        b, w = h >> W_BITS, h & ((1 << W_BITS) - 1)
        rank = (W_BITS + 1) if w == 0 else (W_BITS + 1 - w.bit_length())
        regs[b] = max(regs.get(b, 0), rank)
    s_shift = W_BITS + 1
    s = sum(1 << (s_shift - r) for r in regs.values())
    s += (M - len(regs)) * (1 << s_shift)
    return _alpha(M) * M * M * float(1 << s_shift) / s


@pytest.fixture(scope="module")
def values_df(spark):
    return spark.range(0, 3000).select(
        (F.col("id") % 2).alias("g"),
        F.concat(F.lit("v"), (F.col("id") % 1700).cast("string")).alias("v"),
    )


def test_estimate_matches_python_reference(spark, values_df):
    rows = hll_distinct(values_df, "v", ["g"], p=P).collect()
    vals_by_g = {
        g: {f"v{i % 1700}" for i in range(3000) if i % 2 == g}
        for g in (0, 1)
    }
    assert len(rows) == 2
    for r in rows:
        assert r["est"] == pytest.approx(_py_hll(vals_by_g[r["g"]]), abs=0.0)


def test_accuracy_within_sigma_band(spark):
    # n = 5000 distinct, m = 64 -> sigma ~ 1.04/8 = 13%; assert 4 sigma
    df = spark.range(0, 5000).select(
        F.lit(1).alias("g"), F.col("id").cast("string").alias("v")
    )
    est = hll_distinct(df, "v", ["g"], p=P).collect()[0]["est"]
    assert abs(est - 5000) / 5000 < 4 * 1.04 / (M ** 0.5)


def test_registers_merge_with_max(spark, values_df):
    """Sketch(A ∪ B) == per-bucket MAX of Sketch(A), Sketch(B) — for
    OVERLAPPING halves, the property exact counting does not have."""
    lo = values_df.filter(F.col("v").substr(2, 10).cast("long") < 1000)
    hi = values_df.filter(F.col("v").substr(2, 10).cast("long") >= 700)
    merged = (
        hll_registers(lo, "v", ["g"], p=P)
        .unionByName(hll_registers(hi, "v", ["g"], p=P))
        .groupBy("g", "bucket")
        .agg(F.max("reg").alias("reg"))
    )
    est_merged = {
        r["g"]: r["est"]
        for r in hll_estimate(merged, ["g"], p=P).collect()
    }
    est_full = {
        r["g"]: r["est"]
        for r in hll_distinct(values_df, "v", ["g"], p=P).collect()
    }
    assert est_merged == est_full


def test_partitioning_invariance(spark, values_df):
    one = {
        r["g"]: r["est"]
        for r in hll_distinct(
            values_df.coalesce(1), "v", ["g"], p=P
        ).collect()
    }
    many = {
        r["g"]: r["est"]
        for r in hll_distinct(
            values_df.repartition(17), "v", ["g"], p=P
        ).collect()
    }
    assert one == many


def test_registers_shuffle_is_aggregated(spark, values_df):
    """The register build must partial-aggregate map-side: the plan is a
    two-phase HashAggregate around one Exchange, never a raw-value
    shuffle."""
    plan = (
        hll_registers(values_df, "v", ["g"], p=P)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "HashAggregate" in plan
    assert plan.count("Exchange") <= 2  # registers agg (+ AQE variance)


def test_streaming_merge_parity_and_redelivery(spark, values_df, tmp_path):
    """foreachBatch register maintenance over an ordered replay == the
    one-shot batch sketch; re-delivering an epoch changes nothing (MAX
    merge is idempotent — the exactly-once argument, executed)."""
    from detecting_and_addressing_change_spark.operators.hll import (
        merge_hll_batch,
    )
    from detecting_and_addressing_change_spark.streaming.replay import (
        read_replay_stream,
        stage_replay_files,
    )

    src = values_df.withColumn("seq", F.col("v").substr(2, 10).cast("long"))
    staged = str(tmp_path / "staged")
    stage_replay_files(src, "seq", staged, batch_size=500)
    stream = read_replay_stream(spark, staged, "g bigint, v string, seq long")
    path = str(tmp_path / "hllregs")
    q = (
        stream.writeStream.foreachBatch(
            lambda b, e: merge_hll_batch(b, e, path, "v", ["g"], p=P)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        r["g"]: r["est"]
        for r in hll_estimate(spark.read.parquet(path), ["g"], p=P).collect()
    }
    batch = {
        r["g"]: r["est"]
        for r in hll_distinct(values_df, "v", ["g"], p=P).collect()
    }
    assert streamed == batch
    # redeliver an arbitrary slice of the data: state must not move
    merge_hll_batch(values_df.limit(400), 99, path, "v", ["g"], p=P)
    after = {
        r["g"]: r["est"]
        for r in hll_estimate(spark.read.parquet(path), ["g"], p=P).collect()
    }
    assert after == batch


@pytest.mark.parametrize("p", [4, 8])
def test_estimate_matches_reference_other_precisions(spark, p):
    """The register arithmetic must hold for any p, not just the x85
    default: same independent Python reference, m = 2^p."""
    from detecting_and_addressing_change_spark.operators.hll import (
        HASH_BITS as HB,
    )

    m, w_bits = 1 << p, HASH_BITS - p

    def py_ref(values):
        regs = {}
        for v in values:
            h = int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
            b, w = h >> w_bits, h & ((1 << w_bits) - 1)
            regs[b] = max(
                regs.get(b, 0),
                (w_bits + 1) if w == 0 else (w_bits + 1 - w.bit_length()),
            )
        s_shift = w_bits + 1
        s = sum(1 << (s_shift - r) for r in regs.values())
        s += (m - len(regs)) * (1 << s_shift)
        return _alpha(m) * m * m * float(1 << s_shift) / s

    df = spark.range(0, 2500).select(
        F.lit(1).alias("g"), F.concat(F.lit("k"), "id").alias("v")
    )
    got = hll_distinct(df, "v", ["g"], p=p).collect()[0]["est"]
    assert got == pytest.approx(py_ref({f"k{i}" for i in range(2500)}), abs=0.0)
