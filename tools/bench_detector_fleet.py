"""Measure the keyed detector-fleet slope vs key count (VERDICT r12 #6).

SURVEY §4.3 claims key-parallel detector fleets are "free" at scale:
the keyed applyInPandasWithState stack shards detectors across shuffle
partitions, so adding detectors adds state entries, not serial work.
x72 attests the fleet SHAPE at 3 keys; this script puts a number on the
claim at 1k-10k keys, the realistic per-signal/per-slice fleet size.

Shape measured: the production streaming stack end-to-end —
stage_replay_files -> read_replay_stream (4 ordered micro-batches) ->
detect_drift_stream (DDM per detector_id via applyInPandasWithState)
-> availableNow memory sink. Input is the sf0.1 lineitem table
(~600k rows) mapped to (detector_id = key % K, seq_id, deterministic
Bernoulli error), so total row volume is FIXED while K varies: any
wall growth is per-key state-store cost, not data volume.

Also sweeps state partitions {8, 32} at each K: the r12 crossover
table showed n=8 wins at verdict scale because per-partition commit
overhead dominates; with 10k live state keys the balance could flip —
this measures whether it does.

Usage: PYTHONPATH=. python tools/bench_detector_fleet.py [runs] [sf_dir]
"""

from __future__ import annotations

import shutil
import sys
import time

KEY_COUNTS = [10, 1000, 10000]
PARTS = [8, 32]


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    from pyspark.sql import functions as F

    from detecting_and_addressing_change_spark.session import get_spark
    from detecting_and_addressing_change_spark.sources.tables import (
        load_table,
    )
    from detecting_and_addressing_change_spark.streaming.ddm_stream import (
        detect_drift_stream,
    )
    from detecting_and_addressing_change_spark.streaming.replay import (
        read_replay_stream,
        scoped_state_partitions,
        stage_replay_files,
    )

    spark = get_spark(app_name="detector_fleet")
    spark.sparkContext.setLogLevel("ERROR")

    li = load_table(spark, sf_dir, "lineitem")
    base = (
        li.select(
            (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("k")
        )
        # deterministic Bernoulli error stream (knuth-hash mod), and a
        # per-row seq that is monotone within every detector for any K
        .withColumn("seq_id", F.col("k"))
        .withColumn(
            "error",
            ((F.col("k") * 2654435761) % 100 < 30).cast("double"),
        )
        .localCheckpoint(eager=True)
    )
    n_rows = base.count()
    k_max = base.agg(F.max("k").alias("m")).collect()[0]["m"]
    print(f"rows={n_rows} runs={runs} sf_dir={sf_dir}")
    print(f"{'keys':>6} {'parts':>5} {'wall_s':>7} {'rows_per_s':>10}")

    for n_keys in KEY_COUNTS:
        # batch = the row's CONTIGUOUS QUARTER of the global k range,
        # not k % 4: with k % 4, a detector's rows spanned replay
        # batches with interleaved seq ids whenever n_keys % 4 != 0
        # (e.g. K=10), so DDM saw out-of-order sequences (ADVICE r13;
        # the round-robin (k div n_keys) % 4 variant has the same
        # defect — batch 1 holds seq d+n < batch 0's d+4n). Contiguous
        # k-quarters make seq_id (=k) non-decreasing across batches
        # within EVERY detector at ANY K, and each batch still carries
        # ~1/4 of every detector's rows.
        series = base.select(
            (F.col("k") % n_keys).cast("string").alias("detector_id"),
            "seq_id",
            "error",
            F.expr(f"(k * 4) div {int(k_max) + 1}").cast("long").alias(
                "batch"
            ),
        ).localCheckpoint(eager=True)
        for n_parts in PARTS:
            best = float("inf")
            for r in range(runs):
                staged = f"/tmp/fleet_{n_keys}_{n_parts}_{r}"
                ckpt = f"{staged}_ckpt"
                for p in (staged, ckpt):
                    shutil.rmtree(p, ignore_errors=True)
                stage_replay_files(series, "batch", staged, batch_size=1)
                stream = read_replay_stream(
                    spark,
                    staged,
                    "detector_id string, seq_id long, error double, "
                    "batch long",
                )
                sink = f"fleet_{n_keys}_{n_parts}_{r}"
                t0 = time.perf_counter()
                with scoped_state_partitions(spark, n_parts):
                    q = (
                        detect_drift_stream(stream)
                        .writeStream.format("memory")
                        .queryName(sink)
                        .option("checkpointLocation", ckpt)
                        .trigger(availableNow=True)
                        .start()
                    )
                    if not q.awaitTermination(600):
                        q.stop()
                        raise AssertionError(
                            f"keys={n_keys} parts={n_parts} replay did "
                            "not drain in 600s"
                        )
                dt = time.perf_counter() - t0
                out = spark.table(sink).count()
                assert out == n_rows, (out, n_rows)
                best = min(best, dt)
                for p in (staged, ckpt):
                    shutil.rmtree(p, ignore_errors=True)
            print(
                f"{n_keys:>6} {n_parts:>5} {best:>7.2f} "
                f"{n_rows / best:>10.0f}",
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
