"""Measure the state-partition capacity crossover for stateful
streaming (the claim scoped_state_partitions documents: at verdict-
scale row counts, per-partition state-store commit overhead dominates
and FEWER partitions win; as per-batch volume grows, parallelism starts
paying and the knob is sized UP).

Runs the production ingest-dedup shape (withWatermark ->
dropDuplicatesWithinWatermark -> availableNow memory sink, the x111
stack) over the lineitem table at sf0.01 (~60k rows) and sf0.1
(~600k rows), staged into 4 ordered files (so every run is the same
4-micro-batch replay), at n_partitions in {4, 8, 32}. Reports wall and
rows/s, min-of-N.

Usage: python3 tools/bench_stream_state_partitions.py [runs]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

DIRS = [
    ("sf0.01", "/root/testdata/sf0.01"),
    ("sf0.1", "/root/testdata/sf0.1"),
]
PARTS = [4, 8, 32]


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    from pyspark.sql import functions as F

    from detecting_and_addressing_change_spark.session import get_spark
    from detecting_and_addressing_change_spark.sources.tables import (
        load_table,
    )
    from detecting_and_addressing_change_spark.streaming.replay import (
        read_replay_stream,
        scoped_state_partitions,
        stage_replay_files,
    )

    spark = get_spark(app_name="state_parts")
    spark.sparkContext.setLogLevel("ERROR")
    results = []
    for label, d in DIRS:
        li = load_table(spark, d, "lineitem")
        # 4 roughly-equal replay files; event time is batch-monotone
        # (base + seq*10 with a 300 s watermark delay) so no row is ever
        # late-filtered and the dedup map retains EVERY key — the state
        # volume is what the partition knob is being measured against
        seq = (
            li.select(
                (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias(
                    "k"
                )
            )
            .withColumn("seq", (F.col("k") % 4).cast("long"))
            .withColumn(
                "ts",
                F.timestamp_seconds(
                    F.lit(1_750_000_000) + F.col("seq") * 10
                ),
            )
            .localCheckpoint(eager=True)
        )
        n_rows = seq.count()
        # the synthetic lineitem is TPC-H-ISH: (l_orderkey,
        # l_linenumber) is NOT unique, so the dedup has real work — the
        # emitted count is the distinct-key count
        n_keys = seq.select("k").distinct().count()
        import shutil

        for n_parts in PARTS:
            best = 1e18
            for r in range(runs):
                staged = f"/tmp/ssp_{label}_{n_parts}_{r}"
                shutil.rmtree(staged, ignore_errors=True)
                shutil.rmtree(
                    f"/tmp/ckpt_ssp_{label.replace('.', '_')}_{n_parts}_{r}",
                    ignore_errors=True,
                )
                stage_replay_files(seq, "seq", staged, batch_size=1)
                stream = read_replay_stream(
                    spark, staged, "k long, seq long, ts timestamp"
                )
                sink = f"ssp_{label.replace('.', '_')}_{n_parts}_{r}"
                t0 = time.perf_counter()
                with scoped_state_partitions(spark, n_parts):
                    q = (
                        stream.withWatermark("ts", "300 seconds")
                        .dropDuplicatesWithinWatermark(["k"])
                        .writeStream.format("memory")
                        .queryName(sink)
                        .option(
                            "checkpointLocation", f"{staged}/../ckpt_{sink}"
                        )
                        .trigger(availableNow=True)
                        .start()
                    )
                    if not q.awaitTermination(600):
                        q.stop()
                        raise AssertionError(
                            f"{label} n_parts={n_parts} replay did not "
                            f"drain in 600s"
                        )
                dt = time.perf_counter() - t0
                out = spark.table(sink).count()
                assert out == n_keys, (out, n_keys)
                best = min(best, dt)
                shutil.rmtree(staged, ignore_errors=True)
                shutil.rmtree(
                    f"{staged}/../ckpt_{sink}", ignore_errors=True
                )
            results.append((label, n_rows, n_parts, best))
            print(
                f"{label:7s} rows={n_rows:>8d} parts={n_parts:>3d} "
                f"wall={best:6.2f}s  {n_rows / best:>9.0f} rows/s",
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
