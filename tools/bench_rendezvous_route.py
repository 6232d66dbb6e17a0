"""Measure the Catalyst analysis cost of the two rendezvous-assignment
forms (VERDICT r13 #2): the r13 UNROLLED struct-array (expression tree
grows with n_shards) vs the r14 transform-over-sequence TABLE route
(constant-size tree). Same exact int64 mix, parity-pinned in
tests/test_sharding.py; this tool records the cost shape the table
route removes — the operators/kmeans.py ASSIGN_TABLE_ROUTE_K
precedent applied to shard counts.

Usage: python tools/bench_rendezvous_route.py
Prints one row per (form, n_shards): analysis wall (df.schema on a
fresh expression) and end-to-end execution wall over 200k rows.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from detecting_and_addressing_change_spark.operators.sharding import (  # noqa: E402
    _rendezvous_shard_col_unrolled,
    rendezvous_shard_col,
    rendezvous_shard_col_two_level,
)
from detecting_and_addressing_change_spark.session import get_spark  # noqa: E402


def main() -> None:
    spark = get_spark(app_name="bench_rendezvous_route")
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.range(200_000).select(F.col("id").alias("doc_id"))
    df.agg(F.max("doc_id")).collect()  # warm

    print(f"{'form':>8} {'n_shards':>8} {'analyze_s':>9} {'exec_s':>7}")
    for n in (8, 64, 512, 2048):
        for label, fn in (
            ("table", rendezvous_shard_col),
            ("unrolled", _rendezvous_shard_col_unrolled),
        ):
            if label == "unrolled" and n > 512:
                continue  # minutes of analysis; the point is made by 512
            t0 = time.perf_counter()
            out = df.select(fn("doc_id", n).alias("sid"))
            out.schema  # forces analysis
            t_an = time.perf_counter() - t0
            t0 = time.perf_counter()
            out.agg(F.sum("sid"), F.countDistinct("sid")).collect()
            t_ex = time.perf_counter() - t0
            print(f"{label:>8} {n:>8} {t_an:>9.3f} {t_ex:>7.3f}")

    # two-level HRW at large n: O(G + S) weights/row vs the flat form's
    # O(n) — the per-ROW cost the table route does NOT remove
    for gg, ss in ((32, 64), (64, 32), (128, 128)):
        n = gg * ss
        t0 = time.perf_counter()
        out = df.select(
            rendezvous_shard_col_two_level("doc_id", gg, ss).alias("sid")
        )
        out.schema
        t_an = time.perf_counter() - t0
        t0 = time.perf_counter()
        out.agg(F.sum("sid"), F.countDistinct("sid")).collect()
        t_ex = time.perf_counter() - t0
        print(f"2lvl{gg}x{ss:<4} {n:>7} {t_an:>9.3f} {t_ex:>7.3f}")

    # the r15 adaptive-route seam (VERDICT r14 #3): rendezvous_shard_col
    # stays on the flat draw below TWO_LEVEL_ROUTE_MIN_N (and for
    # near-prime n with no square-ish factorization), and routes to the
    # two-level draw at/above it — measure both sides of the boundary
    print("-- adaptive route seam (rendezvous_shard_col) --")
    for n, note in (
        (1023, "flat (below threshold)"),
        (1024, "routed -> 32x32"),
        (1031, "flat (prime, no factorization)"),
        (2048, "routed -> 32x64"),
    ):
        t0 = time.perf_counter()
        out = df.select(rendezvous_shard_col("doc_id", n).alias("sid"))
        out.schema
        t_an = time.perf_counter() - t0
        t0 = time.perf_counter()
        out.agg(F.sum("sid"), F.countDistinct("sid")).collect()
        t_ex = time.perf_counter() - t0
        print(f"{n:>8} {t_an:>9.3f} {t_ex:>7.3f}  {note}")
    spark.stop()


if __name__ == "__main__":
    main()
