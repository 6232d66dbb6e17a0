"""Measure the k-means assign routes vs k at FIXED data (VERDICT r12 #3).

The unrolled route builds k expression terms (analysis/codegen cost grows
with k); the table route ships the centroid table as ONE constant array
literal and an O(1) expression tree. Both are zero-shuffle narrow maps
with identical exact-int64 semantics (parity: tests/test_kmeans.py).

Usage: python3 tools/bench_assign_route.py [runs] [ks]
  runs: min-of-N per cell (default 3)
  ks:   comma list (default 8,64,256,1024)

Prints a table of wall seconds per (k, route) for one assign pass over
the sf0.1 embeddings table (wall includes expression construction,
planning AND execution — planning is the term under test), plus the
construction-only time.
"""

from __future__ import annotations

import sys
import time


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    ks = (
        [int(x) for x in sys.argv[2].split(",")]
        if len(sys.argv) > 2
        else [8, 64, 256, 1024]
    )
    from pyspark.sql import functions as F

    import detecting_and_addressing_change_spark.operators.kmeans as km
    from detecting_and_addressing_change_spark.operators.similarity import (
        quantize_col,
    )
    from detecting_and_addressing_change_spark.session import get_spark
    from detecting_and_addressing_change_spark.sources.tables import (
        load_table,
    )

    spark = get_spark(app_name="assign_route")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, "/root/testdata/sf0.1", "embeddings")
    quant = emb.select(
        "vec_id", quantize_col(F.col("embedding")).alias("qv")
    ).localCheckpoint(eager=True)
    n_rows = quant.count()
    dim = len(quant.first()["qv"])
    print(f"rows={n_rows} dim={dim} runs={runs}")

    # deterministic synthetic centroids: k distinct quantized vectors on
    # the same int grid as the corpus (values don't matter for COST —
    # every route compares every row to all k centroids regardless)
    def make_centroids(k: int) -> list[tuple[int, list[int]]]:
        return [
            (
                cid,
                [((cid * 2654435761 + d * 40503) % 2001) - 1000
                 for d in range(dim)],
            )
            for cid in range(k)
        ]

    print(f"{'k':>6} {'route':>8} {'construct_s':>11} {'wall_s':>8}")
    results = []
    for k in ks:
        cents = make_centroids(k)
        for route, threshold in (("unrolled", 10**9), ("table", 0)):
            if route == "unrolled" and k > 2048:
                continue
            km.ASSIGN_TABLE_ROUTE_K = threshold
            best_wall, best_cons = float("inf"), float("inf")
            for _ in range(runs):
                t0 = time.perf_counter()
                col = km.kmeans_assign_col(cents, "qv")
                cons = time.perf_counter() - t0
                agg = quant.select(col.alias("cell")).agg(
                    F.sum("cell").alias("s"), F.count(F.lit(1)).alias("n")
                ).collect()[0]
                wall = time.perf_counter() - t0
                assert int(agg["n"]) == n_rows
                best_wall = min(best_wall, wall)
                best_cons = min(best_cons, cons)
            results.append((k, route, best_cons, best_wall))
            print(
                f"{k:>6} {route:>8} {best_cons:>11.3f} {best_wall:>8.2f}",
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
