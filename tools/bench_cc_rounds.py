"""Connected-components scale-slope measurement (VERDICT r10 #5): the
large-star/small-star path (operators/graph.py::connected_components_star,
the x52 production route) claims O(log n) convergence rounds; this tool
MEASURES rounds, vertex/edge counts and wall time on the x52 edge set
(embedding LSH near-dup pairs at >= 0.3) at sf0.01, sf0.1 and the 10x
synthetic sf1eq corpus (tools/gen_scale_slope_data.py -> /tmp/sf1eq),
mirroring the x90 slope protocol (BENCH_NOTES round-9 section).

Usage: python3 tools/bench_cc_rounds.py [runs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

DIRS = [
    ("sf0.01", "/root/testdata/sf0.01"),
    ("sf0.1", "/root/testdata/sf0.1"),
    ("sf1eq", "/tmp/sf1eq"),
]


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    from pyspark.sql import functions as F

    from detecting_and_addressing_change_spark.operators.graph import (
        connected_components_star,
    )
    from detecting_and_addressing_change_spark.operators.similarity import (
        embedding_near_dup_pairs,
    )
    from detecting_and_addressing_change_spark.session import get_spark
    from detecting_and_addressing_change_spark.sources.tables import (
        load_table,
    )

    spark = get_spark(app_name="cc_rounds")
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for label, d in DIRS:
        if not os.path.isdir(d):
            print(f"skip {label}: {d} missing "
                  f"(run tools/gen_scale_slope_data.py)")
            continue
        emb = load_table(spark, d, "embeddings")
        n_vertices = emb.count()
        # the x52 edge set, materialized once so the CC timing measures
        # the star rounds, not the LSH pair generation
        pairs = (
            embedding_near_dup_pairs(emb, threshold=0.3, dim=64)
            .select("a_id", "b_id")
            .localCheckpoint(eager=True)
        )
        n_edges = pairs.count()
        nodes = emb.select("vec_id").localCheckpoint(eager=True)
        best, rounds = 1e18, None
        n_components = None
        for _ in range(runs):
            t0 = time.perf_counter()
            labels, r = connected_components_star(
                nodes, pairs, id_col="vec_id",
                src_col="a_id", dst_col="b_id",
            )
            n_components = labels.select(
                F.countDistinct("lbl")
            ).collect()[0][0]
            dt = time.perf_counter() - t0
            best, rounds = min(best, dt), r
        rows.append(
            (label, n_vertices, n_edges, n_components, rounds, best)
        )
        print(
            f"{label:8s} vertices={n_vertices:>7d} edges={n_edges:>8d} "
            f"components={n_components:>7d} rounds={rounds:>2d} "
            f"wall={best:6.2f}s"
        )
    if len(rows) >= 2:
        a, b = rows[-2], rows[-1]
        print(
            f"slope {a[0]}->{b[0]}: {b[2] / max(a[2], 1):.1f}x edges -> "
            f"rounds {a[4]}->{b[4]}, wall {b[5] / a[5]:.2f}x"
        )
    spark.stop()


if __name__ == "__main__":
    main()
