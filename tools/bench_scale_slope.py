"""Scale-slope measurement (VERDICT r5 task #6): run the iterative /
shuffle-heavy query shapes at sf0.1 and at the generated 10x corpus
(tools/gen_scale_slope_data.py -> /tmp/sf1eq) and report wall-time ratios.
A plan that survives a 100 TB scale-up should be ~linear here (ratio <=
~10 for 10x rows, usually far below on local[32] where fixed job latency
dominates at sf0.1); anything super-linear gets investigated by name in
BENCH_NOTES.md.

Usage: python3 tools/bench_scale_slope.py [runs]
"""

from __future__ import annotations

import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

QUERIES_UNDER_TEST = [
    "x23_dedup_clusters",        # guarded edges + iterative CC
    "x52_semantic_dedup_clusters",  # embedding LSH pairs + star CC
    "x58_kmeans_cells",          # Lloyd's iterations
    "x59_kmeans_ivf_topk",       # fit + pruned probe
    "x71_textrank",              # fixed-point iteration, per-round joins
    "q39_abrupt_drift_experiment",  # E2E embed->NB->DDM pipeline
    "x04_minhash_pairs",         # collapse + banding + capped self-join
    "x75_dedup_savings",         # edges + CC + rollup
    # round-7 additions over the same 10x corpora
    "x83_ann_recall",            # exact ground truth x IVF probe
    "x84_prefix_jaccard_join",   # prefix candidates + positional filters
    "x76_incremental_dedup",     # persisted-index lifecycle incl. writes
    # round-14 addition: the shard-export layout arithmetic (epoch-key
    # range shuffle + global_cumsum + manifest agg)
    "x117_shard_export",
    # round-15 additions: the materialized pretraining build (curate ->
    # vocab -> encode -> pack -> partitioned write) and the trainer
    # that streams it in shard GROUPS — the batch count stays FIXED as
    # the corpus grows (k files/trigger scales with the layout), so the
    # slope should be the per-batch data cost, not the loop count
    "x123_training_build_materialized",
    "x125_train_from_shards_nb",
]


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    from detecting_and_addressing_change_spark.queries import QUERIES
    from detecting_and_addressing_change_spark.session import get_spark

    spark = get_spark(app_name="scale_slope")
    spark.sparkContext.setLogLevel("ERROR")
    dirs = {"sf0.1": "/root/testdata/sf0.1", "sf1eq": "/tmp/sf1eq"}
    # warm every (query, dir) once: JIT/codegen depth must not masquerade
    # as scale cost (same rationale as bench.py's warm-up pass)
    for name in QUERIES_UNDER_TEST:
        for d in dirs.values():
            QUERIES[name](spark, d).write.format("noop").mode(
                "overwrite"
            ).save()
    best: dict[tuple[str, str], float] = {}
    for _ in range(runs):
        for name in QUERIES_UNDER_TEST:
            for label, d in dirs.items():
                t0 = time.perf_counter()
                QUERIES[name](spark, d).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt = time.perf_counter() - t0
                key = (name, label)
                best[key] = min(best.get(key, 1e9), dt)
    print(f"{'query':34s} {'sf0.1':>8s} {'sf1eq(10x)':>10s} {'ratio':>6s}")
    for name in QUERIES_UNDER_TEST:
        a = best[(name, "sf0.1")]
        b = best[(name, "sf1eq")]
        print(f"{name:34s} {a:8.2f} {b:10.2f} {b / a:6.2f}")

    # x123's registered query rides the per-session layout fixture (the
    # warm-up above already built it), so its row measures the
    # read-back, not the build — measure the RAW build into a fresh
    # scratch dir per run here instead (the cost a 100 TB corpus pays)
    import tempfile

    from detecting_and_addressing_change_spark.curation import (
        build_training_shards,
    )
    from detecting_and_addressing_change_spark.sources.tables import (
        load_table,
    )

    raw: dict[str, float] = {}
    for label, d in dirs.items():
        docs = load_table(spark, d, "documents")
        t_best = 1e9
        for _ in range(runs):
            out = tempfile.mkdtemp(prefix="slope_build_")
            t0 = time.perf_counter()
            build_training_shards(
                docs, out, vocab_size=64, pack_size=32,
                packs_per_shard=4, epoch_seed=5,
            )
            t_best = min(t_best, time.perf_counter() - t0)
            shutil.rmtree(out, ignore_errors=True)
        raw[label] = t_best
    a, b = raw["sf0.1"], raw["sf1eq"]
    print(
        f"{'build_training_shards (raw build)':34s} {a:8.2f} "
        f"{b:10.2f} {b / a:6.2f}"
    )

    # the SIZED default (r16): packs_per_shard = isqrt(n_packs), so the
    # directory count grows as sqrt(corpus) — the small-files defense;
    # measure build AND read-back at this budget
    from pyspark.sql import functions as F

    sized_build: dict[str, float] = {}
    sized_rb: dict[str, float] = {}
    for label, d in dirs.items():
        docs = load_table(spark, d, "documents")
        t_best, path = 1e9, None
        for _ in range(runs):
            out = tempfile.mkdtemp(prefix="slope_sized_")
            t0 = time.perf_counter()
            build_training_shards(
                docs, out, vocab_size=64, pack_size=32, epoch_seed=5,
            )
            t_best = min(t_best, time.perf_counter() - t0)
            if path is not None:  # the read-back below only needs the
                shutil.rmtree(path, ignore_errors=True)  # last layout
            path = out
        sized_build[label] = t_best
        t_best = 1e9
        for _ in range(runs):
            t0 = time.perf_counter()
            spark.read.parquet(f"{path}/shards").agg(
                F.count(F.lit(1)),
                F.sum("n_tokens"),
            ).collect()
            t_best = min(t_best, time.perf_counter() - t0)
        shutil.rmtree(path, ignore_errors=True)
        sized_rb[label] = t_best
    for name, row in (
        ("build_training_shards (sized)", sized_build),
        ("sized layout read-back", sized_rb),
    ):
        a, b = row["sf0.1"], row["sf1eq"]
        print(f"{name:34s} {a:8.2f} {b:10.2f} {b / a:6.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
