"""RAG retrieval scale-slope measurement (VERDICT r11 #5): the x109
composition (retrieval.py chunk -> dedupe -> embed -> persisted IVF ->
text-query search) has a written 100 TB design but, unlike the CC and
x90 families, no measured slope. This tool measures chunk count, index
BUILD wall and PROBE wall over the FULL documents table at sf0.01,
sf0.1 and the 10x synthetic sf1eq corpus (tools/gen_scale_slope_data.py
-> /tmp/sf1eq), mirroring the bench_cc_rounds protocol.

Two centroid policies per scale:
 - fixed k=8 (the x109 gate-query shape): probe cost is linear in the
   corpus with slope nprobe/k by construction — each probed cell grows
   with n;
 - scaled k ~ sqrt(n_chunks) (the documented 100 TB posture,
   operators/ivf_index.py: cell occupancy held ~constant): probe cost
   should stay ~flat while build absorbs the extra Lloyd's work.

Usage: python3 tools/bench_rag_slope.py [probe_runs]
"""

from __future__ import annotations

import math
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

DIRS = [
    ("sf0.01", "/root/testdata/sf0.01"),
    ("sf0.1", "/root/testdata/sf0.1"),
    ("sf1eq", "/tmp/sf1eq"),
]
N_QUERIES = 5
TOP_K = 3
NPROBE = 2


def main() -> None:
    probe_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    from detecting_and_addressing_change_spark.retrieval import (
        build_text_index,
        search_text,
    )
    from detecting_and_addressing_change_spark.session import get_spark
    from detecting_and_addressing_change_spark.sources.tables import (
        load_table,
    )

    spark = get_spark(app_name="rag_slope")
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for label, d in DIRS:
        if only and label not in only:
            continue
        if not os.path.isdir(d):
            print(f"skip {label}: {d} missing "
                  f"(run tools/gen_scale_slope_data.py)")
            continue
        docs = load_table(spark, d, "documents")
        n_docs = docs.count()
        chunks_seen = None
        for policy in ("fixed", "scaled"):
            path = f"/tmp/rag_slope_{label}_{policy}"
            shutil.rmtree(path, ignore_errors=True)
            if policy == "fixed":
                k = 8
            else:
                # k = sqrt(n_chunks) (IVF's standard occupancy policy),
                # from the SURVIVING chunk count the fixed build just
                # measured — post-dedup chunks/doc is NOT scale-invariant
                # (4.5 raw here, 1.3 at sf1eq where the tiled replicas'
                # interior chunks collapse), so a doc-count proxy would
                # misstate the policy by ~30%
                k = max(8, int(math.sqrt(chunks_seen)))
            t0 = time.perf_counter()
            build_text_index(docs, path, dim=8, model="BERT",
                             n_centroids=k)
            build_s = time.perf_counter() - t0
            chunks = spark.read.parquet(f"{path}/chunks")
            n_chunks = chunks_seen = chunks.count()
            texts = [
                r["chunk_text"]
                for r in chunks.orderBy("chunk_id")
                .limit(N_QUERIES)
                .collect()
            ]
            best = 1e18
            n_hits = None
            for _ in range(probe_runs):
                t0 = time.perf_counter()
                n_hits = search_text(
                    spark, path, texts, k=TOP_K, nprobe=NPROBE,
                    dim=8, model="BERT",
                ).count()
                best = min(best, time.perf_counter() - t0)
            rows.append((label, policy, n_docs, n_chunks, k, build_s, best))
            print(
                f"{label:7s} {policy:6s} docs={n_docs:>7d} "
                f"chunks={n_chunks:>8d} k={k:>4d} hits={n_hits} "
                f"build={build_s:6.1f}s probe={best:5.2f}s",
                flush=True,
            )
            shutil.rmtree(path, ignore_errors=True)
    for policy in ("fixed", "scaled"):
        seq = [r for r in rows if r[1] == policy]
        for a, b in zip(seq, seq[1:]):
            print(
                f"slope {policy} {a[0]}->{b[0]}: "
                f"{b[3] / max(a[3], 1):.1f}x chunks -> "
                f"build {b[5] / max(a[5], 1e-9):.2f}x, "
                f"probe {b[6] / max(a[6], 1e-9):.2f}x"
            )
    spark.stop()


if __name__ == "__main__":
    main()
