"""Capture .explain("formatted") for named queries into plans/r17/.

Optimization-round evidence tool (guide §1/§7.2): for each query name
given on the command line (or a default heavy set), writes
plans/r17/<name>_<tag>.txt with the formatted physical plan at the
given sf dir (default sf0.01 — plan SHAPE, not data scale, is what the
files attest; Exchange counts / join strategies / PushedFilters are
identical across sf for these queries).

    PYTHONPATH=. python tools/capture_plans.py <tag> [name ...]

Queries that run driver-side actions while BUILDING their DataFrame
(collect-based audits like x90) still work: the captured plan is the
final returned DataFrame's, and the build cost is paid once here.
"""

from __future__ import annotations

import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

DEFAULT_QUERIES = [
    "x90_adaptive_similarity_join",
    "x84_prefix_jaccard_join",
    "x91_sampled_recall_audit",
    "x52_semantic_dedup_clusters",
    "x93_winsorize_approx_audit",
    "x75_dedup_savings",
    "x83_ann_recall",
    "x06_ngram_jaccard",
    "q59_gradual_drift_experiment",
    "x76_incremental_dedup",
    "x23_dedup_clusters",
    "x64_mmd_drift",
    "x65_ks_drift",
    "x80_neardup_decontam",
    "x56_winsorize",
    "x62_crossdoc_ngrams",
    "x71_textrank",
    "x49_containment_pairs",
    "q60_unsupervised_drift_experiment",
    "x04_minhash_pairs",
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or DEFAULT_QUERIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    from detecting_and_addressing_change_spark.plans.inspect import (
        explain_str,
    )
    from detecting_and_addressing_change_spark.queries import QUERIES
    from detecting_and_addressing_change_spark.session import get_spark

    spark = get_spark(app_name="capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(REPO_ROOT, "plans", os.environ.get("PLANS_ROUND", "r18"))
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        spark.sparkContext.setJobDescription(f"plan-capture {name}")
        df = QUERIES[name](spark, sf_dir)
        txt = explain_str(df, "formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(txt)
        n_exch = txt.count("Exchange")
        print(f"{name}: {n_exch} Exchange mentions -> {path}")


if __name__ == "__main__":
    main()
