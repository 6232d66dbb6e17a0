"""Pin the sweep-cost budget against the SWEEP_BUDGET.json artifact
(VERDICT r12 #5).

tools/sweep_budget.py measures the full-registry oracle sweep (the same
compare the driver's CORRECTNESS gate runs) and records per-query cold
(first-touch, what the driver gate pays) and warm (second identical
compare, the steadier number the BENCH_NOTES trim policy is defined on)
wall seconds. These tests make a cost regression — like x109's 3x drift
in r11, which only a judge re-measurement caught — fail the suite
instead of hiding in prose.

The artifact is regenerated each round; the coverage test flags a stale
artifact (new queries not yet measured) too.
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parents[1]
ARTIFACT = REPO_ROOT / "SWEEP_BUDGET.json"

# Justified standing audits allowed past the default warm ceiling, each
# with its BENCH_NOTES rationale. Pins sit ~1.5x above measured warm so
# genuine drift (not machine wander) trips them.
JUSTIFIED_WARM_PINS_S = {
    # audits BOTH candidate routes plus the exact volume pre-flight
    "x90_adaptive_similarity_join": 25.0,
    # fine-tune session: bounded 4x32-doc prequential loop + 3 scoring
    # passes; constant batch count at every scale by construction.
    # Warm measured 12.5-13.0 s under the r14 hygiene-on sweep protocol
    # (the r13 35 s "late-session aging" pin is GONE — the A/B
    # measurement in BENCH_NOTES r14 showed the aging was accumulated
    # in-session state, which the sweep's hygiene step now releases);
    # pin = ~1.5x measured warm.
    "x103_finetune_adaptation_audit": 20.0,
    # RAG build replayed in both engines (chunk->embed->kmeans->index)
    "x109_rag_retrieval": 22.0,
    # takedown E2E: 2 curate epochs + delete + surgical rewrite +
    # re-ingest — the registry's most JOB-DENSE query (~60 driver
    # jobs), which made it the canary for the in-session accumulation
    # the hygiene step now clears (43.2 s warm without hygiene, 14.6 s
    # with — BENCH_NOTES r14). Pin = ~1.5x the 14.6 s hygiene-protocol
    # warm; the r13 35 s aging pin is gone.
    "x101_takedown_verdict": 22.0,
    # large-star/small-star CC + LSH edge build (rounds measured flat)
    "x52_semantic_dedup_clusters": 18.0,
    # trainer-from-shards streaming session (r15): 5 shard-group
    # micro-batches, each = stats agg + the PrequentialNB test-then-
    # train jobs, plus the dual-path final predict — a ~15-job
    # streaming floor, constant in corpus size by construction (the
    # batch count is fixed; k files/trigger scales with the layout).
    # Measured 15.1 s warm at the r15 close (already trimmed 8 -> 5
    # groups); pin = ~1.3x measured warm.
    "x125_train_from_shards_nb": 20.0,
    # curation-stream replay: 2 streaming epochs + a mid-stream
    # redelivery, ~20 fixed driver jobs (decomposed BENCH_NOTES r9) —
    # constant in corpus size. Measured 12.1 s warm r15 / 16.0 s
    # STANDALONE r16 (the r16 box runs job-dense queries 10-30% hotter
    # — BENCH_NOTES r16 receipts); pin = ~1.4x the r16 standalone,
    # consistent with its x101/x103 siblings.
    "x98_curation_stream_verdict": 22.0,
    # checkpoint-recovery suite (r17 fold of the x113/x114/x115 trio,
    # VERDICT r16 #2): all three built-in state shapes killed + resumed
    # from their checkpoints, each phase's three incarnations drained
    # CONCURRENTLY — still 15 micro-batch triggers with per-batch state
    # commits (the batch boundaries ARE the attestation), constant in
    # corpus size. Warm measured 19.7 s standalone at the fold vs
    # 27.6 s summed for the three pre-fold rows (15.82 s in the first
    # post-fold sweep); pin = ~1.4x measured.
    "x113_checkpoint_recovery_verdict": 28.0,
    # uninterrupted stateful-stream suite (r17 fold of x110/x111/x112,
    # same mechanism): three real stateful streaming queries (window
    # agg, dedup horizon, stream-stream join) drained concurrently —
    # the join commits state per side per batch, 4-5 staged files per
    # shape, constant in corpus size. Warm measured 13.6 s standalone
    # at the fold vs ~19 s summed pre-fold; pin = ~1.4x measured.
    "x110_stateful_stream_verdicts": 19.0,
}


@pytest.fixture(scope="module")
def budget():
    if not ARTIFACT.exists():
        pytest.skip("SWEEP_BUDGET.json not generated yet "
                    "(run tools/sweep_budget.py)")
    return json.loads(ARTIFACT.read_text())


def _norm(budget) -> float:
    """Probe normalization factor: the ceilings are defined on the r14
    reference box, and the normalizer is the MEDIAN of the in-sweep
    probe series (stable across rounds: 0.839 r14 / 0.831 r15 on boxes
    whose point-sample calib wandered 0.55-0.89 — BENCH_NOTES r15
    policy), so raw wall is scaled by probe_ref/probe_median before
    comparing. Artifacts predating the field compare raw (factor 1)."""
    pm = budget.get("probe_median_sec")
    ref = budget.get("probe_ref_sec", 0.839)
    return (ref / pm) if pm else 1.0


def test_no_warm_row_over_ceiling(budget):
    default = budget["per_query_warm_ceiling_sec"]
    k = _norm(budget)
    over = {
        n: round(s * k, 2) for n, s in budget["warm"].items()
        if s * k > JUSTIFIED_WARM_PINS_S.get(n, default)
    }
    assert not over, (
        f"warm sweep rows over their ceilings (calib-normalized, "
        f"factor {k:.3f}) — trim inside their own fixtures "
        f"(BENCH_NOTES policy): {over}"
    )


def test_cold_total_under_gate_ceiling(budget):
    k = _norm(budget)
    normalized = budget["total_cold_sec"] * k
    assert normalized < budget["total_cold_ceiling_sec"], (
        f"full-registry cold sweep {budget['total_cold_sec']}s raw = "
        f"{normalized:.1f}s calib-normalized exceeds the "
        f"{budget['total_cold_ceiling_sec']}s gate ceiling — the "
        "driver gate is accreting cost faster than the policy allows"
    )


def test_sweep_was_green(budget):
    assert budget["n_failed"] == 0, budget["failures"]


def test_artifact_covers_registry(budget):
    from detecting_and_addressing_change_spark.queries import QUERIES

    missing = sorted(set(QUERIES) - set(budget["cold"]))
    assert not missing, (
        "queries registered but absent from SWEEP_BUDGET.json — regenerate "
        f"with tools/sweep_budget.py: {missing}"
    )
