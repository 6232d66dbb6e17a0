"""Determinism harness (SURVEY §5.2.4): representative queries produce
byte-identical sorted output across repeated runs and across partition
counts / shuffle settings."""

from __future__ import annotations

import pytest

from detecting_and_addressing_change_spark.queries import QUERIES

from .conftest import SF_SMOKE

REPRESENTATIVE = [
    "q04_word_count_topk",
    "q12_grouped_agg",
    "q22_hash_split",
    "q28_nb_fit_predict",
    "x03_minhash_bands",
    "x05_simhash",
    "x13_rolling_fingerprint",
    "q33_seeded_noise_gate",
    # round-7 families: approximate-but-deterministic estimators and the
    # exact similarity join (its candidate pruning must not leak
    # partitioning into results)
    "x84_prefix_jaccard_join",
    # (x85 folded into x89 round 16 — the register estimator's
    # determinism rides the x89 row below)
    "x86_join_size_estimate",
    "x89_hll_rollup",
    # round-8 families: the routing decision + both routes' pair-set
    # fingerprints, the hash-sampled audit, the attention-encoder
    # forward, and the rank-space approx-percentile verdicts (the last
    # is the one place an ENGINE-nondeterministic sketch value feeds the
    # output — the verdicts must absorb it)
    "x90_adaptive_similarity_join",
    "x91_sampled_recall_audit",
    "x92_transformer_embed",
    "x93_winsorize_approx_audit",
]


def canonical(df):
    cols = sorted(df.columns)
    rows = [tuple(str(v) for v in r) for r in df.select(*cols).collect()]
    return sorted(rows)


@pytest.mark.parametrize("name", REPRESENTATIVE)
def test_repeatable(spark, name):
    a = canonical(QUERIES[name](spark, SF_SMOKE))
    b = canonical(QUERIES[name](spark, SF_SMOKE))
    assert a == b, name


def test_shuffle_partition_invariance(spark):
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        low = canonical(QUERIES["q12_grouped_agg"](spark, SF_SMOKE))
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        high = canonical(QUERIES["q12_grouped_agg"](spark, SF_SMOKE))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert low == high
