"""Skew-guarded blocked fuzzy join (operators/fuzzy.py; VERDICT r2 #7):
pathological blocks must produce a LINEAR (not quadratic) candidate count,
and unskewed blocks must behave exactly like plain blocking."""

from __future__ import annotations

import pytest

from detecting_and_addressing_change_spark.operators.fuzzy import (
    fuzzy_join_blocked,
)


def test_pathological_block_bounded(spark):
    """One block of 1000 rows sharing the first word: plain blocking makes
    ~500k candidate pairs; the guard (md5 tier + cap 64) must keep the
    match count at most linear in width: ceil(w/cap) * C(cap, 2)."""
    cap = 64
    n = 1000
    rows = [(i, "shared", f"shared suffix {i:04d}") for i in range(n)]
    d = spark.createDataFrame(rows, "doc_id long, blk string, pfx string")
    out = fuzzy_join_blocked(
        d, id_col="doc_id", blk_col="blk", key_col="pfx",
        max_dist=24, block_cap=cap,
    )
    got = out.count()
    import math

    bound = math.ceil(n / cap) * cap * (cap - 1) // 2
    assert got <= bound  # linear-in-width bound
    assert got > 0  # and the guard still finds matches
    # strictly better than the quadratic candidate count
    assert got < n * (n - 1) // 2 / 4


def test_unskewed_blocks_unchanged(spark):
    """Blocks under the cap keep the plain-blocking result exactly."""
    rows = [
        (1, "a", "alpha one"),
        (2, "a", "alpha two"),
        (3, "a", "alpha ten"),
        (4, "b", "beta one"),
        (5, "b", "gamma completely different"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, blk string, pfx string")
    out = fuzzy_join_blocked(
        d, id_col="doc_id", blk_col="blk", key_col="pfx",
        max_dist=4, block_cap=64,
    )
    got = sorted((r["a_id"], r["b_id"], r["dist"]) for r in out.collect())
    # all 'a' pairs within distance 4 ("two"<->"ten" is 2 edits); the 'b'
    # pair is too far
    assert got == [(1, 2, 3), (1, 3, 3), (2, 3, 2)]


def test_identical_texts_hard_capped(spark):
    """Identical match text cannot be split by content hashing — the hard
    rank cap must still bound the pair count."""
    cap = 8
    n = 100
    rows = [(i, "dup", "same exact text") for i in range(n)]
    d = spark.createDataFrame(rows, "doc_id long, blk string, pfx string")
    out = fuzzy_join_blocked(
        d, id_col="doc_id", blk_col="blk", key_col="pfx",
        max_dist=0, block_cap=cap,
    )
    import math

    assert out.count() <= math.ceil(n / cap) * cap * (cap - 1) // 2
