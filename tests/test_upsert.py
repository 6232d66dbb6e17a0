"""Changelog upsert (operators/upsert.py): latest version wins, deletes
remove the key, untouched base rows survive."""

from __future__ import annotations

from detecting_and_addressing_change_spark.operators.upsert import (
    apply_changelog,
)


def test_apply_changelog(spark):
    chg = spark.createDataFrame(
        [
            (1, "a", 1, "U"),  # survives untouched
            (2, "b", 1, "U"),  # overridden by v2
            (2, "b2", 2, "U"),
            (3, "c", 1, "U"),  # deleted at v3
            (3, "c2", 2, "U"),
            (3, None, 3, "D"),
            (4, "d", 5, "U"),  # delete then re-insert at higher version
            (4, None, 2, "D"),
        ],
        ["k", "val", "version", "op"],
    )
    got = {r.k: r.val for r in apply_changelog(chg, ["k"]).collect()}
    assert got == {1: "a", 2: "b2", 4: "d"}
