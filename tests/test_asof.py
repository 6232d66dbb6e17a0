"""As-of join semantics on a handcrafted case: at-or-before visibility,
NULL before any right row, per-key isolation."""

from __future__ import annotations

from detecting_and_addressing_change_spark.operators.asof import as_of_join


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, 5, "a"),
            (1, 10, "b"),
            (1, 15, "c"),
            (2, 10, "d"),
        ],
        "k int, t long, name string",
    )
    right = spark.createDataFrame(
        [
            (1, 4, 40.0),
            (1, 10, 100.0),  # tie: visible to left row at t=10
            (1, 12, 120.0),
            (2, 11, 110.0),  # after left's only row for k=2
        ],
        "k int, rt long, v double",
    )
    out = {
        (r["k"], r["t"]): r["asof_v"]
        for r in as_of_join(
            left, right, key="k", left_time="t", right_time="rt",
            right_value="v",
        ).collect()
    }
    assert out[(1, 5)] == 40.0
    assert out[(1, 10)] == 100.0  # at-or-before includes the tie
    assert out[(1, 15)] == 120.0
    assert out[(2, 10)] is None  # nothing before it for this key
