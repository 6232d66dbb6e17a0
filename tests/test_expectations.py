"""Expectation suite (operators/expectations.py): crafted violations are
counted exactly, per rule class."""

from __future__ import annotations

from detecting_and_addressing_change_spark.operators.expectations import (
    check,
    in_range,
    is_in,
    matches,
    non_negative,
    not_null,
)


def test_violation_counts_exact(spark):
    df = spark.createDataFrame(
        [
            (1, 10.0, "A", "a1"),
            (1, -5.0, "A", "a2"),   # dup key 1; negative
            (2, None, "B", "zz"),   # null price; bad flag; bad code
            (3, 200.0, "N", "b3"),  # out of range
            (None, 7.0, "R", "c4"),  # null key (+ fk orphan)
        ],
        "k int, price double, flag string, code string",
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk int")
    got = {
        r["rule"]: (r["violations"], r["pass"])
        for r in check(
            df,
            rules=[
                not_null("k"),
                not_null("price"),
                in_range("price", 0, 100),
                is_in("flag", ["A", "N", "R"]),
                matches("code", "^[a-c][0-9]$"),
                non_negative("price"),
            ],
            unique_keys=[["k"]],
            foreign_keys=[(["k"], parent, ["pk"])],
        ).collect()
    }
    assert got["not_null(k)"] == (1, False)
    assert got["not_null(price)"] == (1, False)
    # NULL price: between() is NULL -> NOT NULL is NULL -> not counted
    # (null-ness is its own rule); -5 and 200 violate the range
    assert got["in_range(price,0,100)"] == (2, False)
    assert got["is_in(flag)"] == (1, False)
    assert got["matches(code)"] == (1, False)
    assert got["non_negative(price)"] == (1, False)
    assert got["unique(k)"] == (1, False)
    assert got["fk(k)"] == (1, False)


def test_clean_table_passes(spark):
    df = spark.createDataFrame(
        [(1, 1.0), (2, 2.0)], "k int, v double"
    )
    rows = check(
        df,
        rules=[not_null("k"), non_negative("v")],
        unique_keys=[["k"]],
    ).collect()
    assert all(r["pass"] and r["violations"] == 0 for r in rows)
    assert len(rows) == 3
