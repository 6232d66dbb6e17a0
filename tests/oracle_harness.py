"""Driver-style comparison harness: run a Spark query and its DuckDB oracle
on the same parquet tables, then compare row count + (order-insensitive)
values. Used by tests/test_oracle_queries.py at sf0.001/sf0.01 — the same
check the driver's CORRECTNESS gate performs.
"""

from __future__ import annotations

import math
from datetime import date, datetime

import duckdb
import pandas as pd

from detecting_and_addressing_change_spark.sources.tables import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _norm_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "∅"
        # floats in the contract are rounded at the query boundary; repr of
        # the exact double catches any residual mismatch
        return repr(v)
    if isinstance(v, (pd.Timestamp, datetime)):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (int,)):
        return str(v)
    return str(v)


def canonical_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        out.append(tuple(_norm_cell(v) for v in row))
    out.sort()
    return out


def compare(spark_df, oracle: str, sf_dir: str) -> None:
    con = duck_connection(sf_dir)
    expected = con.sql(oracle).df()
    actual = spark_df.toPandas()
    assert sorted(actual.columns) == sorted(expected.columns), (
        f"column mismatch: spark={sorted(actual.columns)} "
        f"duck={sorted(expected.columns)}"
    )
    assert len(actual) == len(expected), (
        f"row count mismatch: spark={len(actual)} duck={len(expected)}"
    )
    a = canonical_rows(actual)
    e = canonical_rows(expected)
    if a != e:
        diffs = [(x, y) for x, y in zip(a, e) if x != y][:5]
        raise AssertionError(
            f"value mismatch; first diffs (spark, duck): {diffs}"
        )
