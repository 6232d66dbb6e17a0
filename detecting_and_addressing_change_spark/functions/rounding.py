"""Portable float rounding for the oracle contract.

Spark's ROUND(double, n) routes through java.math.BigDecimal.valueOf — it
rounds the double's shortest DECIMAL string with HALF_UP — while DuckDB
rounds the binary value, so values at a .xx5 boundary diverge (observed:
AVG -> 152741.235 rounds to .24 in Spark, .23 in DuckDB).

The contract therefore pins rounding to pure double arithmetic that both
engines execute bit-identically:

    portable_round(x, n) = FLOOR(x * 10^n + 0.5) / 10^n

Every float-valued oracle-query output uses this on BOTH sides.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def portable_round(col: Column, digits: int) -> Column:
    factor = float(10**digits)
    return F.floor(col * factor + 0.5) / factor


def portable_round_sql(expr: str, digits: int) -> str:
    factor = float(10**digits)
    return f"FLOOR(({expr}) * {factor} + 0.5) / {factor}"
