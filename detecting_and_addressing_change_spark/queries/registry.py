"""Registry mapping query name -> (Spark callable, DuckDB oracle SQL).

The driver contract (``__spark_entry__.py``) needs two dicts:
``queries()[name](spark, sf_dir) -> DataFrame`` and ``oracle_sql()[name]``.
Each query here is implemented with the DataFrame API (the engine's own
operators), never by just executing the oracle SQL text in Spark.

Column-name discipline: every computed column is aliased identically in the
Spark code and the oracle SQL (the driver sorts columns by name before
hashing values).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE_SQL: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query. ``oracle=None`` => non-SQL-expressible op; the
    driver records a weaker rows-only check for it."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn

    return deco
