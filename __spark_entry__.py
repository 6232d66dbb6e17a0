"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

The actual engine lives in ``detecting_and_addressing_change_spark/``;
this module only adapts its query registry to the driver's calling
convention.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# make the engine importable no matter where the driver loads this file from
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the full abrupt-drift
    experiment (SURVEY §3.2 — embed -> pool -> NB train/score -> windowed
    accuracy -> DDM across the embedding-swap seam), i.e. the reference's
    headline workload end-to-end, fully DuckDB-oracle-checked (q39)."""
    from detecting_and_addressing_change_spark.queries import QUERIES

    return QUERIES["q39_abrupt_drift_experiment"](
        spark, "/root/testdata/sf0.001"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator/query from SURVEY.md §2."""
    from detecting_and_addressing_change_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query; queries
    missing here (DDM, LSH-plane ANN) get the driver's rows-only check."""
    from detecting_and_addressing_change_spark.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
