"""Changelog application (CDC upsert): latest-wins merge with deletes.

Long-lived 100 TB tables are maintained incrementally: a base snapshot
plus a stream of keyed upserts/deletes, periodically compacted into the
next snapshot. The merge is one window: rank change rows per key by
version descending, keep rank 1, drop rows whose winning op is a delete.
One shuffle on the key — and if base and changelog are both bucketed on
the key (sinks/parquet.py), even that shuffle disappears.

Deterministic given unique (key, version) pairs, hence
DuckDB-oracle-checkable (x25). No reference counterpart (the reference
regenerates its datasets whole — SURVEY §1.2); extension family §2.9.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def apply_changelog(
    changes: DataFrame,
    key_cols: list[str],
    version_col: str = "version",
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Reduce a changelog (base rows + upserts + deletes, all unioned)
    to the current snapshot: per key, the highest-version row wins; a
    winning delete removes the key. Ties are a data error — make
    versions unique per key upstream."""
    w = Window.partitionBy(*key_cols).orderBy(F.desc(version_col))
    return (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .filter(F.col(op_col) != delete_op)
        .drop("__rn", version_col, op_col)
    )
