"""Batch parquet sinks, designed for the 100 TB write path.

The reference persists artifacts with ``torch.save`` / ad-hoc ``.pt`` files
(S3 embedding materializer, `streams/transform_data.py:15-44`; S6 model
checkpoints, `models/wos_train_lstm.py:60-68`). The Spark-native
equivalents are columnar table writes; this module fixes the three layout
decisions that dominate read performance at scale:

- **Partition columns** (`write_partitioned`) — directory-level pruning:
  a reader filtering on the partition column never opens the other
  directories. One `repartition(partition_cols)` before the write keeps
  it to ONE file per partition per final task instead of
  (input_tasks x partitions) small files — the classic small-file bomb.
- **In-file sort** (`sort_cols`) — parquet min/max row-group statistics
  become selective, so predicate pushdown skips row groups (zone-map
  effect) even within a partition.
- **Bucketing** (`write_bucketed_table`) — pre-shuffled layout: two tables
  bucketed on the same key into the same bucket count join WITHOUT a
  shuffle (SortMergeJoin with zero Exchange — asserted in
  tests/test_sinks.py). At 100 TB this converts every recurring
  fact⋈fact join from a full network shuffle into a local merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Hive-style partitioned parquet write with small-file control.

    Repartitions on the partition columns first (one shuffle) so each
    output directory is written by exactly the tasks that own it, then
    optionally sorts within partitions so row-group min/max stats are
    tight for `sort_cols` predicates."""
    out = df.repartition(*partition_cols)
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    out.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    path: str,
    bucket_col: str,
    n_buckets: int,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write `df` as an external bucketed table (metastore entry `table`,
    data at `path`). Joining two tables bucketed on the same column into
    the same `n_buckets` requires no Exchange on either side; a
    `sort_col` additionally removes the per-task Sort under SortMergeJoin."""
    w = (
        df.write.mode(mode)
        .option("path", path)
        .bucketBy(n_buckets, bucket_col)
    )
    if sort_col is not None:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)


def compact(
    df: DataFrame,
    path: str,
    target_partitions: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Small-file compaction: coalesce (no shuffle) to `target_partitions`
    output files, optionally sorted within each for zone-map locality.
    The maintenance pass every long-lived 100 TB table needs after
    streaming/incremental appends."""
    out = df.coalesce(target_partitions)
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    out.write.mode(mode).parquet(path)
