"""Distributed global ranking — total order without the single-partition
window.

``ROW_NUMBER() OVER (ORDER BY ...)`` with no PARTITION BY sends every row
through ONE task; at 100 TB that is the canonical anti-pattern. Global
ranks decompose: range-partition on the sort key (disjoint, ordered key
ranges per partition), sort within partitions, count rows per partition,
broadcast the cumulative offsets, and enumerate each partition locally.
Correctness does not depend on WHERE the sampled range bounds land — any
range-disjoint partitioning plus in-partition sort yields the same total
order — so the sampling inside ``repartitionByRange`` is not a
determinism hazard as long as the ordering itself is total (callers must
include a unique tie-break column).

No reference counterpart (SURVEY §1.2); extension family per §2.9.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _staged_range_partitions(
    df: DataFrame,
    order: list[Column],
    num_partitions: int | None,
    part_aggs: list[Column],
) -> tuple[DataFrame, dict[int, list[int]]]:
    """Shared scaffolding for the global-order operators: range-partition +
    in-partition sort, materialized ONCE (the per-partition agg job and
    the enumeration job must see the exact same partitioning — range
    bounds come from sampling, so recomputing the plan per job would make
    the offsets a race), plus the cumulative per-partition offsets of
    each ``part_aggs`` entry (one tiny row per partition, driver-trivial
    at any data scale). Returns ``(parts_with___pid, offsets_by_pid)``
    with one exclusive-prefix total PER AGG in each pid's list."""
    n_parts = num_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    parts = (
        df.repartitionByRange(n_parts, *order)
        .sortWithinPartitions(*order)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    agg_rows = parts.groupBy("__pid").agg(
        *[a.alias(f"v{i}") for i in range(len(part_aggs)) for a in [part_aggs[i]]]
    ).collect()
    vals = {
        r["__pid"]: [r[f"v{i}"] for i in range(len(part_aggs))]
        for r in agg_rows
    }
    offsets: dict[int, list[int]] = {}
    acc = [0] * len(part_aggs)
    for pid in sorted(vals):
        offsets[pid] = list(acc)
        acc = [a + v for a, v in zip(acc, vals[pid])]
    return parts, offsets


def _with_long_cols(parts: DataFrame, out_cols: list[str]) -> T.StructType:
    return T.StructType(
        parts.drop("__pid").schema.fields
        + [T.StructField(c, T.LongType()) for c in out_cols]
    )


def global_rank(
    df: DataFrame,
    order: list[Column],
    rank_col: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append a 1-based global rank under the given total ordering.

    ``order``: sort expressions (e.g. ``[F.desc('price'), F.asc('id')]``)
    that must define a TOTAL order (include a unique key)."""
    parts, offsets = _staged_range_partitions(
        df, order, num_partitions, [F.count("*")]
    )
    out_schema = _with_long_cols(parts, [rank_col])

    def enumerate_partition(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        seen = 0
        base = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if base is None:
                base = offsets[int(pdf["__pid"].iloc[0])][0]
            pdf = pdf.drop(columns=["__pid"])
            pdf[rank_col] = range(
                base + seen + 1, base + seen + 1 + len(pdf)
            )
            seen += len(pdf)
            yield pdf

    return parts.mapInPandas(enumerate_partition, out_schema)


def grouped_global_rank(
    df: DataFrame,
    group_col: str,
    order: list[Column],
    rank_col: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append a 1-based rank PER GROUP under the given in-group total
    ordering, from ONE range staging over (group, order) — the grouped
    sibling of :func:`global_rank` (r18). Range-partitioning on
    (group, *order) keeps each group a contiguous, ordered key span, so
    the only addition over the ungrouped form is per-(partition, group)
    counts in the offsets table (still one tiny row per partition per
    group crossing it, driver-trivial). A caller ranking k groups
    separately paid the staging — range shuffle, materialization,
    offsets collect — k times for the same data; this pays it once.

    ``order`` must define a TOTAL order within each group (include a
    unique key). Group values must be hashable driver-side."""
    full_order = [F.asc(group_col), *order]
    n_parts = num_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    parts = (
        df.repartitionByRange(n_parts, *full_order)
        .sortWithinPartitions(*full_order)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    agg_rows = parts.groupBy("__pid", group_col).count().collect()
    # offsets[(pid, group)] = rows of `group` in partitions before pid
    running: dict = {}
    offsets: dict = {}
    for r in sorted(agg_rows, key=lambda row: int(row["__pid"])):
        g = r[group_col]
        offsets[(int(r["__pid"]), g)] = running.get(g, 0)
        running[g] = running.get(g, 0) + int(r["count"])
    out_schema = _with_long_cols(parts, [rank_col])

    def enumerate_partition(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        pid = None
        seen: dict = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if pid is None:
                pid = int(pdf["__pid"].iloc[0])
            base = pdf[group_col].map(
                lambda g: seen.get(g, offsets.get((pid, g), 0))
            )
            within = pdf.groupby(group_col, sort=False).cumcount()
            pdf = pdf.drop(columns=["__pid"])
            pdf[rank_col] = (base + within + 1).astype("int64")
            for g, c in pdf[group_col].value_counts().items():
                seen[g] = seen.get(g, offsets.get((pid, g), 0)) + int(c)
            yield pdf

    return parts.mapInPandas(enumerate_partition, out_schema)


def global_cumsum(
    df: DataFrame,
    order: list[Column],
    value_col: str | list[str],
    out_col: str | list[str] = "cumsum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append the INCLUSIVE running sum of ``value_col`` under a total
    ordering — the same anti-single-task decomposition as
    :func:`global_rank` with per-partition SUMs as the offsets. Shuffle
    volume is the range repartition only; the offsets table is
    ``n_partitions`` rows regardless of data scale.

    ``order`` must define a TOTAL order (include a unique key);
    ``value_col`` must be integral and non-null (token counts, byte
    sizes — the pipeline-packing use cases). ``value_col``/``out_col``
    may be LISTS of equal length: all running sums then ride ONE range
    repartition + materialization + offsets collect instead of one full
    pass per column (r17 — x65 chained two calls, paying the whole
    staging twice for two sums over the same ordering)."""
    value_cols = [value_col] if isinstance(value_col, str) else list(value_col)
    out_cols = [out_col] if isinstance(out_col, str) else list(out_col)
    if len(value_cols) != len(out_cols):
        raise ValueError("global_cumsum: value_col/out_col length mismatch")
    parts, offsets = _staged_range_partitions(
        df, order, num_partitions, [F.sum(c) for c in value_cols]
    )
    out_schema = _with_long_cols(parts, out_cols)

    def cumsum_partition(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        running: list[int] | None = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if running is None:
                running = list(offsets[int(pdf["__pid"].iloc[0])])
            pdf = pdf.drop(columns=["__pid"])
            for j, (vc, oc) in enumerate(zip(value_cols, out_cols)):
                csum = pdf[vc].astype("int64").cumsum() + running[j]
                running[j] = int(csum.iloc[-1])
                pdf[oc] = csum
            yield pdf

    return parts.mapInPandas(cumsum_partition, out_schema)
