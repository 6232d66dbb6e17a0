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


def global_rank(
    df: DataFrame,
    order: list[Column],
    rank_col: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append a 1-based global rank under the given total ordering.

    ``order``: sort expressions (e.g. ``[F.desc('price'), F.asc('id')]``)
    that must define a TOTAL order (include a unique key)."""
    n_parts = num_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    # materialized ONCE: the counts job and the rank job below must see the
    # exact same partitioning (range bounds come from sampling; recomputing
    # the plan for each job would make the offsets a race)
    parts = (
        df.repartitionByRange(n_parts, *order)
        .sortWithinPartitions(*order)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    # one tiny row per partition; cumulative offsets broadcast in the
    # closure below (n_parts entries, driver-trivial at any data scale)
    counts = {
        r["__pid"]: r["c"]
        for r in parts.groupBy("__pid").agg(F.count("*").alias("c")).collect()
    }
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    out_schema = T.StructType(
        parts.drop("__pid").schema.fields
        + [T.StructField(rank_col, T.LongType())]
    )

    def enumerate_partition(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        seen = 0
        base = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if base is None:
                base = offsets[int(pdf["__pid"].iloc[0])]
            pdf = pdf.drop(columns=["__pid"])
            pdf[rank_col] = range(
                base + seen + 1, base + seen + 1 + len(pdf)
            )
            seen += len(pdf)
            yield pdf

    return parts.mapInPandas(enumerate_partition, out_schema)


def global_cumsum(
    df: DataFrame,
    order: list[Column],
    value_col: str,
    out_col: str = "cumsum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append the INCLUSIVE running sum of ``value_col`` under a total
    ordering — the same anti-single-task decomposition as
    :func:`global_rank`: range-partition on the sort key, one tiny
    per-partition SUM job, broadcast cumulative offsets, then a local
    cumsum per partition. Shuffle volume is the range repartition only;
    the offsets table is ``n_partitions`` rows regardless of data scale.

    ``order`` must define a TOTAL order (include a unique key);
    ``value_col`` must be integral and non-null (token counts, byte
    sizes — the pipeline-packing use cases)."""
    n_parts = num_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    parts = (
        df.repartitionByRange(n_parts, *order)
        .sortWithinPartitions(*order)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    sums = {
        r["__pid"]: r["s"]
        for r in parts.groupBy("__pid")
        .agg(F.sum(value_col).alias("s"))
        .collect()
    }
    offsets = {}
    acc = 0
    for pid in sorted(sums):
        offsets[pid] = acc
        acc += sums[pid]

    out_schema = T.StructType(
        parts.drop("__pid").schema.fields
        + [T.StructField(out_col, T.LongType())]
    )

    def cumsum_partition(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        running = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if running is None:
                running = offsets[int(pdf["__pid"].iloc[0])]
            pdf = pdf.drop(columns=["__pid"])
            csum = pdf[value_col].astype("int64").cumsum() + running
            running = int(csum.iloc[-1])
            pdf[out_col] = csum
            yield pdf

    return parts.mapInPandas(cumsum_partition, out_schema)
