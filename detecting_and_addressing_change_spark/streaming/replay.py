"""Ordered replay of a bounded table as a micro-batched stream (SURVEY §2.1
S7: the reference's pull-based ``WOSStream`` cursor with ``next_sample`` /
``restart``, ``streams/stream_data.py:79-203``).

A parquet table becomes a file-source stream by re-bucketing it into many
small files ordered by ``seq_id`` and reading with ``maxFilesPerTrigger=1``:
each micro-batch is one contiguous slice — the Spark equivalent of
``next_sample(batch_size)``. ``restart()`` is a fresh query with a fresh
checkpoint dir.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stage_replay_files(
    df: DataFrame,
    seq_col: str,
    out_dir: str,
    batch_size: int = 512,
    start_index: int = 0,
) -> int:
    """Write df as one parquet file per floor(seq/batch_size) bucket so a
    file-source stream replays it in order. Returns the bucket count.

    Files are named by zero-padded bucket id; Spark's file source lists new
    files in path order, so with maxFilesPerTrigger=1 micro-batch i contains
    exactly bucket i. ``start_index`` offsets the bucket names so a LATER
    staging into the same directory (new data arriving after a stream
    restart) never clashes with already-consumed files."""
    buckets = (
        df.withColumn("__bucket", F.floor(F.col(seq_col) / batch_size))
        .repartition("__bucket")
        .persist()
    )
    n = buckets.agg(F.max("__bucket")).collect()[0][0] + 1
    for b in range(n):
        (
            buckets.filter(F.col("__bucket") == b)
            .drop("__bucket")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(out_dir, f"bucket={start_index + b:06d}"))
        )
    buckets.unpersist()
    return int(n)


def read_replay_stream(
    spark: SparkSession,
    staged_dir: str,
    schema,
    files_per_trigger: int = 1,
) -> DataFrame:
    """File-source stream over the staged buckets, one bucket per trigger."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", files_per_trigger)
        .option("recursiveFileLookup", "true")
        .parquet(staged_dir)
    )
