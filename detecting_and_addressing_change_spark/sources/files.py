"""Text-format file sources: CSV and JSON-Lines with explicit schemas.

The reference ingests its corpus from pickled/pt artifacts
(`streams/loaders.py:26-34`); the Spark-native front door for raw drops is
splittable text formats. Two rules carried through every reader here,
both of which matter enormously at 100 TB:

- **Never infer schemas.** `inferSchema`/schema-less JSON is a FULL extra
  pass over the data before the real one, and the inferred types drift
  between drops. Every reader takes an explicit `StructType` (or DDL
  string), which also enables predicate pushdown with correct types from
  the first scan.
- **Quarantine, don't crash.** A 100 TB drop always contains malformed
  rows. PERMISSIVE mode + a `_corrupt` capture column keeps the scan
  alive and makes the bad rows queryable (route them to a reject sink);
  FAILFAST is opt-in for contract-enforced inputs.

JSONL and CSV are line-splittable, so a single large file still fans out
across executors (unlike e.g. gzip — compressed inputs should be zstd/lz4
or pre-split).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType


def _with_corrupt(schema: StructType | str, corrupt_col: str) -> StructType | str:
    if isinstance(schema, str):
        return f"{schema}, {corrupt_col} STRING"
    return StructType(
        list(schema.fields) + [StructField(corrupt_col, StringType(), True)]
    )


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    header: bool = True,
    strict: bool = False,
    corrupt_col: str = "_corrupt",
) -> DataFrame:
    """CSV with explicit schema. `strict=True` -> FAILFAST (contract
    inputs); default PERMISSIVE with malformed lines captured whole in
    `corrupt_col` (quarantine pattern)."""
    reader = (
        spark.read.option("header", str(header).lower())
        .option("mode", "FAILFAST" if strict else "PERMISSIVE")
    )
    if not strict:
        reader = reader.option("columnNameOfCorruptRecord", corrupt_col)
        schema = _with_corrupt(schema, corrupt_col)
    return reader.schema(schema).csv(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    strict: bool = False,
    corrupt_col: str = "_corrupt",
) -> DataFrame:
    """JSON-Lines with explicit schema (one object per line — the only
    JSON layout that splits across executors; multiline JSON arrays are
    single-task reads and banned here)."""
    reader = spark.read.option("mode", "FAILFAST" if strict else "PERMISSIVE")
    if not strict:
        reader = reader.option("columnNameOfCorruptRecord", corrupt_col)
        schema = _with_corrupt(schema, corrupt_col)
    return reader.schema(schema).json(path)


def quarantine_split(
    df: DataFrame, corrupt_col: str = "_corrupt"
) -> tuple[DataFrame, DataFrame]:
    """Split a PERMISSIVE read into (clean_rows_without_capture_col,
    quarantined_full_rows). The quarantine side keeps every column, not
    just the raw line — partly for triage, partly because Spark refuses
    raw-file queries that reference ONLY the internal corrupt-record
    column (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — and column pruning turns
    an innocent `clean.count()` into exactly that query. The documented
    escape is materializing the parse first: cache here (both splits
    share one scan); at 100 TB stage the parsed read to a parquet sink
    instead and split from there."""
    df = df.cache()
    clean = df.filter(df[corrupt_col].isNull()).drop(corrupt_col)
    bad = df.filter(df[corrupt_col].isNotNull())
    return clean, bad


def read_parquet_evolved(
    spark,
    paths: list[str],
    target_schema: StructType,
):
    """Read parquet written under an EVOLVING schema (columns added over
    time) against one explicit target schema.

    Long-lived 100 TB tables accrete columns; old files simply lack the
    new ones. ``mergeSchema`` reconciles the footers (added columns come
    back NULL for old files), then the explicit select pins order, types,
    and presence — so downstream code sees ONE stable contract regardless
    of which file vintage a partition came from. Dropping or renaming
    columns is NOT reconciled here by design: that needs a rewrite (or a
    table format with column mapping), and silently nulling a renamed
    column is the failure mode this helper exists to prevent — it raises
    instead."""
    from pyspark.sql import functions as F

    df = spark.read.option("mergeSchema", "true").parquet(*paths)
    missing = [f.name for f in target_schema.fields if f.name not in df.columns]
    if missing:
        raise ValueError(
            f"target columns absent from every file: {missing}; a rename "
            "needs a rewrite, not schema merge"
        )
    return df.select(
        *[
            F.col(f.name).cast(f.dataType).alias(f.name)
            for f in target_schema.fields
        ]
    )
