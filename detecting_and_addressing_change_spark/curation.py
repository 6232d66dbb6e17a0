"""Materializing curation run: the x55 verdict applied to the corpus and
WRITTEN, not just reported.

``curate_corpus`` is the batch job a data team schedules: compute the
per-document keep verdict in one plan (exact-dup canonical ∧ benchmark
split exclusion ∧ quality bands ∧ decontamination — see
``queries/extensions7.curation_verdicts``), write the survivors as
source-partitioned parquet sorted by doc_id (tight zone maps for id-range
reads), and write the per-source stats next to them as the run's audit
record. Scale shape: the verdict plan's one digest shuffle + broadcast
gram join + doc_id-keyed joins (x55's plan, unchanged), then ONE
partitioned write; stats are |sources| rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries.extensions7 import curation_verdicts
from .sinks.parquet import write_partitioned


def curate_corpus(docs: DataFrame, out_path: str) -> DataFrame:
    """Run the curation verdict over ``docs`` and materialize:

    - ``{out_path}/corpus``: kept documents (full original columns),
      hive-partitioned by source, sorted by doc_id within files.
    - ``{out_path}/stats``: per-source (n_docs, n_kept, kept_frac,
      kept_tokens) — the same numbers x55 reports.

    Returns the stats DataFrame (read back from disk, so the caller sees
    exactly what the audit record says)."""
    verdicts = curation_verdicts(docs)
    kept = docs.join(
        verdicts.filter(F.col("keep") == 1).select("doc_id"), "doc_id"
    )
    write_partitioned(
        kept, f"{out_path}/corpus", ["source"], sort_cols=["doc_id"]
    )
    stats = (
        verdicts.groupBy("source")
        .agg(
            F.count("*").cast("int").alias("n_docs"),
            F.sum("keep").cast("int").alias("n_kept"),
            (F.sum("keep") * F.lit(1.0) / F.count("*")).alias("kept_frac"),
            F.sum(F.col("keep") * F.col("nw")).cast("int").alias(
                "kept_tokens"
            ),
        )
    )
    stats.coalesce(1).write.mode("overwrite").parquet(f"{out_path}/stats")
    return docs.sparkSession.read.parquet(f"{out_path}/stats")


def load_curated(spark: SparkSession, out_path: str) -> DataFrame:
    """The kept corpus back, partition-prunable on source."""
    return spark.read.parquet(f"{out_path}/corpus")
