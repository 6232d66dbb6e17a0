"""Materializing curation run (curation.py): the written corpus and audit
stats agree with the x55 report, and the output is partition-prunable."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from detecting_and_addressing_change_spark.curation import (
    curate_corpus,
    load_curated,
)
from detecting_and_addressing_change_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_curate_corpus_matches_x55_report(spark):
    from detecting_and_addressing_change_spark.queries import QUERIES

    docs = load_table(spark, SF, "documents")
    report = {
        r["source"]: (r["n_docs"], r["n_kept"], r["kept_tokens"])
        for r in QUERIES["x55_curation_pipeline"](spark, SF).collect()
    }
    with tempfile.TemporaryDirectory() as tmp:
        stats = {
            r["source"]: (r["n_docs"], r["n_kept"], r["kept_tokens"])
            for r in curate_corpus(docs, f"{tmp}/run").collect()
        }
        assert stats == report

        kept = load_curated(spark, f"{tmp}/run")
        # every original column survives; only kept docs are present
        assert set(kept.columns) == set(docs.columns)
        per_source = {
            r["source"]: r["n"]
            for r in kept.groupBy("source")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        for src, (_, n_kept, _) in report.items():
            assert per_source.get(src, 0) == n_kept, src

        # hive partition dirs exist -> source predicates prune at the scan
        dirs = {
            d for d in os.listdir(f"{tmp}/run/corpus")
            if d.startswith("source=")
        }
        assert dirs, "expected source= partition directories"
        one = sorted(dirs)[0].split("=", 1)[1]
        s = kept.filter(F.col("source") == one)._jdf.queryExecution().toString()
        assert "PartitionFilters" in s
