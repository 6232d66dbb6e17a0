"""Event-time streaming (SURVEY §2.6 closing note): the same tumbling-window
aggregation as batch q34, run as a Structured Streaming query with a
watermark over the replayed events table — stream results must equal batch
results (late-data handling engaged but no data is late in ordered replay).
Also exercises the S3 materializer with partition pruning."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from detecting_and_addressing_change_spark.sources.tables import load_table
from detecting_and_addressing_change_spark.streaming.replay import (
    read_replay_stream,
    stage_replay_files,
)

SF = "/root/testdata/sf0.001"


def test_watermarked_window_stream_matches_batch(spark):
    ev = load_table(spark, SF, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    batch = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("cnt"), F.sum("value").alias("sv"))
        .select(
            F.col("w.start").alias("ws"), "event_type", "cnt", "sv"
        )
    )
    expected = {
        (r["ws"], r["event_type"]): (r["cnt"], round(r["sv"], 6))
        for r in batch.collect()
    }

    with tempfile.TemporaryDirectory() as tmp:
        staged = f"{tmp}/staged"
        stage_replay_files(ev, "event_id", staged, batch_size=256)
        stream = read_replay_stream(
            spark,
            staged,
            "event_id long, ts timestamp, event_type string, value double",
        )
        agg = (
            stream.withWatermark("ts", "2 hours")
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count("*").alias("cnt"), F.sum("value").alias("sv"))
            .select(
                F.col("w.start").alias("ws"), "event_type", "cnt", "sv"
            )
        )
        q = (
            agg.writeStream.format("memory")
            .queryName("evw")
            .outputMode("complete")
            .option("checkpointLocation", f"{tmp}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = {
            (r["ws"], r["event_type"]): (r["cnt"], round(r["sv"], 6))
            for r in spark.sql("SELECT * FROM evw").collect()
        }
    assert got == expected


def test_materialized_embeddings_partition_pruning(spark):
    from detecting_and_addressing_change_spark.operators.embedder import (
        materialize_embeddings,
    )
    from detecting_and_addressing_change_spark.plans.inspect import explain_str

    docs = load_table(spark, SF, "documents").limit(20)
    with tempfile.TemporaryDirectory() as tmp:
        path = f"{tmp}/emb"
        materialize_embeddings(
            docs, path, models=("BERT", "SCIBERT"), dim=4
        )
        tbl = spark.read.parquet(path)
        assert tbl.select("model").distinct().count() == 2
        one = tbl.filter(F.col("model") == "BERT")
        s = explain_str(one)
        # partition pruning: the model predicate must land in
        # PartitionFilters, not PushedFilters
        assert "PartitionFilters" in s
        part = s.split("PartitionFilters")[1][:200]
        assert "model" in part
        assert one.count() == 20
