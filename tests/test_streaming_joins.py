"""Structured Streaming join + dedup surface:

- stream⋈static enrichment (the T1 scoring stream joined to a dim table —
  broadcast per micro-batch, no stream state),
- stream⋈stream inner join under watermarks with an event-time range
  bound (the bound is what lets Spark expire join state — without it
  both sides buffer forever at scale),
- exact streaming dedup via dropDuplicatesWithinWatermark (the streaming
  arm of the x01 exact-dedup family).

Each must reproduce its batch equivalent on the ordered events replay."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from detecting_and_addressing_change_spark.sources.tables import load_table
from detecting_and_addressing_change_spark.streaming.replay import (
    read_replay_stream,
    stage_replay_files,
)

SF = "/root/testdata/sf0.001"
EV_DDL = "event_id long, ts timestamp, event_type string, value double"


def _events(spark):
    return load_table(spark, SF, "events").select(
        "event_id", "ts", "event_type", "value"
    )


def _run(stream_df, tmp, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", f"{tmp}/ckpt_{name}")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def test_stream_static_enrichment_matches_batch(spark):
    ev = _events(spark)
    dim = spark.createDataFrame(
        [("click", 1.0), ("view", 0.1), ("purchase", 10.0)],
        ["event_type", "weight"],
    )
    batch_cnt = ev.join(F.broadcast(dim), "event_type").count()
    with tempfile.TemporaryDirectory() as tmp:
        stage_replay_files(ev, "event_id", f"{tmp}/s", batch_size=256)
        stream = read_replay_stream(spark, f"{tmp}/s", EV_DDL)
        _run(stream.join(F.broadcast(dim), "event_type"), tmp, "enrich")
        got = spark.sql("SELECT COUNT(*) c FROM enrich").first()["c"]
    assert got == batch_cnt
    assert batch_cnt > 0


def test_stream_stream_join_matches_batch(spark):
    ev = _events(spark).limit(2000)
    with tempfile.TemporaryDirectory() as tmp:
        stage_replay_files(ev, "event_id", f"{tmp}/a", batch_size=256)
        stage_replay_files(ev, "event_id", f"{tmp}/b", batch_size=512)
        a = read_replay_stream(spark, f"{tmp}/a", EV_DDL).select(
            F.col("event_id").alias("a_id"), F.col("ts").alias("a_ts")
        )
        b = read_replay_stream(spark, f"{tmp}/b", EV_DDL).select(
            F.col("event_id").alias("b_id"),
            F.col("ts").alias("b_ts"),
            "value",
        )
        joined = (
            a.withWatermark("a_ts", "1 hour")
            .join(
                b.withWatermark("b_ts", "1 hour"),
                F.expr(
                    "a_id = b_id AND "
                    "b_ts BETWEEN a_ts - INTERVAL 1 HOUR "
                    "AND a_ts + INTERVAL 1 HOUR"
                ),
            )
        )
        _run(joined, tmp, "ssj")
        got = spark.sql("SELECT COUNT(*) c FROM ssj").first()["c"]
    # each event_id occurs exactly once per side -> 1:1 matches
    assert got == ev.count()


def test_drop_duplicates_within_watermark(spark):
    ev = _events(spark).limit(1000)
    doubled = ev.union(ev)  # planted exact duplicates
    with tempfile.TemporaryDirectory() as tmp:
        stage_replay_files(doubled, "event_id", f"{tmp}/d", batch_size=512)
        stream = read_replay_stream(spark, f"{tmp}/d", EV_DDL)
        deduped = stream.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(
            ["event_id"]
        )
        _run(deduped, tmp, "dedup")
        got = spark.sql("SELECT COUNT(DISTINCT event_id) c, COUNT(*) n FROM dedup").first()
    assert got["n"] == ev.count()
    assert got["c"] == got["n"]
