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


def test_session_window_stream_matches_batch(spark):
    """q47's native session windows (5-min gap) under Structured Streaming:
    append-mode emission gated by the watermark must equal the batch run.
    Two far-future sentinel buckets advance the watermark past every real
    session (append mode only emits a session once the watermark passes its
    end) and then flush them in a following non-empty micro-batch."""
    import datetime

    ev = load_table(spark, SF, "events").select("event_id", "user_id", "ts")
    batch = (
        ev.groupBy("user_id", F.session_window("ts", "5 minutes"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("ss"),
            F.col("session_window.end").alias("se"),
            "n_events",
        )
    )
    expected = {
        (r["user_id"], r["ss"], r["se"], r["n_events"])
        for r in batch.collect()
    }

    mx = ev.agg(
        F.max("event_id").alias("mid"), F.max("ts").alias("mts")
    ).collect()[0]
    batch_size = 256
    base = (mx["mid"] // batch_size + 1) * batch_size
    sentinels = spark.createDataFrame(
        [
            (base, -1, mx["mts"] + datetime.timedelta(days=1)),
            (base + batch_size, -1, mx["mts"] + datetime.timedelta(days=2)),
        ],
        "event_id long, user_id long, ts timestamp",
    )
    staged_df = ev.unionByName(sentinels)

    with tempfile.TemporaryDirectory() as tmp:
        staged = f"{tmp}/staged"
        stage_replay_files(staged_df, "event_id", staged, batch_size=batch_size)
        stream = read_replay_stream(
            spark, staged, "event_id long, user_id long, ts timestamp",
            files_per_trigger=1,
        )
        agg = (
            stream.withWatermark("ts", "1 minute")
            .groupBy("user_id", F.session_window("ts", "5 minutes"))
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(
                "user_id",
                F.col("session_window.start").alias("ss"),
                F.col("session_window.end").alias("se"),
                "n_events",
            )
        )
        q = (
            agg.writeStream.format("memory")
            .queryName("sessw")
            .outputMode("append")
            .option("checkpointLocation", f"{tmp}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        got = {
            (r["user_id"], r["ss"], r["se"], r["n_events"])
            for r in spark.sql(
                "SELECT * FROM sessw WHERE user_id >= 0"
            ).collect()
        }
    assert got == expected


def test_session_window_streaming_matches_batch(spark):
    """Native stateful session windows in streaming: replayed events with
    a watermark produce (in append mode) exactly the batch q47 sessions —
    every emitted session matches key-for-key, and everything the
    watermark finalized was emitted."""
    import tempfile

    from detecting_and_addressing_change_spark.sources.tables import (
        load_table,
    )
    from detecting_and_addressing_change_spark.streaming.replay import (
        read_replay_stream,
        stage_replay_files,
    )

    sf = "/root/testdata/sf0.001"
    ev = load_table(spark, sf, "events").select("user_id", "ts")
    batch = {
        (r["user_id"], r["session_start"], r["session_end"]): r["n_events"]
        for r in ev.groupBy(
            "user_id", F.session_window("ts", "5 minutes")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
        .collect()
    }
    ordered = ev.orderBy("ts").withColumn(
        "seq", F.monotonically_increasing_id()
    )
    # bucket watermark floor: max ts over all but the final bucket — every
    # batch session ending before it MUST have been finalized and emitted
    rows = ordered.collect()
    n_buckets = 5
    per = (len(rows) + n_buckets - 1) // n_buckets
    floor_ts = max(r["ts"] for r in rows[: per * (n_buckets - 1)])
    with tempfile.TemporaryDirectory() as tmp:
        stage_replay_files(
            ordered.select("user_id", "ts", "seq"), "seq",
            f"{tmp}/staged", batch_size=per,
        )
        stream = read_replay_stream(
            spark, f"{tmp}/staged",
            "user_id long, ts timestamp, seq long",
        )
        out = (
            stream.withWatermark("ts", "0 seconds")
            .groupBy("user_id", F.session_window("ts", "5 minutes"))
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(
                "user_id",
                F.col("session_window.start").alias("session_start"),
                F.col("session_window.end").alias("session_end"),
                "n_events",
            )
        )
        q = (
            out.writeStream.outputMode("append")
            .format("memory")
            .queryName("sess_stream")
            .option("checkpointLocation", f"{tmp}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = spark.sql("SELECT * FROM sess_stream").collect()
    emitted = {
        (r["user_id"], r["session_start"], r["session_end"]): r["n_events"]
        for r in got
    }
    # every emitted session is a real batch session, value-identical
    for key, n in emitted.items():
        assert batch.get(key) == n, key
    # everything the watermark finalized was emitted
    must_emit = {
        k for k in batch if k[2] <= floor_ts
    }
    assert must_emit <= set(emitted)
    assert emitted  # non-trivial
