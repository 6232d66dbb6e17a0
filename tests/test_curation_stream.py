"""Continuous curation (streaming/curation_stream.py): the streamed
kept-set must equal the batch pipeline's declared semantics (min-id exact
dedup + quality gate) regardless of batch boundaries, and a mid-stream
restart must not change it."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from detecting_and_addressing_change_spark.functions.text import (
    quality_score_col,
)
from detecting_and_addressing_change_spark.operators.minhash_index import (
    init_minhash_index,
)
from detecting_and_addressing_change_spark.streaming.curation_stream import (
    curate_batch,
    curated_corpus,
)

MIN_Q = 0.5


@pytest.fixture(scope="module")
def corpus(spark):
    base = (
        "the quick brown fox jumps over the lazy dog while a cat "
        "watches from the windowsill with mild interest every day"
    )
    rows = []
    for i in range(60):
        if i % 6 == 0:
            rows.append((i, base))  # exact dups across batches
        elif i % 6 == 1:
            rows.append((i, base.replace("mild", f"keen{i}")))  # near dups
        elif i % 6 == 2:
            rows.append((i, "x " * 3))  # low quality: tiny, repetitive
        else:
            rows.append(
                (
                    i,
                    f"document {i} covers partition tuning and adaptive "
                    f"execution with enough words to pass the gate {i}",
                )
            )
    return spark.createDataFrame(rows, "doc_id long, text string")


def _batch_semantics(spark, corpus):
    from pyspark.sql import Window

    keeper = F.min("doc_id").over(Window.partitionBy("__dg"))
    return {
        r["doc_id"]
        for r in corpus.withColumn("__dg", F.md5("text"))
        .withColumn("__k", keeper)
        .filter(F.col("doc_id") == F.col("__k"))
        .withColumn("q", quality_score_col(F.col("text")))
        .filter(F.col("q") >= MIN_Q)
        .collect()
    }


def _run_stream(spark, corpus, tmp, slices, crash_after=None):
    """Feed ascending-doc_id slices through curate_batch; optionally
    re-deliver one epoch to simulate an at-least-once retry."""
    index = f"{tmp}/idx"
    out = f"{tmp}/out"
    init_minhash_index(spark, index)
    for epoch, (lo, hi) in enumerate(slices):
        b = corpus.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        curate_batch(b, epoch, index, out, min_quality=MIN_Q)
        if crash_after is not None and epoch == crash_after:
            # at-least-once: the same epoch is delivered again
            curate_batch(b, epoch, index, out, min_quality=MIN_Q)
    return {r["doc_id"] for r in curated_corpus(spark, out).collect()}


def test_streamed_kept_set_equals_batch_semantics(spark, corpus, tmp_path):
    want = _batch_semantics(spark, corpus)
    got = _run_stream(
        spark, corpus, str(tmp_path / "a"), [(0, 20), (20, 40), (40, 60)]
    )
    assert got == want and want


def test_batch_boundaries_do_not_change_kept_set(spark, corpus, tmp_path):
    want = _batch_semantics(spark, corpus)
    one = _run_stream(spark, corpus, str(tmp_path / "b1"), [(0, 60)])
    many = _run_stream(
        spark,
        corpus,
        str(tmp_path / "b2"),
        [(0, 7), (7, 13), (13, 31), (31, 44), (44, 60)],
    )
    assert one == many == want


def test_redelivered_epoch_is_idempotent(spark, corpus, tmp_path):
    want = _batch_semantics(spark, corpus)
    got = _run_stream(
        spark,
        corpus,
        str(tmp_path / "c"),
        [(0, 20), (20, 40), (40, 60)],
        crash_after=1,
    )
    assert got == want


def test_near_dup_flags_and_gates(spark, corpus, tmp_path):
    got = curated_corpus(
        spark,
        (
            lambda t: (
                _run_stream(spark, corpus, t, [(0, 30), (30, 60)]),
                f"{t}/out",
            )[1]
        )(str(tmp_path / "d")),
    )
    rows = got.collect()
    by_id = {r["doc_id"]: r for r in rows}
    # exact dups beyond the min-id keeper never appear (0 is the keeper of
    # the base family, 6/12/... are its dups across both batches)
    assert 0 in by_id
    assert all(i not in by_id for i in range(6, 60, 6))
    # low-quality docs never appear
    assert all(i not in by_id for i in range(2, 60, 6))
    # a near-dup in a LATER batch than its partner carries the flag
    flagged = {i for i, r in by_id.items() if r["near_dup_suspect"]}
    later_near_dups = {i for i in range(31, 60) if i % 6 == 1}
    assert later_near_dups <= flagged


def test_real_readstream_wiring(spark, corpus, tmp_path):
    """The same semantics through an ACTUAL Structured Streaming query
    (ordered file replay -> foreachBatch(curate_batch) -> availableNow),
    not just direct calls to the batch body."""
    from detecting_and_addressing_change_spark.streaming.replay import (
        read_replay_stream,
        stage_replay_files,
    )

    staged = str(tmp_path / "staged")
    stage_replay_files(corpus, "doc_id", staged, batch_size=20)
    stream = read_replay_stream(spark, staged, "doc_id long, text string")
    index = str(tmp_path / "idx")
    out = str(tmp_path / "out")
    init_minhash_index(spark, index)
    q = (
        stream.writeStream.foreachBatch(
            lambda b, e: curate_batch(b, e, index, out, min_quality=MIN_Q)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {r["doc_id"] for r in curated_corpus(spark, out).collect()}
    assert got == _batch_semantics(spark, corpus)


def test_epoch_stats_conserve_and_track_drops(spark, corpus, tmp_path):
    """Every input document is accounted for exactly once per epoch, and
    the audit totals match the committed corpus."""
    from detecting_and_addressing_change_spark.streaming.curation_stream import (
        curation_stats,
    )

    t = str(tmp_path / "s")
    kept = _run_stream(spark, corpus, t, [(0, 20), (20, 40), (40, 60)])
    stats = curation_stats(spark, f"{t}/out").collect()
    assert len(stats) == 3
    for r in stats:
        assert (
            r["n_in"]
            == r["n_within_batch_dups"]
            + r["n_exact_dropped"]
            + r["n_quality_dropped"]
            + r["n_kept"]
        )
    assert sum(r["n_in"] for r in stats) == 60
    assert sum(r["n_kept"] for r in stats) == len(kept)
    # epochs after the first see the base family as EXACT index hits
    assert sum(r["n_exact_dropped"] for r in stats if r["epoch"] > 0) > 0
    # low-quality docs are dropped in every epoch (10 per 20-doc slice? no:
    # 3-4 per slice at i % 6 == 2)
    assert all(r["n_quality_dropped"] > 0 for r in stats)


def test_takedown_forgets_across_pipeline(spark, corpus, tmp_path):
    """Takedown removes docs from BOTH the committed corpus and the dedup
    index: untouched epoch partitions keep their exact files, and
    re-ingesting the taken-down content afterwards COMMITS (the index
    forgot the digest)."""
    import os

    from detecting_and_addressing_change_spark.streaming.curation_stream import (
        curate_batch,
        takedown_from_curation,
    )

    t = str(tmp_path / "td")
    kept = _run_stream(spark, corpus, t, [(0, 20), (20, 40), (40, 60)])
    out, index = f"{t}/out", f"{t}/idx"
    # take down two kept docs from epoch 0 (incl. the base-family keeper)
    gone = sorted(i for i in kept if i < 20)[:2]
    assert 0 in gone  # the exact-dup family keeper is kept and early
    files_before = sorted(os.listdir(f"{out}/batch=2"))
    takedown_from_curation(
        spark, index, out, spark.createDataFrame([(i,) for i in gone], "doc_id long")
    )
    after = {r["doc_id"] for r in curated_corpus(spark, out).collect()}
    assert after == kept - set(gone)
    assert sorted(os.listdir(f"{out}/batch=2")) == files_before  # surgical
    # the index forgot: re-ingesting the same text as a new epoch COMMITS
    reingest = corpus.filter(F.col("doc_id") == 0).select(
        (F.col("doc_id") + 1000).alias("doc_id"), "text"
    )
    curate_batch(reingest, 99, index, out, min_quality=MIN_Q)
    final = {r["doc_id"] for r in curated_corpus(spark, out).collect()}
    assert 1000 in final
