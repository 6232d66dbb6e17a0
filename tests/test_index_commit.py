"""Shared commit protocols (operators/index_commit.py): the crash windows
ADVICE r7 found in the per-site copies must be closed AT the shared layer.

Each test manufactures the exact on-disk state a crash leaves behind —
renames are the only atomic primitive, so every window is a directory
layout — and asserts the next mutation recovers with zero data loss.
"""

from __future__ import annotations

import os
import shutil

import pytest

from pyspark.sql import functions as F

from detecting_and_addressing_change_spark.operators.index_commit import (
    commit_table_swap,
    recover_partition_swaps,
    recover_table_swap,
    swap_partition,
)


@pytest.fixture(scope="module")
def vectors(spark):
    rows = [
        (i, [float(i % 4), float((i * 3) % 5), float(i % 7)])
        for i in range(40)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _ids(spark, path):
    return sorted(
        r["vec_id"] for r in spark.read.parquet(f"{path}/postings").collect()
    )


def test_ivf_delete_crash_between_renames_recovers(spark, vectors, tmp_path):
    """ADVICE r7 (high): crash after ``rename(live, trash)`` but before
    ``rename(kept, live)`` strands BOTH copies of a cell inside staging;
    the old code rmtree'd staging on the next run, losing the cell. The
    recovery pass must promote the fully-written staged rewrite."""
    from detecting_and_addressing_change_spark.operators.ivf_index import (
        build_ivf_index,
        delete_from_ivf_index,
    )

    path = str(tmp_path / "ivf")
    build_ivf_index(vectors, path, n_centroids=4)
    all_ids = _ids(spark, path)
    gone = {3, 17}
    # run the delete for real once to learn a touched cell, then rebuild
    # and manufacture its worst-case crash state by hand
    delete_from_ivf_index(
        spark, path, vectors.filter(F.col("vec_id").isin(list(gone)))
    )
    shutil.rmtree(path)
    build_ivf_index(vectors, path, n_centroids=4)
    cells = sorted(
        int(d.split("=")[1])
        for d in os.listdir(f"{path}/postings")
        if d.startswith("cell=")
    )
    cell = cells[0]
    staging = f"{path}/.staging_del"
    live = f"{path}/postings/cell={cell}"
    # staged rewrite: byte-identical copy of the live cell (content is
    # irrelevant to the protocol; _SUCCESS marks it fully written)
    shutil.copytree(live, f"{staging}/cell={cell}")
    # a real staged rewrite is a direct (non-partitionBy) write, which
    # puts _SUCCESS inside the dir; the copied live cell lacks it
    with open(f"{staging}/cell={cell}/_SUCCESS", "w"):
        pass
    os.rename(live, f"{staging}/trash_cell={cell}")  # the crash point
    assert not os.path.exists(live)
    delete_from_ivf_index(
        spark, path, vectors.filter(F.col("vec_id").isin(list(gone)))
    )
    assert _ids(spark, path) == [i for i in all_ids if i not in gone]
    assert not os.path.exists(staging)


def test_partition_recovery_restores_trash_when_staged_incomplete(tmp_path):
    """A staged rewrite without _SUCCESS is mid-write garbage: recovery
    must roll BACK (restore the trash copy), never promote it."""
    root = str(tmp_path / "t")
    staging = f"{root}/.staging"
    os.makedirs(f"{root}/cell=1")
    with open(f"{root}/cell=1/part-0", "w") as f:
        f.write("old")
    os.makedirs(f"{staging}/cell=1")  # no _SUCCESS -> incomplete
    with open(f"{staging}/cell=1/part-0", "w") as f:
        f.write("partial")
    os.rename(f"{root}/cell=1", f"{staging}/trash_cell=1")
    recover_partition_swaps(root, staging)
    with open(f"{root}/cell=1/part-0") as f:
        assert f.read() == "old"
    assert not os.path.exists(staging)


def test_partition_recovery_handles_intentional_drop(tmp_path):
    """``swap_partition(keep=False)`` removes the staged dir BEFORE the
    live rename, so a crash in its window leaves (trash, no staged):
    recovery restores the old partition and an idempotent re-run
    re-drops it — never a silent loss, never a bogus promote."""
    root = str(tmp_path / "t")
    staging = f"{root}/.staging"
    os.makedirs(f"{root}/cell=2")
    with open(f"{root}/cell=2/part-0", "w") as f:
        f.write("victim")
    os.makedirs(staging)
    os.rename(f"{root}/cell=2", f"{staging}/trash_cell=2")
    recover_partition_swaps(root, staging)
    assert os.path.exists(f"{root}/cell=2/part-0")
    # and the completed-swap state (live present) just clears staging
    os.makedirs(f"{staging}/trash_cell=2")
    recover_partition_swaps(root, staging)
    assert os.path.exists(f"{root}/cell=2/part-0")
    assert not os.path.exists(staging)


def test_swap_partition_drop_then_keep_roundtrip(tmp_path):
    root = str(tmp_path / "t")
    staging = f"{root}/.staging"
    os.makedirs(f"{root}/p=1")
    os.makedirs(staging)
    with open(f"{root}/p=1/f", "w") as f:
        f.write("a")
    os.makedirs(f"{staging}/p=1")
    with open(f"{staging}/p=1/f", "w") as f:
        f.write("b")
    swap_partition(root, staging, "p=1", keep=True)
    with open(f"{root}/p=1/f") as f:
        assert f.read() == "b"
    os.makedirs(f"{staging}/p=1")
    swap_partition(root, staging, "p=1", keep=False)
    assert not os.path.exists(f"{root}/p=1")


def test_takedown_crash_between_renames_recovers(spark, tmp_path):
    """ADVICE r7 (high): same window in takedown_from_curation — an epoch
    partition stranded in .staging_takedown was rmtree'd by a re-run,
    permanently deleting committed rows NOT subject to the takedown."""
    from detecting_and_addressing_change_spark.operators.minhash_index import (
        init_minhash_index,
    )
    from detecting_and_addressing_change_spark.streaming.curation_stream import (
        curate_batch,
        curated_corpus,
        takedown_from_curation,
    )

    idx = str(tmp_path / "idx")
    out = str(tmp_path / "out")
    init_minhash_index(spark, idx)
    docs = spark.createDataFrame(
        [
            (
                i,
                f"document {i} covers partition tuning and adaptive "
                f"execution with enough words to pass the gate {i}",
            )
            for i in range(20)
        ],
        "doc_id long, text string",
    )
    curate_batch(docs.filter(F.col("doc_id") < 10), 0, idx, out)
    curate_batch(docs.filter(F.col("doc_id") >= 10), 1, idx, out)
    kept_before = {
        r["doc_id"] for r in curated_corpus(spark, out).collect()
    }
    assert kept_before == set(range(20))
    # manufacture the crash: epoch 0 caught between its two renames with
    # a fully-written staged rewrite (take down doc 3)
    staging = f"{out}/.staging_takedown"
    victims = docs.filter(F.col("doc_id") == 3)
    kept = spark.read.parquet(f"{out}/batch=0").filter(
        F.col("doc_id") != 3
    )
    kept.write.mode("overwrite").parquet(f"{staging}/batch=0")
    os.rename(f"{out}/batch=0", f"{staging}/trash_batch=0")
    takedown_from_curation(spark, idx, out, victims)
    kept_after = {r["doc_id"] for r in curated_corpus(spark, out).collect()}
    assert kept_after == kept_before - {3}
    assert not os.path.exists(staging)


def test_curation_read_heals_crashed_takedown(spark, tmp_path):
    """ADVICE r9 (medium): the every-touch recovery rule covered the IVF
    index but not the curation corpus — a crash mid-takedown left an
    epoch partition missing from every curated_corpus/curation_stats
    read and every curate_batch ingest until the NEXT takedown ran.
    A plain READ must now heal the stranded partition."""
    from detecting_and_addressing_change_spark.operators.minhash_index import (
        init_minhash_index,
    )
    from detecting_and_addressing_change_spark.streaming.curation_stream import (
        curate_batch,
        curated_corpus,
        curation_stats,
    )

    idx = str(tmp_path / "idx")
    out = str(tmp_path / "out")
    init_minhash_index(spark, idx)
    docs = spark.createDataFrame(
        [
            (
                i,
                f"document {i} covers partition tuning and adaptive "
                f"execution with enough words to pass the gate {i}",
            )
            for i in range(20)
        ],
        "doc_id long, text string",
    )
    curate_batch(docs.filter(F.col("doc_id") < 10), 0, idx, out)
    curate_batch(docs.filter(F.col("doc_id") >= 10), 1, idx, out)
    # manufacture the mid-takedown crash: epoch 0 caught between its two
    # renames with a fully-written staged rewrite (doc 3 taken down)
    staging = f"{out}/.staging_takedown"
    spark.read.parquet(f"{out}/batch=0").filter(
        F.col("doc_id") != 3
    ).write.mode("overwrite").parquet(f"{staging}/batch=0")
    os.rename(f"{out}/batch=0", f"{staging}/trash_batch=0")
    # a read alone must finish the interrupted swap (forward: the staged
    # rewrite carries _SUCCESS) — not silently serve a truncated corpus
    kept = {r["doc_id"] for r in curated_corpus(spark, out).collect()}
    assert kept == set(range(20)) - {3}
    assert not os.path.exists(staging)
    assert {int(r["epoch"]) for r in curation_stats(spark, out).collect()} == {
        0,
        1,
    }
    # and an INGEST after the same crash state must heal before probing,
    # so the restored epoch's docs gate re-delivered duplicates
    spark.read.parquet(f"{out}/batch=1").filter(
        F.col("doc_id") != 12
    ).write.mode("overwrite").parquet(f"{staging}/batch=1")
    os.rename(f"{out}/batch=1", f"{staging}/trash_batch=1")
    curate_batch(
        docs.filter(F.col("doc_id") == 19), 2, idx, out
    )  # duplicate of an epoch-1 doc: index probe drops it
    # curate_batch itself must have healed the layout (assert on the
    # filesystem, not through curated_corpus — that read would heal too)
    assert os.path.isdir(f"{out}/batch=1")
    assert not os.path.exists(staging)
    kept2 = {r["doc_id"] for r in curated_corpus(spark, out).collect()}
    assert kept2 == set(range(20)) - {3, 12}


def test_marker_fenced_multi_table_swap_rolls_forward(spark, tmp_path):
    """ADVICE r7 (low): a crash between the docs swap and the sigs swap
    left ``sigs.new`` — carrying the signature GC of a delete — to be
    DISCARDED by marker-less recovery, so signatures of fully-deleted
    content survived indefinitely. With the marker present, recovery must
    finish the sigs swap forward."""
    path = str(tmp_path / "m")
    for name, val in (("docs", "old_docs"), ("sigs", "old_sigs")):
        os.makedirs(f"{path}/{name}")
        with open(f"{path}/{name}/f", "w") as f:
            f.write(val)
        os.makedirs(f"{path}/{name}.new")
        with open(f"{path}/{name}.new/f", "w") as f:
            f.write(f"new_{val}")
    # crash mid-commit: marker created, docs fully swapped, sigs untouched
    with open(f"{path}/.commit_swap", "w"):
        pass
    os.rename(f"{path}/docs", f"{path}/docs.old")
    os.rename(f"{path}/docs.new", f"{path}/docs")
    recover_table_swap(path, ("docs", "sigs"))
    for name in ("docs", "sigs"):
        with open(f"{path}/{name}/f") as f:
            assert f.read() == f"new_old_{name}"
        assert not os.path.exists(f"{path}/{name}.new")
        assert not os.path.exists(f"{path}/{name}.old")
    assert not os.path.exists(f"{path}/.commit_swap")


def test_marker_absent_clears_stale_staging(tmp_path):
    """No marker -> live dirs are the truth: abandoned .new (a crash
    during the consolidated WRITE, before commit) is cleared."""
    path = str(tmp_path / "m")
    os.makedirs(f"{path}/docs")
    with open(f"{path}/docs/f", "w") as f:
        f.write("live")
    os.makedirs(f"{path}/docs.new")
    recover_table_swap(path, ("docs", "sigs"))
    with open(f"{path}/docs/f") as f:
        assert f.read() == "live"
    assert not os.path.exists(f"{path}/docs.new")


def test_delete_crash_then_delete_signature_gc_completes(spark, tmp_path):
    """End-to-end on the real index: interrupt a delete's commit between
    the two table swaps, then run recovery via the next operation — the
    GC'd signature set must be the one that lands (right-to-be-forgotten
    post-condition holds through the crash)."""
    from detecting_and_addressing_change_spark.operators.minhash_index import (
        build_minhash_index,
        delete_from_minhash_index,
        minhash_index_edges,
    )

    docs = spark.createDataFrame(
        [
            (i, f"wholly distinct content number {i} about topic {i} "
                f"with plenty of words for shingling here")
            for i in range(12)
        ],
        "doc_id long, text string",
    )
    path = str(tmp_path / "idx")
    build_minhash_index(docs, path)
    n_sigs_before = spark.read.parquet(f"{path}/sigs").count()
    # run the delete but crash its commit half-way: emulate by doing the
    # writes delete_from_minhash_index would do, then a partial commit
    gone = docs.filter(F.col("doc_id") < 3)
    kept = spark.read.parquet(f"{path}/docs").join(
        gone.select("doc_id"), "doc_id", "left_anti"
    )
    kept.write.mode("overwrite").parquet(f"{path}/docs.new/batch=base")
    surviving = (
        spark.read.parquet(f"{path}/docs.new").select("dgst").distinct()
    )
    spark.read.parquet(f"{path}/sigs").join(
        surviving, "dgst", "semi"
    ).write.mode("overwrite").parquet(f"{path}/sigs.new")
    with open(f"{path}/.commit_swap", "w"):
        pass
    os.rename(f"{path}/docs", f"{path}/docs.old")
    os.rename(f"{path}/docs.new", f"{path}/docs")
    # crash here. Next index mutation runs recovery first:
    delete_from_minhash_index(
        spark, path, spark.createDataFrame([(99,)], "doc_id long")
    )
    assert spark.read.parquet(f"{path}/sigs").count() == n_sigs_before - 3
    got = {
        r["a_id"]
        for r in minhash_index_edges(spark, path).collect()
    }
    assert not any(a < 3 for a in got)


def test_commit_table_swap_happy_path(tmp_path):
    path = str(tmp_path / "m")
    os.makedirs(f"{path}/t")
    with open(f"{path}/t/f", "w") as f:
        f.write("old")
    os.makedirs(f"{path}/t.new")
    with open(f"{path}/t.new/f", "w") as f:
        f.write("new")
    commit_table_swap(path, ("t",))
    with open(f"{path}/t/f") as f:
        assert f.read() == "new"
    assert not os.path.exists(f"{path}/t.old")
    assert not os.path.exists(f"{path}/.commit_swap")


def test_recover_all_sweeps_every_staging_dir(tmp_path):
    """ADVICE r8 (medium): recovery scoped to ONE operation's staging dir
    leaves a partition stranded by a DIFFERENT operation invisible. The
    all-staging sweep must heal both in one call."""
    from detecting_and_addressing_change_spark.operators.index_commit import (
        recover_all_partition_swaps,
    )

    root = str(tmp_path / "t")
    os.makedirs(root)
    for staging_name, part in ((".staging_compact", "p=1"),
                               (".staging_del", "p=2")):
        staging = f"{root}/{staging_name}"
        os.makedirs(f"{root}/{part}")
        with open(f"{root}/{part}/f", "w") as f:
            f.write("old")
        os.makedirs(f"{staging}/{part}")
        with open(f"{staging}/{part}/f", "w") as f:
            f.write("new")
        with open(f"{staging}/{part}/_SUCCESS", "w"):
            pass
        os.rename(f"{root}/{part}", f"{staging}/trash_{part}")
    recover_all_partition_swaps(root)
    for part in ("p=1", "p=2"):
        with open(f"{root}/{part}/f") as f:
            assert f.read() == "new"
    assert not os.path.exists(f"{root}/.staging_compact")
    assert not os.path.exists(f"{root}/.staging_del")


def _strand_cell_in(path: str, staging_name: str) -> int:
    """Manufacture the mid-swap crash state for the first cell of a
    persisted IVF index inside the NAMED staging dir, and return the
    stranded cell id."""
    cells = sorted(
        int(d.split("=")[1])
        for d in os.listdir(f"{path}/postings")
        if d.startswith("cell=")
    )
    cell = cells[0]
    staging = f"{path}/{staging_name}"
    live = f"{path}/postings/cell={cell}"
    shutil.copytree(live, f"{staging}/cell={cell}")
    with open(f"{staging}/cell={cell}/_SUCCESS", "w"):
        pass
    os.rename(live, f"{staging}/trash_cell={cell}")
    return cell


def test_search_heals_cell_stranded_by_crashed_compact(spark, vectors, tmp_path):
    """ADVICE r8: a crash mid-compact used to truncate the index for
    every OTHER caller until the next compact ran. Search (a read) must
    now recover the cell first and scan the complete index."""
    from detecting_and_addressing_change_spark.operators.ivf_index import (
        build_ivf_index,
        ivf_index_search,
    )

    path = str(tmp_path / "ivf")
    # vec_id 0 is the all-zero vector — undefined under cosine on either
    # side of the search, so keep it out of this test's corpus entirely
    corpus = vectors.filter(F.col("vec_id") > 0)
    centroids = build_ivf_index(corpus, path, n_centroids=4)
    queries = corpus.filter(F.col("vec_id").isin(1, 2, 5)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    expected = sorted(
        map(tuple, ivf_index_search(
            spark, path, queries, k=3, nprobe=4, centroids=centroids
        ).collect())
    )
    _strand_cell_in(path, ".staging_compact")
    got = sorted(
        map(tuple, ivf_index_search(
            spark, path, queries, k=3, nprobe=4, centroids=centroids
        ).collect())
    )
    assert got == expected
    assert not os.path.exists(f"{path}/.staging_compact")


def test_stats_and_delete_heal_cell_stranded_by_other_op(
    spark, vectors, tmp_path
):
    """ivf_cell_stats must count the stranded cell's vectors, and a
    delete must rewrite it like any live cell — whichever operation's
    staging dir stranded it."""
    from detecting_and_addressing_change_spark.operators.ivf_index import (
        build_ivf_index,
        delete_from_ivf_index,
        ivf_cell_stats,
    )

    path = str(tmp_path / "ivf")
    build_ivf_index(vectors, path, n_centroids=4)
    total = vectors.count()
    _strand_cell_in(path, ".staging_compact")
    counted = sum(
        int(r["n_vectors"]) for r in ivf_cell_stats(spark, path).collect()
    )
    assert counted == total
    # strand again, then delete ids that live in the stranded cell
    cell = _strand_cell_in(path, ".staging_del")
    victim_ids = {
        int(r["vec_id"])
        for r in spark.read.parquet(
            f"{path}/.staging_del/cell={cell}"
        ).select("vec_id").limit(2).collect()
    }
    delete_from_ivf_index(
        spark, path, vectors.filter(F.col("vec_id").isin(list(victim_ids)))
    )
    survivors = _ids(spark, path)
    assert len(survivors) == total - len(victim_ids)
    assert not (victim_ids & set(survivors))
