"""Continuous corpus curation: the streaming form of the batch curation
pipeline (curation.py / x55) for a corpus that ARRIVES, not one that sits
still.

Per micro-batch (foreachBatch):

1. **Exact-dup gate** — the batch's digests are probed against the
   persisted MinHash index (operators/minhash_index.py): any document
   whose text digest is already indexed is DROPPED (an earlier batch owns
   it); within the batch, one min-id representative per digest survives.
2. **Near-dup flag** — band collisions against the index (and nothing
   else: the index stores digests + signatures, never text, so exact
   Jaccard against indexed content is impossible by design) mark the
   survivor `near_dup_suspect` instead of dropping it — the conservative
   CCNet-style posture: a band collision at 4 bands of 2 hashes is
   evidence, not proof, and a 100 TB pipeline reviews flags offline
   rather than silently losing data to false positives.
3. **Quality gate** — the x46 zero-shuffle quality score; below-threshold
   documents are dropped (same rule as the batch pipeline).
4. **Commit** — survivors are appended to the index (signing only
   never-seen digests) and written to ``out_path/batch=<epoch>``; the
   epoch-keyed overwrite makes a re-delivered epoch replace its own
   output instead of duplicating it (the standard foreachBatch
   exactly-once pattern, same as ``append_minhash_batch``).

Determinism contract (tested): when batches partition the corpus in
ascending doc_id order, the streamed kept-set equals the BATCH pipeline's
kept-set (min-id exact dedup + the same quality rule) — the stream is an
incremental evaluation of the same declared semantics, so kill-and-
restart or batch-boundary changes cannot change WHAT survives, only when
it is seen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import quality_score_col
from ..operators.index_commit import recover_all_partition_swaps
from ..operators.minhash_index import (
    append_minhash_batch,
    minhash_index_probe,
)
from ..sources.tables import read_parquet_cached_schema


def curate_batch(
    batch_df: DataFrame,
    epoch_id: int,
    index_path: str,
    out_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.5,
) -> None:
    """foreachBatch body: gate the batch against the index, write
    survivors, maintain the index. Attach with
    ``.foreachBatch(lambda b, e: curate_batch(b, e, index_path, out_path))``.
    """
    spark = batch_df.sparkSession
    # heal any epoch partition stranded by a crashed takedown BEFORE this
    # epoch probes or writes (ADVICE r9: the all-staging sweep covered the
    # IVF index's every touch but not the curation corpus — a crash
    # mid-takedown left an epoch missing from every read and ingest until
    # the NEXT takedown ran). The sweep is one driver-side listdir when
    # staging is empty — micro-batch-latency safe.
    recover_all_partition_swaps(out_path)
    # one representative per digest WITHIN the batch (min id — the same
    # keeper rule as the batch pipeline's collapse); __grp_n rides the
    # same window exchange so the audit row can reconstruct the batch's
    # input count WITHOUT a separate count() job — per-epoch action count
    # is micro-batch latency at 100 TB, so the audit must not add jobs
    keeper = F.min(id_col).over(Window.partitionBy("__dg"))
    grp_n = F.count(F.lit(1)).over(Window.partitionBy("__dg"))
    reps = (
        batch_df.withColumn("__dg", F.md5(F.col(text_col)))
        .withColumn("__keeper", keeper)
        .withColumn("__grp_n", grp_n)
        .filter(F.col(id_col) == F.col("__keeper"))
        .drop("__keeper")
    )
    # probe BEFORE appending: exact hits -> drop; band hits -> flag.
    # A hit whose matched digest-group keeper is the probing document
    # ITSELF is this epoch's own prior commit showing back up on an
    # at-least-once re-delivery — self-matches must gate nothing, or a
    # retried epoch would overwrite its output with an empty slice
    # (caught by tests/test_curation_stream.py::test_redelivered_epoch_).
    probe = minhash_index_probe(
        spark, index_path, reps, text_col=text_col, id_col=id_col
    ).filter(F.col("index_id") != F.col("batch_id"))
    exact_hits = (
        probe.filter(F.col("via") == "exact")
        .select(F.col("batch_id").alias(id_col))
        .distinct()
    )
    band_hits = (
        probe.filter(F.col("via") == "band")
        .select(F.col("batch_id").alias(id_col))
        .distinct()
        .withColumn("__band_hit", F.lit(True))
    )
    graded = (
        reps.join(exact_hits.withColumn("__exact_hit", F.lit(True)), id_col, "left")
        .join(band_hits, id_col, "left")
        .withColumn(
            "near_dup_suspect", F.coalesce(F.col("__band_hit"), F.lit(False))
        )
        .withColumn("quality", quality_score_col(F.col(text_col)))
        # materialize ONCE, here: graded feeds BOTH the survivors write
        # and the audit stats (before round 11 each re-executed the full
        # window+probe chain — two redundant recomputes per micro-batch),
        # and it must be pinned before the index append below mutates
        # what the probe read
        .localCheckpoint(eager=True)
    )
    survivors = graded.filter(F.col("__exact_hit").isNull()).filter(
        F.col("quality") >= F.lit(min_quality)
    ).drop("__band_hit", "__exact_hit", "__dg", "__grp_n")
    survivors.write.mode("overwrite").parquet(
        f"{out_path}/batch={int(epoch_id)}"
    )
    # per-epoch audit stats beside the corpus (one tiny row per epoch,
    # epoch-keyed like everything else so redelivery replaces): the
    # observability a continuous 100 TB ingest runs on — drop-rate spikes
    # are the first drift signal an operator sees
    stats = graded.agg(
        F.lit(int(epoch_id)).alias("epoch"),
        F.coalesce(F.sum("__grp_n"), F.lit(0)).alias("n_in"),
        (
            F.coalesce(F.sum("__grp_n"), F.lit(0)) - F.count("*")
        ).alias("n_within_batch_dups"),
        F.count(F.col("__exact_hit")).alias("n_exact_dropped"),
        F.sum(
            F.when(
                F.col("__exact_hit").isNull()
                & (F.col("quality") < F.lit(min_quality)),
                1,
            ).otherwise(0)
        ).alias("n_quality_dropped"),
        F.sum(
            F.when(
                F.col("__exact_hit").isNull()
                & (F.col("quality") >= F.lit(min_quality)),
                1,
            ).otherwise(0)
        ).alias("n_kept"),
        F.sum(
            F.when(
                F.col("__exact_hit").isNull()
                & (F.col("quality") >= F.lit(min_quality))
                & F.col("near_dup_suspect"),
                1,
            ).otherwise(0)
        ).alias("n_flagged"),
    )
    stats.coalesce(1).write.mode("overwrite").parquet(
        f"{out_path}/_stats/batch={int(epoch_id)}"
    )
    # epoch-keyed index append: a re-delivered epoch OVERWRITES its own
    # docs/batch=<epoch> partition (never duplicates it) and the novel-sig
    # anti-join is naturally idempotent — same protocol as the raw
    # streaming ingest sink
    append_minhash_batch(
        survivors, epoch_id, index_path, text_col=text_col, id_col=id_col
    )


def curated_corpus(spark: SparkSession, out_path: str) -> DataFrame:
    """The kept corpus across all committed epochs (the ``_stats``
    sidecar is underscore-prefixed, so Spark's file listing skips it).
    Opens with the all-staging recovery sweep so a read after a crashed
    takedown serves the complete corpus, not one missing a stranded
    epoch partition (ADVICE r9 — same every-touch rule as the IVF
    index's ``_recover_postings``)."""
    recover_all_partition_swaps(out_path)
    return read_parquet_cached_schema(spark, out_path).drop("batch")


def curation_stats(spark: SparkSession, out_path: str) -> DataFrame:
    """One audit row per epoch: n_in = n_within_batch_dups +
    n_exact_dropped + n_quality_dropped + n_kept (conservation tested);
    n_flagged counts kept-but-suspect docs. Same recovery-on-read rule
    as ``curated_corpus`` (the takedown never rewrites ``_stats``
    partitions, but the sweep keys on the corpus root, so a stats read
    after a crash heals the corpus too)."""
    recover_all_partition_swaps(out_path)
    return read_parquet_cached_schema(spark, f"{out_path}/_stats").drop("batch")


def takedown_from_curation(
    spark: SparkSession,
    index_path: str,
    out_path: str,
    ids: DataFrame,
    id_col: str = "doc_id",
) -> None:
    """Right-to-be-forgotten across the WHOLE curation pipeline: remove
    the documents from the dedup index (``delete_from_minhash_index`` —
    digests and signatures of fully-deleted content are GC'd) AND from
    the committed corpus. Only epoch partitions that actually contain a
    deleted id are rewritten (the batch column is a partition key, so the
    touched-epoch collect is a column-pruned scan); each is replaced via
    a hidden staging dir + rename, the same surgical protocol as
    ``delete_from_ivf_index`` (shared in ``operators/index_commit.py``) —
    a crash leaves every partition either old or new, both complete, and
    re-running finishes the job: the recovery pass promotes or restores
    any epoch partition stranded between its two renames before staging
    is cleared (ADVICE r7 — the previous start-of-run rmtree destroyed
    both copies, permanently deleting committed rows NOT subject to the
    takedown).

    Note the dedup interaction this does NOT undo: if a taken-down
    document was the min-id keeper of an exact-dup group, its dropped
    duplicates from past epochs are gone too (they were never committed).
    That is the correct legal posture — the CONTENT was taken down — but
    operators should know re-ingesting a still-legitimate duplicate later
    will now commit it, because the index forgot the digest."""
    import shutil

    from ..operators.index_commit import (
        recover_all_partition_swaps,
        swap_partition,
    )
    from ..operators.minhash_index import delete_from_minhash_index

    delete_from_minhash_index(spark, index_path, ids, id_col=id_col)
    # sweep ALL .staging_* dirs (ADVICE r8), and BEFORE the touched-epoch
    # read below so the epoch set is computed over the complete corpus,
    # never one missing a partition stranded by a crashed prior run.
    recover_all_partition_swaps(out_path)
    del_ids = ids.select(F.col(id_col).alias("__del_id")).distinct()
    corpus = read_parquet_cached_schema(spark, out_path)
    touched = sorted(
        int(r["batch"])
        for r in corpus.join(
            F.broadcast(del_ids), corpus[id_col] == F.col("__del_id"), "semi"
        )
        .select("batch")
        .distinct()
        .collect()
    )
    staging = f"{out_path}/.staging_takedown"
    for epoch in touched:
        kept = read_parquet_cached_schema(spark, f"{out_path}/batch={epoch}").join(
            F.broadcast(del_ids),
            F.col(id_col) == F.col("__del_id"),
            "left_anti",
        )
        kept.write.mode("overwrite").parquet(f"{staging}/batch={epoch}")
        swap_partition(out_path, staging, f"batch={epoch}")
    shutil.rmtree(staging, ignore_errors=True)
