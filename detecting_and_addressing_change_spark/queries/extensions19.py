"""Round-16 extension query: the genuine MULTI-EPOCH training session
(VERDICT r15 #4). x128 proved the between-epoch re-shard is
content-invariant (a two-epoch trainer would hold exactly 2x the
sufficient statistics); until this round no query actually RAN two
epochs through the prequential loop. The reference's epoch loop is
``stream.restart()`` + re-iterate (``models/wos_train_nb.py:116``,
``models/wos_train_lstm.py:168-169``) — each epoch replays the SAME
corpus in a fresh seeded order.

x129 composes the existing fixtures (budget policy: reuse, don't
rebuild): epoch 1 is the shared x123 layout (seed 5, ``_x123_layout``);
epoch 2 is the shared x128 re-shard (seed 7, ``_x128_epoch2_layout`` —
built once per session, consumed by both x128 and this query). ONE
PrequentialNB model walks epoch 1's shard groups then epoch 2's,
test-then-train per group, the model state carried ACROSS the epoch
boundary — the real multi-epoch trainer, not two independent sessions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .extensions17 import _X123_PACK, _x123_ctes, _x123_layout
from .extensions18 import (
    _SHARD_TOKENS,
    _X125_CK_N,
    _X125_CK_S1,
    _X125_DIM,
    _X128_SEED2,
    _accumulate_stats,
    _collect_int_stats,
    _nb_stats_ctes,
    _stats_checksum,
    _x125_features,
    _x125_label,
    _x128_epoch2_layout,
)
from .registry import query
from ..sources.tables import read_parquet_cached_schema

# --------------------------------------------------------------------------
# X129 — multi-epoch prequential training across the epoch re-shard.
#
# Session shape: 3 shard groups per epoch (gsize = ceil(populated/3) in
# each epoch's OWN layout), walked ascending; each group is one
# partition-pruned scan (the x126 cadence) feeding the REAL
# PrequentialNB loop — test against the CURRENT model, then the exact
# sufficient-stats merge. The model is NOT reset at the epoch boundary:
# epoch 2 begins by testing the fully-epoch-1-trained model, exactly the
# reference's restart-and-re-iterate cadence.
#
# Verdicts (raise-guarded at generation time, pinned TRUE by the
# oracle):
#  - epoch_replay_orders_disjoint_ascending: within EACH epoch the
#    per-group replay intervals are strictly ascending and disjoint in
#    that epoch's own order coordinates — epoch 1 by the materialized
#    pack offsets (epos, the x126 evidence), epoch 2 by the
#    (epoch_key, doc_id) lexicographic order the seed-7 cut was made on
#    (assign_shards keeps epoch_key in the written layout);
#  - epochs_not_same_order: the shard-level order checksums of the two
#    epochs differ — the epochs genuinely replay in different orders
#    (both checksums fully recomputed by the oracle: the x128 seed-7
#    window arithmetic, zero pins);
#  - prequential_history_ok: exactly n_batches_epoch1 +
#    n_batches_epoch2 - 1 test rows (only the session's FIRST group has
#    no model to test — the epoch-2 groups all test the carried model),
#    accuracies in [0, 1];
#  - two_epoch_stats_exact: the integer sufficient statistics
#    accumulated across BOTH epochs equal exactly 2x epoch 1's one-pass
#    batch recompute — the x128 content-invariance consumed by the real
#    loop (and the oracle's doubled GROUP BY).
# Beside them, SQL-exact fingerprints: n_docs, per-epoch batch counts,
# both shard-order checksums, and the two-epoch stats checksum.
#
# Scale shape: 2 x _X129_GROUPS partition-pruned group scans + as many
# bounded (classes x dims) aggs + the NB merge chain; the epoch-2 build
# cost is the shared fixture's ONE range shuffle. Nothing rescans text;
# the group count is a cadence parameter (coverage is both epochs'
# full corpora either way — the x125 trim precedent).
# --------------------------------------------------------------------------
# 3 groups per epoch: the smallest genuinely multi-batch per-epoch walk
# with a middle interval (6 test-then-train steps, 5 test rows) — the
# cadence is a cost parameter, coverage is both epochs' full corpora
# either way (the x125 trim precedent; measured 14.0 s warm at 4+4
# groups vs the 15 s ceiling, r16)
_X129_GROUPS = 3


def _x129_oracle() -> str:
    from ..operators.sharding import epoch_order_sql

    return _x123_ctes() + f"""
    , e2 AS (
      SELECT doc_id,
             strt // {_SHARD_TOKENS} AS shard1,
             (SUM(n_tokens) OVER (
                ORDER BY {epoch_order_sql('doc_id', _X128_SEED2)}, doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
              ) - n_tokens) // {_SHARD_TOKENS} AS shard2
      FROM c2
    ),
    gsz AS (
      -- populated-count group sizing in each epoch's OWN layout
      SELECT
        (COUNT(DISTINCT shard1) + {_X129_GROUPS - 1}) // {_X129_GROUPS}
          AS g1,
        (COUNT(DISTINCT shard2) + {_X129_GROUPS - 1}) // {_X129_GROUPS}
          AS g2
      FROM e2
    ),
    batches AS (
      SELECT
        COUNT(DISTINCT e2.shard1 // gsz.g1) AS nb1,
        COUNT(DISTINCT e2.shard2 // gsz.g2) AS nb2,
        CAST(SUM(e2.shard1 * e2.doc_id) AS BIGINT) AS ck1,
        CAST(SUM(e2.shard2 * e2.doc_id) AS BIGINT) AS ck2
      FROM e2 CROSS JOIN gsz
    ),{_nb_stats_ctes()},
    two AS (
      SELECT CAST(SUM((label * {_X125_DIM} + d + 1) *
                      (2 * n * {_X125_CK_N} + 2 * s1 * {_X125_CK_S1}
                       + 2 * s2)) AS BIGINT) AS stats_checksum_two_epochs
      FROM nbstats
    )
    SELECT
      CAST((SELECT COUNT(*) FROM e2) AS BIGINT) AS n_docs,
      CAST(b.nb1 AS BIGINT) AS n_batches_epoch1,
      CAST(b.nb2 AS BIGINT) AS n_batches_epoch2,
      b.ck1 AS shard_order_checksum_epoch1,
      b.ck2 AS shard_order_checksum_epoch2,
      two.stats_checksum_two_epochs,
      TRUE AS epoch_replay_orders_disjoint_ascending,
      TRUE AS epochs_not_same_order,
      TRUE AS prequential_history_ok,
      TRUE AS two_epoch_stats_exact
    FROM batches b CROSS JOIN two
"""


def _epoch_groups(
    layout: DataFrame, order_struct, label: str
) -> tuple[DataFrame, list[tuple[int, object, object]]]:
    """Group inventory for one epoch: add the group id (populated-count
    sizing), collect per-group (grp, min_order, max_order) ascending,
    and raise-guard that the replay intervals are strictly ascending
    and disjoint in the epoch's own order coordinates."""
    n_shards = int(
        layout.agg(F.countDistinct("shard_id").alias("n")).collect()[0][
            "n"
        ]
    )
    gsize = (n_shards + _X129_GROUPS - 1) // _X129_GROUPS
    with_grp = layout.withColumn(
        "grp", F.expr(f"CAST(shard_id AS BIGINT) div {gsize}")
    ).withColumn("__ord", order_struct)
    groups = sorted(
        (int(r["grp"]), r["lo"], r["hi"])
        for r in with_grp.groupBy("grp")
        .agg(F.min("__ord").alias("lo"), F.max("__ord").alias("hi"))
        .collect()
    )
    if len(groups) < 2:
        raise AssertionError(
            f"x129 fixture drift: epoch {label} has {len(groups)} "
            "non-empty groups — the multi-epoch session needs a real "
            "per-epoch walk"
        )
    for (g0, _, hi0), (g1, lo1, _) in zip(groups, groups[1:]):
        if not (g0 < g1 and tuple(hi0) < tuple(lo1)):
            raise AssertionError(
                f"x129: epoch {label} groups {g0}->{g1} not disjoint "
                f"ascending in the epoch order ({hi0} vs {lo1}) — the "
                "shard cut must BE the epoch order"
            )
    return with_grp, groups


@query("x129_multi_epoch_training", oracle=_x129_oracle())
def x129(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run ONE prequential NB model through two full epochs — the x123
    seed-5 layout then the x128 seed-7 re-shard — group by group with
    the model carried across the epoch boundary; report the per-epoch
    order fingerprints and the exactly-doubled sufficient-stats
    checksum as one driver-hashable row."""
    from ..streaming.prequential import PrequentialNB

    path1 = _x123_layout(spark, sf_dir)
    layout1 = read_parquet_cached_schema(spark, f"{path1}/shards")
    path2, _span2 = _x128_epoch2_layout(spark, sf_dir)
    layout2 = read_parquet_cached_schema(spark, f"{path2}/data")

    epos = F.struct(
        (
            F.col("pack_id").cast("long") * _X123_PACK
            + F.col("pack_offset").cast("long")
        ).alias("a"),
        F.col("doc_id").cast("long").alias("b"),
    )
    ekey = F.struct(
        F.col("epoch_key").cast("long").alias("a"),
        F.col("doc_id").cast("long").alias("b"),
    )
    g1, groups1 = _epoch_groups(layout1, epos, "1")
    g2, groups2 = _epoch_groups(layout2, ekey, "2")

    loop = PrequentialNB(
        features_col="features", label_col="label", id_col="doc_id"
    )
    stream_stats: dict[tuple[int, int], list[int]] = {}
    bid = 0
    for frame, groups in ((g1, groups1), (g2, groups2)):
        for g, _, _ in groups:
            # partition-pruned group scan; ONE narrow select feeds both
            # the integer stats and the real test-then-train step
            batch = frame.filter(F.col("grp") == g).select(
                "doc_id",
                _x125_features().alias("features"),
                _x125_label().alias("label"),
            )
            _accumulate_stats(stream_stats, _collect_int_stats(batch))
            loop.process_batch(batch, bid)
            bid += 1

    # ---- prequential_history_ok: the model is carried ACROSS the
    # epoch boundary, so only the session's first group lacks a model
    hist = loop.results()
    expected_tests = len(groups1) + len(groups2) - 1
    if len(hist) != expected_tests or any(
        not (0.0 <= acc <= 1.0) for _, acc, _ in hist
    ):
        loop.close()
        raise AssertionError(
            f"x129: bad prequential series (len {len(hist)}, expected "
            f"{expected_tests}) — the epoch-2 groups must test the "
            "epoch-1-trained model, not a fresh one"
        )
    loop.close()

    # ---- two_epoch_stats_exact (the x128 invariant consumed by the
    # REAL loop): accumulated == exactly 2x epoch 1's one-pass recompute
    batch1 = _collect_int_stats(
        layout1.select(
            "doc_id",
            _x125_features().alias("features"),
            _x125_label().alias("label"),
        )
    )
    doubled = {c: [2 * n, 2 * s1, 2 * s2] for c, (n, s1, s2) in batch1.items()}
    if stream_stats != doubled:
        diff = {
            c: (stream_stats.get(c), doubled.get(c))
            for c in set(stream_stats) | set(doubled)
            if stream_stats.get(c) != doubled.get(c)
        }
        raise AssertionError(
            "x129: two-epoch accumulated stats != 2x epoch-1 recompute: "
            f"{dict(list(diff.items())[:3])}"
        )

    # ---- epochs_not_same_order: shard-level order checksums differ
    row = (
        layout1.select("doc_id", F.col("shard_id").alias("s1"))
        .join(
            layout2.select("doc_id", F.col("shard_id").alias("s2")),
            "doc_id",
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                F.col("s1").cast("long") * F.col("doc_id").cast("long")
            ).alias("ck1"),
            F.sum(
                F.col("s2").cast("long") * F.col("doc_id").cast("long")
            ).alias("ck2"),
        )
        .collect()[0]
    )
    ck1, ck2 = int(row["ck1"]), int(row["ck2"])
    if ck1 == ck2:
        raise AssertionError(
            "x129: the two epochs' shard-order checksums coincide — the "
            "re-shard did not change the replay composition"
        )
    return spark.range(1).select(
        F.lit(int(row["n_docs"])).cast("long").alias("n_docs"),
        F.lit(len(groups1)).cast("long").alias("n_batches_epoch1"),
        F.lit(len(groups2)).cast("long").alias("n_batches_epoch2"),
        F.lit(ck1).cast("long").alias("shard_order_checksum_epoch1"),
        F.lit(ck2).cast("long").alias("shard_order_checksum_epoch2"),
        F.lit(_stats_checksum(stream_stats)).cast("long").alias(
            "stats_checksum_two_epochs"
        ),
        F.lit(True).alias("epoch_replay_orders_disjoint_ascending"),
        F.lit(True).alias("epochs_not_same_order"),
        F.lit(True).alias("prequential_history_ok"),
        F.lit(True).alias("two_epoch_stats_exact"),
    )
