"""Round-12 extension queries: checkpoint recovery of the BUILT-IN
stateful streaming surface — VERDICT r11 #2 (x113, the watermarked
window aggregation) plus its siblings for the other two built-in state
shapes (x114, the stream-stream join's buffered state; x115, the
bounded-state dedup's seen-keys map).

Round-17 consolidation (VERDICT r16 #2): the three recovery queries
were separate registry rows through r16 (x113 green r12-r16, x114/x115
green r12-r16) and paid SIX sequential streaming drains per sweep pass
(two incarnations x three shapes, ~25 s cold combined — each drain
mostly data-independent startup + state-store floor). They are now ONE
registry row, x113_checkpoint_recovery_verdict, that kills and resumes
all three state shapes with the incarnations of a phase started
CONCURRENTLY: each shape keeps its own staged layout, checkpoint and
parquet file sink (the three queries share nothing but the wall
clock), run 1 of every shape drains in one window, then run 2 of every
shape resumes from its own checkpoint in a second window. Every
synthesis, precondition and raise-guarded verdict of the three
original queries is preserved verbatim below; only the returned row
shape changed — one FINGERPRINT row per state shape (the x100/x104
pattern: count + key/value sums the oracle recomputes from scratch,
verdict booleans raise-guarded in-query then pinned TRUE).

x99 attested restart-safety for the foreachBatch/CDC upsert path, but
the built-in stateful operators the r11 round closed (x110 watermarked
window aggregation, x111 bounded-state dedup, x112 stream-stream join)
had only ever run UNINTERRUPTED availableNow replays: the one streaming
posture never driver-attested before r12 was killing such a query
mid-replay and resuming it from its ``checkpointLocation``.

Shape 1 — window_agg (the original x113): the exact x110 stack (same
synthesized event-time replay, same watermark/window arithmetic —
constants imported from extensions15, construction cited there) split
across TWO streaming query incarnations sharing one checkpoint and one
parquet FILE sink:

  run 1: batches 0-2 staged -> availableNow drains them -> graceful stop.
         The checkpoint now holds the seen-file log, the open-window
         state store, and watermark 940 (the spacer batch pins it under
         a one- OR two-batch filter lag, the x110 engine fact).
  run 2: batches 3-5 staged into the same directory -> a NEW query on
         the SAME checkpoint + sink resumes: the LATE batch is filtered
         against the RESTORED watermark (940), the accepted straggler
         merges into a window whose partial count lives in the RESTORED
         state store, and the final no-data batch (watermark 2140)
         closes everything through [2040, 2100).

  Verdicts (raise-guarded): watermark_restored — total emitted rows
  match the late-drop arithmetic at watermark 940; window_state
  restored — the [960, 1020) window's count equals its run-1 rows PLUS
  the run-2 accepted straggler; exactly-once — no (win_start,
  event_type) key appears twice across the two incarnations (the
  parquet sink's ``_spark_metadata`` commit log read back through the
  production consumer path).

Shape 2 — join_buffer (the original x114): the x112 two-sided-watermark
stream-stream inner join split after batch 0 of BOTH sources: run 1
emits the same-batch pairs and leaves the cross-batch pair's LEFT row
(key m100 == 83, t = 830) sitting in the join buffer when the query
stops; its RIGHT partner (t = 860) arrives only in the resumed
incarnation, so the pair can ONLY be emitted by matching against the
RESTORED buffer — run-1-snapshot-checked in-query. The late left leg
replays after the resume too, so its drop attests the restored
two-sided watermark. Same margins as x112 (the buffered row's eviction
bound 890 sits above any possible restored watermark 680/710; the late
leg's times <= 970 sit far below the 1740 its batch sees), and the
final sink must equal the uninterrupted x112 emission set, recomputed
from scratch by the oracle.

Shape 3 — dedup_map (the original x115): x111's
`dropDuplicatesWithinWatermark` seen-keys map killed and resumed. The
replay splits after batch 0 (the originals): run 1 emits every first
occurrence and stops with the whole key map in state at watermark 690;
run 2 resumes and replays the WITHIN-HORIZON redelivery first — its
dedup can only come from the RESTORED key map (first-seen t = 930,
expiry >= 1230 under any eviction rule, far above the restored 690),
so a checkpoint that lost the map re-emits it and fails both the
raise-guard and the oracle. The jump/spacer batches then advance the
watermark to 1740 and the BEYOND-HORIZON redelivery re-emits —
eviction executed by the resumed incarnation over restored state.
Final sink must equal x111's uninterrupted emission set, recomputed in
closed form (zero pins).

Together the three shapes complete checkpoint-recovery attestation for
every built-in state shape the engine uses.

Reference parity: the reference's detector loops restart from persisted
model state (``streams/stream_data.py:79-203`` restart + the checkpoint
sinks SURVEY §2.1 S6/S7 cover); this query attests the Spark-native
equivalent for the engine's built-in stateful operators. Driver-gated,
NOT benched (streaming floor, the documented bench budget policy).

Scale shape: three narrow synthesis passes, staged replay writes, and
the standard stateful-operator queries — checkpoint recovery cost is
O(state), independent of corpus size; at 100 TB the same
checkpointLocation mechanics carry a 1000-executor query across
executor loss, driver restart, and code redeploy. The in-process
concurrency here is attestation-budget engineering, not the production
posture — a real cluster runs each recovery independently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .extensions15 import _X110_BASE, _X110_CASE_T, _X110_DELAY, _X110_WIN
from .registry import query
from ..sources.tables import read_parquet_cached_schema


# --------------------------------------------------------------------------
# X114 (folded into x113, round 17): the join-buffer recovery verdict —
# see "Shape 2" in the module docstring. Standalone registry row green
# r12-r16; its synthesis, preconditions, raise-guards and oracle
# emission arithmetic moved verbatim into
# x113_checkpoint_recovery_verdict (VERDICT r16 #2 sweep
# consolidation: the trio shared one staged-layout PATTERN but paid
# three separate streaming drains per incarnation phase).
# --------------------------------------------------------------------------

# --------------------------------------------------------------------------
# X115 (folded into x113, round 17): the dedup-state recovery verdict —
# see "Shape 3" in the module docstring. Standalone registry row green
# r12-r16; folded on the same grounds as x114 above.
# --------------------------------------------------------------------------


def _x113_oracle() -> str:
    b, w = _X110_BASE, _X110_WIN
    return f"""
    WITH w_rows AS (
      SELECT event_id, event_type,
             {_X110_CASE_T} AS t,
             CASE WHEN event_id % 20 = 9 THEN 1
                  WHEN event_id % 20 = 19 THEN 4
                  WHEN event_id % 100 = 11 THEN 2
                  WHEN event_id % 100 = 31 THEN 5
                  WHEN event_id % 10 = 7 THEN 3
                  ELSE 0 END AS batch
      FROM events
    ),
    -- window_agg shape: identical emission arithmetic to x110's oracle;
    -- the late batch is filtered at watermark 1240 - {_X110_DELAY} = 940
    -- (RESTORED from the checkpoint rather than carried in memory), and
    -- the final watermark 2440 - {_X110_DELAY} = 2140 emits windows with
    -- start <= 2080
    w_accepted AS (
      SELECT * FROM w_rows WHERE batch <> 3 OR t >= 900
    ),
    w_emitted AS (
      SELECT CAST({b} + FLOOR(t / {w}) * {w} AS BIGINT) AS win_start,
             event_type
      FROM w_accepted
      WHERE FLOOR(t / {w}) * {w} <= 2080
    ),
    w_grouped AS (
      SELECT win_start, event_type, COUNT(*) AS n
      FROM w_emitted GROUP BY win_start, event_type
    ),
    -- join_buffer shape: the uninterrupted x112 emission set (in-batch
    -- pairs + the cross-restart pair served from the restored buffer)
    j_e AS (
      SELECT event_id AS k, event_id % 100 AS m100,
             event_id % 20 AS m20, event_id % 10 AS m10
      FROM events
    ),
    j_pairs AS (
      SELECT k, m100 * 10 AS lt, m100 * 10 + 30 AS rt FROM j_e
      WHERE m20 NOT IN (9, 19) AND m10 <> 7
        AND m100 NOT IN (11, 31, 51, 83)
      UNION ALL
      SELECT k, 830, 860 FROM j_e WHERE m100 = 83
    ),
    -- dedup_map shape: every key's FIRST occurrence plus the
    -- beyond-horizon redeliveries the evicted state cannot remember
    d_e AS (
      SELECT event_id AS k, event_id % 100 AS m100, event_id % 20 AS m20
      FROM events
    ),
    d_emitted AS (
      SELECT k, CASE WHEN m20 = 9 THEN 2000 + (k % 5) * 10
                     WHEN m100 = 11 THEN 2040
                     ELSE m100 * 10 END AS t
      FROM d_e
      UNION ALL
      SELECT k, 1900 FROM d_e WHERE m100 = 43
    ),
    fp AS (
      SELECT 'window_agg' AS state_shape,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(win_start) AS BIGINT) AS fp_key_sum,
             CAST(SUM(n) AS BIGINT) AS fp_val_sum
      FROM w_grouped
      UNION ALL
      SELECT 'join_buffer',
             CAST(COUNT(*) AS BIGINT),
             CAST(SUM(k) AS BIGINT),
             CAST(SUM(lt) + SUM(rt) AS BIGINT)
      FROM j_pairs
      UNION ALL
      SELECT 'dedup_map',
             CAST(COUNT(*) AS BIGINT),
             CAST(SUM(k) AS BIGINT),
             CAST(SUM(t) AS BIGINT)
      FROM d_emitted
    )
    SELECT state_shape, n_rows, fp_key_sum, fp_val_sum,
           TRUE AS state_restored,
           TRUE AS late_discipline_ok,
           TRUE AS exactly_once_resume
    FROM fp
"""


def _await_all(started: dict, phase: str) -> None:
    """Drain a phase's concurrently-started availableNow queries; a
    timeout or error in any of them stops the rest and raises."""
    for shape, q in started.items():
        if not q.awaitTermination(300):
            for qq in started.values():
                qq.stop()
            raise AssertionError(
                f"x113 {shape} incarnation ({phase}) did not drain in 300s"
            )
        if q.exception() is not None:
            raise q.exception()


@query("x113_checkpoint_recovery_verdict", oracle=_x113_oracle())
def x113(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All three built-in state shapes (watermarked window aggregation,
    stream-stream join buffer, bounded-state dedup key map) killed
    mid-replay and RESUMED from their checkpointLocations, the
    incarnations of each phase drained concurrently; the recovered
    final sinks (real parquet file sinks read through their
    _spark_metadata commit logs) must equal the uninterrupted runs'
    emission sets, which the oracle recomputes — returned as one
    fingerprint row per shape."""
    from ..streaming.replay import (
        read_replay_stream,
        scoped_state_partitions,
        stage_replay_files,
    )
    from .extensions10 import _scratch_index_dir
    from .extensions15 import (
        _X111_BASE,
        _X111_DELAY,
        _X112_BASE,
        _X112_DELAY,
    )

    # ---------------- shape 1: window_agg synthesis (x110's, verbatim —
    # kept inline rather than factored so x110's attested executed path
    # is untouched) ----------------
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type")
    e = F.col("event_id")
    t = (
        F.when(e % 20 == 9, F.lit(1200) + (e % 5) * 10)
        .when(e % 20 == 19, F.lit(2400) + (e % 5) * 10)
        .when(e % 100 == 11, F.lit(1240))
        .when(e % 100 == 31, F.lit(2440))
        .otherwise((e % 100) * 10)
    ).cast("long")
    batch = (
        F.when(e % 20 == 9, 1)
        .when(e % 20 == 19, 4)
        .when(e % 100 == 11, 2)
        .when(e % 100 == 31, 5)
        .when(e % 10 == 7, 3)
        .otherwise(0)
    ).cast("long")
    w_rows = ev.select(
        batch.alias("replay_batch"),
        F.timestamp_seconds(F.lit(_X110_BASE) + t).alias("ts"),
        "event_type",
        t.alias("__t"),
    ).localCheckpoint(eager=True)

    # non-vacuousness preconditions (x110's, asserted BEFORE streaming;
    # r18: one grouped agg serves the leg census and the late split —
    # was two jobs over the same checkpointed rows)
    w_pre = w_rows.groupBy("replay_batch").agg(
        F.count("*").alias("n"),
        F.sum((F.col("__t") < 900).cast("long")).alias("n_lt900"),
    ).collect()
    w_legs = {int(r["replay_batch"]): int(r["n"]) for r in w_pre}
    n_dropped_late = sum(
        int(r["n_lt900"]) for r in w_pre if int(r["replay_batch"]) == 3
    )
    n_accepted_late = w_legs.get(3, 0) - n_dropped_late
    if not all(w_legs.get(i, 0) for i in (0, 1, 2, 4, 5)):
        raise AssertionError(
            f"x113 fixture drift: empty window-agg replay leg {w_legs}"
        )
    if not (n_dropped_late > 0 and n_accepted_late > 0):
        raise AssertionError(
            f"x113 fixture drift: late split dropped={n_dropped_late} "
            f"accepted={n_accepted_late} — a leg is vacuous"
        )

    # ---------------- shape 2: join_buffer synthesis (x112's, verbatim)
    ev_k = load_table(spark, sf_dir, "events").select("event_id")
    m100, m20, m10 = e % 100, e % 20, e % 10
    is_a = ~m20.isin(9, 19) & (m10 != 7) & ~m100.isin(11, 31, 51, 83)

    def leg(cond, b, t_expr, base):
        return ev_k.filter(cond).select(
            F.lit(b).cast("long").alias("replay_batch"),
            e.alias("k"),
            F.timestamp_seconds(
                F.lit(base) + t_expr.cast("long")
            ).alias("ts"),
        )

    j_left = (
        leg(is_a | (m100 == 83), 0, m100 * 10, _X112_BASE)
        .unionByName(
            leg(m20 == 9, 1, F.lit(2000) + (e % 5) * 10, _X112_BASE)
        )
        .unionByName(leg(m100 == 11, 2, F.lit(2040), _X112_BASE))
        .unionByName(leg(m10 == 7, 3, m100 * 10, _X112_BASE))  # LATE leg
        .localCheckpoint(eager=True)
    )
    j_right = (
        leg(is_a | (m10 == 7), 0, m100 * 10 + 30, _X112_BASE)
        .unionByName(
            leg(
                m20 == 19, 1, F.lit(2000) + (e % 5) * 10, _X112_BASE
            ).unionByName(
                # cross-RESTART partner
                leg(m100 == 83, 1, F.lit(860), _X112_BASE)
            )
        )
        .unionByName(leg(m100 == 31, 2, F.lit(2040), _X112_BASE))
        .unionByName(leg(m100 == 51, 3, F.lit(2040), _X112_BASE))
        .localCheckpoint(eager=True)
    )

    # non-vacuousness preconditions (x112's, asserted BEFORE streaming;
    # r18: one grouped agg per side serves the leg census and the
    # cross/late/in-batch counts — was five jobs over the same
    # checkpointed legs)
    l_pre = j_left.groupBy("replay_batch").agg(
        F.count("*").alias("n"),
        F.sum((F.col("k") % 100 == 83).cast("long")).alias("n83"),
    ).collect()
    n_cross = sum(int(r["n83"]) for r in l_pre)
    n_late = sum(
        int(r["n"]) for r in l_pre if int(r["replay_batch"]) == 3
    )
    n_a = (
        sum(int(r["n"]) for r in l_pre if int(r["replay_batch"]) == 0)
        - n_cross
    )
    if not (n_cross > 0 and n_late > 0 and n_a > 0):
        raise AssertionError(
            f"x113 fixture drift: join cross leg {n_cross}, late leg "
            f"{n_late}, in-batch leg {n_a} — a verdict would be vacuous"
        )
    r_pre = j_right.groupBy("replay_batch").count().collect()
    for rows, nm in ((l_pre, "left"), (r_pre, "right")):
        side_legs = sorted(int(r["replay_batch"]) for r in rows)
        if side_legs != [0, 1, 2, 3]:
            raise AssertionError(
                f"x113 fixture drift: join {nm} legs "
                f"{side_legs} != 4 files"
            )

    # ---------------- shape 3: dedup_map synthesis (x111's, verbatim)
    originals = ev_k.filter((m20 != 9) & (m100 != 11)).select(
        F.lit(0).alias("replay_batch"), e.alias("k"), (m100 * 10).alias("t")
    )
    dup_a = ev_k.filter(m100 == 93).select(
        F.lit(1).alias("replay_batch"), e.alias("k"), F.lit(980).alias("t")
    )
    jump = ev_k.filter(m20 == 9).select(
        F.lit(2).alias("replay_batch"),
        e.alias("k"),
        (F.lit(2000) + (e % 5) * 10).alias("t"),
    )
    spacer = ev_k.filter(m100 == 11).select(
        F.lit(3).alias("replay_batch"), e.alias("k"), F.lit(2040).alias("t")
    )
    dup_b = ev_k.filter(m100 == 43).select(
        F.lit(4).alias("replay_batch"), e.alias("k"), F.lit(1900).alias("t")
    )
    d_rows = (
        originals.unionByName(dup_a)
        .unionByName(jump)
        .unionByName(spacer)
        .unionByName(dup_b)
        .select(
            F.col("replay_batch").cast("long").alias("replay_batch"),
            "k",
            F.timestamp_seconds(
                F.lit(_X111_BASE) + F.col("t")
            ).alias("ts"),
        )
        .localCheckpoint(eager=True)
    )

    # non-vacuousness preconditions (x111's)
    d_legs = {
        int(r["replay_batch"]): int(r["n"])
        for r in d_rows.groupBy("replay_batch")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    if not all(d_legs.get(i, 0) for i in range(5)):
        raise AssertionError(
            f"x113 fixture drift: empty dedup replay leg {d_legs}"
        )

    # ---------------- staging dirs, sinks, checkpoints (per shape)
    tmp = _scratch_index_dir(spark, "ckpt113_")
    w_staged, w_sink, w_ckpt = f"{tmp}/w/staged", f"{tmp}/w/sink", f"{tmp}/w/ckpt"
    l_staged, r_staged = f"{tmp}/j/left", f"{tmp}/j/right"
    j_sink, j_ckpt = f"{tmp}/j/sink", f"{tmp}/j/ckpt"
    d_staged, d_sink, d_ckpt = f"{tmp}/d/staged", f"{tmp}/d/sink", f"{tmp}/d/ckpt"
    w_schema = "replay_batch long, ts timestamp, event_type string"
    j_schema = "replay_batch long, k long, ts timestamp"
    d_schema = "replay_batch long, k long, ts timestamp"

    def _stage(df, dest, lo, hi, start_index):
        stage_replay_files(
            df.filter(
                (F.col("replay_batch") >= lo)
                & (F.col("replay_batch") <= hi)
            ),
            "replay_batch",
            dest,
            batch_size=1,
            start_index=start_index,
        )

    def start_window(lo: int, hi: int, start_index: int):
        """Stage window-agg batches [lo, hi], then start an incarnation
        on the SHARED checkpoint + sink (NOT awaited here)."""
        _stage(w_rows.drop("__t"), w_staged, lo, hi, start_index)
        return (
            read_replay_stream(spark, w_staged, w_schema)
            .withWatermark("ts", f"{_X110_DELAY} seconds")
            .groupBy(F.window("ts", f"{_X110_WIN} seconds"), "event_type")
            .agg(F.count("*").alias("n"))
            .select(
                F.col("window.start").cast("long").alias("win_start"),
                "event_type",
                F.col("n").cast("long").alias("n"),
            )
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", w_sink)
            .option("checkpointLocation", w_ckpt)
            .trigger(availableNow=True)
            .start()
        )

    def start_join(lo: int, hi: int, start_index: int):
        """Stage join batches [lo, hi] on BOTH sources (equal file
        counts per phase, so triggers pair deterministically across the
        restart exactly as in x112's single run), then start an
        incarnation."""
        _stage(j_left, l_staged, lo, hi, start_index)
        _stage(j_right, r_staged, lo, hi, start_index)
        ls = (
            read_replay_stream(spark, l_staged, j_schema)
            .withWatermark("ts", f"{_X112_DELAY} seconds")
            .select(F.col("k").alias("lk"), F.col("ts").alias("lts"))
        )
        rs = (
            read_replay_stream(spark, r_staged, j_schema)
            .withWatermark("ts", f"{_X112_DELAY} seconds")
            .select(F.col("k").alias("rk"), F.col("ts").alias("rts"))
        )
        return (
            ls.join(
                rs,
                (F.col("lk") == F.col("rk"))
                & (F.col("rts") >= F.col("lts"))
                & (
                    F.col("rts")
                    <= F.col("lts") + F.expr("INTERVAL 60 SECONDS")
                ),
                "inner",
            )
            .select(
                F.col("lk").alias("k"),
                (F.col("lts").cast("long") - _X112_BASE).alias("lt"),
                (F.col("rts").cast("long") - _X112_BASE).alias("rt"),
            )
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", j_sink)
            .option("checkpointLocation", j_ckpt)
            .trigger(availableNow=True)
            .start()
        )

    def start_dedup(lo: int, hi: int, start_index: int):
        """Stage dedup batches [lo, hi], then start an incarnation."""
        _stage(d_rows, d_staged, lo, hi, start_index)
        return (
            read_replay_stream(spark, d_staged, d_schema)
            .withWatermark("ts", f"{_X111_DELAY} seconds")
            .dropDuplicatesWithinWatermark(["k"])
            .select(
                "k", (F.col("ts").cast("long") - _X111_BASE).alias("t")
            )
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", d_sink)
            .option("checkpointLocation", d_ckpt)
            .trigger(availableNow=True)
            .start()
        )

    # Scoped state partitions (see streaming/replay.py — join state is
    # committed PER SIDE per batch, the heaviest case of the commit
    # overhead the helper documents). One scope covers all six
    # incarnations; each checkpoint pins its count at first start and
    # Spark restores it on resume.
    with scoped_state_partitions(spark):
        # PHASE 1 (concurrent): window batches 0-2 (normal + jump1 +
        # spacer1 — checkpoint persists watermark 940 and open-window
        # state), join batch 0 of both sources (leaves the cross pair's
        # left row in the buffer), dedup batch 0 (the originals — whole
        # key map enters state at watermark 690). Graceful stops.
        _await_all(
            {
                "window_agg": start_window(0, 2, 0),
                "join_buffer": start_join(0, 0, 0),
                "dedup_map": start_dedup(0, 0, 0),
            },
            "run 1",
        )
        # the run-1 snapshot scalars MUST be taken eagerly here (run 2
        # appends to the same sinks), but they ride ONE collect of
        # cross-joined aggs instead of five driver jobs (r18, guide
        # §1.2; the x101 mid-pipeline rule satisfied — the collect
        # executes before run 2 starts)
        mid = (
            read_parquet_cached_schema(spark, w_sink)
            .agg(F.count("*").alias("w_n"))
            .crossJoin(
                read_parquet_cached_schema(spark, j_sink).agg(
                    F.count("*").alias("j_n"),
                    F.coalesce(
                        F.sum((F.col("k") % 100 == 83).cast("long")),
                        F.lit(0),
                    ).alias("j_cross"),
                )
            )
            .crossJoin(
                read_parquet_cached_schema(spark, d_sink).agg(
                    F.count("*").alias("d_n")
                )
            )
            .collect()[0]
        )
        w_n_run1 = int(mid["w_n"])
        j_n_run1 = int(mid["j_n"])
        cross_in_run1 = int(mid["j_cross"])
        d_n_run1 = int(mid["d_n"])

        # PHASE 2 (concurrent): the remaining batches of every shape on
        # the SAME checkpoints (start_index keeps the new staged buckets
        # behind the already-consumed ones in both name and mtime
        # order) — watermark/buffer/key-map recovery happens here.
        _await_all(
            {
                "window_agg": start_window(3, 5, 3),
                "join_buffer": start_join(1, 3, 1),
                "dedup_map": start_dedup(1, 4, 1),
            },
            "run 2",
        )
        w_final = read_parquet_cached_schema(spark, w_sink).localCheckpoint(eager=True)
        j_final = read_parquet_cached_schema(spark, j_sink).localCheckpoint(eager=True)
        d_final = read_parquet_cached_schema(spark, d_sink).localCheckpoint(eager=True)

    # ---------------- raise-guarded verdicts (x113/x114/x115's
    # originals — same predicates, same failure messages; since r18 ALL
    # fourteen guard scalars ride ONE collect of cross-joined 1-row
    # aggs over the checkpointed sinks and the checkpointed w_rows
    # instead of fourteen sequential driver jobs (guide §1.2). The
    # distinct-cardinality guards use COUNT(DISTINCT ...) — the same
    # value the former .distinct().count() computed.
    g = (
        w_final.agg(
            F.count("*").alias("w_n_final"),
            F.coalesce(F.sum("n"), F.lit(0)).alias("total"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("win_start") == _X110_BASE + 960,
                        F.col("n"),
                    )
                ),
                F.lit(0),
            ).alias("got_straggler"),
            F.count_distinct(
                F.col("win_start"), F.col("event_type")
            ).alias("w_n_keys"),
        )
        .crossJoin(
            w_rows.agg(
                F.coalesce(
                    F.sum(
                        (
                            (
                                (F.col("replay_batch") != 3)
                                | (F.col("__t") >= 900)
                            )
                            & (
                                F.floor(F.col("__t") / _X110_WIN)
                                * _X110_WIN
                                <= 2080
                            )
                        ).cast("long")
                    ),
                    F.lit(0),
                ).alias("expected_emitted"),
                F.coalesce(
                    F.sum(
                        (
                            (F.col("replay_batch") == 0)
                            & (F.col("__t") >= 960)
                            & (F.col("__t") < 1020)
                        ).cast("long")
                    ),
                    F.lit(0),
                ).alias("straggler_run1"),
            )
        )
        .crossJoin(
            j_final.agg(
                F.count("*").alias("j_n_final"),
                F.coalesce(
                    F.sum(
                        (
                            (F.col("k") % 100 == 83)
                            & (F.col("lt") == 830)
                            & (F.col("rt") == 860)
                        ).cast("long")
                    ),
                    F.lit(0),
                ).alias("got_cross"),
                F.coalesce(
                    F.sum((F.col("k") % 10 == 7).cast("long")), F.lit(0)
                ).alias("got_late"),
                F.count_distinct(
                    F.col("k"), F.col("lt"), F.col("rt")
                ).alias("j_n_keys"),
            )
        )
        .crossJoin(
            d_final.agg(
                F.count("*").alias("d_n_final"),
                F.coalesce(
                    F.sum(
                        (
                            (F.col("k") % 100 == 93)
                            & (F.col("t") == 980)
                        ).cast("long")
                    ),
                    F.lit(0),
                ).alias("a_keys"),
                F.coalesce(
                    F.sum(
                        (
                            (F.col("k") % 100 == 43)
                            & (F.col("t") == 1900)
                        ).cast("long")
                    ),
                    F.lit(0),
                ).alias("b_got"),
                F.count_distinct(F.col("k"), F.col("t")).alias(
                    "d_n_keys"
                ),
            )
        )
        .collect()[0]
    )

    # shape 1 (x113's originals)
    w_n_final = int(g["w_n_final"])
    if not 0 < w_n_run1 < w_n_final:
        raise AssertionError(
            f"x113 window split vacuous: run1 emitted {w_n_run1} of "
            f"{w_n_final} — the kill point did not land mid-emission"
        )
    n_keys = int(g["w_n_keys"])
    if n_keys != w_n_final:
        raise AssertionError(
            f"x113 window exactly-once regression: {w_n_final} sink rows "
            f"over {n_keys} distinct (win_start, event_type) keys — a "
            f"window was re-emitted across the restart"
        )
    expected_emitted = int(g["expected_emitted"])
    total = int(g["total"])
    if total != expected_emitted:
        raise AssertionError(
            f"x113 watermark-recovery regression: sink holds {total} "
            f"rows, expected {expected_emitted} — the restored watermark "
            f"did not filter the late batch at 940"
        )
    expected_straggler = int(g["straggler_run1"]) + n_accepted_late
    got_straggler = int(g["got_straggler"])
    if got_straggler != expected_straggler:
        raise AssertionError(
            f"x113 state-recovery regression: straggler window counts "
            f"{got_straggler}, expected {expected_straggler} (run-1 rows "
            f"+ {n_accepted_late} accepted late) — the window state did "
            f"not survive the restart"
        )

    # shape 2 (x114's originals)
    j_n_final = int(g["j_n_final"])
    if cross_in_run1 != 0:
        raise AssertionError(
            f"x113 join split vacuous: {cross_in_run1} cross pairs "
            f"emitted BEFORE the stop — the partner leaked into run 1"
        )
    if not 0 < j_n_run1 < j_n_final:
        raise AssertionError(
            f"x113 join split vacuous: run1 emitted {j_n_run1} of "
            f"{j_n_final}"
        )
    got_cross = int(g["got_cross"])
    if got_cross != n_cross:
        raise AssertionError(
            f"x113 buffer-recovery regression: {got_cross}/{n_cross} "
            f"cross-restart pairs emitted — the join buffer did not "
            f"survive the restart"
        )
    got_late = int(g["got_late"])
    if got_late != 0:
        raise AssertionError(
            f"x113 watermark-recovery regression: {got_late} late-leg "
            f"pairs emitted after the resume"
        )
    j_n_keys = int(g["j_n_keys"])
    if j_n_keys != j_n_final:
        raise AssertionError(
            f"x113 join exactly-once regression: {j_n_final} sink rows "
            f"over {j_n_keys} distinct (k, lt, rt) triples — a pair was "
            f"re-emitted across the restart"
        )
    if j_n_final != n_a + n_cross:
        raise AssertionError(
            f"x113 join emission regression: {j_n_final} pairs, expected "
            f"{n_a} in-batch + {n_cross} cross-restart"
        )

    # shape 3 (x115's originals)
    d_n_final = int(g["d_n_final"])
    if d_n_run1 != d_legs[0]:
        raise AssertionError(
            f"x113 dedup split vacuous: run1 emitted {d_n_run1}, "
            f"expected the {d_legs[0]} originals exactly"
        )
    a_keys = int(g["a_keys"])
    if a_keys != 0:
        raise AssertionError(
            f"x113 state-recovery regression: {a_keys} within-horizon "
            f"redeliveries re-emitted — the dedup key map did not "
            f"survive the restart"
        )
    b_got = int(g["b_got"])
    if b_got != d_legs[4]:
        raise AssertionError(
            f"x113 horizon regression: {b_got}/{d_legs[4]} beyond-horizon"
            f" redeliveries re-emitted after the resume"
        )
    d_n_keys = int(g["d_n_keys"])
    d_expected_total = d_legs[0] + d_legs[2] + d_legs[3] + d_legs[4]
    if not (d_n_keys == d_n_final == d_expected_total):
        raise AssertionError(
            f"x113 dedup exactly-once regression: {d_n_final} rows, "
            f"{d_n_keys} distinct (k, t), expected {d_expected_total}"
        )

    # ---------------- fingerprint rows (one per shape; every count and
    # sum recomputed by the oracle from scratch, booleans raise-guarded
    # above then pinned TRUE — the x100/x104 consolidation shape)
    def _verdicts(row: DataFrame) -> DataFrame:
        return row.select(
            "*",
            F.lit(True).alias("state_restored"),
            F.lit(True).alias("late_discipline_ok"),
            F.lit(True).alias("exactly_once_resume"),
        )

    w_fp = w_final.agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum("win_start").cast("long").alias("fp_key_sum"),
        F.sum("n").cast("long").alias("fp_val_sum"),
    ).select(F.lit("window_agg").alias("state_shape"), "*")
    j_fp = j_final.agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum("k").cast("long").alias("fp_key_sum"),
        (F.sum("lt") + F.sum("rt")).cast("long").alias("fp_val_sum"),
    ).select(F.lit("join_buffer").alias("state_shape"), "*")
    d_fp = d_final.agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum("k").cast("long").alias("fp_key_sum"),
        F.sum("t").cast("long").alias("fp_val_sum"),
    ).select(F.lit("dedup_map").alias("state_shape"), "*")
    return _verdicts(w_fp.unionByName(j_fp).unionByName(d_fp))
