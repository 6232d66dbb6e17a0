"""Fifth wave of extension queries: event-time analytics — hypertable-style
time-hierarchy rollups and sequential funnel analysis over the events
stream. Both fully DuckDB-oracle-checked; ``events.ts`` goes through
``load_table``'s nanos→µs truncation so the timestamps agree with DuckDB
to the microsecond. No reference counterpart (SURVEY §1.2); extension
family per §2.9.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query


# --------------------------------------------------------------------------
# x30 — time-hierarchy rollup (hypertable continuous-aggregate shape):
# per-(day, hour) and per-day event stats from ONE pass via GROUPING SETS.
# Map-side partial aggregation collapses each scan partition to the tiny
# (day × hour × type) key space before the shuffle, so this holds at any
# event volume; the multi-granularity output is what a downstream dashboard
# would otherwise maintain as separate materialized views.
# --------------------------------------------------------------------------
@query(
    "x30_time_rollup",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
           CAST(GROUPING(date_trunc('hour', ts)) AS INT) AS is_day_level,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           FLOOR(SUM(value) * 100.0 + 0.5) / 100.0 AS total_value
    FROM events
    GROUP BY GROUPING SETS ((date_trunc('day', ts), date_trunc('hour', ts)),
                            (date_trunc('day', ts)))
    """,
)
def x30(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import portable_round

    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc("day", F.col("ts")).alias("day"),
        F.date_trunc("hour", F.col("ts")).alias("hour"),
        "user_id",
        "value",
    )
    return ev.groupingSets(
        [["day", "hour"], ["day"]], "day", "hour"
    ).agg(
        F.grouping("hour").cast("int").alias("is_day_level"),
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        portable_round(F.sum("value"), 2).alias("total_value"),
    ).select(
        "day", "hour", "is_day_level", "n_events", "n_users", "total_value"
    )


# --------------------------------------------------------------------------
# x31 — sequential funnel (view → click → purchase) per user, single-pass.
# The naive formulation is three self-joins (first view, first click after
# it, first purchase after that); here each stage is a running conditional
# MIN over ONE event-time window — the default RANGE frame makes same-
# timestamp events peers, which matches the oracle's strict ts > bound on
# ties — then one groupBy on the same key, so the whole funnel costs a
# single shuffle on user_id and scales with users, not event pairs.
# --------------------------------------------------------------------------
@query(
    "x31_event_funnel",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t_view FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS t_click
      FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t_view
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS t_purchase
      FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t_click
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    ),
    u AS (SELECT DISTINCT user_id FROM events)
    SELECT u.user_id, v.t_view, c.t_click, p.t_purchase,
           CAST(CASE WHEN v.t_view IS NULL THEN 0 ELSE 1 END
              + CASE WHEN c.t_click IS NULL THEN 0 ELSE 1 END
              + CASE WHEN p.t_purchase IS NULL THEN 0 ELSE 1 END
              AS INT) AS stage
    FROM u
    LEFT JOIN v ON u.user_id = v.user_id
    LEFT JOIN c ON u.user_id = c.user_id
    LEFT JOIN p ON u.user_id = p.user_id
    """,
)
def x31(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type"
    )
    # default frame = RANGE UNBOUNDED PRECEDING..CURRENT ROW: same-ts rows
    # are peers, so a click at exactly the first view's timestamp sees
    # t_view == its own ts and is excluded — identical to the strict
    # ts > bound in the oracle
    w = Window.partitionBy("user_id").orderBy("ts")
    staged = (
        ev.withColumn(
            "fv",
            F.min(
                F.when(F.col("event_type") == "view", F.col("ts"))
            ).over(w),
        )
        .withColumn(
            "ce",
            F.when(
                (F.col("event_type") == "click") & (F.col("ts") > F.col("fv")),
                F.col("ts"),
            ),
        )
        .withColumn("fc", F.min("ce").over(w))
        .withColumn(
            "pe",
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") > F.col("fc")),
                F.col("ts"),
            ),
        )
    )
    agg = staged.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "view", F.col("ts"))
        ).alias("t_view"),
        F.min("ce").alias("t_click"),
        F.min("pe").alias("t_purchase"),
    )
    stage = (
        F.when(F.col("t_view").isNull(), 0).otherwise(1)
        + F.when(F.col("t_click").isNull(), 0).otherwise(1)
        + F.when(F.col("t_purchase").isNull(), 0).otherwise(1)
    )
    return agg.select(
        "user_id",
        "t_view",
        "t_click",
        "t_purchase",
        stage.cast("int").alias("stage"),
    )


# --------------------------------------------------------------------------
# x32 — cohort retention: users grouped by first-seen day, counted by
# day-offset of later activity. Two aggregations on the SAME user_id key
# (first-seen, then the join back), so the second shuffle is avoided by
# partitioning reuse; the final (cohort, offset) matrix is tiny at any
# scale. DATE arithmetic stays in integer day-diffs; cohort day is cast to
# TIMESTAMP on both engines (DATE-typed outputs never hash-match — DuckDB
# upcasts DATE to datetime64 in pandas).
# --------------------------------------------------------------------------
@query(
    "x32_cohort_retention",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, CAST(date_trunc('day', MIN(ts)) AS TIMESTAMP) AS cohort
      FROM events GROUP BY user_id
    )
    SELECT f.cohort AS cohort_day,
           CAST(date_diff('day', CAST(f.cohort AS DATE),
                          CAST(date_trunc('day', e.ts) AS DATE)) AS INT)
             AS day_offset,
           COUNT(DISTINCT e.user_id) AS n_users
    FROM events e JOIN first_seen f ON e.user_id = f.user_id
    GROUP BY 1, 2
    """,
)
def x32(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("cohort")
    )
    return (
        ev.join(first_seen, "user_id")
        .groupBy(
            F.col("cohort").alias("cohort_day"),
            F.datediff(F.date_trunc("day", F.col("ts")), F.col("cohort"))
            .cast("int")
            .alias("day_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


# --------------------------------------------------------------------------
# x33 — blocked fuzzy matching (data-cleaning / entity-resolution family):
# candidate pairs share a cheap blocking key (first word), then exact
# Levenshtein on a bounded prefix decides the match. Blocking is what makes
# fuzzy joins scale: the edit-distance compute runs only within blocks, and
# the shuffle key is the block — at 100 TB you additionally cap block width
# (skew guard) and tier the blocking key (first word, then SimHash band).
# Levenshtein is bit-identical across engines (integer DP).
# --------------------------------------------------------------------------
@query(
    "x33_fuzzy_join",
    oracle="""
    WITH d AS (
      SELECT doc_id, string_split(text, ' ')[1] AS blk,
             substr(text, 1, 24) AS pfx
      FROM documents
    )
    SELECT a.doc_id AS a_id, b.doc_id AS b_id,
           CAST(levenshtein(a.pfx, b.pfx) AS INT) AS dist
    FROM d a JOIN d b ON a.blk = b.blk AND a.doc_id < b.doc_id
    WHERE levenshtein(a.pfx, b.pfx) <= 8
    """,
)
def x33(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        F.element_at(F.split(F.col("text"), " "), 1).alias("blk"),
        F.substring(F.col("text"), 1, 24).alias("pfx"),
    )
    a = d.select(
        F.col("doc_id").alias("a_id"), "blk", F.col("pfx").alias("pa")
    )
    b = d.select(
        F.col("doc_id").alias("b_id"), "blk", F.col("pfx").alias("pb")
    )
    dist = F.levenshtein(F.col("pa"), F.col("pb"))
    return (
        a.join(b, "blk")
        .filter(F.col("a_id") < F.col("b_id"))
        .filter(dist <= 8)
        .select("a_id", "b_id", dist.cast("int").alias("dist"))
    )


# --------------------------------------------------------------------------
# x34 — robust outlier detection via median / MAD per group. Two grouped
# percentile aggregations on the SAME key plus a broadcast join of the tiny
# stats table back onto the facts — no second full shuffle. The stats are
# pinned to 4 decimals BEFORE the threshold compare, so the outlier
# boundary is engine-portable (raw interpolated quantiles can differ in
# the last ulp between engines).
# --------------------------------------------------------------------------
@query(
    "x34_mad_outliers",
    oracle="""
    WITH med AS (
      SELECT o_orderpriority,
             FLOOR((QUANTILE_CONT(o_totalprice, 0.5)) * 10000.0 + 0.5)
               / 10000.0 AS med
      FROM orders GROUP BY o_orderpriority
    ),
    dev AS (
      SELECT o.o_orderpriority, o.o_orderkey,
             ABS(o.o_totalprice - m.med) AS adev, m.med
      FROM orders o JOIN med m ON o.o_orderpriority = m.o_orderpriority
    ),
    mad AS (
      SELECT o_orderpriority,
             FLOOR((QUANTILE_CONT(adev, 0.5)) * 10000.0 + 0.5)
               / 10000.0 AS mad
      FROM dev GROUP BY o_orderpriority
    )
    SELECT d.o_orderpriority, d.med, mad.mad,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN d.adev > 3 * mad.mad THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers
    FROM dev d JOIN mad ON d.o_orderpriority = mad.o_orderpriority
    GROUP BY d.o_orderpriority, d.med, mad.mad
    """,
)
def x34(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import portable_round

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_orderkey", "o_totalprice"
    )
    med = orders.groupBy("o_orderpriority").agg(
        portable_round(
            F.percentile(F.col("o_totalprice"), F.lit(0.5)), 4
        ).alias("med")
    )
    dev = orders.join(F.broadcast(med), "o_orderpriority").select(
        "o_orderpriority",
        "med",
        F.abs(F.col("o_totalprice") - F.col("med")).alias("adev"),
    )
    mad = dev.groupBy("o_orderpriority").agg(
        portable_round(F.percentile(F.col("adev"), F.lit(0.5)), 4).alias(
            "mad"
        )
    )
    return (
        dev.join(F.broadcast(mad), "o_orderpriority")
        .groupBy("o_orderpriority", "med", "mad")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("adev") > 3 * F.col("mad"), 1).otherwise(0)
            ).alias("n_outliers"),
        )
        .select("o_orderpriority", "med", "mad", "n", "n_outliers")
    )


# --------------------------------------------------------------------------
# q58 — global ranking at scale: every order ranked under the total order
# (price desc, key asc) WITHOUT a single-partition window — range
# repartition + per-partition offsets + local enumeration
# (operators/order.py). The oracle is the plain one-window ROW_NUMBER.
# --------------------------------------------------------------------------
@query(
    "q58_global_rank",
    oracle="""
    SELECT o_orderkey,
           FLOOR(o_totalprice * 100.0 + 0.5) / 100.0 AS price,
           ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey)
             AS rank
    FROM orders
    """,
)
def q58(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import portable_round
    from ..operators.order import global_rank

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    ranked = global_rank(
        orders, [F.desc("o_totalprice"), F.asc("o_orderkey")]
    )
    return ranked.select(
        "o_orderkey",
        portable_round(F.col("o_totalprice"), 2).alias("price"),
        "rank",
    )
