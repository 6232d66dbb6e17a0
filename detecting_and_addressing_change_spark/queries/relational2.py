"""Second relational batch: event-time windows, cube grouping, exact
percentiles, portable string-function coverage — extensions past the
reference's count-based windows (SURVEY §2.6 note: event-time semantics
come free from running the same operators over the events table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import portable_round
from ..sources.tables import load_table
from .registry import query


# --------------------------------------------------------------------------
# Q34 — event-time tumbling window (wall-clock analogue of A3's count
# windows; in streaming mode the same agg runs under withWatermark)
# --------------------------------------------------------------------------
@query(
    "q34_time_window",
    oracle="""
    SELECT DATE_TRUNC('hour', ts) AS hour_start,
           event_type,
           COUNT(*) AS cnt,
           FLOOR((AVG(value)) * 100.0 + 0.5) / 100.0 AS avg_value
    FROM events
    GROUP BY hour_start, event_type
    """,
)
def q34(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour_start"),
            "event_type",
        )
        .agg(
            F.count("*").alias("cnt"),
            portable_round(F.avg("value"), 2).alias("avg_value"),
        )
    )


# --------------------------------------------------------------------------
# Q35 — CUBE grouping sets (beyond Q14's rollup)
# --------------------------------------------------------------------------
@query(
    "q35_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt,
           FLOOR((SUM(o_totalprice)) * 100.0 + 0.5) / 100.0 AS sum_price
    FROM orders
    GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
)
def q35(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("cnt"),
            portable_round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
    )


# --------------------------------------------------------------------------
# Q36 — exact percentiles (median/quartiles with linear interpolation;
# Spark `percentile` and DuckDB `quantile_cont` share the definition)
# --------------------------------------------------------------------------
@query(
    "q36_percentiles",
    oracle="""
    SELECT l_returnflag,
           FLOOR((QUANTILE_CONT(l_extendedprice, 0.5)) * 10000.0 + 0.5) / 10000.0 AS p50,
           FLOOR((QUANTILE_CONT(l_extendedprice, 0.9)) * 10000.0 + 0.5) / 10000.0 AS p90
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q36(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # one array-form percentile: two scalar percentile aggs each buffer
    # the whole group's values separately (the x56 r17 finding)
    return li.groupBy("l_returnflag").agg(
        F.expr(
            "percentile(l_extendedprice, array(0.5, 0.9))"
        ).alias("ps")
    ).select(
        "l_returnflag",
        portable_round(F.col("ps")[0], 4).alias("p50"),
        portable_round(F.col("ps")[1], 4).alias("p90"),
    )


# --------------------------------------------------------------------------
# Q37 — portable string-function coverage (concat/substr/upper/replace/
# lpad/reverse/left-pad lengths)
# --------------------------------------------------------------------------
@query(
    "q37_string_functions",
    oracle="""
    SELECT o_orderkey,
           UPPER(o_orderpriority) AS up,
           SUBSTR(o_orderpriority, 1, 1) AS first_ch,
           REPLACE(o_orderpriority, '-', '_') AS repl,
           LPAD(CAST(o_orderkey AS VARCHAR), 12, '0') AS padded,
           REVERSE(o_orderstatus) AS rev,
           CAST(LENGTH(o_orderpriority) AS INT) AS plen,
           CONCAT(o_orderstatus, '/', o_orderpriority) AS joined
    FROM orders
    """,
)
def q37(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.upper("o_orderpriority").alias("up"),
        F.substring("o_orderpriority", 1, 1).alias("first_ch"),
        F.replace(
            F.col("o_orderpriority"), F.lit("-"), F.lit("_")
        ).alias("repl"),
        F.lpad(F.col("o_orderkey").cast("string"), 12, "0").alias("padded"),
        F.reverse("o_orderstatus").alias("rev"),
        F.length("o_orderpriority").alias("plen"),
        F.concat_ws("/", "o_orderstatus", "o_orderpriority").alias("joined"),
    )


# --------------------------------------------------------------------------
# Q38 — conditional scalar coverage: least/greatest/coalesce/nullif + CASE
# --------------------------------------------------------------------------
@query(
    "q38_conditional_scalars",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           FLOOR((LEAST(l_discount, l_tax)) * 10000.0 + 0.5) / 10000.0 AS lo,
           FLOOR((GREATEST(l_discount, l_tax)) * 10000.0 + 0.5) / 10000.0 AS hi,
           COALESCE(NULLIF(l_returnflag, 'N'), 'none') AS flag_or_none,
           CASE WHEN l_quantity >= 25 THEN 'bulk'
                WHEN l_quantity >= 10 THEN 'mid'
                ELSE 'small' END AS size_band
    FROM lineitem
    """,
)
def q38(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        portable_round(F.least("l_discount", "l_tax"), 4).alias("lo"),
        portable_round(F.greatest("l_discount", "l_tax"), 4).alias("hi"),
        F.coalesce(
            F.nullif(F.col("l_returnflag"), F.lit("N")), F.lit("none")
        ).alias("flag_or_none"),
        F.when(F.col("l_quantity") >= 25, F.lit("bulk"))
        .when(F.col("l_quantity") >= 10, F.lit("mid"))
        .otherwise(F.lit("small"))
        .alias("size_band"),
    )


# --------------------------------------------------------------------------
# Q40 — RANGE window frame (value-based, vs Q17's ROWS frame)
# --------------------------------------------------------------------------
@query(
    "q40_range_frame",
    oracle="""
    SELECT o_orderkey,
           CAST(COUNT(*) OVER (
             PARTITION BY o_custkey ORDER BY o_totalprice
             RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW) AS BIGINT)
             AS near_cnt
    FROM orders
    """,
)
def q40(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_totalprice")
        .rangeBetween(-1000, Window.currentRow)
    )
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.count("*").over(w).cast("bigint").alias("near_cnt")
    )


# --------------------------------------------------------------------------
# Q41 — first/last/nth window values over full-partition frames
# --------------------------------------------------------------------------
@query(
    "q41_first_last_nth",
    oracle="""
    SELECT o_orderkey,
           FIRST_VALUE(o_orderkey) OVER w AS first_ok,
           LAST_VALUE(o_orderkey) OVER w AS last_ok,
           NTH_VALUE(o_orderkey, 2) OVER w AS second_ok
    FROM orders
    WINDOW w AS (
      PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def q41(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_ok"),
        F.last("o_orderkey").over(w).alias("last_ok"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_ok"),
    )


# --------------------------------------------------------------------------
# Q42 — array scalar functions over the split word array (size, contains,
# position, distinct-sorted join) — scalar outputs only, so the value hash
# is type-stable in both engines
# --------------------------------------------------------------------------
@query(
    "q42_array_functions",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INT) AS n_words,
           CASE WHEN list_contains(string_split(text, ' '), 'scan')
                THEN 1 ELSE 0 END AS has_scan,
           CAST(COALESCE(list_position(string_split(text, ' '), 'scan'), 0)
                AS INT) AS scan_pos,
           array_to_string(
             list_sort(list_distinct(
               list_slice(string_split(text, ' '), 1, 5))), ',') AS head_sorted
    FROM documents
    """,
)
def q42(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    ws = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.size(ws).alias("n_words"),
        F.array_contains(ws, "scan").cast("int").alias("has_scan"),
        F.array_position(ws, "scan").cast("int").alias("scan_pos"),
        F.array_join(
            F.array_sort(F.array_distinct(F.slice(ws, 1, 5))), ","
        ).alias("head_sorted"),
    )


# --------------------------------------------------------------------------
# Q43 — as-of join (operators/asof.py): for every event, the value of the
# same user's most recent 'purchase' at-or-before it. Oracle expresses the
# identical semantics as a correlated window in SQL.
# --------------------------------------------------------------------------
@query(
    "q43_asof_join",
    oracle="""
    WITH tagged AS (
      SELECT user_id, event_id, ts, event_type, value,
             MAX(CASE WHEN event_type = 'purchase' THEN ts END) OVER w
               AS last_purchase_ts
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    with_val AS (
      SELECT t.event_id, t.user_id,
             FLOOR((p.value) * 100.0 + 0.5) / 100.0 AS last_purchase_value
      FROM tagged t
      LEFT JOIN events p
        ON p.user_id = t.user_id AND p.ts = t.last_purchase_ts
       AND p.event_type = 'purchase'
    )
    SELECT event_id, user_id, last_purchase_value FROM with_val
    """,
)
def q43(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.asof import as_of_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    out = as_of_join(
        ev,
        purchases,
        key="user_id",
        left_time="ts",
        right_time="ts",
        right_value="value",
        out_col="last_purchase_value",
    )
    return out.select(
        "event_id",
        "user_id",
        portable_round(F.col("last_purchase_value"), 2).alias(
            "last_purchase_value"
        ),
    )


# --------------------------------------------------------------------------
# Q44 — range join into value bins (broadcast non-equi join)
# --------------------------------------------------------------------------
@query(
    "q44_range_join_bins",
    oracle="""
    WITH bins AS (
      SELECT UNNEST(GENERATE_SERIES(0, 9)) * 10.0 AS lo,
             (UNNEST(GENERATE_SERIES(0, 9)) + 1) * 10.0 AS hi
    )
    SELECT CAST(b.lo AS INT) AS bin_lo, COUNT(*) AS cnt,
           FLOOR((AVG(e.value)) * 10000.0 + 0.5) / 10000.0 AS avg_value
    FROM events e JOIN bins b ON e.value >= b.lo AND e.value < b.hi
    GROUP BY b.lo
    """,
)
def q44(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.asof import range_join_bins

    ev = load_table(spark, sf_dir, "events")
    bins = spark.range(10).select(
        (F.col("id") * 10.0).alias("lo"),
        ((F.col("id") + 1) * 10.0).alias("hi"),
    )
    joined = range_join_bins(ev, bins, "value")
    return joined.groupBy(F.col("lo").cast("int").alias("bin_lo")).agg(
        F.count("*").alias("cnt"),
        portable_round(F.avg("value"), 4).alias("avg_value"),
    )
