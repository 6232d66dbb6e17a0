"""Relational core — the declared oracle queries Q1–Q24 of SURVEY §2.8.

Each query exercises one operator family from SURVEY §2.1–2.6 using the
idiomatic Spark primitive named there (scan/filter/project, string pipeline
R1, word-count A1/A2, joins J1–J6, grouped aggs A3/A4, windows, rollup, set
ops, CASE gates T2/T4, date functions, deterministic hash split O3).

All implemented with the DataFrame API; the oracle strings are independent
DuckDB SQL over the same parquet views. Floating-point outputs are rounded
at the query boundary (FLOOR((x) * 100.0 + 0.5) / 100.0) in BOTH engines so aggregation-order ulp
noise cannot flip the value hash (SURVEY §7 "What's hard" #2).

Note: SURVEY §2.8 wrote Q3/Q4 against ``o_comment``; the driver's testdata
has no comment columns, so the string-pipeline and word-count queries run on
``documents.text`` instead (same operator family, same shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.rounding import portable_round
from ..sources.tables import load_table
from .registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# Q1 — scan + projection + cast (S1 + R2)
# --------------------------------------------------------------------------
@query(
    "q01_scan_project_cast",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(FLOOR(l_quantity) AS INT) AS qty
    FROM lineitem
    """,
)
def q01(spark: SparkSession, sf_dir: str) -> DataFrame:
    # FLOOR before the int cast: Spark ANSI truncates double->int while
    # DuckDB rounds, so the cast is pinned to floor semantics in both.
    return _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.floor("l_quantity").cast("int").alias("qty"),
    )


# --------------------------------------------------------------------------
# Q2 — filter / predicate gate (T4-style)
# --------------------------------------------------------------------------
@query(
    "q02_filter_predicate",
    oracle="""
    SELECT l_orderkey, l_linenumber
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
    """,
)
def q02(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
    ).select("l_orderkey", "l_linenumber")


# --------------------------------------------------------------------------
# Q3 — string cleaning pipeline (R1, utils/formatting.py:7-36 in reference)
# --------------------------------------------------------------------------
@query(
    "q03_clean_text",
    oracle=r"""
    SELECT doc_id,
           LOWER(TRIM(REGEXP_REPLACE(text, '\s+', ' ', 'g'))) AS clean
    FROM documents
    """,
)
def q03(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Spark regexp_replace is global by default; DuckDB needs the 'g' flag.
    from ..functions.text import clean_text_col

    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", clean_text_col(F.col("text")).alias("clean"))


# --------------------------------------------------------------------------
# Q4 — word count + top-k (A1/A2, adaptation/dataset.py:193-212 in reference)
# --------------------------------------------------------------------------
@query(
    "q04_word_count_topk",
    oracle="""
    SELECT w AS word, COUNT(*) AS c
    FROM (SELECT UNNEST(STRING_SPLIT(text, ' ')) AS w FROM documents)
    GROUP BY w
    ORDER BY c DESC, word
    LIMIT 100
    """,
)
def q04(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.topk import word_count, top_k

    docs = _t(spark, sf_dir, "documents")
    return top_k(word_count(docs, "text"), k=100)


# --------------------------------------------------------------------------
# Q5 — grouped top-k with deterministic tie-break (A2/O1/O2, SURVEY §8 Q6)
# --------------------------------------------------------------------------
@query(
    "q05_topk_tiebreak",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS c
    FROM customer
    GROUP BY c_mktsegment
    ORDER BY c DESC, c_mktsegment
    LIMIT 3
    """,
)
def q05(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), F.asc("c_mktsegment"))
        .limit(3)
    )


# --------------------------------------------------------------------------
# Q6 — inner equi-join (J1: the reference's positional X-y alignment,
# streams/loaders.py:41-51, as an explicit join)
# --------------------------------------------------------------------------
@query(
    "q06_inner_join",
    oracle="""
    SELECT o_orderkey, c_name
    FROM orders JOIN customer ON o_custkey = c_custkey
    """,
)
def q06(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    return orders.join(
        customer, orders.o_custkey == customer.c_custkey, "inner"
    ).select("o_orderkey", "c_name")


# --------------------------------------------------------------------------
# Q7 — multi-join chain over dim tables (J2) — nation/region broadcast
# --------------------------------------------------------------------------
@query(
    "q07_multi_join_agg",
    oracle="""
    SELECT n_name, r_name, COUNT(*) AS cnt
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY n_name, r_name
    """,
)
def q07(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    nation = F.broadcast(_t(spark, sf_dir, "nation"))
    region = F.broadcast(_t(spark, sf_dir, "region"))
    return (
        customer.join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(region, F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name", "r_name")
        .agg(F.count("*").alias("cnt"))
    )


# --------------------------------------------------------------------------
# Q8 — left outer join + count-skips-nulls
# --------------------------------------------------------------------------
@query(
    "q08_left_outer_join",
    oracle="""
    SELECT c_custkey, COUNT(o_orderkey) AS order_cnt
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
)
def q08(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("order_cnt"))
    )


# --------------------------------------------------------------------------
# Q9 — left semi join (J3 existence)
# --------------------------------------------------------------------------
@query(
    "q09_semi_join",
    oracle="""
    SELECT c_custkey FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def q09(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return customer.join(
        orders, F.col("c_custkey") == F.col("o_custkey"), "left_semi"
    ).select("c_custkey")


# --------------------------------------------------------------------------
# Q10 — left anti join
# --------------------------------------------------------------------------
@query(
    "q10_anti_join",
    oracle="""
    SELECT c_custkey FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return customer.join(
        orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey")


# --------------------------------------------------------------------------
# Q11 — fact x small-dim broadcast joins (J5 σ-schedule-lookup shape)
# --------------------------------------------------------------------------
@query(
    "q11_broadcast_dim_join",
    oracle="""
    SELECT l_orderkey, l_linenumber, n_name
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    """,
)
def q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = _t(spark, sf_dir, "lineitem")
    supplier = F.broadcast(_t(spark, sf_dir, "supplier"))
    nation = F.broadcast(_t(spark, sf_dir, "nation"))
    return (
        lineitem.join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("l_orderkey", "l_linenumber", "n_name")
    )


# --------------------------------------------------------------------------
# Q12 — TPC-H Q1-shaped grouped aggregation (A3 windowed-mean family)
# --------------------------------------------------------------------------
@query(
    "q12_grouped_agg",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           FLOOR((SUM(l_quantity)) * 100.0 + 0.5) / 100.0 AS sum_qty,
           FLOOR((AVG(l_extendedprice)) * 100.0 + 0.5) / 100.0 AS avg_price,
           MIN(l_shipdate) AS min_ship,
           MAX(l_shipdate) AS max_ship,
           COUNT(*) AS cnt
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            portable_round(F.sum("l_quantity"), 2).alias("sum_qty"),
            portable_round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.min("l_shipdate").alias("min_ship"),
            F.max("l_shipdate").alias("max_ship"),
            F.count("*").alias("cnt"),
        )
    )


# --------------------------------------------------------------------------
# Q13 — distinct aggregate
# --------------------------------------------------------------------------
@query(
    "q13_count_distinct",
    oracle="SELECT COUNT(DISTINCT o_custkey) AS cnt FROM orders",
)
def q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "orders").agg(
        F.count_distinct("o_custkey").alias("cnt")
    )


# --------------------------------------------------------------------------
# Q14 — rollup (grouping sets)
# --------------------------------------------------------------------------
@query(
    "q14_rollup",
    oracle="""
    SELECT n_name, c_mktsegment, COUNT(*) AS cnt
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY ROLLUP(n_name, c_mktsegment)
    """,
)
def q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer")
    nation = F.broadcast(_t(spark, sf_dir, "nation"))
    return (
        customer.join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .rollup("n_name", "c_mktsegment")
        .agg(F.count("*").alias("cnt"))
    )


# --------------------------------------------------------------------------
# Q15 — confusion-matrix shape (A4, utils/metrics.py:6-32 in reference)
# --------------------------------------------------------------------------
@query(
    "q15_confusion_matrix_shape",
    oracle="""
    SELECT a.o_orderpriority AS p1, b.o_orderstatus AS p2, COUNT(*) AS cnt
    FROM orders a JOIN orders b ON a.o_orderkey = b.o_orderkey
    GROUP BY p1, p2
    """,
)
def q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = _t(spark, sf_dir, "orders").alias("a")
    b = _t(spark, sf_dir, "orders").alias("b")
    return (
        a.join(b, F.col("a.o_orderkey") == F.col("b.o_orderkey"))
        .groupBy(
            F.col("a.o_orderpriority").alias("p1"),
            F.col("b.o_orderstatus").alias("p2"),
        )
        .agg(F.count("*").alias("cnt"))
    )


# --------------------------------------------------------------------------
# Q16 — ranking window (A5/O2)
# --------------------------------------------------------------------------
@query(
    "q16_window_rank",
    oracle="""
    SELECT o_custkey, o_orderkey, CAST(rnk AS INT) AS rnk FROM (
      SELECT o_custkey, o_orderkey,
             ROW_NUMBER() OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rnk
      FROM orders)
    WHERE rnk <= 2
    """,
)
def q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        _t(spark, sf_dir, "orders")
        .select(
            "o_custkey", "o_orderkey", F.row_number().over(w).alias("rnk")
        )
        .filter(F.col("rnk") <= 2)
    )


# --------------------------------------------------------------------------
# Q17 — analytic frame window: running mean (A3)
# --------------------------------------------------------------------------
@query(
    "q17_window_running_avg",
    oracle="""
    SELECT o_orderkey,
           FLOOR((AVG(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)) * 100.0 + 0.5) / 100.0 AS run_avg
    FROM orders
    """,
)
def q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, Window.currentRow)
    )
    return _t(spark, sf_dir, "orders").select(
        "o_orderkey", portable_round(F.avg("o_totalprice").over(w), 2).alias("run_avg")
    )


# --------------------------------------------------------------------------
# Q18 — lag/lead window (T1 state-delta shape)
# --------------------------------------------------------------------------
@query(
    "q18_window_lag",
    oracle="""
    SELECT o_orderkey,
           CAST(DATE_DIFF('day',
                CAST(LAG(o_orderdate) OVER (
                  PARTITION BY o_custkey
                  ORDER BY o_orderdate, o_orderkey) AS DATE),
                CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since_prev
    FROM orders
    """,
)
def q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_orderdate").over(w)
    return _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), prev)
        .cast("bigint")
        .alias("days_since_prev"),
    )


# --------------------------------------------------------------------------
# Q19 — set ops (O6/J6 union family): intersect / except / union-all
# --------------------------------------------------------------------------
@query(
    "q19a_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
)
def q19a(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = _t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.intersect(s)


@query(
    "q19b_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey FROM supplier
    """,
)
def q19b(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = _t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    # subtract == EXCEPT DISTINCT (exceptAll would keep keys whose
    # multiplicity in c merely exceeds that in s)
    return c.subtract(s)


@query(
    "q19c_union_all_count",
    oracle="""
    SELECT nationkey, COUNT(*) AS cnt FROM (
      SELECT c_nationkey AS nationkey FROM customer
      UNION ALL
      SELECT s_nationkey FROM supplier)
    GROUP BY nationkey
    """,
)
def q19c(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = _t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.unionByName(s).groupBy("nationkey").agg(F.count("*").alias("cnt"))


# --------------------------------------------------------------------------
# Q20 — CASE flagging (T2 drift-flag classification shape)
# --------------------------------------------------------------------------
@query(
    "q20_case_flags",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_discount >= 0.08 THEN 'D'
                WHEN l_discount >= 0.05 THEN 'W'
                ELSE 'N' END AS flag
    FROM lineitem
    """,
)
def q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ddm import flag_case_expr

    return _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        flag_case_expr(
            F.col("l_discount"), drift_at=0.08, warn_at=0.05
        ).alias("flag"),
    )


# --------------------------------------------------------------------------
# Q21 — date functions
# --------------------------------------------------------------------------
@query(
    "q21_date_parts",
    oracle="""
    SELECT o_orderkey,
           CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS yr,
           CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS mth
    FROM orders
    """,
)
def q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mth"),
    )


# --------------------------------------------------------------------------
# Q22 — deterministic hash split (O3; shared arithmetic LCG because the
# engines' built-in HASH functions differ)
# --------------------------------------------------------------------------
@query(
    "q22_hash_split",
    oracle="""
    SELECT COUNT(*) AS cnt FROM lineitem
    WHERE ((l_orderkey * 100000 + l_linenumber) % 2147483648)
          * 1103515245 % 2147483648 % 5 = 0
    """,
)
def q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.hashing import lcg_bucket

    li = _t(spark, sf_dir, "lineitem")
    key = F.col("l_orderkey") * 100000 + F.col("l_linenumber")
    return li.filter(lcg_bucket(key, 5) == 0).agg(F.count("*").alias("cnt"))


# --------------------------------------------------------------------------
# Q23 — MSE shape (A6, adaptation/mapping.py:39-41 in reference)
# --------------------------------------------------------------------------
@query(
    "q23_mse",
    oracle="""
    SELECT FLOOR((AVG(POWER(l_extendedprice - p_retailprice, 2))) * 100.0 + 0.5) / 100.0 AS mse
    FROM lineitem JOIN part ON l_partkey = p_partkey
    """,
)
def q23(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = F.broadcast(_t(spark, sf_dir, "part"))
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            portable_round(
                F.avg(
                    F.pow(F.col("l_extendedprice") - F.col("p_retailprice"), 2)
                ),
                2,
            ).alias("mse")
        )
    )


# --------------------------------------------------------------------------
# Q24 — count-windowed mean over the events stream in batch replay (the
# exact A3 shape: floor(seq_id / batch) buckets,
# streams/run_stream_supervised.py:69-72 in reference)
# --------------------------------------------------------------------------
@query(
    "q24_count_window_mean",
    oracle="""
    SELECT CAST(FLOOR(event_id / 32) AS INT) AS bucket,
           FLOOR((AVG(value)) * 100.0 + 0.5) / 100.0 AS avg_value,
           COUNT(*) AS cnt
    FROM events
    GROUP BY bucket
    """,
)
def q24(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.windows import count_window_agg

    ev = _t(spark, sf_dir, "events")
    return count_window_agg(
        ev,
        seq_col="event_id",
        batch_size=32,
        aggs=[
            portable_round(F.avg("value"), 2).alias("avg_value"),
            F.count("*").alias("cnt"),
        ],
    )


# --------------------------------------------------------------------------
# Q26 — JSON scalar extraction (events.props)
# --------------------------------------------------------------------------
@query(
    "q26_json_extract",
    oracle="""
    SELECT event_id,
           CAST(JSON_EXTRACT_STRING(props, '$.k') AS INT) AS k
    FROM events
    """,
)
def q26(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "events").select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )


# --------------------------------------------------------------------------
# Q27 — sessionization via lag + cumulative sum (gap > 30 min); the
# window-function analogue of the reference's stream-position bookkeeping.
# --------------------------------------------------------------------------
@query(
    "q27_sessionize",
    oracle="""
    SELECT user_id, event_id,
           CAST(SUM(new_sess) OVER (
             PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS session_id
    FROM (
      SELECT user_id, event_id, ts,
             CASE WHEN EPOCH(ts) - EPOCH(LAG(ts) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id)) > 1800.0
                  OR LAG(ts) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_sess
      FROM events)
    """,
)
def q27(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    new_sess = F.when(
        prev_ts.isNull()
        | (F.col("ts").cast("double") - prev_ts.cast("double") > 1800.0),
        F.lit(1),
    ).otherwise(F.lit(0))
    ev = _t(spark, sf_dir, "events").withColumn("new_sess", new_sess)
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.sum("new_sess").over(w2).cast("bigint").alias("session_id"),
    )
