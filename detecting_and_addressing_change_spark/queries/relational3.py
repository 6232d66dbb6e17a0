"""Third relational wave: map scalar functions, interval/date arithmetic,
statistical aggregates — plus the LSTM inference surface (U1/U3) exposed as
a registry entry (rows-only: model compute is not SQL-expressible; its
numerics are pinned by tests/test_lstm.py golden vectors).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import portable_round
from ..sources.tables import load_table
from .registry import query


# --------------------------------------------------------------------------
# Q49 — map construction + extraction scalars. DuckDB's map[key] yields a
# one-element LIST, hence the [1] subscripts in the oracle; Spark's
# element_at yields the scalar directly.
# --------------------------------------------------------------------------
@query(
    "q49_map_functions",
    oracle="""
    SELECT o_orderkey,
           MAP {'status': o_orderstatus, 'priority': o_orderpriority}
             ['status'][1] AS status_v,
           MAP {'status': o_orderstatus, 'priority': o_orderpriority}
             ['priority'][1] AS priority_v,
           CAST(cardinality(MAP {'status': o_orderstatus,
                                 'priority': o_orderpriority}) AS INT)
             AS n_keys
    FROM orders
    """,
)
def q49(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    m = F.create_map(
        F.lit("status"), F.col("o_orderstatus"),
        F.lit("priority"), F.col("o_orderpriority"),
    )
    return orders.select(
        "o_orderkey",
        F.element_at(m, "status").alias("status_v"),
        F.element_at(m, "priority").alias("priority_v"),
        F.size(m).alias("n_keys"),
    )


# --------------------------------------------------------------------------
# Q50 — interval / date arithmetic: add_months, date_add, datediff,
# last_day, quarter-trunc. DuckDB DATE + INTERVAL promotes to TIMESTAMP,
# pinned back with CAST AS DATE.
# --------------------------------------------------------------------------
# All date-valued outputs are cast to TIMESTAMP on BOTH engines: DuckDB's
# pandas bridge upcasts DATE to datetime64 while Spark keeps datetime.date,
# so a DATE output can never hash-match — midnight TIMESTAMPs do (q34
# precedent).
@query(
    "q50_interval_arithmetic",
    oracle="""
    SELECT o_orderkey,
           CAST(CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS TIMESTAMP)
             AS plus_3m,
           -- NOT "+ INTERVAL 90 DAY": DuckDB 1.0.0's subexpression
           -- elimination considers INTERVAL 3 MONTH == INTERVAL 90 DAY
           -- (interval comparison normalizes 1 month to 30 days) and
           -- silently reuses the plus_3m expression; DATE + integer
           -- sidesteps the conflation
           CAST(CAST(o_orderdate AS DATE) + 90 AS TIMESTAMP) AS plus_90d,
           CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
                AS INT) AS days_since_95,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP)
             AS month_end,
           CAST(date_trunc('quarter', o_orderdate) AS TIMESTAMP)
             AS quarter_start
    FROM orders
    """,
)
def q50(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.add_months("o_orderdate", 3).cast("timestamp").alias("plus_3m"),
        F.date_add("o_orderdate", 90).cast("timestamp").alias("plus_90d"),
        F.datediff("o_orderdate", F.lit("1995-01-01").cast("date"))
        .cast("int")
        .alias("days_since_95"),
        F.last_day("o_orderdate").cast("timestamp").alias("month_end"),
        F.date_trunc("quarter", "o_orderdate").alias("quarter_start"),
    )


# --------------------------------------------------------------------------
# Q51 — statistical aggregates: sample/population stddev & variance,
# Pearson correlation, covariance. All map-side combinable in Spark
# (partial moment sums), so they scale like any HashAggregate.
# --------------------------------------------------------------------------
@query(
    "q51_stats_aggregates",
    oracle="""
    SELECT l_returnflag,
           FLOOR(stddev_samp(l_quantity) * 1000000.0 + 0.5) / 1000000.0
             AS sd_qty,
           FLOOR(var_samp(l_quantity) * 1000000.0 + 0.5) / 1000000.0
             AS var_qty,
           FLOOR(stddev_pop(l_discount) * 1000000.0 + 0.5) / 1000000.0
             AS sdp_disc,
           FLOOR(corr(l_quantity, l_extendedprice) * 1000000.0 + 0.5)
             / 1000000.0 AS corr_qty_price,
           FLOOR(covar_samp(l_quantity, l_extendedprice) * 100.0 + 0.5)
             / 100.0 AS cov_qty_price,
           FLOOR(covar_pop(l_discount, l_tax) * 1000000.0 + 0.5) / 1000000.0
             AS covp_disc_tax
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q51(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        portable_round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
        portable_round(F.var_samp("l_quantity"), 6).alias("var_qty"),
        portable_round(F.stddev_pop("l_discount"), 6).alias("sdp_disc"),
        portable_round(
            F.corr("l_quantity", "l_extendedprice"), 6
        ).alias("corr_qty_price"),
        portable_round(
            F.covar_samp("l_quantity", "l_extendedprice"), 2
        ).alias("cov_qty_price"),
        portable_round(F.covar_pop("l_discount", "l_tax"), 6).alias(
            "covp_disc_tax"
        ),
    )


# --------------------------------------------------------------------------
# Q53 — correlated scalar subquery shape: orders above their customer's
# average. The DataFrame side de-correlates explicitly (grouped avg +
# equi-join) — exactly the rewrite Catalyst performs on the subquery form.
# --------------------------------------------------------------------------
@query(
    "q53_correlated_subquery",
    oracle="""
    SELECT o_orderkey, o_custkey,
           FLOOR((o_totalprice - cavg) * 100.0 + 0.5) / 100.0 AS above_avg_by
    FROM (
      SELECT o_orderkey, o_custkey, o_totalprice,
             (SELECT AVG(i.o_totalprice) FROM orders i
              WHERE i.o_custkey = o.o_custkey) AS cavg
      FROM orders o
    )
    WHERE o_totalprice > cavg
    """,
)
def q53(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cavg = orders.groupBy("o_custkey").agg(
        F.avg("o_totalprice").alias("cavg")
    )
    return (
        orders.join(cavg, "o_custkey")
        .filter(F.col("o_totalprice") > F.col("cavg"))
        .select(
            "o_orderkey",
            "o_custkey",
            portable_round(
                F.col("o_totalprice") - F.col("cavg"), 2
            ).alias("above_avg_by"),
        )
    )


# --------------------------------------------------------------------------
# Q54 — UNPIVOT (wide -> long): lineitem measures melted to rows.
# --------------------------------------------------------------------------
@query(
    "q54_unpivot",
    oracle="""
    SELECT l_orderkey, l_linenumber, measure, value FROM (
      SELECT l_orderkey, l_linenumber,
             CAST(l_quantity AS DOUBLE) AS qty,
             CAST(l_extendedprice AS DOUBLE) AS price,
             CAST(l_discount AS DOUBLE) AS discount
      FROM lineitem
    ) UNPIVOT (value FOR measure IN (qty, price, discount))
    """,
)
def q54(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    wide = li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("double").alias("qty"),
        F.col("l_extendedprice").cast("double").alias("price"),
        F.col("l_discount").cast("double").alias("discount"),
    )
    return wide.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["qty", "price", "discount"],
        "measure",
        "value",
    )


# --------------------------------------------------------------------------
# Q55 — multiset set ops: EXCEPT ALL / INTERSECT ALL (q19 covers the
# DISTINCT variants), tagged and unioned into one result.
# --------------------------------------------------------------------------
@query(
    "q55_except_intersect_all",
    oracle="""
    SELECT 'except_all' AS op, k FROM (
      SELECT o_custkey AS k FROM orders
      EXCEPT ALL
      SELECT c_custkey FROM customer
    )
    UNION ALL
    SELECT 'intersect_all' AS op, k FROM (
      SELECT o_custkey AS k FROM orders
      INTERSECT ALL
      SELECT c_custkey FROM customer
    )
    """,
)
def q55(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("k")
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k")
    )
    ex = orders.exceptAll(cust).select(F.lit("except_all").alias("op"), "k")
    inter = orders.intersectAll(cust).select(
        F.lit("intersect_all").alias("op"), "k"
    )
    return ex.unionByName(inter)


# --------------------------------------------------------------------------
# Q56 — higher-order array lambdas (transform / filter / aggregate /
# sort) over tokenized text — the JVM-side expression family every pooling
# operator (R7-R9) is built from.
# --------------------------------------------------------------------------
@query(
    "q56_array_lambdas",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    SELECT doc_id,
           CAST(list_sum(list_transform(toks, w -> length(w))) AS INT)
             AS total_chars,
           CAST(list_max(list_transform(toks, w -> length(w))) AS INT)
             AS max_len,
           CAST(len(list_filter(toks, w -> length(w) > 5)) AS INT)
             AS n_long,
           list_sort(toks)[1] AS first_tok
    FROM t
    """,
)
def q56(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    lens = F.transform(toks, lambda w: F.length(w))
    return docs.select(
        "doc_id",
        F.aggregate(lens, F.lit(0), lambda acc, x: acc + x).alias(
            "total_chars"
        ),
        F.array_max(lens).alias("max_len"),
        F.size(F.filter(toks, lambda w: F.length(w) > 5)).alias("n_long"),
        F.element_at(F.sort_array(toks), 1).alias("first_tok"),
    )


# --------------------------------------------------------------------------
# Q52 — LSTM inference (U1/U3) over the embeddings table: each embedding is
# a one-token sequence through the 2-layer numpy LSTM with deterministic
# seed-0 weights, Arrow-batched via mapInPandas. Rows-only (model compute);
# the forward pass is pinned by tests/test_lstm.py.
# --------------------------------------------------------------------------
@query("q52_lstm_infer", oracle=None)
def q52(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.lstm import LSTMWeights, lstm_predict

    emb = load_table(spark, sf_dir, "embeddings")
    n_classes = emb.agg(F.max("label")).collect()[0][0] + 1
    seqs = emb.select(
        F.col("vec_id").alias("doc_id"),
        F.array(F.col("embedding")).alias("tokens"),
    )
    weights = LSTMWeights.init(
        input_dim=64, hidden=16, n_layers=2, n_classes=int(n_classes), seed=0
    )
    return lstm_predict(seqs, weights).select("doc_id", "pred")
