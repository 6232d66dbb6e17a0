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
# a one-token sequence through the 2-layer LSTM (hidden 16), Arrow-batched
# via mapInPandas. FULL oracle: weights are hash-derived (polyhash+sin, the
# FIXTURES.md §2 construction; scale 1/sqrt(16)=0.25 is an exact binary
# fraction) and the portable kernel fixes every FP operation — ordered
# folds instead of BLAS, libm exp, tanh as 1-2/(exp(2x)+1) since DuckDB
# lacks tanh — so the SQL mirror is BIT-EXACT. The general numpy fast path
# stays pinned by tests/test_lstm.py.
# --------------------------------------------------------------------------
_Q52_ORACLE = """
WITH cls AS (SELECT CAST(MAX(label) + 1 AS INT) AS c FROM embeddings),
widx AS (
  SELECT 'w0' AS tag, i.range AS i, j.range AS j
  FROM range(0,64) i CROSS JOIN range(0,64) j
  UNION ALL SELECT 'u0', k.range, j.range
  FROM range(0,16) k CROSS JOIN range(0,64) j
  UNION ALL SELECT 'b0', 0, j.range FROM range(0,64) j
  UNION ALL SELECT 'w1', i.range, j.range
  FROM range(0,16) i CROSS JOIN range(0,64) j
  UNION ALL SELECT 'u1', k.range, j.range
  FROM range(0,16) k CROSS JOIN range(0,64) j
  UNION ALL SELECT 'b1', 0, j.range FROM range(0,64) j
  UNION ALL SELECT 'hw', d.range, c2.range
  FROM range(0,16) d CROSS JOIN range(0,64) c2 CROSS JOIN cls
  WHERE c2.range < cls.c
  UNION ALL SELECT 'hb', 0, c2.range FROM range(0,64) c2 CROSS JOIN cls
  WHERE c2.range < cls.c
),
wts AS (
  SELECT tag, i, j,
         (sin(list_reduce(
            [7::BIGINT] || list_transform(
              string_split_regex('lstmw:' || tag || ':' || i || ':' || j, ''),
              ch -> ord(ch)::BIGINT),
            (a, b) -> (a * 31 + b) % 2147483647)) * 2 - 1) * 0.25 AS w
  FROM widx
),
mats AS (SELECT tag, i, LIST(w ORDER BY j) AS wrow FROM wts GROUP BY tag, i),
m2 AS (SELECT tag, LIST(wrow ORDER BY i) AS mat FROM mats GROUP BY tag),
wm AS MATERIALIZED (
  SELECT (SELECT mat FROM m2 WHERE tag = 'w0') AS w0,
         (SELECT mat FROM m2 WHERE tag = 'u0') AS u0,
         (SELECT mat[1] FROM m2 WHERE tag = 'b0') AS b0,
         (SELECT mat FROM m2 WHERE tag = 'w1') AS w1,
         (SELECT mat FROM m2 WHERE tag = 'u1') AS u1,
         (SELECT mat[1] FROM m2 WHERE tag = 'b1') AS b1,
         (SELECT mat FROM m2 WHERE tag = 'hw') AS hw,
         (SELECT mat[1] FROM m2 WHERE tag = 'hb') AS hb,
         (SELECT c FROM cls) AS nc
),
e AS (SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings),
g1 AS (
  SELECT vec_id,
         list_transform(range(0,64), j ->
             list_reduce([0.0::DOUBLE] || list_transform(range(0,64),
                 i -> x[i+1] * w0[i+1][j+1]), (a,b) -> a + b)
           + list_reduce([0.0::DOUBLE] || list_transform(range(0,16),
                 k -> 0.0 * u0[k+1][j+1]), (a,b) -> a + b)
           + b0[j+1]) AS g
  FROM e CROSS JOIN wm
),
c1 AS (
  SELECT vec_id, g,
         list_transform(range(0,16), d ->
             (1.0/(1.0+exp(-g[17+d]))) * 0.0
           + (1.0/(1.0+exp(-g[1+d])))
             * (1.0 - 2.0/(exp(2.0*g[33+d]) + 1.0))) AS c
  FROM g1
),
h1 AS (
  SELECT vec_id,
         list_transform(range(0,16), d ->
             (1.0/(1.0+exp(-g[49+d])))
             * (1.0 - 2.0/(exp(2.0*c[d+1]) + 1.0))) AS h
  FROM c1
),
g2 AS (
  SELECT vec_id,
         list_transform(range(0,64), j ->
             list_reduce([0.0::DOUBLE] || list_transform(range(0,16),
                 i -> h[i+1] * w1[i+1][j+1]), (a,b) -> a + b)
           + list_reduce([0.0::DOUBLE] || list_transform(range(0,16),
                 k -> 0.0 * u1[k+1][j+1]), (a,b) -> a + b)
           + b1[j+1]) AS g
  FROM h1 CROSS JOIN wm
),
c2t AS (
  SELECT vec_id, g,
         list_transform(range(0,16), d ->
             (1.0/(1.0+exp(-g[17+d]))) * 0.0
           + (1.0/(1.0+exp(-g[1+d])))
             * (1.0 - 2.0/(exp(2.0*g[33+d]) + 1.0))) AS c
  FROM g2
),
h2 AS (
  SELECT vec_id,
         list_transform(range(0,16), d ->
             (1.0/(1.0+exp(-g[49+d])))
             * (1.0 - 2.0/(exp(2.0*c[d+1]) + 1.0))) AS h
  FROM c2t
),
logits AS (
  SELECT vec_id,
         list_transform(range(0, nc), cl ->
             list_reduce([0.0::DOUBLE] || list_transform(range(0,16),
                 d -> h[d+1] * hw[d+1][cl+1]), (a,b) -> a + b)
           + hb[cl+1]) AS lg
  FROM h2 CROSS JOIN wm
),
mx AS (
  SELECT vec_id, lg,
         list_reduce(lg, (a,b) -> CASE WHEN b > a THEN b ELSE a END) AS m
  FROM logits
),
lsev AS (
  SELECT vec_id, lg, m,
         ln(list_reduce([0.0::DOUBLE] || list_transform(lg,
             v -> exp(v - m)), (a,b) -> a + b)) AS l
  FROM mx
),
lp AS (SELECT vec_id, list_transform(lg, v -> (v - m) - l) AS lpv FROM lsev),
ex2 AS (
  SELECT vec_id, UNNEST(lpv) AS v, GENERATE_SUBSCRIPTS(lpv, 1) AS cl FROM lp
),
best AS (
  SELECT vec_id, cl - 1 AS pred, v,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY v DESC, cl) AS r
  FROM ex2
)
SELECT vec_id AS doc_id, CAST(pred AS INT) AS pred,
       FLOOR(v * 1000000.0 + 0.5) / 1000000.0 AS lp_pred
FROM best WHERE r = 1
"""


@query("q52_lstm_infer", oracle=_Q52_ORACLE)
def q52(
    spark: SparkSession, sf_dir: str, n_classes: int | None = None
) -> DataFrame:
    from ..functions.rounding import portable_round
    from ..operators.lstm import init_hash_weights, lstm_predict_portable

    emb = load_table(spark, sf_dir, "embeddings")
    if n_classes is None:
        # the head's numpy weight matrix genuinely needs the class count
        # driver-side; callers that know it pass it and skip this job
        n_classes = emb.agg(F.max("label")).collect()[0][0] + 1
    seqs = emb.select(
        F.col("vec_id").alias("doc_id"),
        F.array(F.col("embedding")).alias("tokens"),
    )
    weights = init_hash_weights(
        input_dim=64, hidden=16, n_layers=2, n_classes=int(n_classes)
    )
    preds = lstm_predict_portable(seqs, weights)
    lp_pred = F.element_at(F.col("log_probs"), F.col("pred") + 1)
    return preds.select(
        "doc_id", "pred", portable_round(lp_pred, 6).alias("lp_pred")
    )
