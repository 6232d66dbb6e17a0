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
# fuzzy joins scale; the SKEW GUARD (operators/fuzzy.py) is what makes the
# blocking survive a pathological block: oversized blocks are refined by a
# portable md5 tier-bucket and hard-capped by rank, so the candidate count
# is linear (not quadratic) in block width. The DuckDB oracle implements
# the identical guard (md5 bytes + ROW_NUMBER are engine-portable), so the
# bounded semantics ARE the declared semantics. Levenshtein is bit-identical
# across engines (integer DP).
# --------------------------------------------------------------------------
@query(
    "x33_fuzzy_join",
    oracle="""
    WITH d AS (
      SELECT doc_id, string_split(text, ' ')[1] AS blk,
             substr(text, 1, 24) AS pfx
      FROM documents
    ),
    w AS (SELECT blk, COUNT(*) AS wdt FROM d GROUP BY blk),
    t AS (
      SELECT d.doc_id, d.blk, d.pfx,
             CASE WHEN w.wdt <= 64 THEN 0
                  ELSE (('0x' || substr(md5(d.pfx), 1, 8))::BIGINT)
                       % CAST(CEIL(w.wdt / 64.0) AS BIGINT) END AS bkt
      FROM d JOIN w ON d.blk = w.blk
    ),
    r AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY blk, bkt ORDER BY doc_id)
               AS rk
      FROM t
    )
    SELECT a.doc_id AS a_id, b.doc_id AS b_id,
           CAST(levenshtein(a.pfx, b.pfx) AS INT) AS dist
    FROM r a JOIN r b ON a.blk = b.blk AND a.bkt = b.bkt
                     AND a.doc_id < b.doc_id
    WHERE a.rk <= 64 AND b.rk <= 64 AND levenshtein(a.pfx, b.pfx) <= 8
    """,
)
def x33(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.fuzzy import fuzzy_join_blocked

    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        F.element_at(F.split(F.col("text"), " "), 1).alias("blk"),
        F.substring(F.col("text"), 1, 24).alias("pfx"),
    )
    return fuzzy_join_blocked(
        d, id_col="doc_id", blk_col="blk", key_col="pfx",
        max_dist=8, block_cap=64,
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


# --------------------------------------------------------------------------
# x36 — LSTM inference over REAL token sequences (U1/U3 with the recurrence
# exercised): documents -> hash token embeddings (dim 8, truncated at 16
# tokens) -> 2-layer portable LSTM (hidden 4) -> signed abs-max pool over
# the hidden sequence -> head -> log_softmax. The oracle advances the
# recurrence ONE TIMESTEP PER RECURSION ITERATION, carrying (h1,c1,h2,c2,
# running abs-max pool) as DOUBLE[] state — bit-exact against the portable
# kernel (ordered folds, libm exp, formula-tanh; weight scale 1/sqrt(4)=0.5
# exact). Composes the q39 embedder SQL with the q52 weight machinery.
# Spark side: same mapInPandas distribution model as q52; detectors of the
# recurrence (docs) scale horizontally, the 16-step loop is per-row local.
# --------------------------------------------------------------------------
_X36_ORACLE = """
WITH RECURSIVE
doc_words AS (
  SELECT doc_id, word, pos FROM (
    SELECT doc_id, UNNEST(string_split(text, ' ')) AS word,
           GENERATE_SUBSCRIPTS(string_split(text, ' '), 1) AS pos
    FROM documents
  ) WHERE pos <= 16
),
word_pre AS (
  SELECT word,
         list_reduce(
             [7::BIGINT] || list_transform(
               string_split_regex('BERT:' || word || ':', ''),
               c -> ord(c)::BIGINT),
             (a, b) -> (a * 31 + b) % 2147483647) AS hpre
  FROM (SELECT DISTINCT word FROM doc_words)
),
word_emb AS (
  SELECT wp.word, dm.range AS d,
         CAST(sin((wp.hpre * 31 + 48 + dm.range) % 2147483647) * 2 - 1
              AS REAL) AS v32
  FROM word_pre wp CROSS JOIN range(0, 8) dm
),
toks AS MATERIALIZED (
  SELECT dw.doc_id, dw.pos,
         LIST(we.v32::DOUBLE ORDER BY we.d) AS x
  FROM doc_words dw JOIN word_emb we ON dw.word = we.word
  GROUP BY dw.doc_id, dw.pos
),
widx AS (
  SELECT 'w0' AS tag, i.range AS i, j.range AS j
  FROM range(0,8) i CROSS JOIN range(0,16) j
  UNION ALL SELECT 'u0', k.range, j.range
  FROM range(0,4) k CROSS JOIN range(0,16) j
  UNION ALL SELECT 'b0', 0, j.range FROM range(0,16) j
  UNION ALL SELECT 'w1', i.range, j.range
  FROM range(0,4) i CROSS JOIN range(0,16) j
  UNION ALL SELECT 'u1', k.range, j.range
  FROM range(0,4) k CROSS JOIN range(0,16) j
  UNION ALL SELECT 'b1', 0, j.range FROM range(0,16) j
  UNION ALL SELECT 'hw', d.range, c2.range
  FROM range(0,4) d CROSS JOIN range(0,5) c2
  UNION ALL SELECT 'hb', 0, c2.range FROM range(0,5) c2
),
wts AS (
  SELECT tag, i, j,
         (sin(list_reduce(
            [7::BIGINT] || list_transform(
              string_split_regex('lstmw:' || tag || ':' || i || ':' || j, ''),
              ch -> ord(ch)::BIGINT),
            (a, b) -> (a * 31 + b) % 2147483647)) * 2 - 1) * 0.5 AS w
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
         (SELECT mat[1] FROM m2 WHERE tag = 'hb') AS hb
),
scan AS (
  SELECT doc_id, 0::BIGINT AS t,
         [0.0,0.0,0.0,0.0]::DOUBLE[] AS h1,
         [0.0,0.0,0.0,0.0]::DOUBLE[] AS c1,
         [0.0,0.0,0.0,0.0]::DOUBLE[] AS h2,
         [0.0,0.0,0.0,0.0]::DOUBLE[] AS c2,
         CAST(NULL AS DOUBLE[]) AS pooled
  FROM (SELECT DISTINCT doc_id FROM toks)
  UNION ALL
  SELECT doc_id, t, h1n AS h1, c1n AS c1, h2n AS h2, c2n AS c2,
         CASE WHEN pooled IS NULL THEN h2n
              ELSE list_transform(range(0,4), d ->
                CASE WHEN abs(h2n[d+1]) > abs(pooled[d+1])
                     THEN h2n[d+1] ELSE pooled[d+1] END)
         END AS pooled
  FROM (
    SELECT doc_id, t, h1n, c1n, c2n, pooled,
           list_transform(range(0,4), d ->
             (1.0/(1.0+exp(-g2[13+d]))) *
             (1.0 - 2.0/(exp(2.0*c2n[d+1]) + 1.0))) AS h2n
    FROM (
      SELECT doc_id, t, h1n, c1n, g2, pooled,
             list_transform(range(0,4), d ->
               (1.0/(1.0+exp(-g2[5+d]))) * c2[d+1]
             + (1.0/(1.0+exp(-g2[1+d])))
               * (1.0 - 2.0/(exp(2.0*g2[9+d]) + 1.0))) AS c2n
      FROM (
        SELECT doc_id, t, h1n, c1n, c2, pooled,
               list_transform(range(0,16), j ->
                   list_reduce([0.0::DOUBLE] || list_transform(range(0,4),
                       i -> h1n[i+1] * w1[i+1][j+1]), (a,b) -> a + b)
                 + list_reduce([0.0::DOUBLE] || list_transform(range(0,4),
                       k -> h2[k+1] * u1[k+1][j+1]), (a,b) -> a + b)
                 + b1[j+1]) AS g2
        FROM (
          SELECT doc_id, t, h1n, c1n, h2, c2, pooled, w1, u1, b1
          FROM (
            SELECT doc_id, t, g1, c1n, h2, c2, pooled, w1, u1, b1,
                   list_transform(range(0,4), d ->
                     (1.0/(1.0+exp(-g1[13+d]))) *
                     (1.0 - 2.0/(exp(2.0*c1n[d+1]) + 1.0))) AS h1n
            FROM (
              SELECT doc_id, t, g1, c1, h2, c2, pooled, w1, u1, b1,
                     list_transform(range(0,4), d ->
                       (1.0/(1.0+exp(-g1[5+d]))) * c1[d+1]
                     + (1.0/(1.0+exp(-g1[1+d])))
                       * (1.0 - 2.0/(exp(2.0*g1[9+d]) + 1.0))) AS c1n
              FROM (
                SELECT s.doc_id, s.t + 1 AS t, s.c1, s.h2, s.c2, s.pooled,
                       wm.w1, wm.u1, wm.b1,
                       list_transform(range(0,16), j ->
                           list_reduce([0.0::DOUBLE] ||
                               list_transform(range(0,8),
                                 i -> tk.x[i+1] * wm.w0[i+1][j+1]),
                               (a,b) -> a + b)
                         + list_reduce([0.0::DOUBLE] ||
                               list_transform(range(0,4),
                                 k -> s.h1[k+1] * wm.u0[k+1][j+1]),
                               (a,b) -> a + b)
                         + wm.b0[j+1]) AS g1
                FROM scan s
                JOIN toks tk ON tk.doc_id = s.doc_id AND tk.pos = s.t + 1
                CROSS JOIN wm
              )
            )
          )
        )
      )
    )
  )
),
final AS (
  SELECT doc_id, pooled,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY t DESC) AS r
  FROM scan WHERE t >= 1
),
logits AS (
  SELECT f.doc_id,
         list_transform(range(0,5), cl ->
             list_reduce([0.0::DOUBLE] || list_transform(range(0,4),
                 d -> f.pooled[d+1] * wm.hw[d+1][cl+1]), (a,b) -> a + b)
           + wm.hb[cl+1]) AS lg
  FROM final f CROSS JOIN wm WHERE f.r = 1
),
mx AS (
  SELECT doc_id, lg,
         list_reduce(lg, (a,b) -> CASE WHEN b > a THEN b ELSE a END) AS m
  FROM logits
),
lsev AS (
  SELECT doc_id, lg, m,
         ln(list_reduce([0.0::DOUBLE] || list_transform(lg,
             v -> exp(v - m)), (a,b) -> a + b)) AS l
  FROM mx
),
lp AS (SELECT doc_id, list_transform(lg, v -> (v - m) - l) AS lpv FROM lsev),
ex2 AS (
  SELECT doc_id, UNNEST(lpv) AS v, GENERATE_SUBSCRIPTS(lpv, 1) AS cl FROM lp
),
best AS (
  SELECT doc_id, cl - 1 AS pred, v,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY v DESC, cl) AS r
  FROM ex2
)
SELECT doc_id, CAST(pred AS INT) AS pred,
       FLOOR(v * 1000000.0 + 0.5) / 1000000.0 AS lp_pred
FROM best WHERE r = 1
"""


@query("x36_lstm_sequence", oracle=_X36_ORACLE)
def x36(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import portable_round
    from ..operators.embedder import embed_documents
    from ..operators.lstm import init_hash_weights, lstm_predict_portable

    docs = load_table(spark, sf_dir, "documents")
    seqs = embed_documents(
        docs, model="BERT", dim=8, max_seq_len=16
    ).select("doc_id", "tokens")
    weights = init_hash_weights(
        input_dim=8, hidden=4, n_layers=2, n_classes=5
    )
    preds = lstm_predict_portable(seqs, weights)
    lp_pred = F.element_at(F.col("log_probs"), F.col("pred") + 1)
    return preds.select(
        "doc_id", "pred", portable_round(lp_pred, 6).alias("lp_pred")
    )


# --------------------------------------------------------------------------
# x37 — BM25 ranking against a fixed query (retrieval / quality-filter
# family, the saturation-weighted upgrade of x17's TF-IDF). All stats are
# integers (tf, df, doc len, N) so the float math is identical-op-order on
# both engines; the per-document score sums its three query terms in a
# FIXED order (one conditional aggregate per term) because a SUM over a
# term-rows group would be engine-order-dependent. Two shuffles total
# (doc-term tf, then per-doc roll-up); df and avg length are broadcast
# scalars.
# --------------------------------------------------------------------------
_BM25_TERMS = ["spark", "data", "table"]
_BM25_K1 = 1.2
_BM25_B = 0.75


def _bm25_term_sql(t: str) -> str:
    return f"""
      COALESCE(SUM(CASE WHEN term = '{t}' THEN
        idf * tf * ({_BM25_K1} + 1.0)
            / (tf + {_BM25_K1} * (1.0 - {_BM25_B}
               + {_BM25_B} * len_d / avg_len)) END), 0.0)"""


@query(
    "x37_bm25_topk",
    oracle=f"""
    WITH words AS (
      SELECT doc_id, UNNEST(string_split(text, ' ')) AS term FROM documents
    ),
    lens AS (
      SELECT doc_id, LEN(string_split(text, ' ')) AS len_d FROM documents
    ),
    stats AS (
      SELECT AVG(len_d) AS avg_len, (SELECT COUNT(*) FROM documents) AS n
      FROM lens
    ),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM words
      WHERE term IN ('spark', 'data', 'table')
      GROUP BY doc_id, term
    ),
    df AS (
      SELECT term, COUNT(DISTINCT doc_id) AS df FROM words
      WHERE term IN ('spark', 'data', 'table')
      GROUP BY term
    ),
    scored_terms AS (
      SELECT tf.doc_id, tf.term, tf.tf, lens.len_d, stats.avg_len,
             LN((stats.n - df.df + 0.5) / (df.df + 0.5) + 1.0) AS idf
      FROM tf
      JOIN df ON tf.term = df.term
      JOIN lens ON tf.doc_id = lens.doc_id
      CROSS JOIN stats
    ),
    per_doc AS (
      SELECT doc_id,
             {_bm25_term_sql('spark')}
           + {_bm25_term_sql('data')}
           + {_bm25_term_sql('table')} AS score
      FROM scored_terms GROUP BY doc_id
    ),
    ranked AS (
      SELECT doc_id, FLOOR(score * 1000000.0 + 0.5) / 1000000.0 AS score,
             ROW_NUMBER() OVER (
               ORDER BY FLOOR(score * 1000000.0 + 0.5) / 1000000.0 DESC,
                        doc_id) AS rnk
      FROM per_doc
    )
    SELECT doc_id, score, CAST(rnk AS INT) AS rnk
    FROM ranked WHERE rnk <= 10
    """,
)
def x37(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import portable_round

    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    ).filter(F.col("term").isin(_BM25_TERMS))
    lens = docs.select(
        "doc_id", F.size(F.split(F.col("text"), " ")).alias("len_d")
    )
    # corpus stats ride the plan as a broadcast 1-row aggregate — no
    # driver collect, no second scan job (avg of exact long sums is
    # order-independent, so the in-plan value is deterministic)
    st = lens.agg(
        F.avg("len_d").alias("avg_len"), F.count(F.lit(1)).alias("n_docs")
    )
    tf = words.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = words.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(lens, "doc_id")
        .join(F.broadcast(st))
        .select(
            "doc_id",
            "term",
            (
                idf
                * F.col("tf")
                * (_BM25_K1 + 1.0)
                / (
                    F.col("tf")
                    + _BM25_K1
                    * (
                        1.0
                        - _BM25_B
                        + _BM25_B * F.col("len_d") / F.col("avg_len")
                    )
                )
            ).alias("ts"),
        )
    )

    def term_sum(t: str):
        return F.coalesce(
            F.sum(F.when(F.col("term") == t, F.col("ts"))), F.lit(0.0)
        )

    per_doc = scored.groupBy("doc_id").agg(
        (
            term_sum("spark") + term_sum("data") + term_sum("table")
        ).alias("score_raw")
    )
    from pyspark.sql import Window

    score = portable_round(F.col("score_raw"), 6)
    ranked = per_doc.select("doc_id", score.alias("score")).withColumn(
        "rnk",
        F.row_number().over(
            Window.orderBy(F.desc("score"), F.asc("doc_id"))
        ),
    )
    return ranked.filter(F.col("rnk") <= 10).select(
        "doc_id", "score", F.col("rnk").cast("int").alias("rnk")
    )


# --------------------------------------------------------------------------
# x38 — deterministic weighted sampling without replacement (exponential
# clocks / A-ES): key = -ln(u)/w with u from the portable md5 hash; the k
# smallest keys per stratum are the sample. One shuffle on the stratum;
# identical doubles on both engines make the order (and hence the sample)
# reproducible anywhere. Weighted variant of x20's uniform stratified
# sample.
# --------------------------------------------------------------------------
@query(
    "x38_weighted_sample",
    oracle="""
    WITH keyed AS (
      SELECT o_orderpriority, o_orderkey,
             -LN((('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT
                  + 1.0) / 4294967297.0) / o_totalprice AS k
      FROM orders
    ),
    ranked AS (
      SELECT o_orderpriority, o_orderkey,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY k, o_orderkey) AS rnk
      FROM keyed
    )
    SELECT o_orderpriority, o_orderkey, CAST(rnk AS INT) AS rnk
    FROM ranked WHERE rnk <= 5
    """,
)
def x38(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    u = (
        F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10)
        .cast("double")
        + 1.0
    ) / 4294967297.0
    keyed = orders.select(
        "o_orderpriority",
        "o_orderkey",
        (-F.log(u) / F.col("o_totalprice")).alias("k"),
    )
    ranked = keyed.withColumn(
        "rnk",
        F.row_number().over(
            Window.partitionBy("o_orderpriority").orderBy(
                F.asc("k"), F.asc("o_orderkey")
            )
        ),
    )
    return ranked.filter(F.col("rnk") <= 5).select(
        "o_orderpriority", "o_orderkey", F.col("rnk").cast("int").alias("rnk")
    )


# --------------------------------------------------------------------------
# x39 — hopping (sliding) window aggregation: 2-hour windows every hour,
# so each event lands in exactly two windows. Spark's F.window handles the
# window assignment natively (no self-join); the oracle reproduces the
# epoch-aligned window starts with integer epoch arithmetic (avoiding
# DuckDB interval arithmetic entirely). Bounded output keyspace — the
# shuffle carries only (window, type) partials.
# --------------------------------------------------------------------------
@query(
    "x39_sliding_window",
    oracle="""
    WITH hops AS (SELECT UNNEST([0, 1]) AS k),
    assigned AS (
      SELECT make_timestamp(
               ((CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) - hops.k) * 3600)
               * 1000000) AS win_start,
             event_type, value
      FROM events CROSS JOIN hops
    )
    SELECT win_start, event_type,
           COUNT(*) AS n,
           FLOOR(SUM(value) * 100.0 + 0.5) / 100.0 AS total
    FROM assigned
    GROUP BY win_start, event_type
    """,
)
def x39(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import portable_round

    ev = load_table(spark, sf_dir, "events")
    win = F.window(F.col("ts"), "2 hours", "1 hour")
    return (
        ev.groupBy(win.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            portable_round(F.sum("value"), 2).alias("total"),
        )
        .select(
            F.col("w.start").alias("win_start"),
            "event_type",
            "n",
            "total",
        )
    )


# --------------------------------------------------------------------------
# x40 — per-user EWMA (exponential moving average) over the event stream:
# the second sequential recurrence after DDM, same execution contract —
# sequential WITHIN a user (applyInPandas sorted scan), horizontal ACROSS
# users. alpha = 0.25 (exact binary fraction). Oracle: recursive CTE, one
# event per user per iteration, all users advancing in lockstep.
# --------------------------------------------------------------------------
_EWMA_ORACLE = """
WITH RECURSIVE seq AS MATERIALIZED (
  SELECT user_id, event_id, value,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events
),
scan AS (
  SELECT user_id, event_id, value, rn, value AS ewma
  FROM seq WHERE rn = 1
  UNION ALL
  SELECT s.user_id, s.event_id, s.value, s.rn,
         0.25 * s.value + 0.75 * scan.ewma AS ewma
  FROM scan JOIN seq s
    ON s.user_id = scan.user_id AND s.rn = scan.rn + 1
)
SELECT user_id, event_id,
       FLOOR(ewma * 1000000.0 + 0.5) / 1000000.0 AS ewma
FROM scan
"""


@query("x40_ewma", oracle=_EWMA_ORACLE)
def x40(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from pyspark.sql import types as T

    from ..functions.rounding import portable_round

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "value"
    )
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_id", T.LongType()),
            T.StructField("ewma", T.DoubleType()),
        ]
    )

    def scan(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        out = []
        y = None
        for v in pdf["value"].astype(float):
            # mirrors the oracle op-for-op: first value seeds the state
            y = v if y is None else 0.25 * v + 0.75 * y
            out.append(y)
        return pd.DataFrame(
            {
                "user_id": pdf["user_id"].values,
                "event_id": pdf["event_id"].values,
                "ewma": out,
            }
        )

    res = ev.groupBy("user_id").applyInPandas(scan, schema)
    return res.select(
        "user_id", "event_id", portable_round(F.col("ewma"), 6).alias("ewma")
    )


# --------------------------------------------------------------------------
# x41 — table diff / audit: classify every key across two snapshot versions
# as added / deleted / changed (kept rows are filtered out — at 100 TB the
# unchanged mass is the bulk and never leaves the join). One full-outer
# join on the key; with both snapshots bucketed on the key it is
# Exchange-free. The v2 snapshot is synthesized deterministically from
# orders (same technique as x25's changelog).
# --------------------------------------------------------------------------
@query(
    "x41_table_diff",
    oracle="""
    WITH v2 AS (
      SELECT o_orderkey AS k,
             CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice * 1.1
                  ELSE o_totalprice END AS p
      FROM orders WHERE o_orderkey % 17 <> 0
      UNION ALL
      SELECT o_orderkey + 1000000, o_totalprice FROM orders
      WHERE o_orderkey % 23 = 0
    ),
    v1 AS (SELECT o_orderkey AS k, o_totalprice AS p FROM orders),
    d AS (
      SELECT COALESCE(v1.k, v2.k) AS k,
             CASE WHEN v1.k IS NULL THEN 'A'
                  WHEN v2.k IS NULL THEN 'D'
                  WHEN v1.p <> v2.p THEN 'C'
                  ELSE 'K' END AS op,
             v1.p AS old_p, v2.p AS new_p
      FROM v1 FULL OUTER JOIN v2 ON v1.k = v2.k
    )
    SELECT k, op,
           FLOOR(COALESCE(old_p, 0.0) * 100.0 + 0.5) / 100.0 AS old_p,
           FLOOR(COALESCE(new_p, 0.0) * 100.0 + 0.5) / 100.0 AS new_p
    FROM d WHERE op <> 'K'
    """,
)
def x41(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import portable_round

    orders = load_table(spark, sf_dir, "orders")
    v1 = orders.select(
        F.col("o_orderkey").alias("k"), F.col("o_totalprice").alias("p")
    )
    v2 = (
        orders.filter(F.col("o_orderkey") % 17 != 0)
        .select(
            F.col("o_orderkey").alias("k"),
            F.when(
                F.col("o_orderkey") % 10 == 0, F.col("o_totalprice") * 1.1
            )
            .otherwise(F.col("o_totalprice"))
            .alias("p"),
        )
        .unionByName(
            orders.filter(F.col("o_orderkey") % 23 == 0).select(
                (F.col("o_orderkey") + 1000000).alias("k"),
                F.col("o_totalprice").alias("p"),
            )
        )
    )
    a = v1.select(F.col("k"), F.col("p").alias("old_p"))
    b = v2.select(F.col("k"), F.col("p").alias("new_p"))
    d = a.join(b, "k", "full_outer").select(
        "k",
        F.when(F.col("old_p").isNull(), "A")
        .when(F.col("new_p").isNull(), "D")
        .when(F.col("old_p") != F.col("new_p"), "C")
        .otherwise("K")
        .alias("op"),
        portable_round(F.coalesce(F.col("old_p"), F.lit(0.0)), 2).alias(
            "old_p"
        ),
        portable_round(F.coalesce(F.col("new_p"), F.lit(0.0)), 2).alias(
            "new_p"
        ),
    )
    return d.filter(F.col("op") != "K")
