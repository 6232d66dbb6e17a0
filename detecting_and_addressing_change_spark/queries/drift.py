"""Drift-pipeline queries: the reference's ML surface re-expressed
relationally (NB fit/predict A7, classification metrics A4, DDM T1, noise
gate T4 / σ-schedule J5).

The NB and metrics queries have FULL duckdb oracles — the entire Gaussian
Naive Bayes fit+predict and the sklearn-style macro metrics are expressible
in portable SQL, which is exactly the point of the sufficient-statistics
formulation (SURVEY §2.3 A7: exact, order-independent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import portable_round
from ..sources.tables import load_table
from .registry import query


# --------------------------------------------------------------------------
# Q25 — DDM drift detection over the events error stream (T1).
# The recurrence is sequential-with-resets, but every step is plain IEEE
# double arithmetic (one divide, one sqrt), so a DuckDB recursive CTE that
# advances exactly one row per iteration reproduces the Python kernel
# BIT-EXACTLY (verified against operators/ddm.py::ddm_scan). Per-batch
# error = k/32 is an exact dyadic rational, so no rounding is needed at the
# output boundary. Flag transitions (N/W/D + reset) are exercised by golden
# tests (tests/test_ddm.py); the oracle pins the full running-state math on
# real data.
# --------------------------------------------------------------------------
def ddm_scan_oracle(seq_body: str) -> str:
    """DuckDB recursive-CTE DDM scan over any ``(bucket, error)`` series —
    the pluggable form of the q25 oracle, reused by the corpus-quality
    drift monitor (x51). ``seq_body`` must select ``bucket`` and
    ``error`` columns."""
    return (
        """
WITH RECURSIVE seq AS MATERIALIZED (
  SELECT ROW_NUMBER() OVER (ORDER BY bucket) AS rn, bucket AS seq_id, error
  FROM (
"""
        + seq_body
        + """
  )
),"""
        + _DDM_SCAN_TAIL
    )


_DDM_SCAN_TAIL = """
scan AS (
  SELECT 0::BIGINT AS rn, CAST(NULL AS BIGINT) AS seq_id,
         CAST(NULL AS DOUBLE) AS error, CAST(NULL AS VARCHAR) AS flag,
         1::BIGINT AS n, 1.0::DOUBLE AS p,
         'infinity'::DOUBLE AS psmin, 'infinity'::DOUBLE AS pmin,
         'infinity'::DOUBLE AS smin, FALSE AS in_change
  UNION ALL
  SELECT rn, seq_id, error,
         CASE WHEN n1 < 30 THEN 'N'
              WHEN p1 + s1 > pmin1 + 3.0 * smin1 THEN 'D'
              WHEN p1 + s1 > pmin1 + 2.0 * smin1 THEN 'W'
              ELSE 'N' END AS flag,
         n1 AS n, p1 AS p, psmin1 AS psmin, pmin1 AS pmin, smin1 AS smin,
         (n1 >= 30 AND p1 + s1 > pmin1 + 3.0 * smin1) AS in_change
  FROM (
    SELECT rn, seq_id, error, n1, p1, s1,
           CASE WHEN n1 >= 30 AND p1 + s1 <= psmin0
                THEN p1 + s1 ELSE psmin0 END AS psmin1,
           CASE WHEN n1 >= 30 AND p1 + s1 <= psmin0
                THEN p1 ELSE pmin0 END AS pmin1,
           CASE WHEN n1 >= 30 AND p1 + s1 <= psmin0
                THEN s1 ELSE smin0 END AS smin1
    FROM (
      SELECT rn, seq_id, error, n0 + 1 AS n1, p1,
             SQRT(GREATEST(p1 * (1.0 - p1), 0.0) / n0) AS s1,
             psmin0, pmin0, smin0
      FROM (
        SELECT scan.rn + 1 AS rn, seq.seq_id, seq.error,
               CASE WHEN scan.in_change THEN 1 ELSE scan.n END AS n0,
               (CASE WHEN scan.in_change THEN 1.0 ELSE scan.p END)
                 + (seq.error
                    - (CASE WHEN scan.in_change THEN 1.0 ELSE scan.p END))
                   / (CASE WHEN scan.in_change THEN 1 ELSE scan.n END) AS p1,
               CASE WHEN scan.in_change THEN 'infinity'::DOUBLE
                    ELSE scan.psmin END AS psmin0,
               CASE WHEN scan.in_change THEN 'infinity'::DOUBLE
                    ELSE scan.pmin END AS pmin0,
               CASE WHEN scan.in_change THEN 'infinity'::DOUBLE
                    ELSE scan.smin END AS smin0
        FROM scan JOIN seq ON seq.rn = scan.rn + 1
      )
    )
  )
)
SELECT seq_id, error, flag FROM scan WHERE rn >= 1
"""


_DDM_ORACLE = ddm_scan_oracle(
    """
    SELECT CAST(FLOOR(event_id / 32) AS BIGINT) AS bucket,
           AVG(CASE WHEN event_type = 'error' THEN 1.0 ELSE 0.0 END) AS error
    FROM events
    GROUP BY bucket
"""
)


@query("q25_ddm_drift_flags", oracle=_DDM_ORACLE)
def q25(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ddm import detect_drift
    from ..operators.windows import count_window_agg

    ev = load_table(spark, sf_dir, "events")
    per_batch = count_window_agg(
        ev,
        seq_col="event_id",
        batch_size=32,
        aggs=[
            F.avg((F.col("event_type") == "error").cast("int")).alias("error")
        ],
    ).select(
        F.lit("events").alias("detector_id"),
        F.col("bucket").cast("long").alias("seq_id"),
        "error",
    )
    return detect_drift(per_batch).select("seq_id", "error", "flag")


# --------------------------------------------------------------------------
# Q28 — Gaussian NB fit + predict on the embeddings table (A7), with a full
# SQL oracle: per-class/per-dim count-mean-var sufficient statistics, then
# argmax of Gaussian log-likelihood + log prior.
# --------------------------------------------------------------------------
@query(
    "q28_nb_fit_predict",
    oracle="""
    WITH e AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS emb FROM embeddings
    ),
    ex AS (
      SELECT vec_id, label, UNNEST(emb) AS v,
             GENERATE_SUBSCRIPTS(emb, 1) AS d
      FROM e
    ),
    stats AS (
      SELECT label, d, COUNT(*) AS n, SUM(v)/COUNT(*) AS mean,
             SUM(v*v)/COUNT(*) - (SUM(v)/COUNT(*))*(SUM(v)/COUNT(*)) AS var
      FROM ex GROUP BY label, d
    ),
    mv AS (SELECT MAX(var) AS maxvar FROM stats),
    priors AS (SELECT label, COUNT(*) AS cnt FROM e GROUP BY label),
    total AS (SELECT COUNT(*) AS n_total FROM e),
    scored AS (
      SELECT ex.vec_id, s.label AS cls,
             SUM(-0.5*LN(2*PI()*(s.var + 1e-9*mv.maxvar))
                 - (ex.v - s.mean)*(ex.v - s.mean)
                   / (2*(s.var + 1e-9*mv.maxvar))) AS ll
      FROM ex JOIN stats s ON ex.d = s.d
      CROSS JOIN mv
      GROUP BY ex.vec_id, s.label
    ),
    post AS (
      SELECT scored.vec_id, cls,
             ll + LN(p.cnt::DOUBLE / t.n_total) AS lp
      FROM scored JOIN priors p ON scored.cls = p.label CROSS JOIN total t
    ),
    best AS (
      SELECT vec_id, cls,
             ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY lp DESC, cls) AS r
      FROM post
    )
    SELECT vec_id, CAST(cls AS INT) AS pred FROM best WHERE r = 1
    """,
)
def q28(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.nb import nb_fit, nb_predict

    emb = load_table(spark, sf_dir, "embeddings")
    # dim=64 is the embeddings-table contract (same constant q52 pins);
    # known dim => single-shuffle unrolled fit, no posexplode
    stats = nb_fit(emb, features_col="embedding", label_col="label", dim=64)
    preds = nb_predict(
        emb, stats, features_col="embedding", id_cols=("vec_id",)
    )
    return preds.select("vec_id", "pred")


# --------------------------------------------------------------------------
# Q29 — classification metrics (A4): accuracy + macro precision/recall/F1
# with sklearn zero_division=0 semantics over the fixed class universe.
# Predictions are a deterministic corruption of the labels so the metric
# math (not a model) is what's exercised.
# --------------------------------------------------------------------------
@query(
    "q29_classification_metrics",
    oracle="""
    WITH ncls AS (SELECT MAX(label) + 1 AS n FROM embeddings),
    e AS (
      SELECT label,
             CASE WHEN vec_id % 5 = 0
                  THEN (label + 1) % (SELECT n FROM ncls)
                  ELSE label END AS pred
      FROM embeddings
    ),
    classes AS (
      SELECT UNNEST(GENERATE_SERIES(0, (SELECT n - 1 FROM ncls))) AS cls
    ),
    cm AS (SELECT label, pred, COUNT(*) AS cnt FROM e GROUP BY label, pred),
    sup AS (SELECT label AS cls, SUM(cnt) AS s FROM cm GROUP BY label),
    prd AS (SELECT pred AS cls, SUM(cnt) AS p FROM cm GROUP BY pred),
    tp AS (SELECT label AS cls, cnt AS tp FROM cm WHERE label = pred),
    pc AS (
      SELECT c.cls,
             CASE WHEN COALESCE(p.p, 0) > 0
                  THEN COALESCE(t.tp, 0) / p.p ELSE 0 END AS prec,
             CASE WHEN COALESCE(s.s, 0) > 0
                  THEN COALESCE(t.tp, 0) / s.s ELSE 0 END AS rec
      FROM classes c
      LEFT JOIN tp t ON c.cls = t.cls
      LEFT JOIN sup s ON c.cls = s.cls
      LEFT JOIN prd p ON c.cls = p.cls
    ),
    pc2 AS (
      SELECT prec, rec,
             CASE WHEN prec + rec > 0
                  THEN 2 * prec * rec / (prec + rec) ELSE 0 END AS f1
      FROM pc
    )
    SELECT
      FLOOR(((SELECT SUM(CASE WHEN label = pred THEN 1 ELSE 0 END)::DOUBLE
                    / COUNT(*) FROM e)) * 1000000.0 + 0.5) / 1000000.0 AS accuracy,
      FLOOR((AVG(prec)) * 1000000.0 + 0.5) / 1000000.0 AS precision,
      FLOOR((AVG(rec)) * 1000000.0 + 0.5) / 1000000.0 AS recall,
      FLOOR((AVG(f1)) * 1000000.0 + 0.5) / 1000000.0 AS macro_f1
    FROM pc2
    """,
)
def q29(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.metrics import classification_metrics

    emb = load_table(spark, sf_dir, "embeddings")
    # class count rides the plan as a broadcast singleton — no driver-side
    # collect job (VERDICT r2 #10); the metrics universe is derived in-plan
    nc = emb.agg((F.max("label") + 1).alias("__nc"))
    scored = emb.crossJoin(F.broadcast(nc)).select(
        "label",
        F.when(
            F.col("vec_id") % 5 == 0,
            (F.col("label") + 1) % F.col("__nc"),
        )
        .otherwise(F.col("label"))
        .alias("pred"),
    )
    m = classification_metrics(scored)
    return m.select(
        portable_round(F.col("accuracy"), 6).alias("accuracy"),
        portable_round(F.col("precision"), 6).alias("precision"),
        portable_round(F.col("recall"), 6).alias("recall"),
        portable_round(F.col("macro_f1"), 6).alias("macro_f1"),
    )


# --------------------------------------------------------------------------
# Q39 — full abrupt-drift experiment E2E (SURVEY §3.2): documents -> hash
# embedder (space A/B) -> mean pool -> NB train on A -> score A then B
# through ONE detector with continuous seq_id -> windowed accuracy + flags.
# FULL oracle: every stage is portable — the hash embedder is pure integer
# polyhash + libm sin (bit-identical both engines), mean pooling is an
# ordered fold reproduced with LIST(.. ORDER BY pos) + list_reduce, NB is
# the q28 sufficient-statistics SQL, and DDM is the q25 recursive CTE.
# seq is MATERIALIZED so the recursion doesn't re-run the pipeline per
# iteration. Semantics additionally pinned by tests/test_pipeline.py on
# separable synthetic classes.
# --------------------------------------------------------------------------
# Shared CTE prefix: the full relational NB drift pipeline (hash embed
# both spaces -> ordered-fold mean pool -> NB sufficient stats on space A
# -> score BOTH spaces), ending at ``preds(model, doc_id, pred)``. q39
# appends the windowed-accuracy + DDM-scan tail; x103 (the fine-tune
# session audit, queries/extensions14.py) appends a merged-stats second
# scoring pass. Splitting the literal changes NEITHER oracle's text —
# _Q39_ORACLE is byte-identical to its round-3 form.
_NB_PIPELINE_CTES = """
WITH RECURSIVE
langcode AS (
  SELECT lang, CAST(ROW_NUMBER() OVER (ORDER BY lang) - 1 AS INT) AS label
  FROM (SELECT DISTINCT lang FROM documents)
),
docs AS (
  SELECT d.doc_id, COALESCE(d.text, '') AS text, lc.label
  FROM documents d JOIN langcode lc ON d.lang = lc.lang
),
n_docs AS (SELECT COUNT(*) AS n FROM docs),
doc_words AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS word,
         GENERATE_SUBSCRIPTS(string_split(text, ' '), 1) AS pos
  FROM docs
),
doc_words_t AS (SELECT * FROM doc_words WHERE pos <= 512),
words AS (SELECT DISTINCT word FROM doc_words_t),
dims AS (SELECT UNNEST(GENERATE_SERIES(0, 7)) AS d),
models AS (SELECT UNNEST(['BERT', 'SCIBERT']) AS model),
word_pre AS (
  -- hash the 'model:word:' prefix once; each dim appends one digit char
  SELECT w.word, m.model,
         list_reduce(
             [7::BIGINT] || list_transform(
               string_split_regex(m.model || ':' || w.word || ':', ''),
               c -> ord(c)::BIGINT),
             (a, b) -> (a * 31 + b) % 2147483647) AS hpre
  FROM words w CROSS JOIN models m
),
word_emb AS (
  SELECT wp.word, wp.model, dm.d,
         CAST(sin((wp.hpre * 31 + 48 + dm.d) % 2147483647) * 2 - 1
              AS REAL) AS v32
  FROM word_pre wp CROSS JOIN dims dm
),
-- ordered-fold mean pooling: sum float32 tokens (as double) in pos order
pooled AS (
  SELECT dw.doc_id, we.model, we.d,
         list_reduce([0.0::DOUBLE] || LIST(we.v32::DOUBLE ORDER BY dw.pos),
                     (a, b) -> a + b) / COUNT(*) AS v
  FROM doc_words_t dw JOIN word_emb we ON dw.word = we.word
  GROUP BY dw.doc_id, we.model, we.d
),
train AS (
  SELECT p.doc_id, p.d, p.v, dc.label
  FROM pooled p JOIN docs dc ON p.doc_id = dc.doc_id
  WHERE p.model = 'BERT'
),
stats AS (
  SELECT label, d, COUNT(*) AS n, SUM(v)/COUNT(*) AS mean,
         SUM(v*v)/COUNT(*) - (SUM(v)/COUNT(*))*(SUM(v)/COUNT(*)) AS var
  FROM train GROUP BY label, d
),
mv AS (SELECT MAX(var) AS maxvar FROM stats),
priors AS (SELECT label, COUNT(*) AS cnt FROM train WHERE d = 0 GROUP BY label),
total AS (SELECT COUNT(*) AS n_total FROM docs),
scored AS (
  SELECT p.model, p.doc_id, s.label AS cls,
         SUM(-0.5*LN(2*PI()*(s.var + 1e-9*mv.maxvar))
             - (p.v - s.mean)*(p.v - s.mean)
               / (2*(s.var + 1e-9*mv.maxvar))) AS ll
  FROM pooled p JOIN stats s ON p.d = s.d
  CROSS JOIN mv
  GROUP BY p.model, p.doc_id, s.label
),
post AS (
  SELECT sc.model, sc.doc_id, sc.cls,
         sc.ll + LN(pr.cnt::DOUBLE / t.n_total) AS lp
  FROM scored sc JOIN priors pr ON sc.cls = pr.label CROSS JOIN total t
),
best AS (
  SELECT model, doc_id, cls,
         ROW_NUMBER() OVER (PARTITION BY model, doc_id
                            ORDER BY lp DESC, cls) AS r
  FROM post
),
preds AS (SELECT model, doc_id, cls AS pred FROM best WHERE r = 1),
"""

_Q39_ORACLE = _NB_PIPELINE_CTES + """correct AS (
  SELECT CASE WHEN p.model = 'BERT' THEN p.doc_id
              ELSE p.doc_id + (SELECT n FROM n_docs) END AS seq_id,
         CASE WHEN p.model = 'BERT' THEN 'trained' ELSE 'untrained' END AS stream,
         CASE WHEN p.pred = dc.label THEN 1 ELSE 0 END AS c
  FROM preds p JOIN docs dc ON p.doc_id = dc.doc_id
),
buckets AS (
  SELECT CAST(FLOOR(seq_id / 32) AS BIGINT) AS seq_id,
         AVG(c::DOUBLE) AS accuracy, MAX(stream) AS stream
  FROM correct GROUP BY 1
),
seq AS MATERIALIZED (
  SELECT ROW_NUMBER() OVER (ORDER BY seq_id) AS rn, seq_id,
         1.0 - accuracy AS error, accuracy, stream
  FROM buckets
),
scan AS (
  SELECT 0::BIGINT AS rn, CAST(NULL AS BIGINT) AS seq_id,
         CAST(NULL AS VARCHAR) AS flag,
         1::BIGINT AS n, 1.0::DOUBLE AS p,
         'infinity'::DOUBLE AS psmin, 'infinity'::DOUBLE AS pmin,
         'infinity'::DOUBLE AS smin, FALSE AS in_change
  UNION ALL
  SELECT rn, seq_id,
         CASE WHEN n1 < 30 THEN 'N'
              WHEN p1 + s1 > pmin1 + 3.0 * smin1 THEN 'D'
              WHEN p1 + s1 > pmin1 + 2.0 * smin1 THEN 'W'
              ELSE 'N' END AS flag,
         n1 AS n, p1 AS p, psmin1 AS psmin, pmin1 AS pmin, smin1 AS smin,
         (n1 >= 30 AND p1 + s1 > pmin1 + 3.0 * smin1) AS in_change
  FROM (
    SELECT rn, seq_id, n1, p1, s1,
           CASE WHEN n1 >= 30 AND p1 + s1 <= psmin0
                THEN p1 + s1 ELSE psmin0 END AS psmin1,
           CASE WHEN n1 >= 30 AND p1 + s1 <= psmin0
                THEN p1 ELSE pmin0 END AS pmin1,
           CASE WHEN n1 >= 30 AND p1 + s1 <= psmin0
                THEN s1 ELSE smin0 END AS smin1
    FROM (
      SELECT rn, seq_id, n0 + 1 AS n1, p1,
             SQRT(GREATEST(p1 * (1.0 - p1), 0.0) / n0) AS s1,
             psmin0, pmin0, smin0
      FROM (
        SELECT scan.rn + 1 AS rn, seq.seq_id,
               CASE WHEN scan.in_change THEN 1 ELSE scan.n END AS n0,
               (CASE WHEN scan.in_change THEN 1.0 ELSE scan.p END)
                 + (seq.error
                    - (CASE WHEN scan.in_change THEN 1.0 ELSE scan.p END))
                   / (CASE WHEN scan.in_change THEN 1 ELSE scan.n END) AS p1,
               CASE WHEN scan.in_change THEN 'infinity'::DOUBLE
                    ELSE scan.psmin END AS psmin0,
               CASE WHEN scan.in_change THEN 'infinity'::DOUBLE
                    ELSE scan.pmin END AS pmin0,
               CASE WHEN scan.in_change THEN 'infinity'::DOUBLE
                    ELSE scan.smin END AS smin0
        FROM scan JOIN seq ON seq.rn = scan.rn + 1
      )
    )
  )
)
SELECT sq.seq_id, sq.stream,
       FLOOR(sq.accuracy * 1000000.0 + 0.5) / 1000000.0 AS accuracy,
       sc.flag
FROM seq sq JOIN scan sc ON sq.seq_id = sc.seq_id
"""


@query("q39_abrupt_drift_experiment", oracle=_Q39_ORACLE)
def q39(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..pipelines import abrupt_drift_experiment

    docs = load_table(spark, sf_dir, "documents")
    # language as the class label, dense-coded deterministically IN-PLAN:
    # rank the tiny distinct-lang set and broadcast-join it back — same
    # coding as sorted(collect()) but no driver-side job (VERDICT r2 #10)
    lang_codes = (
        docs.select("lang")
        .distinct()
        .withColumn(
            "label",
            (F.dense_rank().over(Window.orderBy("lang")) - 1).cast("int"),
        )
    )
    labeled = docs.join(F.broadcast(lang_codes), "lang").select(
        "doc_id", "text", "label"
    )
    return abrupt_drift_experiment(labeled, batch_size=32)


# --------------------------------------------------------------------------
# Q30 — σ-schedule generation + warm-start gate (J5 + T4): the gradual-drift
# noise schedule (drift_experiments_supervised.py:200-204 in reference) as a
# generated dim table joined to count-window buckets.
# --------------------------------------------------------------------------
@query(
    "q30_sigma_schedule_gate",
    oracle="""
    WITH buckets AS (
      SELECT CAST(FLOOR(event_id / 32) AS INT) AS bucket, COUNT(*) AS cnt
      FROM events GROUP BY bucket
    ),
    sched AS (
      SELECT UNNEST(GENERATE_SERIES(0,
               (SELECT MAX(bucket) FROM buckets))) AS bucket
    ),
    sigma AS (
      SELECT bucket,
             CASE WHEN bucket < 30 THEN 0.0
                  ELSE LEAST((bucket - 30) * (2.0 / 150), 2.0) END AS sigma
      FROM sched
    )
    SELECT b.bucket, FLOOR((s.sigma) * 1000000.0 + 0.5) / 1000000.0 AS sigma, b.cnt
    FROM buckets b JOIN sigma s ON b.bucket = s.bucket
    """,
)
def q30(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.windows import count_window_agg
    from ..streaming.schedule import sigma_schedule_for

    ev = load_table(spark, sf_dir, "events")
    buckets = count_window_agg(
        ev, seq_col="event_id", batch_size=32,
        aggs=[F.count("*").alias("cnt")],
    )
    # schedule sized in-plan from the buckets' own max — no driver collect
    sched = sigma_schedule_for(
        buckets, warm_start=30, max_std=2.0, steps=150
    )
    return (
        buckets.join(F.broadcast(sched), "bucket")
        .select("bucket", portable_round(F.col("sigma"), 6).alias("sigma"), "cnt")
    )


# --------------------------------------------------------------------------
# X57 — Page-Hinkley drift flags (second detector of the T1 family).
# Same bit-exact recursive-CTE strategy as the DDM oracle: every kernel
# step is IEEE double arithmetic in a fixed order, replayed one row per
# iteration.
# --------------------------------------------------------------------------
def ph_scan_oracle(
    seq_body: str,
    delta: float = 0.005,
    threshold: float = 1.0,
    min_instances: int = 30,
) -> str:
    """DuckDB recursive-CTE Page-Hinkley scan over any ``(bucket, error)``
    series — mirrors operators.ph.PageHinkleyState.add_element exactly."""
    return f"""
WITH RECURSIVE seq AS MATERIALIZED (
  SELECT ROW_NUMBER() OVER (ORDER BY bucket) AS rn, bucket AS seq_id, error
  FROM (
{seq_body}
  )
),
scan AS (
  SELECT 0::BIGINT AS rn, CAST(NULL AS BIGINT) AS seq_id,
         CAST(NULL AS DOUBLE) AS error, CAST(NULL AS VARCHAR) AS flag,
         0::BIGINT AS t, 0.0::DOUBLE AS mean, 0.0::DOUBLE AS m,
         'infinity'::DOUBLE AS mmin
  UNION ALL
  SELECT rn, seq_id, error,
         CASE WHEN drift THEN 'D' ELSE 'N' END AS flag,
         CASE WHEN drift THEN 0 ELSE t1 END AS t,
         CASE WHEN drift THEN 0.0 ELSE mean1 END AS mean,
         CASE WHEN drift THEN 0.0 ELSE m1 END AS m,
         CASE WHEN drift THEN 'infinity'::DOUBLE ELSE mmin1 END AS mmin
  FROM (
    SELECT rn, seq_id, error, t1, mean1, m1, mmin1,
           (t1 >= {min_instances} AND m1 - mmin1 > {threshold}) AS drift
    FROM (
      SELECT rn, seq_id, error, t1, mean1, m1,
             LEAST(mmin0, m1) AS mmin1
      FROM (
        SELECT scan.rn + 1 AS rn, seq.seq_id, seq.error,
               scan.t + 1 AS t1,
               scan.mean + (seq.error - scan.mean) / (scan.t + 1) AS mean1,
               scan.m + (seq.error
                         - (scan.mean + (seq.error - scan.mean)
                            / (scan.t + 1))
                         - {delta}) AS m1,
               scan.mmin AS mmin0
        FROM scan JOIN seq ON seq.rn = scan.rn + 1
      )
    )
  )
)
SELECT seq_id, error, flag FROM scan WHERE rn >= 1
"""


@query(
    "x57_page_hinkley",
    oracle=ph_scan_oracle(
        """
    SELECT CAST(FLOOR(event_id / 32) AS BIGINT) AS bucket,
           AVG(CASE WHEN event_type = 'error' THEN 1.0 ELSE 0.0 END) AS error
    FROM events
    GROUP BY bucket
"""
    ),
)
def x57(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-Hinkley flags over the same per-batch error series q25 feeds
    DDM — the two detectors are drop-in alternatives (identical
    input/output schema), so an experiment can swap detection strategies
    without touching the pipeline. Same scale posture as DDM: the
    sequential scan is confined to one detector key's (tiny) bucket
    series; fleets of detectors parallelize across keys."""
    from ..operators.ph import detect_drift_ph
    from ..operators.windows import count_window_agg

    ev = load_table(spark, sf_dir, "events")
    per_batch = count_window_agg(
        ev,
        seq_col="event_id",
        batch_size=32,
        aggs=[
            F.avg((F.col("event_type") == "error").cast("int")).alias("error")
        ],
    ).select(
        F.lit("events").alias("detector_id"),
        F.col("bucket").cast("long").alias("seq_id"),
        "error",
    )
    return detect_drift_ph(per_batch).select("seq_id", "error", "flag")


def ph_scan_oracle_keyed(
    seq_body: str,
    delta: float = 0.005,
    threshold: float = 1.0,
    min_instances: int = 30,
) -> str:
    """Keyed variant of :func:`ph_scan_oracle`: one independent
    Page-Hinkley scan per ``detector`` over a ``(detector, bucket,
    error)`` series — the recursion carries the detector key, so a whole
    detector FLEET replays in one recursive CTE (all series advance in
    lockstep by per-detector row number)."""
    return f"""
WITH RECURSIVE seq AS MATERIALIZED (
  SELECT detector,
         ROW_NUMBER() OVER (PARTITION BY detector ORDER BY bucket) AS rn,
         bucket AS seq_id, error
  FROM (
{seq_body}
  )
),
scan AS (
  SELECT detector, 0::BIGINT AS rn, CAST(NULL AS BIGINT) AS seq_id,
         CAST(NULL AS DOUBLE) AS error, CAST(NULL AS VARCHAR) AS flag,
         0::BIGINT AS t, 0.0::DOUBLE AS mean, 0.0::DOUBLE AS m,
         'infinity'::DOUBLE AS mmin
  FROM (SELECT DISTINCT detector FROM seq)
  UNION ALL
  SELECT detector, rn, seq_id, error,
         CASE WHEN drift THEN 'D' ELSE 'N' END AS flag,
         CASE WHEN drift THEN 0 ELSE t1 END AS t,
         CASE WHEN drift THEN 0.0 ELSE mean1 END AS mean,
         CASE WHEN drift THEN 0.0 ELSE m1 END AS m,
         CASE WHEN drift THEN 'infinity'::DOUBLE ELSE mmin1 END AS mmin
  FROM (
    SELECT detector, rn, seq_id, error, t1, mean1, m1, mmin1,
           (t1 >= {min_instances} AND m1 - mmin1 > {threshold}) AS drift
    FROM (
      SELECT detector, rn, seq_id, error, t1, mean1, m1,
             LEAST(mmin0, m1) AS mmin1
      FROM (
        SELECT scan.detector, scan.rn + 1 AS rn, seq.seq_id, seq.error,
               scan.t + 1 AS t1,
               scan.mean + (seq.error - scan.mean) / (scan.t + 1) AS mean1,
               scan.m + (seq.error
                         - (scan.mean + (seq.error - scan.mean)
                            / (scan.t + 1))
                         - {delta}) AS m1,
               scan.mmin AS mmin0
        FROM scan
        JOIN seq ON seq.rn = scan.rn + 1
                AND seq.detector = scan.detector
      )
    )
  )
)
SELECT detector, seq_id, error, flag FROM scan WHERE rn >= 1
"""
