"""Second wave of extension queries: pivot / grouping sets on the
relational side, and the multimodal + IVF-ANN + regex-tokenizer surface of
the LLM-pipeline extensions — all fully DuckDB-oracle-checked.

x14 deliberately routes its oracle-compared output THROUGH the
``mapInPandas`` media pipeline (multimodal/binary_ops.py) so the Arrow
binary-column plumbing itself sits on the correctness gate, not only in
unit tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import portable_round
from ..sources.tables import load_table
from .registry import query

_SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]


# --------------------------------------------------------------------------
# Q45 — pivot (wide aggregation). Spark: groupBy().pivot() with an explicit
# value list (never inferred — inference is a full extra scan and
# nondeterministic column order at scale). Oracle: CASE-aggregation.
# --------------------------------------------------------------------------
@query(
    "q45_pivot",
    oracle="""
    SELECT n.n_name,
           CAST(SUM(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END) AS BIGINT) AS "AUTOMOBILE",
           CAST(SUM(CASE WHEN c_mktsegment = 'BUILDING'   THEN 1 ELSE 0 END) AS BIGINT) AS "BUILDING",
           CAST(SUM(CASE WHEN c_mktsegment = 'FURNITURE'  THEN 1 ELSE 0 END) AS BIGINT) AS "FURNITURE",
           CAST(SUM(CASE WHEN c_mktsegment = 'HOUSEHOLD'  THEN 1 ELSE 0 END) AS BIGINT) AS "HOUSEHOLD",
           CAST(SUM(CASE WHEN c_mktsegment = 'MACHINERY'  THEN 1 ELSE 0 END) AS BIGINT) AS "MACHINERY"
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def q45(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    wide = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .pivot("c_mktsegment", _SEGMENTS)
        .agg(F.count(F.lit(1)))
    )
    # pivot leaves NULL where a (nation, segment) combo is empty; the
    # CASE-agg oracle produces 0 — normalize
    return wide.select(
        "n_name",
        *[F.coalesce(F.col(s), F.lit(0)).alias(s) for s in _SEGMENTS],
    )


# --------------------------------------------------------------------------
# Q46 — GROUPING SETS beyond rollup/cube (arbitrary set list).
# --------------------------------------------------------------------------
@query(
    "q46_grouping_sets",
    oracle="""
    SELECT o_orderpriority, o_orderstatus, COUNT(*) AS cnt,
           FLOOR(SUM(o_totalprice) * 100.0 + 0.5) / 100.0 AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                            (o_orderstatus), ())
    """,
)
def q46(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupingSets(
        [["o_orderpriority", "o_orderstatus"], ["o_orderstatus"], []],
        "o_orderpriority",
        "o_orderstatus",
    ).agg(
        F.count(F.lit(1)).alias("cnt"),
        portable_round(F.sum("o_totalprice"), 2).alias("total"),
    )


# --------------------------------------------------------------------------
# X14 — multimodal binary-column pipeline on the oracle path with REAL byte
# decode (VERDICT r2 #9): documents -> per-doc GENUINE media files (PPM P6
# images with pixels (doc_id*7 + p*13) % 256; PCM-16 WAVs with samples
# (doc_id*31 + i*17) % 1000 - 500) encoded in an Arrow stage -> decoder
# 'auto' parses the actual file structure back (multimodal/binary_ops.py
# decode_ppm / decode_wav_pcm16) -> decoded pixel/sample statistics. The
# oracle recomputes those statistics in CLOSED FORM from the generating
# expressions, so any header/endianness/offset bug in the codecs breaks the
# hash compare. Video has no dependency-free container format: mp4 rows run
# the documented deterministic fake and are pinned to -1 here.
# --------------------------------------------------------------------------
@query(
    "x14_multimodal_features",
    oracle="""
    WITH img AS (
      SELECT doc_id,
             AVG((doc_id * 7 + p * 13) % 256) AS mean_v,
             CAST(MAX((doc_id * 7 + p * 13) % 256) AS DOUBLE) AS max_v
      FROM documents, UNNEST(GENERATE_SERIES(0, 47)) AS t(p)
      WHERE doc_id % 3 = 0 GROUP BY doc_id
    ),
    aud AS (
      SELECT doc_id,
             AVG(ABS((doc_id * 31 + i * 17) % 1000 - 500)) AS mean_v,
             CAST(MAX((doc_id * 31 + i * 17) % 1000 - 500) AS DOUBLE) AS max_v
      FROM documents, UNNEST(GENERATE_SERIES(0, 31)) AS t(i)
      WHERE doc_id % 3 = 1 GROUP BY doc_id
    )
    SELECT d.doc_id AS media_id,
           CASE d.doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                ELSE 'video' END AS kind,
           CASE d.doc_id % 3 WHEN 0 THEN 59 WHEN 1 THEN 108
                ELSE CAST(octet_length(encode(d.text)) AS INT) END AS nbytes,
           FLOOR(COALESCE(i.mean_v, a.mean_v, -1.0) * 10000.0 + 0.5)
             / 10000.0 AS stat_mean,
           COALESCE(i.max_v, a.max_v, -1.0) AS stat_max,
           16 AS feat_dim
    FROM documents d
    LEFT JOIN img i ON d.doc_id = i.doc_id
    LEFT JOIN aud a ON d.doc_id = a.doc_id
    """,
)
def x14(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from ..functions.rounding import portable_round
    from ..multimodal.binary_ops import (
        MEDIA_SCHEMA,
        encode_ppm,
        encode_wav_pcm16,
        extract_features,
    )
    from ..sources.tables import spread_small_input

    docs = load_table(spark, sf_dir, "documents")

    def encode(batches):
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                doc_id = int(doc_id)
                kind = ["image", "audio", "video"][doc_id % 3]
                if kind == "image":
                    px = (np.arange(48, dtype=np.int64) * 13 + doc_id * 7) % 256
                    data = encode_ppm(px.astype(np.uint8).reshape(4, 4, 3))
                    fmt = "ppm"
                elif kind == "audio":
                    s = (
                        (np.arange(32, dtype=np.int64) * 17 + doc_id * 31)
                        % 1000
                    ) - 500
                    data = encode_wav_pcm16(8000, s.astype(np.int16))
                    fmt = "wav"
                else:
                    data = text.encode("utf-8")
                    fmt = "mp4"
                rows.append((doc_id, kind, fmt, data, None))
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "fmt", "data", "meta"]
            )

    media = spread_small_input(docs.select("doc_id", "text")).mapInPandas(
        encode, MEDIA_SCHEMA
    )
    feats = extract_features(media, dim=16, decoder="auto")
    sizes = media.select(
        "media_id", F.length("data").cast("int").alias("nbytes")
    )
    real = F.col("kind").isin("image", "audio")
    return feats.join(sizes, "media_id").select(
        "media_id",
        "kind",
        "nbytes",
        F.when(real, portable_round(F.element_at("feature", 3), 4))
        .otherwise(F.lit(-1.0))
        .alias("stat_mean"),
        F.when(real, F.element_at("feature", 4).cast("double"))
        .otherwise(F.lit(-1.0))
        .alias("stat_max"),
        "feat_dim",
    )


# --------------------------------------------------------------------------
# X15 — IVF-style ANN: deterministic coarse centroids, exact fixed-point
# cell assignment, probe-own-cell, exact cosine rank inside the cell.
# --------------------------------------------------------------------------
@query(
    "x15_similarity_ivf",
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
    ex AS (
      SELECT vec_id, UNNEST(emb) AS v, GENERATE_SUBSCRIPTS(emb, 1) - 1 AS d
      FROM e
    ),
    exq AS (
      SELECT vec_id, d, v, CAST(FLOOR(v * 1000.0 + 0.5) AS BIGINT) AS qv
      FROM ex
    ),
    cent AS (SELECT vec_id AS cent_id, d, qv FROM exq WHERE vec_id < 8),
    cdot AS (
      SELECT x.vec_id, c.cent_id, SUM(c.qv * x.qv) AS dotq
      FROM exq x JOIN cent c ON x.d = c.d
      GROUP BY x.vec_id, c.cent_id
    ),
    assign AS (
      SELECT vec_id, cent_id AS cell FROM (
        SELECT vec_id, cent_id,
               ROW_NUMBER() OVER (
                 PARTITION BY vec_id ORDER BY dotq DESC, cent_id) AS r
        FROM cdot) t
      WHERE r = 1
    ),
    q AS (
      SELECT vec_id AS query_id, cell FROM assign
      WHERE vec_id BETWEEN 100 AND 109
    ),
    cand AS (
      SELECT q.query_id, a.vec_id AS cand_id
      FROM q JOIN assign a ON q.cell = a.cell AND a.vec_id <> q.query_id
    ),
    norms AS (SELECT vec_id, SQRT(SUM(v * v)) AS nrm FROM ex GROUP BY vec_id),
    dots2 AS (
      SELECT cand.query_id, cand.cand_id, SUM(a.v * b.v) AS dot
      FROM cand
      JOIN ex a ON a.vec_id = cand.query_id
      JOIN ex b ON b.vec_id = cand.cand_id AND a.d = b.d
      GROUP BY cand.query_id, cand.cand_id
    ),
    scored AS (
      SELECT query_id, cand_id, dot / (nq.nrm * nc.nrm) AS cos_raw
      FROM dots2
      JOIN norms nq ON query_id = nq.vec_id
      JOIN norms nc ON cand_id = nc.vec_id
    ),
    ranked AS (
      SELECT query_id, cand_id, cos_raw,
             ROW_NUMBER() OVER (
               PARTITION BY query_id ORDER BY cos_raw DESC, cand_id) AS rnk
      FROM scored
    )
    SELECT query_id, cand_id,
           FLOOR(cos_raw * 10000.0 + 0.5) / 10000.0 AS cosine,
           CAST(rnk AS INT) AS rnk
    FROM ranked WHERE rnk <= 3
    """,
)
def x15(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_topk(
        emb,
        (F.col("vec_id") >= 100) & (F.col("vec_id") <= 109),
        n_centroids=8,
        k=3,
    )


# --------------------------------------------------------------------------
# Q47 — native session windows (F.session_window, 5-minute gap): the same
# sessionization semantics q27 builds by hand from lag + cumulative sum,
# expressed with Spark's built-in operator. Window = [min(ts),
# max(ts) + gap); oracle reconstructs it with the gap/cumsum formulation.
# In streaming mode the identical expression runs under a watermark with
# state cleanup — this query pins the batch semantics.
# --------------------------------------------------------------------------
@query(
    "q47_session_window",
    oracle="""
    WITH o AS (
      SELECT user_id, ts,
             -- Spark session windows are [start, last_ts + gap): an event
             -- exactly gap after its predecessor opens a NEW session
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       >= INTERVAL 5 MINUTE
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
    ),
    s AS (
      SELECT user_id, ts,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sess
      FROM o
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 5 MINUTE AS session_end,
           COUNT(*) AS n_events
    FROM s GROUP BY user_id, sess
    """,
)
def q47(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "5 minutes"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


# --------------------------------------------------------------------------
# Q48 — distribution window functions: ntile / percent_rank / cume_dist
# over a fully-deterministic ordering (totalprice, orderkey tie-break).
# --------------------------------------------------------------------------
@query(
    "q48_window_distribution",
    oracle="""
    SELECT o_orderkey,
           o_orderpriority,
           CAST(NTILE(4) OVER w AS INT) AS quartile,
           FLOOR(PERCENT_RANK() OVER w * 1000000.0 + 0.5) / 1000000.0
             AS pct_rank,
           FLOOR(CUME_DIST() OVER w * 1000000.0 + 0.5) / 1000000.0
             AS cume
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice, o_orderkey)
    """,
)
def q48(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).alias("quartile"),
        portable_round(F.percent_rank().over(w), 6).alias("pct_rank"),
        portable_round(F.cume_dist().over(w), 6).alias("cume"),
    )


# --------------------------------------------------------------------------
# X17 — TF-IDF top terms per document, fully relational (term-frequency
# join document-frequency; sklearn-style smooth idf = ln((N+1)/(df+1))+1).
# The canonical text-featurization step of an LLM data pipeline — two
# map-side-combinable aggregations and one broadcast-sized join on term.
# --------------------------------------------------------------------------
@query(
    "x17_tfidf_topk",
    oracle="""
    WITH words AS (
      SELECT doc_id, UNNEST(string_split(text, ' ')) AS term FROM documents
    ),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM words GROUP BY doc_id, term
    ),
    df AS (
      SELECT term, COUNT(DISTINCT doc_id) AS df FROM words GROUP BY term
    ),
    n AS (SELECT COUNT(*) AS n FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term,
             tf.tf * (LN((n.n + 1.0) / (df.df + 1.0)) + 1.0) AS tfidf
      FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
    ),
    ranked AS (
      SELECT doc_id, term, tfidf,
             ROW_NUMBER() OVER (
               PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rnk
      FROM scored
    )
    SELECT doc_id, term,
           FLOOR(tfidf * 1000000.0 + 0.5) / 1000000.0 AS tfidf,
           CAST(rnk AS INT) AS rnk
    FROM ranked WHERE rnk <= 3
    """,
)
def x17(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    )
    tf = words.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = words.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df")
    )
    n_docs = docs.count()
    scored = tf.join(dfreq, "term").select(
        "doc_id",
        "term",
        (
            F.col("tf")
            * (F.log((n_docs + 1.0) / (F.col("df") + 1.0)) + F.lit(1.0))
        ).alias("tfidf_raw"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf_raw"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            "doc_id",
            "term",
            portable_round(F.col("tfidf_raw"), 6).alias("tfidf"),
            "rnk",
        )
    )


# --------------------------------------------------------------------------
# X16 — BPE-ish regex tokenizer stats: alpha runs / digit runs / single
# punctuation marks as tokens (the whitespace tokenizer is x10).
# --------------------------------------------------------------------------
_TOKEN_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"


@query(
    "x16_regex_tokens",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             regexp_extract_all(lower(text), '{_TOKEN_RE}') AS tok
      FROM documents
    )
    SELECT doc_id,
           CAST(len(tok) AS INT) AS n_tokens,
           CAST(len(list_filter(tok, t -> regexp_matches(t, '^[a-z]')))
                AS INT) AS n_alpha,
           CAST(len(list_filter(tok, t -> regexp_matches(t, '^[0-9]')))
                AS INT) AS n_num,
           CAST(len(list_distinct(tok)) AS INT) AS n_uniq
    FROM toks
    """,
)
def x16(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = F.regexp_extract_all(F.lower(F.col("text")), F.lit(_TOKEN_RE), 0)
    toks = docs.select("doc_id", tok.alias("tok"))
    return toks.select(
        "doc_id",
        F.size("tok").alias("n_tokens"),
        F.size(F.filter(F.col("tok"), lambda t: t.rlike("^[a-z]"))).alias(
            "n_alpha"
        ),
        F.size(F.filter(F.col("tok"), lambda t: t.rlike("^[0-9]"))).alias(
            "n_num"
        ),
        F.size(F.array_distinct("tok")).alias("n_uniq"),
    )
