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
# X14 — multimodal binary-column pipeline on the oracle path: documents ->
# opaque media bytes (binary column) -> Arrow mapInPandas feature extraction
# (stubbed deterministic decode) -> metadata + fingerprint. The md5 / byte
# length / kind dispatch are engine-portable; feat_dim comes back from the
# actual UDF output, so a broken mapInPandas stage fails the hash compare.
# --------------------------------------------------------------------------
@query(
    "x14_multimodal_features",
    oracle="""
    SELECT doc_id AS media_id,
           CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                ELSE 'video' END AS kind,
           CAST(octet_length(encode(text)) AS INT) AS nbytes,
           md5(text) AS digest,
           16 AS feat_dim
    FROM documents
    """,
)
def x14(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..multimodal.binary_ops import extract_features

    docs = load_table(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.element_at(
            F.array(F.lit("png"), F.lit("wav"), F.lit("mp4")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("fmt"),
        F.encode(F.col("text"), "UTF-8").alias("data"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )
    feats = extract_features(media, dim=16).select("media_id", "feat_dim")
    side = media.select(
        "media_id",
        "kind",
        F.length("data").cast("int").alias("nbytes"),
        F.md5("data").alias("digest"),
    )
    return side.join(feats, "media_id").select(
        "media_id", "kind", "nbytes", "digest", "feat_dim"
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
