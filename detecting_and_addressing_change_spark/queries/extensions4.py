"""Fourth wave of LLM-pipeline extension queries: text cleaning (PII
scrubbing), corpus length profiling, n-gram statistics, and skew-aware
top-k per group.

All fully DuckDB-oracle-checked. The PII query synthesizes deterministic
dirty text first (the synthetic corpus has no real addresses — same
technique as x25's synthetic changelog); the regex subset used (character
classes, ``+``, literal dots) behaves identically in Java regex and RE2.
No reference counterpart (SURVEY §1.2); extension family per §2.9.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

# --------------------------------------------------------------------------
# x26 — PII scrubbing (text cleaning): tag emails/URLs, count and redact
# them. Row-level JVM regex ops — no shuffle, whole-stage codegen, scales
# linearly with input.
# --------------------------------------------------------------------------
_EMAIL_RE = "[a-z0-9.-]+@[a-z0-9.-]+"
_URL_RE = "http://[a-z0-9./-]+"


@query(
    "x26_pii_scrub",
    oracle=f"""
    WITH dirty AS (
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0
                  THEN text || ' user' || doc_id || '@mail-' || doc_id
                       || '.com see http://h' || doc_id || '.org/p'
                  ELSE text END AS t
      FROM documents
    )
    SELECT doc_id,
           CAST(LEN(regexp_extract_all(t, '{_EMAIL_RE}')) AS INT) AS n_email,
           CAST(LEN(regexp_extract_all(t, '{_URL_RE}')) AS INT) AS n_url,
           CAST(LENGTH(regexp_replace(regexp_replace(t, '{_EMAIL_RE}',
                '<EMAIL>', 'g'), '{_URL_RE}', '<URL>', 'g')) AS INT)
             AS clean_len
    FROM dirty
    """,
)
def x26(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    dirty = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.col("text"),
                F.lit(" user"),
                F.col("doc_id"),
                F.lit("@mail-"),
                F.col("doc_id"),
                F.lit(".com see http://h"),
                F.col("doc_id"),
                F.lit(".org/p"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("t"),
    )
    cleaned = F.regexp_replace(
        F.regexp_replace(F.col("t"), _EMAIL_RE, "<EMAIL>"),
        _URL_RE,
        "<URL>",
    )
    return dirty.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("t"), F.lit(_EMAIL_RE), 0)).alias(
            "n_email"
        ),
        F.size(F.regexp_extract_all(F.col("t"), F.lit(_URL_RE), 0)).alias(
            "n_url"
        ),
        F.length(cleaned).cast("int").alias("clean_len"),
    )


# --------------------------------------------------------------------------
# x27 — corpus length histogram (profiling): fixed-width buckets over
# n_chars with per-bucket doc and language counts. One map-side-combinable
# aggregation; bucket count is bounded so the shuffle is tiny at any scale.
# --------------------------------------------------------------------------
@query(
    "x27_length_histogram",
    oracle="""
    SELECT CAST(FLOOR(n_chars / 64) AS INT) AS bucket,
           CAST(FLOOR(n_chars / 64) * 64 AS INT) AS lo_chars,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT lang) AS n_langs,
           CAST(MIN(n_chars) AS INT) AS min_chars,
           CAST(MAX(n_chars) AS INT) AS max_chars
    FROM documents
    GROUP BY 1, 2
    """,
)
def x27(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.floor(F.col("n_chars") / 64).cast("int")
    return (
        docs.groupBy(
            bucket.alias("bucket"), (bucket * 64).cast("int").alias("lo_chars")
        )
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("lang").alias("n_langs"),
            F.min("n_chars").cast("int").alias("min_chars"),
            F.max("n_chars").cast("int").alias("max_chars"),
        )
    )


# --------------------------------------------------------------------------
# x28 — per-language top-5 bigrams (n-gram statistics). Bigrams are built
# array-natively with zip_with over two slices — no per-token shuffle, one
# aggregation on (lang, bigram) — then ranked with the skew-aware
# topk_per_group operator (languages are few and heavy: a plain
# PARTITION BY lang window would be a straggler at scale).
# --------------------------------------------------------------------------
@query(
    "x28_bigram_topk",
    oracle="""
    WITH w AS (
      SELECT lang, string_split(text, ' ') AS ws FROM documents
    ),
    bg AS (
      SELECT lang,
             UNNEST(list_transform(range(1, LEN(ws)),
                                   i -> ws[i] || ' ' || ws[i + 1])) AS bigram
      FROM w
    ),
    cnt AS (
      SELECT lang, bigram, COUNT(*) AS c FROM bg GROUP BY lang, bigram
    ),
    ranked AS (
      SELECT lang, bigram, c,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY c DESC, bigram) AS rn
      FROM cnt
    )
    SELECT lang, bigram, c, CAST(rn AS INT) AS rn FROM ranked WHERE rn <= 5
    """,
)
def x28(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.topk import topk_per_group

    docs = load_table(spark, sf_dir, "documents")
    ws = F.split(F.col("text"), " ")
    bigrams = F.zip_with(
        F.slice(ws, 1, F.size(ws) - 1),
        F.slice(ws, 2, F.size(ws) - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    cnt = (
        docs.select("lang", F.explode(bigrams).alias("bigram"))
        .groupBy("lang", "bigram")
        .agg(F.count("*").alias("c"))
    )
    return topk_per_group(
        cnt, ["lang"], "c", 5, tiebreak_cols=("bigram",)
    ).select("lang", "bigram", "c", F.col("rn").cast("int").alias("rn"))


# --------------------------------------------------------------------------
# q57 — top-3 orders by price per order priority: the canonical
# top-k-per-group, via the same two-phase salted operator. The oracle is
# the plain one-window formulation (fine at sf0.01; the Spark side is the
# plan you'd actually run at 100 TB).
# --------------------------------------------------------------------------
@query(
    "q57_topk_per_group",
    oracle="""
    WITH ranked AS (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    )
    SELECT o_orderpriority, o_orderkey,
           FLOOR(o_totalprice * 100.0 + 0.5) / 100.0 AS price,
           CAST(rn AS INT) AS rn
    FROM ranked WHERE rn <= 3
    """,
)
def q57(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import portable_round
    from ..operators.topk import topk_per_group

    orders = load_table(spark, sf_dir, "orders")
    top = topk_per_group(
        orders,
        ["o_orderpriority"],
        "o_totalprice",
        3,
        tiebreak_cols=("o_orderkey",),
    )
    return top.select(
        "o_orderpriority",
        "o_orderkey",
        portable_round(F.col("o_totalprice"), 2).alias("price"),
        F.col("rn").cast("int").alias("rn"),
    )


# --------------------------------------------------------------------------
# x29 — embedding L2-normalize + symmetric int8 quantization: the standard
# preprocessing in front of ANN indexes (x08/x15) — unit-norm makes cosine
# an inner product, int8 shrinks the index 4x. The norm is an ORDERED fold
# (F.aggregate vs list_reduce) so both engines sum in the same order ->
# bit-identical doubles; the quantizer is the portable FLOOR(x*127+0.5).
# Row-level array math, JVM-side, no shuffle.
# --------------------------------------------------------------------------
@query(
    "x29_vector_quantize",
    oracle="""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
    ),
    n AS (
      SELECT vec_id, emb,
             SQRT(list_reduce([0.0::DOUBLE] || emb, (a, b) -> a + b * b))
               AS nrm
      FROM e
    ),
    ex AS (
      SELECT vec_id, nrm, UNNEST(emb) AS v,
             GENERATE_SUBSCRIPTS(emb, 1) AS d
      FROM n
    )
    SELECT vec_id, CAST(d - 1 AS INT) AS d,
           CAST(FLOOR(v / nrm * 127 + 0.5) AS INT) AS q,
           FLOOR(nrm * 1000000.0 + 0.5) / 1000000.0 AS norm
    FROM ex
    """,
)
def x29(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.rounding import portable_round

    emb = load_table(spark, sf_dir, "embeddings")
    vecs = emb.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias(
            "emb"
        ),
    )
    nrm = F.sqrt(
        F.aggregate(F.col("emb"), F.lit(0.0), lambda a, x: a + x * x)
    )
    ex = vecs.withColumn("nrm", nrm).select(
        "vec_id", "nrm", F.posexplode("emb").alias("d", "v")
    )
    return ex.select(
        "vec_id",
        F.col("d").cast("int").alias("d"),
        F.floor(F.col("v") / F.col("nrm") * 127 + 0.5).cast("int").alias("q"),
        portable_round(F.col("nrm"), 6).alias("norm"),
    )
