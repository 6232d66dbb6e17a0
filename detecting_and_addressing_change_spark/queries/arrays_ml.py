"""Array/ML operator queries (SURVEY §2.2 R5-R9, §2.3 A6): linear-map
apply, poolings over token arrays, seeded Gaussian noise — all with full
DuckDB oracles built from the same portable arithmetic.

The embeddings table has flat 64-dim vectors; the pooling queries view them
as 8 tokens x 8 dims (token t = dims [8t, 8t+8)) so the ragged-array pooling
operators get exercised against a relational oracle.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import portable_round
from ..sources.tables import load_table
from .registry import query

DIM = 64
TOK = 8  # tokens per vector when chunking


# --------------------------------------------------------------------------
# Q31 — linear-map apply (R6, adaptation/stream.py:49-54 in reference —
# the repaired matrix path, SURVEY §8 Q3). The matrix is a deterministic
# formula M[i][d] = ((i*31 + d*17) % 7 - 3) / 10 so both engines build the
# identical literal.
# --------------------------------------------------------------------------
@query(
    "q31_linear_map",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
    ),
    ex AS (
      SELECT vec_id, UNNEST(emb) AS v,
             GENERATE_SUBSCRIPTS(emb, 1) - 1 AS d
      FROM e
    ),
    outdim AS (SELECT UNNEST(GENERATE_SERIES(0, {DIM - 1})) AS i)
    SELECT ex.vec_id, CAST(o.i AS INT) AS i,
           FLOOR((SUM(((o.i*31 + ex.d*17) % 7 - 3) / 10.0 * ex.v)) * 1000000.0 + 0.5)
             / 1000000.0 AS mapped
    FROM ex CROSS JOIN outdim o
    GROUP BY ex.vec_id, o.i
    """,
)
def q31(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.arrays import linear_map_udf

    matrix = [
        [((i * 31 + d * 17) % 7 - 3) / 10.0 for d in range(DIM)]
        for i in range(DIM)
    ]
    emb = load_table(spark, sf_dir, "embeddings")
    # Arrow-batched ordered-fold matmul — bit-identical to the audited
    # linear_map_col expression (parity test in tests/test_arrays.py)
    mapped = emb.select(
        "vec_id", linear_map_udf(matrix)(F.col("embedding")).alias("m")
    )
    return mapped.select(
        "vec_id", F.posexplode("m").alias("i", "mv")
    ).select(
        "vec_id",
        F.col("i").cast("int").alias("i"),
        portable_round(F.col("mv"), 6).alias("mapped"),
    )


# --------------------------------------------------------------------------
# Q32 — poolings over token arrays (R7 abs-max / R8 max / R9 mean, the
# reference's three pooling conventions: models/wos_classifier.py:181-198,
# models/wos_train_nb.py:73-75, adaptation/dataset.py:214-230). The flat
# vector is chunked into 8 tokens x 8 dims; outputs are exploded per dim.
# --------------------------------------------------------------------------
@query(
    "q32_poolings",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
    ),
    ex AS (
      SELECT vec_id, UNNEST(emb) AS v,
             GENERATE_SUBSCRIPTS(emb, 1) - 1 AS pos
      FROM e
    ),
    toks AS (
      SELECT vec_id, pos % {TOK} AS d, CAST(pos / {TOK} AS INT) AS t, v
      FROM ex
    ),
    agg AS (
      SELECT vec_id, d, SUM(v)/COUNT(*) AS mean_v, MAX(v) AS max_v
      FROM toks GROUP BY vec_id, d
    ),
    am AS (
      SELECT vec_id, d, v FROM (
        SELECT vec_id, d, v,
               ROW_NUMBER() OVER (
                 PARTITION BY vec_id, d ORDER BY ABS(v) DESC, t) AS r
        FROM toks) WHERE r = 1
    )
    SELECT a.vec_id, CAST(a.d AS INT) AS d,
           FLOOR((a.mean_v) * 1000000.0 + 0.5) / 1000000.0 AS mean_pool,
           FLOOR((a.max_v) * 1000000.0 + 0.5) / 1000000.0 AS max_pool,
           FLOOR((am.v) * 1000000.0 + 0.5) / 1000000.0 AS abs_max_pool
    FROM agg a JOIN am ON a.vec_id = am.vec_id AND a.d = am.d
    """,
)
def q32(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.arrays import (
        abs_max_pool_col,
        max_pool_col,
        mean_pool_col,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    # chunk flat 64-dim into 8 tokens of 8 dims: token t = slice(8t+1, 8)
    tokens = F.transform(
        F.sequence(F.lit(0), F.lit(TOK - 1)),
        lambda t: F.slice(F.col("embedding"), t * TOK + 1, TOK),
    )
    pooled = emb.select(
        "vec_id",
        mean_pool_col(tokens).alias("mean_a"),
        max_pool_col(tokens).alias("max_a"),
        abs_max_pool_col(tokens).alias("am_a"),
    )
    # explode the three pooled vectors in lockstep via the dim index
    return pooled.select(
        "vec_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(TOK - 1)),
                lambda d: F.struct(
                    F.get("mean_a", d).alias("mean_pool"),
                    F.get("max_a", d).alias("max_pool"),
                    F.get("am_a", d).alias("abs_max_pool"),
                ),
            )
        ).alias("d", "p"),
    ).select(
        "vec_id",
        F.col("d").cast("int").alias("d"),
        portable_round(F.col("p.mean_pool"), 6).alias("mean_pool"),
        portable_round(F.col("p.max_pool"), 6).alias("max_pool"),
        portable_round(F.col("p.abs_max_pool"), 6).alias("abs_max_pool"),
    )


# --------------------------------------------------------------------------
# Q33 — seeded Gaussian noise (R5): portable Box-Muller from integer-hash
# uniforms, so the "random" noise is a pure deterministic function of
# (vec_id, dim) that BOTH engines compute identically — the engine-portable
# analogue of the reference's torch.randn σ-schedule noise
# (streams/run_stream_supervised.py:50-54). Warm-start gate included:
# vectors with vec_id < 100 get σ=0 (T4).
# --------------------------------------------------------------------------
_NOISE = """
    (SQRT(-2.0 * LN((((vec_id * 1000 + {d}) * 1103515245 + 12345) % 2147483648 + 1.0)
        / 2147483649.0))
     * COS(2.0 * PI() * ((((vec_id * 1000 + {d}) * 69069 + 1) % 2147483648)
        / 2147483648.0)))
"""


@query(
    "q33_seeded_noise_gate",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
    ),
    ex AS (
      SELECT vec_id, UNNEST(emb) AS v,
             GENERATE_SUBSCRIPTS(emb, 1) - 1 AS d
      FROM e
    )
    SELECT vec_id, CAST(d AS INT) AS d,
           FLOOR((v + CASE WHEN vec_id < 100 THEN 0.0
                           ELSE 0.5 * {_NOISE.format(d="d")} END) * 1000000.0 + 0.5)
             / 1000000.0 AS noisy
    FROM ex
    """,
)
def q33(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        "vec_id", F.posexplode(F.col("embedding").cast("array<double>")).alias("d", "v")
    )
    key = F.col("vec_id") * 1000 + F.col("d")
    u1 = ((key * 1103515245 + 12345) % F.lit(2147483648) + 1.0) / 2147483649.0
    u2 = ((key * 69069 + 1) % F.lit(2147483648)) / 2147483648.0
    noise = F.sqrt(-2.0 * F.log(u1)) * F.cos(2.0 * math.pi * u2)
    gated = F.when(F.col("vec_id") < 100, F.lit(0.0)).otherwise(0.5 * noise)
    return ex.select(
        "vec_id",
        F.col("d").cast("int").alias("d"),
        portable_round(F.col("v") + gated, 6).alias("noisy"),
    )
