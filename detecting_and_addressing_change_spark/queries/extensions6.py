"""Round-3 extension queries: PCA projection (U9).

PCA's eigendecomposition is not expressible in portable SQL, so
x42_pca_project registers WITHOUT a DuckDB oracle (driver records the
weaker rows-only check); the strong correctness signal is the numpy-golden
parity test in tests/test_pca.py (components, projections, centering, sign
convention all pinned against centered SVD).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import portable_round
from ..sources.tables import load_table
from .registry import query


@query("x42_pca_project")
def x42(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U9 (reference adaptation/mapping.py:67-76): project the embeddings
    table onto its top-2 principal axes — centered + sign-normalized, the
    sklearn semantics the reference's visualization uses."""
    from ..operators.pca import pca_fit_project

    emb = load_table(spark, sf_dir, "embeddings")
    out = pca_fit_project(emb, vec_col="embedding", k=2, out_col="pc")
    return out.select(
        "vec_id",
        portable_round(F.element_at("pc", 1), 4).alias("pc1"),
        portable_round(F.element_at("pc", 2), 4).alias("pc2"),
    ).orderBy("vec_id")


# --------------------------------------------------------------------------
# x43 — audio frame sampling over REAL WAV bytes: per-doc PCM-16 files
# (samples (doc_id*31 + i*17) % 1000 - 500, the x14 generator) -> decode ->
# hop-strided frames -> per-frame RMS/peak. The oracle recomputes each
# frame's RMS in closed form: frame length 16 is a power of two so AVG is
# exact, and IEEE sqrt is correctly rounded in both engines — the compare
# is bit-exact, pinning header parsing, sample endianness, AND the frame
# stride arithmetic.
# --------------------------------------------------------------------------
@query(
    "x43_audio_frames",
    oracle="""
    WITH aud AS (SELECT doc_id FROM documents WHERE doc_id % 3 = 1),
    frames AS (SELECT UNNEST(GENERATE_SERIES(0, 2)) AS frame_id),
    samp AS (
      SELECT a.doc_id, f.frame_id, i,
             CAST((a.doc_id * 31 + i * 17) % 1000 - 500 AS DOUBLE) AS s
      FROM aud a, frames f,
           UNNEST(GENERATE_SERIES(0, 15)) AS t(j),
           LATERAL (SELECT f.frame_id * 8 + j AS i)
    )
    SELECT doc_id AS media_id, CAST(frame_id AS INT) AS frame_id,
           frame_id * 1000.0 AS start_us,
           16 AS n_samples,
           FLOOR(SQRT(AVG(s * s)) * 10000.0 + 0.5) / 10000.0 AS rms,
           MAX(ABS(s)) AS peak
    FROM samp GROUP BY doc_id, frame_id
    """,
)
def x43(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from ..multimodal.binary_ops import (
        MEDIA_SCHEMA,
        encode_wav_pcm16,
        sample_audio_frames,
    )
    from ..sources.tables import spread_small_input

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 3 == 1
    )

    def encode(batches):
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                s = (
                    (np.arange(32, dtype=np.int64) * 17 + doc_id * 31) % 1000
                ) - 500
                rows.append(
                    (
                        doc_id,
                        "audio",
                        "wav",
                        encode_wav_pcm16(8000, s.astype(np.int16)),
                        None,
                    )
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "fmt", "data", "meta"]
            )

    media = spread_small_input(docs.select("doc_id")).mapInPandas(
        encode, MEDIA_SCHEMA
    )
    frames = sample_audio_frames(media, frame_len=16, hop=8)
    return frames.select(
        "media_id",
        "frame_id",
        # 8 samples hop at 8000 Hz = exactly 1 ms; expose microseconds so
        # the oracle column is integral-valued doubles on both engines
        (F.col("start_ms") * 1000.0).alias("start_us"),
        "n_samples",
        portable_round(F.col("rms"), 4).alias("rms"),
        "peak",
    )


# --------------------------------------------------------------------------
# x44 — image resize over REAL PPM bytes: encode 4x4 (pixels
# (doc_id*7 + p*13) % 256), nearest-neighbor resize to 2x2 through the real
# decode->remap->re-encode path, then feature-extract the RESIZED file. The
# oracle selects exactly the 12 bytes nearest-neighbor keeps
# (y,x in {0,2}, c in 0..2 => p = (y*4+x)*3 + c) and averages them — a
# wrong stride, header, or index map changes the mean and fails the hash.
# --------------------------------------------------------------------------
@query(
    "x44_image_resize",
    oracle="""
    WITH img AS (SELECT doc_id FROM documents WHERE doc_id % 3 = 0),
    px AS (
      SELECT i.doc_id, ((y * 4 + x) * 3 + c) AS p
      FROM img i,
           UNNEST([0, 2]) AS ty(y),
           UNNEST([0, 2]) AS tx(x),
           UNNEST(GENERATE_SERIES(0, 2)) AS tc(c)
    )
    SELECT doc_id AS media_id, 2 AS width, 2 AS height,
           FLOOR(AVG((doc_id * 7 + p * 13) % 256) * 10000.0 + 0.5)
             / 10000.0 AS mean_px
    FROM px GROUP BY doc_id
    """,
)
def x44(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from ..multimodal.binary_ops import (
        MEDIA_SCHEMA,
        encode_ppm,
        extract_features,
        resize_images,
    )
    from ..sources.tables import spread_small_input

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 3 == 0
    )

    def encode(batches):
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                doc_id = int(doc_id)
                px = (np.arange(48, dtype=np.int64) * 13 + doc_id * 7) % 256
                rows.append(
                    (
                        doc_id,
                        "image",
                        "ppm",
                        encode_ppm(px.astype(np.uint8).reshape(4, 4, 3)),
                        None,
                    )
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "fmt", "data", "meta"]
            )

    media = spread_small_input(docs.select("doc_id")).mapInPandas(
        encode, MEDIA_SCHEMA
    )
    resized = resize_images(media, out_w=2, out_h=2)
    feats = extract_features(resized, dim=8, decoder="real")
    return feats.select(
        "media_id",
        F.element_at("feature", 1).cast("int").alias("width"),
        F.element_at("feature", 2).cast("int").alias("height"),
        portable_round(F.element_at("feature", 3), 4).alias("mean_px"),
    )


# --------------------------------------------------------------------------
# x45 — IVF multi-probe ANN: same deterministic coarse quantizer as x15,
# but each query probes its TOP-2 nearest cells (the standard recall knob;
# candidate volume grows linearly in nprobe, never quadratically). The
# oracle reuses x15's exact fixed-point assignment with the query-side
# rank widened to r <= 2.
# --------------------------------------------------------------------------
@query(
    "x45_similarity_ivf_multiprobe",
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
    cellrank AS (
      SELECT vec_id, cent_id AS cell,
             ROW_NUMBER() OVER (
               PARTITION BY vec_id ORDER BY dotq DESC, cent_id) AS r
      FROM cdot
    ),
    assign AS (SELECT vec_id, cell FROM cellrank WHERE r = 1),
    q AS (
      SELECT vec_id AS query_id, cell FROM cellrank
      WHERE r <= 2 AND vec_id BETWEEN 100 AND 109
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
def x45(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_topk(
        emb,
        (F.col("vec_id") >= 100) & (F.col("vec_id") <= 109),
        n_centroids=8,
        k=3,
        nprobe=2,
    )
