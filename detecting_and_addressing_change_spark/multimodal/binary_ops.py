"""Multimodal (image/audio/video) column plumbing — LLM-pipeline extension.

Media are opaque ``binary`` columns with a typed metadata struct; decode /
feature-extract / resize / frame-sample run as Arrow-batched ``mapInPandas``
stages. The decode kernels themselves are STUBBED (no media libraries in
this container, per the build constraints): ``decoder='fake'`` produces a
deterministic, size-parametric fake decode so the Spark-side plumbing —
schema, batching, partitioning, UDF signature — is real and testable, and
``decoder='pillow'``-style real backends plug into the same interface.

Design for scale: media bytes never pass through a shuffle — the pipeline
is scan -> mapInPandas -> write, fully narrow. Metadata-only operations
(filter by width/duration, group by format) use the struct column and never
touch the bytes (column pruning drops the binary at the parquet scan).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("fmt", T.StringType()),  # png, wav, mp4, ...
        T.StructField("data", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
        T.StructField("feat_dim", T.IntegerType()),
    ]
)


def _fake_decode(data: bytes, kind: str, dim: int) -> np.ndarray:
    """Deterministic stand-in for a real decoder+featurizer: md5-seeded
    uniform vector. Replaced by a real backend via the same signature."""
    seed = int.from_bytes(hashlib.md5(data or b"").digest()[:4], "big")
    rng = np.random.RandomState(seed)
    return rng.uniform(-1, 1, size=dim).astype(np.float32)


def extract_features(
    media: DataFrame, dim: int = 64, decoder: str = "fake"
) -> DataFrame:
    """media (MEDIA_SCHEMA) -> FEATURE_SCHEMA via mapInPandas.

    Arrow delivers the binary column in batches; a real decoder would init
    per-partition (model load once per task, SURVEY §7 'cold-start') exactly
    where `decode` is bound below."""
    if decoder == "fake":
        decode = _fake_decode
    else:  # pragma: no cover - real backends not available in this container
        raise NotImplementedError(
            f"decoder {decoder!r}: media libraries are not available here; "
            "plug a real backend with signature (bytes, kind, dim) -> ndarray"
        )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode(d, k, dim)
                for d, k in zip(pdf["data"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "kind": pdf["kind"].values,
                    "feature": [f.tolist() for f in feats],
                    "feat_dim": [dim] * len(pdf),
                }
            )

    return media.mapInPandas(fn, FEATURE_SCHEMA)


def synth_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fixture: n fake media rows (binary payload = repeated
    md5 bytes; metadata consistent per kind)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.md5(f"media-{i}".encode()).digest() * (4 + i % 7)
        meta = {
            "width": 64 + i % 128 if kind != "audio" else None,
            "height": 48 + i % 96 if kind != "audio" else None,
            "sample_rate": 16000 if kind == "audio" else None,
            "duration_ms": 1000 + 37 * i if kind != "image" else None,
        }
        rows.append((i, kind, {"image": "png", "audio": "wav", "video": "mp4"}[kind], payload, meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
