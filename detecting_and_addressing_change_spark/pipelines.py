"""End-to-end drift-experiment pipelines (SURVEY §3.2 entry point B).

The reference's abrupt-drift experiment
(``drift_detection/drift_experiments_supervised.py:29-133``): train a
classifier on embedding space A, stream space-A data through it, then —
through the SAME detector instance — stream space-B data (the embedding
swap IS the drift); the detector should fire near the seam (J6 stream
concatenation with carried state, SURVEY §8 Q8).

Spark-first realization: both streams are DataFrames; the 'shared detector
across the seam' is a union with a CONTINUOUS seq_id feeding one DDM key;
the classifier is the exact-sufficient-statistics Gaussian NB (A7); windowed
accuracy is the count-bucket agg (A3). Everything except the tiny driver-side
detector state is distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .functions.arrays import mean_pool_col
from .operators.ddm import detect_drift
from .operators.embedder import embed_documents
from .operators.nb import nb_fit, nb_predict
from .operators.windows import count_window_agg


def pooled_features(
    docs: DataFrame, model: str, dim: int, id_col: str = "doc_id"
) -> DataFrame:
    """text -> token embeddings (U7) -> mean pooling (R9):
    DataFrame[doc_id, features]."""
    emb = embed_documents(docs, model=model, dim=dim, id_col=id_col)
    return emb.select(
        id_col, mean_pool_col(F.col("tokens")).alias("features")
    )


def abrupt_drift_experiment(
    docs: DataFrame,
    label_col: str = "label",
    model_a: str = "BERT",
    model_b: str = "SCIBERT",
    dim: int = 8,
    batch_size: int = 32,
    id_col: str = "doc_id",
) -> DataFrame:
    """Returns DataFrame[seq_id, stream, accuracy, flag]: per-batch
    accuracy series of [space-A stream ++ space-B stream] through one DDM.

    Mirrors drift_experiments_supervised.py:29-133: model trained on A;
    prediction-correctness streams for A then B; per-print_every windowed
    accuracy; 1-accuracy into the shared detector."""
    labels = docs.select(id_col, F.col(label_col).alias("label"))

    feats_a = pooled_features(docs, model_a, dim, id_col)
    feats_b = pooled_features(docs, model_b, dim, id_col)

    train = feats_a.join(labels, id_col)
    stats = nb_fit(train, features_col="features", label_col="label")

    def score(feats: DataFrame, tag: str, seq_offset) -> DataFrame:
        preds = nb_predict(
            feats, stats, features_col="features", id_cols=(id_col,)
        )
        return (
            preds.join(labels, id_col)
            .select(
                (F.col(id_col) + F.lit(seq_offset)).alias("seq_id"),
                F.lit(tag).alias("stream"),
                (F.col("pred") == F.col("label")).cast("int").alias("correct"),
            )
        )

    n_docs = docs.count()
    scored = score(feats_a, "trained", 0).unionByName(
        score(feats_b, "untrained", n_docs)
    )

    per_batch = count_window_agg(
        scored,
        seq_col="seq_id",
        batch_size=batch_size,
        aggs=[
            F.avg("correct").alias("accuracy"),
            F.max("stream").alias("stream"),
        ],
    ).select(
        F.lit("ddm").alias("detector_id"),
        F.col("bucket").cast("long").alias("seq_id"),
        (1.0 - F.col("accuracy")).alias("error"),
        "accuracy",
        "stream",
    )

    flags = detect_drift(
        per_batch.select("detector_id", "seq_id", "error")
    ).select("seq_id", "flag")
    return (
        per_batch.join(flags, "seq_id")
        .select("seq_id", "stream", F.round("accuracy", 6).alias("accuracy"), "flag")
    )
