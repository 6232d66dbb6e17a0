"""Learned embedding-space mappings (SURVEY §2.7 U4/U5/U8).

Reference: a 2-layer MLP (Linear->ReLU->Linear, shape-preserving,
``models/adaptation_models.py:21-39``) trained 10 epochs of Adam on MSE over
(source, target) pairs (``adaptation/mapping.py:148-184``). The pair table
is small by construction (top-k words x dim, <= 10k x 768), so — exactly
like the reference — training runs driver-side; this implementation uses
numpy (torch is not available in this container) with the same architecture,
loss, and Adam update rule. INFERENCE is distributed: weights are broadcast
inside an Arrow-batched pandas iterator (mapInPandas), so applying the
mapping to 100 TB of embeddings is embarrassingly parallel.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T


@dataclass
class MLPWeights:
    w1: np.ndarray
    b1: np.ndarray
    w2: np.ndarray
    b2: np.ndarray

    def forward(self, x: np.ndarray) -> np.ndarray:
        h = np.maximum(x @ self.w1 + self.b1, 0.0)
        return h @ self.w2 + self.b2


def train_mlp_mapping(
    pairs: DataFrame,
    source_col: str = "source",
    target_col: str = "target",
    hidden: int | None = None,
    epochs: int = 10,
    batch_size: int = 50,
    lr: float = 1e-3,
    seed: int = 0,
) -> MLPWeights:
    """U5: collect the (small) pair table and run Adam on MSE.

    Architecture mirrors the reference MLP (hidden defaults to dim,
    models/adaptation_models.py:24-28); batch 50 / 10 epochs / shuffled
    match adaptation/mapping.py:148-184."""
    rows = pairs.select(source_col, target_col).collect()
    x = np.array([r[source_col] for r in rows], dtype=np.float64)
    y = np.array([r[target_col] for r in rows], dtype=np.float64)
    n, dim = x.shape
    hidden = hidden or dim
    rng = np.random.RandomState(seed)
    w = MLPWeights(
        w1=rng.randn(dim, hidden) * np.sqrt(2.0 / dim),
        b1=np.zeros(hidden),
        w2=rng.randn(hidden, dim) * np.sqrt(2.0 / hidden),
        b2=np.zeros(dim),
    )
    # Adam state
    params = [w.w1, w.b1, w.w2, w.b2]
    m = [np.zeros_like(p) for p in params]
    v = [np.zeros_like(p) for p in params]
    beta1, beta2, eps = 0.9, 0.999, 1e-8
    t = 0
    for _ in range(epochs):
        order = rng.permutation(n)
        for start in range(0, n, batch_size):
            idx = order[start : start + batch_size]
            xb, yb = x[idx], y[idx]
            # forward
            z1 = xb @ w.w1 + w.b1
            h = np.maximum(z1, 0.0)
            out = h @ w.w2 + w.b2
            # MSE grads
            g_out = 2.0 * (out - yb) / out.size
            g_w2 = h.T @ g_out
            g_b2 = g_out.sum(axis=0)
            g_h = g_out @ w.w2.T
            g_z1 = g_h * (z1 > 0)
            g_w1 = xb.T @ g_z1
            g_b1 = g_z1.sum(axis=0)
            grads = [g_w1, g_b1, g_w2, g_b2]
            t += 1
            for p, mp, vp, g in zip(params, m, v, grads):
                mp *= beta1
                mp += (1 - beta1) * g
                vp *= beta2
                vp += (1 - beta2) * g * g
                mhat = mp / (1 - beta1**t)
                vhat = vp / (1 - beta2**t)
                p -= lr * mhat / (np.sqrt(vhat) + eps)
    return w


def apply_mlp_mapping(
    df: DataFrame,
    weights: MLPWeights,
    vec_col: str,
    out_col: str,
    id_cols: tuple[str, ...] = ("vec_id",),
) -> DataFrame:
    """U4 forward as a distributed Arrow-batched map; weights ride the
    closure (broadcast by Spark's task serialization — a few MB max)."""
    schema = T.StructType(
        [
            *[
                T.StructField(c, T.LongType())
                for c in id_cols
            ],
            T.StructField(out_col, T.ArrayType(T.DoubleType())),
        ]
    )

    def fn(batches):
        for pdf in batches:
            x = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            out = weights.forward(x)
            data = {c: pdf[c].values for c in id_cols}
            data[out_col] = [row.tolist() for row in out]
            yield pd.DataFrame(data)

    return df.select(*id_cols, vec_col).mapInPandas(fn, schema)
