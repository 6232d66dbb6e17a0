"""LSTM stream classifier — inference surface (SURVEY §2.7 U1/U3).

Reference: a 2-layer LSTM(hidden 256) over per-token embeddings, abs-max
pooling over the hidden sequence, a Linear head, log_softmax
(``models/wos_classifier.py:116-198``). torch is not available in this
container, so the forward pass is implemented in numpy with the standard
LSTM recurrences — same architecture, same pooling (R7 signed abs-max,
``:181-198``), same log_softmax decode (A5 argmax-first ties).

Distribution model (the part that matters at 100 TB): weights live in the
closure of an Arrow-batched ``mapInPandas`` — broadcast once per task,
model math vectorized per batch. Training (U2: one Adam step per
micro-batch of 32) remains driver-side inside foreachBatch per the
reference's scale; distributed training is explicitly out of scope
(SURVEY §7 Phase 4).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T


def _sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-x))


@dataclass
class LSTMWeights:
    """Per-layer gate weights: W[layer] (in_dim x 4H), U[layer] (H x 4H),
    b[layer] (4H). Gate order: input, forget, cell, output. Head:
    (H x n_classes)."""

    w: list = field(default_factory=list)
    u: list = field(default_factory=list)
    b: list = field(default_factory=list)
    head_w: np.ndarray | None = None
    head_b: np.ndarray | None = None

    @staticmethod
    def init(
        input_dim: int, hidden: int, n_layers: int, n_classes: int, seed: int = 0
    ) -> "LSTMWeights":
        rng = np.random.RandomState(seed)
        ws = LSTMWeights()
        for layer in range(n_layers):
            in_dim = input_dim if layer == 0 else hidden
            scale = 1.0 / np.sqrt(hidden)
            ws.w.append(rng.uniform(-scale, scale, (in_dim, 4 * hidden)))
            ws.u.append(rng.uniform(-scale, scale, (hidden, 4 * hidden)))
            ws.b.append(np.zeros(4 * hidden))
        ws.head_w = rng.uniform(
            -1.0 / np.sqrt(hidden), 1.0 / np.sqrt(hidden), (hidden, n_classes)
        )
        ws.head_b = np.zeros(n_classes)
        return ws

    @property
    def hidden(self) -> int:
        return self.u[0].shape[0]

    def forward_one(self, tokens: np.ndarray) -> np.ndarray:
        """(seq, in_dim) -> log-probs (n_classes,): LSTM stack -> signed
        abs-max pool over the hidden sequence -> linear -> log_softmax."""
        h_seq = tokens
        hid = self.hidden
        for layer in range(len(self.w)):
            h = np.zeros(hid)
            c = np.zeros(hid)
            outs = np.empty((len(h_seq), hid))
            for t_i, x in enumerate(h_seq):
                gates = x @ self.w[layer] + h @ self.u[layer] + self.b[layer]
                i = _sigmoid(gates[:hid])
                f = _sigmoid(gates[hid : 2 * hid])
                g = np.tanh(gates[2 * hid : 3 * hid])
                o = _sigmoid(gates[3 * hid :])
                c = f * c + i * g
                h = o * np.tanh(c)
                outs[t_i] = h
            h_seq = outs
        # R7 signed abs-max pooling, first-max tie semantics
        idx = np.abs(h_seq).argmax(axis=0)
        pooled = h_seq[idx, np.arange(h_seq.shape[1])]
        logits = pooled @ self.head_w + self.head_b
        logits = logits - logits.max()
        return logits - np.log(np.exp(logits).sum())


LSTM_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("log_probs", T.ArrayType(T.DoubleType())),
        T.StructField("pred", T.IntegerType()),
    ]
)


def lstm_predict(
    df: DataFrame,
    weights: LSTMWeights,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """U1/U3 inference: DataFrame[doc_id, tokens: array<array<float>>] ->
    DataFrame[doc_id, log_probs, pred]. pred uses torch argmax-first tie
    semantics (A5)."""

    def fn(batches):
        for pdf in batches:
            lps, preds = [], []
            for toks in pdf[tokens_col]:
                arr = np.array(
                    [np.asarray(t, dtype=np.float64) for t in toks]
                )
                lp = weights.forward_one(arr)
                lps.append(lp.tolist())
                preds.append(int(lp.argmax()))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].values,
                    "log_probs": lps,
                    "pred": preds,
                }
            )

    return df.select(id_col, tokens_col).mapInPandas(fn, LSTM_OUTPUT_SCHEMA)
