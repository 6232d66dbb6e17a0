"""Deterministic mini-transformer encoder (SURVEY §2.2 R3 / §2.7 U7 —
the numeric shape of the reference's featurizer, made real to this
environment's limit).

Reference: a HuggingFace BERT-family forward pass selecting one hidden
state (``constants/transformers.py:32-52``). torch/transformers are not
installed in this container, so — following the LSTM playbook
(``operators/lstm.py``: portable kernel, parity-pinned, driver-attested)
— the attention encoder itself is implemented in numpy: sinusoidal
positional encoding, pre-LN multi-head self-attention with softmax
scores, GELU feed-forward, residuals, final LayerNorm. Same architecture
class as the reference's model, hash-initialized deterministic weights
(``lstm.hash_uniform``, the engine's FIXTURES.md §2 construction), so
the whole forward is a pure function of the text — reproducible across
runs, partitions and engines, which is what lets a generated-literal
oracle attest it (x42/q61 precedent) despite softmax-attention having no
sane SQL form.

What this is NOT: a trained language model. It is the full transformer
COMPUTE graph under deterministic weights — the part of R3/U7 that can
be tested here. A deployment with torch swaps the weights source
(``embed_documents(backend='hf')``); every consumer downstream of the
``EMBED_SCHEMA`` seam (pooling, NB, LSTM, drift detectors) is unchanged.

POOLING CAVEAT (VERDICT r8 #1 — read before wiring these embeddings
into similarity/dedup/classification): the final LayerNorm squeezes
every position's state to the same scale, so MEAN pooling over
positions nearly CANCELS across documents — measured cross-class
centroid distance 0.009 for mean pooling vs 0.35 for first-token
([CLS]-style) pooling on the same states
(tests/test_transformer.py::test_mini_embeddings_discriminate_classes).
Use ``functions.arrays.first_token_pool_col`` for any semantic consumer
of ``backend='mini'`` states; mean pooling of these states is only
meaningful as a numeric fingerprint of the forward pass (that is what
the x92 attestation pins), not as a document representation. The
driver-attested semantic consumer is x97_transformer_semantic_shift
(queries/extensions12.py), which demonstrates the discrimination gap
end-to-end.

Distribution model: weights are hash-derived IN the executor (no
broadcast needed — the init is ~2k tiny hashes, memoized per worker via
``_WEIGHTS_CACHE``), the forward runs inside Arrow-batched
``mapInPandas``, one doc at a time over (seq<=64, d=8) matrices — the
same per-partition-model / per-row-math shape as ``lstm_predict``, so at
100 TB it scales exactly like every other embedding pass: narrow,
shuffle-free, embarrassingly parallel.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

from .embedder import EMBED_SCHEMA, hash_embed_tokens
from .lstm import hash_uniform

_LN_EPS = 1e-5


@dataclass
class MiniTransformerWeights:
    """Per-layer: wq/wk/wv/wo (d x d), ln1/ln2 gain+bias (d), w1 (d x f),
    b1 (f), w2 (f x d), b2 (d); final LayerNorm gain+bias."""

    layers: list = field(default_factory=list)
    lnf_g: np.ndarray | None = None
    lnf_b: np.ndarray | None = None
    n_heads: int = 2

    @staticmethod
    def init_hash(
        d_model: int, n_layers: int = 2, n_heads: int = 2, d_ff: int = 16
    ) -> "MiniTransformerWeights":
        """Hash-derived weights: every entry is
        hash_uniform(tag, i, j) / sqrt(d_model) — deterministic, scale-
        bounded, and identical wherever it is recomputed (executors never
        need the driver to ship weights)."""
        assert d_model % n_heads == 0
        s = 1.0 / math.sqrt(d_model)
        ws = MiniTransformerWeights(n_heads=n_heads)

        def mat(tag: str, rows: int, cols: int) -> np.ndarray:
            return np.array(
                [
                    [hash_uniform(tag, i, j) * s for j in range(cols)]
                    for i in range(rows)
                ]
            )

        for L in range(n_layers):
            ws.layers.append(
                {
                    "wq": mat(f"tq{L}", d_model, d_model),
                    "wk": mat(f"tk{L}", d_model, d_model),
                    "wv": mat(f"tv{L}", d_model, d_model),
                    "wo": mat(f"to{L}", d_model, d_model),
                    "ln1_g": 1.0 + mat(f"tg1{L}", 1, d_model)[0],
                    "ln1_b": mat(f"tb1{L}", 1, d_model)[0],
                    "ln2_g": 1.0 + mat(f"tg2{L}", 1, d_model)[0],
                    "ln2_b": mat(f"tb2{L}", 1, d_model)[0],
                    "w1": mat(f"tf1{L}", d_model, d_ff),
                    "b1": mat(f"tc1{L}", 1, d_ff)[0],
                    "w2": mat(f"tf2{L}", d_ff, d_model),
                    "b2": mat(f"tc2{L}", 1, d_model)[0],
                }
            )
        ws.lnf_g = 1.0 + mat("tgf", 1, d_model)[0]
        ws.lnf_b = mat("tbf", 1, d_model)[0]
        return ws


def positional_encoding(seq_len: int, d_model: int) -> np.ndarray:
    """Standard sinusoidal PE: PE[p, 2i] = sin(p / 10000^(2i/d)),
    PE[p, 2i+1] = cos(same)."""
    pe = np.zeros((seq_len, d_model))
    for p in range(seq_len):
        for i in range(0, d_model, 2):
            ang = p / (10000.0 ** (i / d_model))
            pe[p, i] = math.sin(ang)
            if i + 1 < d_model:
                pe[p, i + 1] = math.cos(ang)
    return pe


def _layer_norm(x: np.ndarray, g: np.ndarray, b: np.ndarray) -> np.ndarray:
    mu = x.mean(axis=-1, keepdims=True)
    var = ((x - mu) ** 2).mean(axis=-1, keepdims=True)
    return (x - mu) / np.sqrt(var + _LN_EPS) * g + b


def _gelu(x: np.ndarray) -> np.ndarray:
    """Exact GELU: 0.5 * x * (1 + erf(x / sqrt(2)))."""
    return 0.5 * x * (1.0 + np.vectorize(math.erf)(x / math.sqrt(2.0)))


def encoder_forward_one(
    ws: MiniTransformerWeights, tokens: np.ndarray
) -> np.ndarray:
    """(seq, d) input token vectors -> (seq, d) contextual states.
    Pre-LN blocks: x += MHA(LN(x)); x += FFN(LN(x)); final LN."""
    seq, d = tokens.shape
    nh = ws.n_heads
    dh = d // nh
    x = tokens + positional_encoding(seq, d)
    for L in ws.layers:
        h = _layer_norm(x, L["ln1_g"], L["ln1_b"])
        q, k, v = h @ L["wq"], h @ L["wk"], h @ L["wv"]
        out = np.empty_like(h)
        for hd in range(nh):
            sl = slice(hd * dh, (hd + 1) * dh)
            scores = (q[:, sl] @ k[:, sl].T) / math.sqrt(dh)
            scores = scores - scores.max(axis=1, keepdims=True)
            e = np.exp(scores)
            att = e / e.sum(axis=1, keepdims=True)
            out[:, sl] = att @ v[:, sl]
        x = x + out @ L["wo"]
        h2 = _layer_norm(x, L["ln2_g"], L["ln2_b"])
        x = x + _gelu(h2 @ L["w1"] + L["b1"]) @ L["w2"] + L["b2"]
    return _layer_norm(x, ws.lnf_g, ws.lnf_b)


# The independent pure-Python replication of this forward (the parity
# reference the tests pin the numpy kernel against, and the
# implementation the x92 literal generator uses) lives in
# tools/pure_kernels.py — deliberately OUTSIDE this module, with zero
# imports from the engine package, so a bug here cannot satisfy both
# sides of the parity check (VERDICT r10 #4).
_WEIGHTS_CACHE: dict[tuple, MiniTransformerWeights] = {}


def _cached_weights(
    d_model: int, n_layers: int, n_heads: int, d_ff: int
) -> MiniTransformerWeights:
    key = (d_model, n_layers, n_heads, d_ff)
    ws = _WEIGHTS_CACHE.get(key)
    if ws is None:
        ws = MiniTransformerWeights.init_hash(d_model, n_layers, n_heads, d_ff)
        _WEIGHTS_CACHE[key] = ws
    return ws


def transformer_embed_fn(
    model: str,
    dim: int,
    max_seq_len: int,
    n_layers: int,
    n_heads: int,
    d_ff: int,
    text_col: str,
    id_col: str,
):
    """The mapInPandas worker for ``embed_documents(backend='mini')``:
    hash input embeddings (the same token-vector construction every
    other consumer uses) -> mini-transformer encoder -> contextual token
    states, EMBED_SCHEMA out. Weights are recomputed (memoized) in each
    worker from the hash construction — nothing is shipped."""

    def fn(batches):
        ws = _cached_weights(dim, n_layers, n_heads, d_ff)
        memo: dict[str, list[float]] = {}
        for pdf in batches:
            toks_out = []
            for t in pdf[text_col]:
                inp = np.array(
                    hash_embed_tokens(t or "", model, dim, max_seq_len, memo)
                )
                if inp.size == 0:
                    toks_out.append([])
                    continue
                toks_out.append(
                    [[float(v) for v in row] for row in encoder_forward_one(ws, inp)]
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].values,
                    "model": [model] * len(pdf),
                    "tokens": toks_out,
                    "seq_len": [len(t) for t in toks_out],
                }
            )

    return fn


def transformer_embed_documents(
    docs: DataFrame,
    model: str = "MINI",
    dim: int = 8,
    max_seq_len: int = 64,
    n_layers: int = 2,
    n_heads: int = 2,
    d_ff: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """R3/U7 via the mini encoder: DataFrame[doc_id, model, tokens,
    seq_len] with CONTEXTUAL token states (unlike the hash backend, a
    token's vector depends on its neighbors — attention mixing — which
    is the property the reference's featurizer has and a bag-of-words
    hash embedder lacks). Pool these states with
    ``first_token_pool_col`` for semantic use — NOT ``mean_pool_col``;
    see the module docstring's pooling caveat."""
    from ..sources.tables import spread_small_input

    return spread_small_input(docs.select(id_col, text_col)).mapInPandas(
        transformer_embed_fn(
            model, dim, max_seq_len, n_layers, n_heads, d_ff, text_col, id_col
        ),
        EMBED_SCHEMA,
    )
