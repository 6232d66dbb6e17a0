"""LSTM inference surface (U1/U3): deterministic, distributed == local,
valid log-probs, argmax-first decode."""

from __future__ import annotations

import numpy as np
import pytest

from detecting_and_addressing_change_spark.operators.lstm import (
    LSTMWeights,
    lstm_predict,
)


@pytest.fixture(scope="module")
def model_and_docs(spark):
    rng = np.random.RandomState(4)
    w = LSTMWeights.init(input_dim=6, hidden=12, n_layers=2, n_classes=5, seed=2)
    rows = []
    for i in range(24):
        seq = rng.randint(2, 9)
        rows.append((i, (rng.randn(seq, 6) * 0.8).tolist()))
    df = spark.createDataFrame(rows, "doc_id long, tokens array<array<double>>")
    return w, df, dict(rows)


def test_distributed_matches_local(spark, model_and_docs):
    w, df, raw = model_and_docs
    out = {r["doc_id"]: r for r in lstm_predict(df.repartition(4), w).collect()}
    for i, toks in raw.items():
        local = w.forward_one(np.array(toks))
        np.testing.assert_allclose(out[i]["log_probs"], local, atol=1e-9)
        assert out[i]["pred"] == int(local.argmax())


def test_log_probs_normalized(spark, model_and_docs):
    w, df, _ = model_and_docs
    for r in lstm_predict(df, w).collect():
        total = np.exp(np.array(r["log_probs"])).sum()
        assert total == pytest.approx(1.0, abs=1e-9)


def test_deterministic_across_runs(spark, model_and_docs):
    w, df, _ = model_and_docs
    a = sorted(tuple(r) for r in lstm_predict(df, w).collect())
    b = sorted(tuple(r) for r in lstm_predict(df.repartition(2), w).collect())
    for (ia, lpa, pa), (ib, lpb, pb) in zip(a, b):
        assert ia == ib and pa == pb
        np.testing.assert_allclose(lpa, lpb, atol=0)


def test_portable_kernel_matches_numpy_semantics():
    """The portable (ordered-fold / formula-tanh) kernel is the SAME
    network as the numpy fast path — only FP association differs, so
    outputs agree to ~1e-9 while bits may differ."""
    import numpy as np

    from detecting_and_addressing_change_spark.operators.lstm import (
        forward_one_portable,
        init_hash_weights,
    )

    ws = init_hash_weights(6, 4, 2, 3)
    tokens = [
        [0.1 * i - 0.25 * d for d in range(6)] for i in range(5)
    ]
    lp_np = ws.forward_one(np.array(tokens, dtype=np.float64))
    lp_po = forward_one_portable(ws, tokens)
    assert np.allclose(lp_np, np.array(lp_po), atol=1e-9)
    assert int(np.argmax(lp_np)) == max(
        range(len(lp_po)), key=lambda c: (lp_po[c], -c)
    )
