"""U2 LSTM incremental training (operators/lstm_train.py): analytic BPTT
gradients pinned by finite differences, and the one-Adam-step-per-batch
partial_fit loop (reference wos_classifier.py:38-71) actually learns."""

from __future__ import annotations

import numpy as np
import pytest

from detecting_and_addressing_change_spark.operators.lstm import LSTMWeights
from detecting_and_addressing_change_spark.operators.lstm_train import (
    AdamState,
    LSTMGrads,
    lstm_partial_fit,
    nll_loss_and_grads,
)


def _batch(rng, n, dim, n_classes, seq=(2, 5)):
    toks = [
        rng.randn(rng.randint(*seq), dim).tolist() for _ in range(n)
    ]
    ys = [int(rng.randint(0, n_classes)) for _ in range(n)]
    return toks, ys


def test_gradients_match_finite_differences():
    """Every parameter tensor's analytic gradient agrees with central
    finite differences of the mean-NLL loss — the strongest dependency-free
    parity check for the backward pass."""
    rng = np.random.RandomState(0)
    dim, hid, n_classes = 3, 4, 3
    ws = LSTMWeights.init(dim, hid, n_layers=2, n_classes=n_classes, seed=1)
    toks, ys = _batch(rng, 4, dim, n_classes)
    loss, grads = nll_loss_and_grads(ws, toks, ys)
    assert loss > 0

    eps = 1e-6
    tensors = [
        ("w0", ws.w[0], grads.w[0]),
        ("w1", ws.w[1], grads.w[1]),
        ("u0", ws.u[0], grads.u[0]),
        ("u1", ws.u[1], grads.u[1]),
        ("b0", ws.b[0], grads.b[0]),
        ("b1", ws.b[1], grads.b[1]),
        ("head_w", ws.head_w, grads.head_w),
        ("head_b", ws.head_b, grads.head_b),
    ]
    for name, p, g in tensors:
        flat = p.ravel()
        # probe a spread of coordinates in each tensor
        idxs = np.linspace(0, flat.size - 1, num=min(10, flat.size)).astype(int)
        for ix in idxs:
            orig = flat[ix]
            flat[ix] = orig + eps
            lp, _ = nll_loss_and_grads(ws, toks, ys)
            flat[ix] = orig - eps
            lm, _ = nll_loss_and_grads(ws, toks, ys)
            flat[ix] = orig
            fd = (lp - lm) / (2 * eps)
            assert abs(fd - g.ravel()[ix]) < 1e-5, (name, ix, fd, g.ravel()[ix])


def test_abs_max_pool_gradient_routing():
    """The pool passes gradient ONLY to the argmax timestep per dim: a
    perturbation of a non-selected timestep's contribution must not change
    the loss to first order. Verified implicitly by the FD check, and
    explicitly here: grads are finite and nonzero where expected."""
    rng = np.random.RandomState(3)
    ws = LSTMWeights.init(3, 4, n_layers=1, n_classes=2, seed=2)
    toks, ys = _batch(rng, 2, 3, 2)
    _, grads = nll_loss_and_grads(ws, toks, ys)
    for g in [*grads.w, *grads.u, *grads.b, grads.head_w, grads.head_b]:
        assert np.isfinite(g).all()
    assert float(np.abs(grads.head_w).sum()) > 0


def test_partial_fit_learns_separable_data():
    """One Adam step per micro-batch (the reference cadence) drives loss
    down and accuracy up on linearly separable sequences."""
    rng = np.random.RandomState(5)
    dim, n_classes = 4, 2
    ws = LSTMWeights.init(dim, 8, n_layers=1, n_classes=n_classes, seed=4)
    adam = AdamState(lr=5e-2)

    def make(n):
        toks, ys = [], []
        for _ in range(n):
            y = int(rng.randint(0, n_classes))
            seq = rng.randn(rng.randint(2, 5), dim) * 0.1
            seq[:, y] += 3.0  # class-marker dimension
            toks.append(seq.tolist())
            ys.append(y)
        return toks, ys

    first_loss = None
    for _ in range(30):
        toks, ys = make(16)
        loss = lstm_partial_fit(ws, adam, toks, ys)
        if first_loss is None:
            first_loss = loss
    final_loss = lstm_partial_fit(ws, adam, *make(16))
    assert final_loss < first_loss * 0.5

    toks, ys = make(64)
    correct = 0
    for t, y in zip(toks, ys):
        lp = ws.forward_one(np.array(t))
        correct += int(lp.argmax()) == y
    assert correct / 64 > 0.9


def test_adam_matches_reference_formula():
    """One hand-computed Adam step on a tiny fake gradient — pins the
    bias-corrected update (torch defaults, wos_classifier.py:34)."""
    ws = LSTMWeights.init(2, 2, n_layers=1, n_classes=2, seed=0)
    adam = AdamState(lr=0.1)
    grads = LSTMGrads.zeros_like(ws)
    grads.head_b = np.array([1.0, -1.0])
    before = ws.head_b.copy()
    adam.step(ws, grads)
    # t=1: mhat = g, vhat = g^2  =>  update = -lr * g / (|g| + eps)
    expect = before - 0.1 * np.array([1.0, -1.0]) / (1.0 + 1e-8)
    np.testing.assert_allclose(ws.head_b, expect, atol=1e-12)
