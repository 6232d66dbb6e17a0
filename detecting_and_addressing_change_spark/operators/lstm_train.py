"""LSTM incremental training (SURVEY §2.7 U2, + the LSTM half of U8).

Reference: ``models/wos_classifier.py:38-71`` — ``LSTMStream.partial_fit``
performs ONE Adam step (lr=1e-3, torch defaults otherwise) of mean-reduced
NLLLoss over the micro-batch's log_softmax outputs. torch is absent in this
container, so the step is implemented in numpy on the SAME architecture as
``operators/lstm.py::LSTMWeights.forward_one`` (2-layer LSTM -> signed
abs-max pool -> linear head -> log_softmax), with full backpropagation
through time — the same route the MLP mapping takes for U5
(``operators/mapping.py::train_mlp_mapping``).

Distribution model (SURVEY §2.7 U2): training stays DRIVER-SIDE inside a
foreachBatch loop at the reference's cadence (micro-batches of 32 rows —
collecting 32 rows is not a scale problem); INFERENCE is the distributed
``lstm_predict`` mapInPandas. Data-parallel gradient training is explicitly
out of scope, matching the reference's single-process trainer.

Gradient correctness is pinned by a finite-difference check over every
parameter tensor (tests/test_lstm_train.py) — stronger than a torch parity
test and dependency-free.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .lstm import LSTMWeights


def _sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-x))


@dataclass
class LSTMGrads:
    w: list
    u: list
    b: list
    head_w: np.ndarray
    head_b: np.ndarray

    @staticmethod
    def zeros_like(ws: LSTMWeights) -> "LSTMGrads":
        return LSTMGrads(
            w=[np.zeros_like(m) for m in ws.w],
            u=[np.zeros_like(m) for m in ws.u],
            b=[np.zeros_like(m) for m in ws.b],
            head_w=np.zeros_like(ws.head_w),
            head_b=np.zeros_like(ws.head_b),
        )


def _forward_cached(ws: LSTMWeights, tokens: np.ndarray):
    """forward_one with every intermediate kept for BPTT. Returns
    (log_probs, cache). Mirrors LSTMWeights.forward_one op-for-op."""
    hid = ws.hidden
    n_layers = len(ws.w)
    layer_inputs = []  # input sequence to each layer: (T, in_dim)
    gates_all = []  # per layer: list over t of (i, f, g, o)
    c_all = []  # per layer: list over t of c_t (and c_{t-1} via index)
    h_seq = tokens
    for layer in range(n_layers):
        layer_inputs.append(h_seq)
        h = np.zeros(hid)
        c = np.zeros(hid)
        outs = np.empty((len(h_seq), hid))
        gates_t = []
        c_t = []
        for t_i, x in enumerate(h_seq):
            gates = x @ ws.w[layer] + h @ ws.u[layer] + ws.b[layer]
            i = _sigmoid(gates[:hid])
            f = _sigmoid(gates[hid : 2 * hid])
            g = np.tanh(gates[2 * hid : 3 * hid])
            o = _sigmoid(gates[3 * hid :])
            c = f * c + i * g
            h = o * np.tanh(c)
            gates_t.append((i, f, g, o))
            c_t.append(c)
            outs[t_i] = h
        gates_all.append(gates_t)
        c_all.append(c_t)
        h_seq = outs
    # R7 signed abs-max pool (first-max ties, matching argmax)
    pool_idx = np.abs(h_seq).argmax(axis=0)
    pooled = h_seq[pool_idx, np.arange(hid)]
    logits = pooled @ ws.head_w + ws.head_b
    shifted = logits - logits.max()
    log_probs = shifted - np.log(np.exp(shifted).sum())
    cache = (layer_inputs, gates_all, c_all, h_seq, pool_idx, pooled)
    return log_probs, cache


def _backward_one(
    ws: LSTMWeights, cache, d_logits: np.ndarray, grads: LSTMGrads
) -> None:
    """Accumulate one sequence's parameter gradients given dLoss/dlogits."""
    layer_inputs, gates_all, c_all, last_out, pool_idx, pooled = cache
    hid = ws.hidden
    n_layers = len(ws.w)

    grads.head_w += np.outer(pooled, d_logits)
    grads.head_b += d_logits
    d_pooled = ws.head_w @ d_logits

    # route pooled grad back to the argmax timesteps of the LAST layer
    d_out_seq = np.zeros_like(last_out)  # (T, hid)
    d_out_seq[pool_idx, np.arange(hid)] = d_pooled

    for layer in range(n_layers - 1, -1, -1):
        xs = layer_inputs[layer]
        gates_t = gates_all[layer]
        c_t = c_all[layer]
        seq_len = len(xs)
        d_x_seq = np.zeros((seq_len, xs.shape[1]))
        dh_next = np.zeros(hid)
        dc_next = np.zeros(hid)
        for t_i in range(seq_len - 1, -1, -1):
            i, f, g, o = gates_t[t_i]
            c = c_t[t_i]
            c_prev = c_t[t_i - 1] if t_i > 0 else np.zeros(hid)
            # h_{t-1} = o_{t-1} * tanh(c_{t-1})
            h_prev = (
                gates_t[t_i - 1][3] * np.tanh(c_prev)
                if t_i > 0
                else np.zeros(hid)
            )
            dh = d_out_seq[t_i] + dh_next
            tanh_c = np.tanh(c)
            do = dh * tanh_c
            dc = dh * o * (1.0 - tanh_c * tanh_c) + dc_next
            di = dc * g
            df = dc * c_prev
            dg = dc * i
            dc_next = dc * f
            d_gates = np.concatenate(
                [
                    di * i * (1.0 - i),
                    df * f * (1.0 - f),
                    dg * (1.0 - g * g),
                    do * o * (1.0 - o),
                ]
            )
            grads.w[layer] += np.outer(xs[t_i], d_gates)
            grads.u[layer] += np.outer(h_prev, d_gates)
            grads.b[layer] += d_gates
            d_x_seq[t_i] = ws.w[layer] @ d_gates
            dh_next = ws.u[layer] @ d_gates
        d_out_seq = d_x_seq  # becomes the output-grad of the layer below


def nll_loss_and_grads(
    ws: LSTMWeights, token_batch: list, labels: list[int]
) -> tuple[float, LSTMGrads]:
    """Mean NLL over the micro-batch + full-parameter gradients — the exact
    quantity torch's ``NLLLoss()(log_probs, y).backward()`` differentiates
    (wos_classifier.py:67-68)."""
    n = len(token_batch)
    grads = LSTMGrads.zeros_like(ws)
    total = 0.0
    for toks, y in zip(token_batch, labels):
        arr = np.array([np.asarray(t, dtype=np.float64) for t in toks])
        log_probs, cache = _forward_cached(ws, arr)
        total += -log_probs[y]
        # d(mean NLL)/d logits = (softmax - onehot) / n
        d_logits = np.exp(log_probs)
        d_logits[y] -= 1.0
        d_logits /= n
        _backward_one(ws, cache, d_logits, grads)
    return total / n, grads


@dataclass
class AdamState:
    """torch.optim.Adam defaults (wos_classifier.py:34): betas (0.9, 0.999),
    eps 1e-8, no weight decay."""

    lr: float = 1e-3
    beta1: float = 0.9
    beta2: float = 0.999
    eps: float = 1e-8
    t: int = 0
    m: LSTMGrads | None = None
    v: LSTMGrads | None = None

    def _tensors(self, g: LSTMGrads):
        return [*g.w, *g.u, *g.b, g.head_w, g.head_b]

    def step(self, ws: LSTMWeights, grads: LSTMGrads) -> None:
        if self.m is None:
            self.m = LSTMGrads.zeros_like(ws)
            self.v = LSTMGrads.zeros_like(ws)
        self.t += 1
        params = [*ws.w, *ws.u, *ws.b, ws.head_w, ws.head_b]
        for p, mp, vp, g in zip(
            params,
            self._tensors(self.m),
            self._tensors(self.v),
            self._tensors(grads),
        ):
            mp *= self.beta1
            mp += (1 - self.beta1) * g
            vp *= self.beta2
            vp += (1 - self.beta2) * g * g
            mhat = mp / (1 - self.beta1**self.t)
            vhat = vp / (1 - self.beta2**self.t)
            p -= self.lr * mhat / (np.sqrt(vhat) + self.eps)


def lstm_partial_fit(
    ws: LSTMWeights,
    adam: AdamState,
    token_batch: list,
    labels: list[int],
) -> float:
    """U2: one Adam step of mean NLL on one micro-batch
    (wos_classifier.py:38-71). Mutates ws/adam in place; returns the
    pre-step loss."""
    loss, grads = nll_loss_and_grads(ws, token_batch, labels)
    adam.step(ws, grads)
    return loss
