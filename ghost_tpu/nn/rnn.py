"""Recurrent cells and stacked/bidirectional runners (apex.RNN parity).

The reference vendors apex.RNN (reference apex/apex/RNN/models.py:20-55,
cells.py:56-85, RNNBackend.py:25-230): LSTM / GRU / ReLU / Tanh cells
plus the multiplicative mLSTM, wrapped by stackedRNN / bidirectionalRNN.
Upstream apex deprecated the package, and GHOST itself never imports it,
but it is part of the vendored capability surface — so here is the
TPU-native equivalent.

TPU-first notes: a recurrence is inherently sequential in time, so each
layer is ONE `lax.scan` whose body is a fused (x_t @ W_ih + h @ W_hh)
matmul pair — the per-step work is a single MXU call, which is the TPU
analogue of the fused-pointwise CUDA cells apex binds. Precompute
`x @ W_ih` for ALL timesteps in one batched matmul before the scan (the
input projection does not depend on the recurrence), so the scan body
only carries the small h-projection. Long scans remain latency-bound on
TPU (CLAUDE.md measured facts) — prefer attention/transducer paths for
new models; this module exists for capability parity.

Weight layout matches torch.nn.LSTM/GRU (w_ih: (gates*H, in),
w_hh: (gates*H, H), gate order i,f,g,o for LSTM and r,z,n for GRU), so
torch state dicts map on directly.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class RNNParams(NamedTuple):
    """One layer's weights (torch layout)."""

    w_ih: Any  # (G*H, in)
    w_hh: Any  # (G*H, H)
    b_ih: Any | None = None  # (G*H,)
    b_hh: Any | None = None  # (G*H,)
    w_mih: Any | None = None  # mLSTM only: (H, in)
    w_mhh: Any | None = None  # mLSTM only: (H, H)


def _linear(x, w, b=None):
    y = x @ w.T
    return y if b is None else y + b


def lstm_cell(p: RNNParams, hidden, x_proj, x=None):
    """Torch LSTMCell: gates i,f,g,o (reference torch LSTMCell used by
    apex models.py:24). x_proj = x @ w_ih.T (+ b_ih), precomputed."""
    hx, cx = hidden
    gates = x_proj + _linear(hx, p.w_hh, p.b_hh)
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
    g = jnp.tanh(g)
    cy = f * cx + i * g
    hy = o * jnp.tanh(cy)
    return (hy, cy), hy


def gru_cell(p: RNNParams, hidden, x_proj, x=None):
    """Torch GRUCell: r,z,n with the reset gate applied to the full
    hidden projection INCLUDING its bias (torch semantics)."""
    (hx,) = hidden
    h_proj = _linear(hx, p.w_hh, p.b_hh)
    xr, xz, xn = jnp.split(x_proj, 3, axis=-1)
    hr, hz, hn = jnp.split(h_proj, 3, axis=-1)
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)
    hy = (1.0 - z) * n + z * hx
    return (hy,), hy


def rnn_tanh_cell(p: RNNParams, hidden, x_proj, x=None):
    (hx,) = hidden
    hy = jnp.tanh(x_proj + _linear(hx, p.w_hh, p.b_hh))
    return (hy,), hy


def rnn_relu_cell(p: RNNParams, hidden, x_proj, x=None):
    (hx,) = hidden
    hy = jax.nn.relu(x_proj + _linear(hx, p.w_hh, p.b_hh))
    return (hy,), hy


def mlstm_cell(p: RNNParams, hidden, x_proj, x):
    """Multiplicative LSTM (reference apex/apex/RNN/cells.py:56-85):
    m = (x @ w_mih) * (h @ w_mhh); gates = x@w_ih + b_ih + m@w_hh + b_hh.

    Needs the raw x (the m-projection of x is cheap and also
    precomputable; we fold it into x_proj's second slot)."""
    hx, cx = hidden
    x_gates, x_m = x_proj
    m = x_m * _linear(hx, p.w_mhh)
    gates = x_gates + _linear(m, p.w_hh, p.b_hh)
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
    g = jnp.tanh(g)
    cy = f * cx + i * g
    hy = o * jnp.tanh(cy)
    return (hy, cy), hy


_CELLS = {
    "lstm": (lstm_cell, 4, 2),
    "gru": (gru_cell, 3, 1),
    "relu": (rnn_relu_cell, 1, 1),
    "tanh": (rnn_tanh_cell, 1, 1),
    "mlstm": (mlstm_cell, 4, 2),
}


def init_rnn_params(key, kind: str, input_size: int, hidden_size: int,
                    num_layers: int = 1, bias: bool = True,
                    bidirectional: bool = False, dtype=jnp.float32):
    """Uniform(-1/sqrt(H), 1/sqrt(H)) init (torch default)."""
    _, gates, _ = _CELLS[kind]
    bound = 1.0 / (hidden_size ** 0.5)
    dirs = 2 if bidirectional else 1
    layers = []
    for layer in range(num_layers):
        per_dir = []
        for _ in range(dirs):
            isz = input_size if layer == 0 else hidden_size * dirs
            key, *ks = jax.random.split(key, 7)
            u = lambda k, shape: jax.random.uniform(
                k, shape, dtype, -bound, bound)
            per_dir.append(RNNParams(
                w_ih=u(ks[0], (gates * hidden_size, isz)),
                w_hh=u(ks[1], (gates * hidden_size, hidden_size)),
                b_ih=u(ks[2], (gates * hidden_size,)) if bias else None,
                b_hh=u(ks[3], (gates * hidden_size,)) if bias else None,
                w_mih=u(ks[4], (hidden_size, isz)) if kind == "mlstm" else None,
                w_mhh=u(ks[5], (hidden_size, hidden_size))
                if kind == "mlstm" else None,
            ))
        layers.append(per_dir if dirs == 2 else per_dir[0])
    return layers


def _run_layer(cell, gates, n_state, p: RNNParams, x, h0, reverse=False):
    """x: (T, B, in) -> (T, B, H). One lax.scan; input projection hoisted
    out of the recurrence as a single batched matmul."""
    t, b, _ = x.shape
    if cell is mlstm_cell:
        x_proj = (_linear(x, p.w_ih, p.b_ih), _linear(x, p.w_mih))
    else:
        x_proj = _linear(x, p.w_ih, p.b_ih)
    if reverse:
        x_proj = jax.tree.map(lambda v: jnp.flip(v, axis=0), x_proj)

    def step(hidden, xp):
        return cell(p, hidden, xp, None)

    ys_init = h0
    hidden_last, ys = jax.lax.scan(step, ys_init, x_proj)
    if reverse:
        ys = jnp.flip(ys, axis=0)
    return ys, hidden_last


def rnn_forward(kind: str, params, x, h0=None, bidirectional: bool = False):
    """Stacked (and optionally bidirectional) RNN over x (T, B, in).

    Mirrors apex stackedRNN/bidirectionalRNN (RNNBackend.py:90-196,
    25-50): layer l consumes layer l-1's full output sequence;
    bidirectional concatenates forward and reverse features per layer.

    h0, when given, warm-starts the recurrence (streaming continuation
    across chunks): the same structure this function RETURNS as
    last_hidden — a list with one entry per layer, each a tuple of
    n_state (B, H) arrays (a (fwd, rev) pair of such tuples per layer
    when bidirectional). None (the default) zero-initializes.

    Returns (ys (T, B, H*dirs), last_hidden list per layer)."""
    cell, gates, n_state = _CELLS[kind]
    t, b, _ = x.shape
    if h0 is not None and len(h0) != len(params):
        raise ValueError(
            f"h0 has {len(h0)} layer states for {len(params)} layers")
    lasts = []
    h = x
    for li, layer_p in enumerate(params):
        if bidirectional:
            pf, pr = layer_p
            hsz = pf.w_hh.shape[-1]
            z = jnp.zeros((b, hsz), h.dtype)
            zl = tuple(z for _ in range(n_state))
            h0f, h0r = h0[li] if h0 is not None else (zl, zl)
            yf, hf = _run_layer(cell, gates, n_state, pf, h, h0f)
            yr, hr = _run_layer(cell, gates, n_state, pr, h, h0r,
                                reverse=True)
            h = jnp.concatenate([yf, yr], axis=-1)
            lasts.append((hf, hr))
        else:
            hsz = layer_p.w_hh.shape[-1]
            z = jnp.zeros((b, hsz), h.dtype)
            h0l = (h0[li] if h0 is not None
                   else tuple(z for _ in range(n_state)))
            h, hl = _run_layer(cell, gates, n_state, layer_p, h, h0l)
            lasts.append(hl)
    return h, lasts


def lstm(params, x, bidirectional=False):
    return rnn_forward("lstm", params, x, bidirectional=bidirectional)


def gru(params, x, bidirectional=False):
    return rnn_forward("gru", params, x, bidirectional=bidirectional)


def mlstm(params, x, bidirectional=False):
    return rnn_forward("mlstm", params, x, bidirectional=bidirectional)
