"""apex.RNN parity: scan-based cells vs torch.nn.LSTM/GRU and the apex
mLSTM cell math (reference apex/apex/RNN/cells.py:56-85,
models.py:20-55)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from ghost_tpu.nn.rnn import RNNParams, rnn_forward  # noqa: E402


def _params_from_torch(mod, kind, num_layers, bidirectional):
    layers = []
    dirs = 2 if bidirectional else 1
    for layer in range(num_layers):
        per_dir = []
        for d in range(dirs):
            sfx = f"l{layer}" + ("_reverse" if d else "")
            g = lambda n: jnp.asarray(
                getattr(mod, f"{n}_{sfx}").detach().numpy())
            per_dir.append(RNNParams(w_ih=g("weight_ih"), w_hh=g("weight_hh"),
                                     b_ih=g("bias_ih"), b_hh=g("bias_hh")))
        layers.append(tuple(per_dir) if dirs == 2 else per_dir[0])
    return layers


@pytest.mark.parametrize("kind,bidir,layers", [
    ("lstm", False, 1), ("lstm", True, 2), ("gru", False, 2),
    ("gru", True, 1),
])
def test_torch_parity(kind, bidir, layers):
    torch.manual_seed(0)
    t, b, isz, hsz = 7, 3, 5, 4
    cls = torch.nn.LSTM if kind == "lstm" else torch.nn.GRU
    mod = cls(isz, hsz, num_layers=layers, bidirectional=bidir)
    x = torch.randn(t, b, isz)
    with torch.no_grad():
        ref, _ = mod(x)
    params = _params_from_torch(mod, kind, layers, bidir)
    got, _ = rnn_forward(kind, params, jnp.asarray(x.numpy()),
                         bidirectional=bidir)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=2e-6)


def test_mlstm_matches_apex_cell_math():
    """One-layer mLSTM vs a torch reimplementation of the apex CPU-path
    cell (reference cells.py:69-85)."""
    torch.manual_seed(1)
    t, b, isz, hsz = 5, 2, 4, 3
    w_ih = torch.randn(4 * hsz, isz)
    w_hh = torch.randn(4 * hsz, hsz)
    b_ih = torch.randn(4 * hsz)
    b_hh = torch.randn(4 * hsz)
    w_mih = torch.randn(hsz, isz)
    w_mhh = torch.randn(hsz, hsz)
    x = torch.randn(t, b, isz)

    hx = torch.zeros(b, hsz)
    cx = torch.zeros(b, hsz)
    outs = []
    import torch.nn.functional as F
    with torch.no_grad():
        for i in range(t):
            m = F.linear(x[i], w_mih) * F.linear(hx, w_mhh)
            gates = F.linear(x[i], w_ih, b_ih) + F.linear(m, w_hh, b_hh)
            ig, fg, gg, og = gates.chunk(4, 1)
            ig, fg, og = ig.sigmoid(), fg.sigmoid(), og.sigmoid()
            cx = fg * cx + ig * gg.tanh()
            hx = og * cx.tanh()
            outs.append(hx)
    ref = torch.stack(outs)

    p = [RNNParams(*[jnp.asarray(a.numpy()) for a in
                     (w_ih, w_hh, b_ih, b_hh, w_mih, w_mhh)])]
    got, _ = rnn_forward("mlstm", p, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=2e-6)


def test_relu_tanh_cells_run():
    from ghost_tpu.nn.rnn import init_rnn_params
    import jax

    for kind in ("relu", "tanh"):
        params = init_rnn_params(jax.random.key(0), kind, 4, 3,
                                 num_layers=2)
        y, lasts = rnn_forward(kind, params, jnp.zeros((6, 2, 4)))
        assert y.shape == (6, 2, 3)
        assert len(lasts) == 2


def test_h0_continuation():
    """Streaming continuation: feeding chunk 2 with chunk 1's
    last_hidden as h0 must equal the one-shot run (h0 was previously
    accepted and silently ignored)."""
    import jax
    from ghost_tpu.nn.rnn import init_rnn_params

    for kind, bidir in (("lstm", False), ("gru", False)):
        params = init_rnn_params(jax.random.key(1), kind, 4, 3,
                                 num_layers=2)
        x = jnp.asarray(np.random.default_rng(0).standard_normal(
            (8, 2, 4)).astype(np.float32))
        y_full, last_full = rnn_forward(kind, params, x,
                                        bidirectional=bidir)
        y1, h1 = rnn_forward(kind, params, x[:4], bidirectional=bidir)
        y2, h2 = rnn_forward(kind, params, x[4:], h0=h1,
                             bidirectional=bidir)
        np.testing.assert_allclose(
            np.asarray(jnp.concatenate([y1, y2], axis=0)),
            np.asarray(y_full), atol=1e-6)
        for a, b in zip(h2, last_full):
            np.testing.assert_allclose(np.asarray(jnp.stack(a)),
                                       np.asarray(jnp.stack(b)), atol=1e-6)

    # mismatched layer count is a loud error
    params = init_rnn_params(jax.random.key(1), "lstm", 4, 3, num_layers=2)
    import pytest
    with pytest.raises(ValueError):
        rnn_forward("lstm", params, jnp.zeros((4, 2, 4)), h0=[None])
