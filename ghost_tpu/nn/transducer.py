"""RNN-Transducer joint + loss — apex transducer parity.

The reference vendors transducer_joint_cuda / transducer_loss_cuda
(reference apex/apex/contrib/csrc/transducer/*.cu, ~2.5k LoC). SURVEY.md
marks it out of scope for face-swap but part of the apex capability
surface, so here is the TPU-native equivalent:

  * `transducer_joint`: broadcast-add of encoder (B,T,H) and predictor
    (B,U,H) activations -> (B,T,U,H), the fused "joint" the CUDA kernel
    computes (packing is unnecessary on TPU: padding lanes are masked
    in the loss);
  * `transducer_loss`: the RNN-T negative log-likelihood via the
    alpha recursion computed over anti-diagonals with lax.scan —
    O(T+U) sequential steps of vectorized work instead of the CUDA
    kernel's per-cell threads. Gradients come free via autodiff of the
    logsumexp recursion.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def transducer_joint(f_enc, g_pred, activation=None):
    """(B,T,H) + (B,U,H) -> (B,T,U,H) joint tensor."""
    joint = f_enc[:, :, None, :] + g_pred[:, None, :, :]
    if activation is not None:
        joint = activation(joint)
    return joint


def transducer_loss(log_probs, labels, f_len, y_len, blank_idx: int = 0):
    """RNN-T loss.

    log_probs: (B, T, U+1, V) log-softmax outputs;
    labels: (B, U) int targets;
    f_len: (B,) valid encoder lengths; y_len: (B,) valid label lengths.
    Returns (B,) negative log-likelihoods.
    """
    b, t_max, u_max1, _v = log_probs.shape

    # per-cell transition log-probs
    lp_blank = log_probs[..., blank_idx]  # (B,T,U+1)
    label_idx = jnp.pad(labels, ((0, 0), (0, 1)),
                        constant_values=0)  # (B,U+1); last unused
    lp_emit = jnp.take_along_axis(
        log_probs, label_idx[:, None, :, None], axis=-1
    )[..., 0]  # (B,T,U+1)

    # alpha over anti-diagonals d = t + u:
    #   alpha[t,u] = logaddexp(alpha[t-1,u] + blank[t-1,u],
    #                          alpha[t,u-1] + emit[t,u-1])
    # Both parents of every cell on diagonal d live on diagonal d-1, so
    # the whole DP is ONE scan of T+U steps, each a vectorized (B,U+1)
    # update — the repo's own measured-facts list says long sequential
    # scans are pathological on TPU, and the previous nested-scan form
    # was O(T*U) sequential. Diagonal state is indexed by u:
    # diag_d[u] = alpha[d-u, u].
    blank_ut = jnp.moveaxis(lp_blank, 1, 2)  # (B,U+1,T) u-major
    emit_ut = jnp.moveaxis(lp_emit, 1, 2)
    u_ar = jnp.arange(u_max1)

    def gather_t(table_ut, t_idx):
        # table (B,U+1,T), t_idx (U+1,) -> out[:, u] = table[:, u, t_idx[u]]
        idx = jnp.broadcast_to(
            jnp.clip(t_idx, 0, t_max - 1)[None, :, None], (b, u_max1, 1))
        return jnp.take_along_axis(table_ut, idx, axis=2)[..., 0]

    neg_col = jnp.full((b, 1), NEG_INF)

    def step(diag_prev, d):
        t_u = d - u_ar  # (U+1,) the t-coordinate of each lane
        cell_ok = (t_u >= 0) & (t_u < t_max)
        # from above: diag_{d-1}[u] = alpha[t-1,u]; + blank[t-1,u]
        above = diag_prev + gather_t(blank_ut, t_u - 1)
        above = jnp.where((t_u >= 1)[None, :], above, NEG_INF)
        # from left: diag_{d-1}[u-1] = alpha[t,u-1]; + emit[t,u-1].
        # gather_t(emit_ut, t_u - 1)[u-1] == emit[u-1, d-u] == emit[t,u-1]
        g = gather_t(emit_ut, t_u - 1)
        left = (jnp.concatenate([neg_col, diag_prev[:, :-1]], axis=1)
                + jnp.concatenate([neg_col, g[:, :-1]], axis=1))
        diag = jnp.where(cell_ok[None, :],
                         jnp.logaddexp(above, left), NEG_INF)
        return diag, diag

    init = jnp.where(u_ar[None, :] == 0, 0.0,
                     jnp.full((b, u_max1), NEG_INF))  # diagonal d=0
    _, tail = jax.lax.scan(step, init, jnp.arange(1, t_max + u_max1 - 1))
    diags = jnp.concatenate([init[None], tail], 0)  # (T+U, B, U+1)

    # ll = alpha[f_len-1, y_len] + blank[f_len-1, y_len]; the diagonal
    # holding alpha[t,u] is d = t + u
    t_idx = jnp.maximum(f_len - 1, 0)
    gather_alpha = diags[t_idx + y_len, jnp.arange(b), y_len]
    gather_blank = lp_blank[jnp.arange(b), t_idx, y_len]
    return -(gather_alpha + gather_blank)


def transducer_loss_reference(log_probs, labels, f_len, y_len,
                              blank_idx: int = 0):
    """Plain-python DP for tests (single batch loops)."""
    import numpy as np

    lp = np.asarray(log_probs, np.float64)
    b, t_max, u_max1, _ = lp.shape
    out = np.zeros(b)
    for i in range(b):
        T, U = int(f_len[i]), int(y_len[i])
        alpha = np.full((T, U + 1), -np.inf)
        alpha[0, 0] = 0.0
        for t in range(T):
            for u in range(U + 1):
                if t == 0 and u == 0:
                    continue
                cands = []
                if t > 0:
                    cands.append(alpha[t - 1, u] + lp[i, t - 1, u, blank_idx])
                if u > 0:
                    cands.append(alpha[t, u - 1]
                                 + lp[i, t, u - 1, labels[i, u - 1]])
                alpha[t, u] = np.logaddexp.reduce(cands)
        out[i] = -(alpha[T - 1, U] + lp[i, T - 1, U, blank_idx])
    return out
