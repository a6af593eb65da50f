"""Sequence parallelism: ring attention over a "seq" mesh axis.

The reference has NO sequence/context parallelism — its only attention
code at all is the apex fmha/multihead_attn CUDA kernels, which are
sequence-LOCAL with max seqlen 512 (reference
apex/apex/contrib/csrc/fmha/fmha_api.cpp:33-42; SURVEY.md §5 names ring
attention over ICI as the natural beyond-reference extension). This
module provides it: attention over a sequence S times longer than one
chip can hold, with O(S/n) memory per chip and the KV rotation hidden
behind compute.

TPU-native mechanics: Q, K, V are sharded on the sequence dim across
the "seq" axis. One `shard_map` program; each device keeps its Q chunk
resident and accumulates flash-style online-softmax state (m, l, o in
f32) while the K/V chunks rotate one hop per tick via `ppermute` (a
neighbor-exchange that rides ICI; XLA overlaps the hop with the next
tick's matmuls). `lax.scan` over n ticks, static shapes, no gathers.
Causal masking is arithmetic on global position indices — the rotation
step tells each device which chunk it currently holds. The whole thing
is differentiable (scan + ppermute transpose), so it serves training
as-is; memory per chip stays O(local chunk) in both passes.

The per-tick inner block uses jnp matmuls (MXU): at per-device block
sizes XLA's attention is within ~1x of the tuned Pallas flash kernel
(scripts/bench_attention.py — Pallas wins 2.6x only from S>=4096 on
one chip), and the ring already bounds the live set to one KV chunk.
Swap `ops.pallas.attention.flash_attention` into `_block_update` for
very long per-device chunks.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ghost_tpu.parallel.pp import mark_varying

SEQ_AXIS = "seq"
_NEG = -1e30  # finite "-inf": masked-row algebra stays NaN-free


def make_seq_mesh(num_devices: int,
                  devices: Sequence[jax.Device] | None = None) -> Mesh:
    """A 1-D ("seq",) mesh over the first `num_devices` devices."""
    from ghost_tpu.core.mesh import make_mesh_1d

    return make_mesh_1d(SEQ_AXIS, num_devices, devices)


def _block_update(carry, q, k, v, scale, mask):
    """One online-softmax accumulation step (f32 state).

    carry = (o, m, l): o (B,Lq,H,D) unnormalized output, m (B,H,Lq)
    running row max, l (B,H,Lq) running row sum. mask (Lq,Lk) True =
    attend, or None.
    """
    o, m, l = carry
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    if mask is not None:
        s = jnp.where(mask[None, None], s, _NEG)
    m_new = jnp.maximum(m, jnp.max(s, axis=-1))
    # rows still all-masked keep m_new == _NEG; exp(s - m_new) is then
    # exp(0) = 1 for masked lanes, but the first real block drives
    # corr = exp(_NEG - m_real) = 0, wiping the bogus o/l. Every causal
    # row sees its own diagonal block eventually, so the final state is
    # exact.
    p = jnp.exp(s - m_new[..., None])
    corr = jnp.exp(m - m_new)
    l = l * corr + jnp.sum(p, axis=-1)
    o = o * corr.transpose(0, 2, 1)[..., None] + jnp.einsum(
        "bhqk,bkhd->bqhd", p, v.astype(jnp.float32))
    return o, m_new, l


def ring_attention(q: jax.Array, k: jax.Array, v: jax.Array, *,
                   mesh: Mesh, axis: str = SEQ_AXIS,
                   causal: bool = False,
                   scale: float | None = None,
                   batch_axis: str | None = None) -> jax.Array:
    """Exact attention with Q/K/V sequence-sharded over `axis`.

    q, k, v: (B, S, H, D) global views, S divisible by the axis size.
    Returns (B, S, H, D) sharded the same way. Matches
    softmax(QK^T * scale [+ causal mask]) V to f32 accuracy (tested on
    the 8-device CPU mesh, fwd and grads). batch_axis optionally shards
    the batch dim over a second mesh axis (2-D data x seq composition;
    the KV ring stays on `axis`).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    n = mesh.shape[axis]
    if q.shape[1] % n:
        raise ValueError(f"seq {q.shape[1]} not divisible by {n} devices")
    if k.shape[1] % n:
        # cross-attention (MultiheadAttention kv != q) shards K/V with
        # the same spec; fail with a diagnostic instead of an opaque
        # shard_map sharding error
        raise ValueError(f"kv seq {k.shape[1]} not divisible by {n} devices")

    def local_fn(q, k, v):
        idx = jax.lax.axis_index(axis)
        b, lq, h, d = q.shape
        lk = k.shape[1]
        qf = q.astype(jnp.float32)
        vaxes = (axis,) + ((batch_axis,) if batch_axis else ())
        o0 = mark_varying(jnp.zeros((b, lq, h, d), jnp.float32), vaxes)
        m0 = mark_varying(jnp.full((b, h, lq), _NEG, jnp.float32), vaxes)
        l0 = mark_varying(jnp.zeros((b, h, lq), jnp.float32), vaxes)
        q_pos = idx * lq + jnp.arange(lq)

        perm = [(i, (i + 1) % n) for i in range(n)]

        def update(oml, t, kc, vc):
            # after t hops this device holds the chunk born on (idx-t)%n
            src = jax.lax.rem(idx - t + n, n)
            if causal:
                k_pos = src * lk + jnp.arange(lk)
                mask = k_pos[None, :] <= q_pos[:, None]
            else:
                mask = None
            return _block_update(oml, qf, kc, vc, scale, mask)

        def tick(carry, t):
            o, m, l, kc, vc = carry
            o, m, l = update((o, m, l), t, kc, vc)
            kc = jax.lax.ppermute(kc, axis, perm)
            vc = jax.lax.ppermute(vc, axis, perm)
            return (o, m, l, kc, vc), None

        # n-1 update+rotate ticks, then the last chunk's update WITHOUT
        # the rotation: the n-th hop's result is never read, and inside
        # the fixed scan body XLA cannot elide it — one whole KV-chunk
        # neighbor exchange of dead ICI traffic per call (and per
        # rematerialized backward)
        (o, m, l, kc, vc), _ = jax.lax.scan(
            tick, (o0, m0, l0, k, v), jnp.arange(n - 1))
        o, m, l = update((o, m, l), n - 1, kc, vc)
        return (o / l.transpose(0, 2, 1)[..., None]).astype(q.dtype)

    spec = P(batch_axis, axis)
    shmap = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec)
    return shmap(q, k, v)


def attention_reference(q, k, v, *, causal: bool = False,
                        scale: float | None = None):
    """Materializing single-device attention (the golden for tests)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    if causal:
        sq, sk = q.shape[1], k.shape[1]
        mask = jnp.arange(sk)[None, :] <= jnp.arange(sq)[:, None]
        s = jnp.where(mask[None, None], s, _NEG)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p,
                      v.astype(jnp.float32)).astype(q.dtype)
