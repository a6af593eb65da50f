"""Pipeline parallelism: a GPipe microbatch schedule over a "pipe" mesh
axis.

The reference has NO pipeline parallelism — its complete distributed
surface is DDP + SyncBN + ZeRO-style sharded optimizers (SURVEY.md
§2.5, reference apex/apex/parallel/). This module is a beyond-reference
scaling capability motivated by a *measured* wall: RRDB x4plus
background enhancement is compute-walled at ~1.4 fps/chip for 1080p x4
(its ~33 MFLOP/px roofline — BENCH_EXTRA_r03.json), and its trunk is 23
identical residual blocks. That homogeneous-block shape is the ideal
pipeline: stack the block params, give each chip a contiguous run of
blocks, and stream microbatches through with `ppermute` hops riding
ICI. Data parallelism can't help a latency-bound single stream;
pipelining turns N chips into ~N× trunk throughput at high microbatch
occupancy (efficiency M/(M+S-1) for M microbatches over S stages).

TPU-native mechanics: one `shard_map` program; each device holds its
stage's stacked block params (leading dim sharded on "pipe"); a
`lax.scan` over M+S-1 ticks applies the local blocks and shifts
activations to the next stage with `ppermute` (XLA schedules the hop to
overlap with the next tick's compute). Everything is static-shape; the
wavefront is masked arithmetic, not control flow. The schedule is
differentiable end to end (scan + ppermute transpose), so the same
function serves training — pass `remat=True` to rematerialize block
activations in the backward pass (GPipe's memory trick).
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

PIPE_AXIS = "pipe"


def mark_varying(tree: Any, axis: str | tuple[str, ...]) -> Any:
    """Mark arrays as device-varying over axis (or axes) inside
    shard_map.

    Zero-initialized scan carries start unvarying but become varying
    once mixed with axis_index/ppermute results (or with inputs sharded
    over a second mesh axis); jax>=0.8's varying-manual-axes typing
    requires the initializers to be marked up front (pcast on new jax,
    pvary on the older spelling)."""
    axes = (axis,) if isinstance(axis, str) else tuple(axis)
    pcast = getattr(jax.lax, "pcast", None)

    def _vma(v):
        try:
            return set(jax.typeof(v).vma)
        except Exception:
            return set()

    def f(v):
        # marking an already-varying axis is rejected (pcast) or
        # undefined (pvary) — mark only the missing ones (e.g.
        # zeros_like(x) inherits x's axes on a 2-D mesh)
        for a in axes:
            if a not in _vma(v):
                v = (pcast(v, (a,), to="varying") if pcast is not None
                     else jax.lax.pvary(v, (a,)))
        return v

    return jax.tree.map(f, tree)


def make_pipe_mesh(num_stages: int,
                   devices: Sequence[jax.Device] | None = None) -> Mesh:
    """A 1-D ("pipe",) mesh over the first `num_stages` devices."""
    from ghost_tpu.core.mesh import make_mesh_1d

    return make_mesh_1d(PIPE_AXIS, num_stages, devices)


def stack_block_params(blocks: Sequence[Any]) -> Any:
    """Stack N per-block param trees into one tree of (N, ...) leaves
    (the layout `pipeline_apply` shards across stages)."""
    return jax.tree.map(lambda *ls: jnp.stack(ls), *blocks)


def unstack_block_params(stacked: Any) -> list:
    """Inverse of `stack_block_params`."""
    n = jax.tree.leaves(stacked)[0].shape[0]
    return [jax.tree.map(lambda l: l[i], stacked) for i in range(n)]


def pipeline_apply(
    block_apply: Callable[[Any, jax.Array], jax.Array],
    stacked_params: Any,
    x: jax.Array,
    *,
    mesh: Mesh,
    axis: str = PIPE_AXIS,
    num_microbatches: int | None = None,
    remat: bool = False,
    batch_axis: str | None = None,
) -> jax.Array:
    """Run x through N homogeneous blocks pipelined over `axis`.

    block_apply(params_one_block, h) -> h', same shape (a residual
    block). stacked_params: tree of (N, ...) leaves; stage s owns
    blocks [s*ceil(N/S), (s+1)*ceil(N/S)). When N is not divisible by
    the stage count S (e.g. RRDBNet's 23-block trunk over 4 chips) the
    trailing slots are zero-padded params masked to identity — they
    still burn their FLOPs, but correctness is exact. x: (B, ...) with
    B divisible by num_microbatches (default: the axis size, the
    minimum that keeps every stage busy at steady state).

    Output equals applying the N blocks sequentially (tested exactly);
    the pipeline is purely an execution-schedule change.

    batch_axis: name of a second mesh axis to shard each microbatch's
    batch dim over (2-D data x pipe composition — the ppermute hops
    stay on the pipe axis, per-data-shard streams are independent).
    """
    num_stages = mesh.shape[axis]
    n_blocks = jax.tree.leaves(stacked_params)[0].shape[0]
    bps = -(-n_blocks // num_stages)  # ceil
    n_pad = bps * num_stages
    if n_pad != n_blocks:
        stacked_params = jax.tree.map(
            lambda p: jnp.concatenate(
                [p, jnp.zeros((n_pad - n_blocks,) + p.shape[1:], p.dtype)]),
            stacked_params)
    m = num_microbatches or num_stages
    if x.shape[0] % m:
        raise ValueError(f"batch {x.shape[0]} not divisible by "
                         f"{m} microbatches")
    xm = x.reshape((m, x.shape[0] // m) + x.shape[1:])

    staged = jax.tree.map(
        lambda p: p.reshape((num_stages, bps) + p.shape[1:]), stacked_params)
    apply_one = jax.checkpoint(block_apply) if remat else block_apply

    def stage_fn(params, xm):
        # params leaves: (1, bps, ...) — this stage's blocks.
        # xm: (M, Bm, ...) — replicated microbatches.
        idx = jax.lax.axis_index(axis)
        s_last = num_stages - 1

        def run_blocks(h):
            for b in range(bps):
                p_b = jax.tree.map(lambda l: l[0, b], params)
                y_b = apply_one(p_b, h)
                if n_pad != n_blocks:
                    # padded trailing slots are identity (zero params
                    # would NOT be identity for arbitrary block_apply)
                    h = jnp.where(idx * bps + b < n_blocks, y_b, h)
                else:
                    h = y_b
            return h

        def tick(state, t):
            # stage 0 ingests microbatch t while t < M
            inp = jax.lax.dynamic_slice_in_dim(
                xm, jnp.clip(t, 0, m - 1), 1, 0)[0]
            h = jnp.where(jnp.logical_and(idx == 0, t < m), inp, state)
            y = run_blocks(h)
            # shift activations one stage downstream (rides ICI)
            nxt = jax.lax.ppermute(
                y, axis, [(i, i + 1) for i in range(num_stages - 1)])
            return nxt, y

        # the carry mixes axis_index/ppermute (pipe-varying) with xm
        # (also batch_axis-varying on a 2-D mesh)
        vaxes = (axis,) + ((batch_axis,) if batch_axis else ())
        state0 = mark_varying(jnp.zeros(xm.shape[1:], xm.dtype), vaxes)
        _, ys = jax.lax.scan(
            tick, state0, jnp.arange(m + num_stages - 1))
        # the last stage emits microbatch t-(S-1) at tick t, so its
        # ys[S-1:] are the M results in order (scan stacks them — no
        # per-tick whole-buffer update in the carry); other stages'
        # ys are intermediate wavefronts, masked out by the psum
        out = ys[s_last:]
        mask = (idx == s_last).astype(out.dtype)
        return jax.lax.psum(out * mask, axis)

    x_spec = P(None, batch_axis)  # xm is (M, Bm, ...)
    shmap = jax.shard_map(
        stage_fn, mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P(axis), staged), x_spec),
        out_specs=x_spec)
    out = shmap(staged, xm)
    return out.reshape(x.shape)
