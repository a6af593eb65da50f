"""Pallas paste-back kernel vs the jnp warp_and_blend reference."""

import jax.numpy as jnp
import numpy as np

from ghost_tpu.ops.pallas.warp_kernel import pasteback_pallas
from ghost_tpu.ops.warp import warp_and_blend


def test_pasteback_matches_reference(rng):
    b, h, w, cs = 2, 64, 96, 32
    frame = rng.uniform(0, 255, (b, h, w, 3)).astype(np.float32)
    swap = rng.uniform(0, 255, (b, cs, cs, 3)).astype(np.float32)
    mask = rng.uniform(0, 1, (b, cs, cs, 1)).astype(np.float32)
    m = np.tile(np.array([[0.4, 0.0, -6.0], [0.0, 0.4, -3.0]],
                         np.float32)[None], (b, 1, 1))
    present = jnp.asarray([True, False])

    ref = np.asarray(warp_and_blend(jnp.asarray(frame), jnp.asarray(swap),
                                    jnp.asarray(mask), jnp.asarray(m),
                                    present=present))
    ours = np.asarray(pasteback_pallas(jnp.asarray(frame), jnp.asarray(swap),
                                       jnp.asarray(mask), jnp.asarray(m),
                                       present=present, tile_h=32,
                                       interpret=True))
    np.testing.assert_allclose(ours, np.clip(ref, 0, 255), rtol=1e-3,
                               atol=1e-2)


def test_pasteback_absent_passthrough(rng):
    frame = rng.uniform(0, 255, (1, 32, 32, 3)).astype(np.float32)
    swap = rng.uniform(0, 255, (1, 16, 16, 3)).astype(np.float32)
    mask = np.ones((1, 16, 16, 1), np.float32)
    m = np.array([[[1.0, 0, 0], [0, 1.0, 0]]], np.float32)
    out = np.asarray(pasteback_pallas(
        jnp.asarray(frame), jnp.asarray(swap), jnp.asarray(mask),
        jnp.asarray(m), present=jnp.asarray([False]), tile_h=32,
        interpret=True))
    np.testing.assert_allclose(out, frame, atol=0.51)  # clip+round only
