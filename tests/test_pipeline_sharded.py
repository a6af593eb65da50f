"""Multi-chip inference: the swap pipeline sharded over the frame axis.

The reference's only scaling story is training DDP; serving is single
GPU. Here the whole detect->match and swap->blend stages run under
GSPMD with the chunk's frame axis sharded across a data mesh — the
TPU-native way to scale video throughput across chips (SURVEY.md §5
"frame-axis scaling"). Outputs must equal the unsharded run exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from ghost_tpu.core.mesh import make_mesh
from ghost_tpu.pipeline.swap import SwapConfig, build_random_pipeline


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8-device mesh")
def test_sharded_pipeline_matches_single_device():
    mesh = make_mesh(data=8, model=1)
    cfg = SwapConfig(chunk_size=8, max_faces=2, crop_size=224,
                     gen_groups=1, mask_per_shot=False)
    pipe = build_random_pipeline(cfg, seed=0)

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (8, 96, 128, 3), dtype=np.uint8)
    kps = rng.uniform(20, 80, (8, 1, 5, 2)).astype(np.float32)
    present = np.ones((8, 1), bool)
    src = pipe.embed_sources(
        rng.integers(0, 255, (1, 224, 224, 3), dtype=np.uint8))
    tgt = pipe.embed_targets(
        rng.integers(0, 255, (1, 224, 224, 3), dtype=np.uint8))

    # unsharded reference
    ref_kps, ref_sim, _s, _r = pipe._detect_match(jnp.asarray(frames), tgt)
    ref_out = pipe._swap_blend(jnp.asarray(frames), jnp.asarray(kps),
                               jnp.asarray(present), src)

    # shard the frame axis across the mesh; GSPMD propagates through
    # detector/arcface/generator/blend without any code changes
    fsh = NamedSharding(mesh, P("data"))
    frames_sh = jax.device_put(jnp.asarray(frames), fsh)
    kps_sh = jax.device_put(jnp.asarray(kps), fsh)
    present_sh = jax.device_put(jnp.asarray(present), fsh)

    got_kps, got_sim, _s2, _r2 = pipe._detect_match(frames_sh, tgt)
    got_out = pipe._swap_blend(frames_sh, kps_sh, present_sh, src)

    assert len(got_out.sharding.device_set) == 8  # stayed distributed
    # materializing a multi-device ARRAY aborts on this CPU backend
    # (even fully replicated); only scalars cross to host reliably —
    # reduce the comparison on-device (same pattern as the sharded
    # train-step test)
    rep = NamedSharding(mesh, P())
    ref_kps_d = jax.device_put(np.asarray(ref_kps), rep)
    ref_out_d = jax.device_put(np.asarray(ref_out), rep)
    dk, do = jax.jit(
        lambda a, b, c, d: (
            jnp.max(jnp.abs(a - b)),
            jnp.max(jnp.abs(c.astype(jnp.int32) - d.astype(jnp.int32))),
        ),
        out_shardings=rep,
    )(got_kps, ref_kps_d, got_out, ref_out_d)
    assert float(dk) < 1e-4
    assert float(do) == 0


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
