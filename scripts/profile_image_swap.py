"""Device-side fused single-image swap timing (backs docs/SERVING.md config-1 row).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_image_swap.py
"""
import time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/ghost_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp
import sys
sys.path.insert(0, "/root/repo")
from ghost_tpu.core.precision import DEFAULT_POLICY
from ghost_tpu.pipeline.swap import SwapConfig, build_random_pipeline

cfg = SwapConfig(chunk_size=1, max_faces=4, crop_size=224, match_faces=2)
pipe = build_random_pipeline(cfg, policy=DEFAULT_POLICY, arcface_layers=(3,13,30,3))
rng = np.random.default_rng(0)
frame = jnp.asarray(rng.integers(0, 255, (1, 1080, 1920, 3), dtype=np.uint8))
src = rng.integers(0, 255, (1, 224, 224, 3), dtype=np.uint8)
src_emb = pipe.embed_sources(src)
from ghost_tpu.pipeline.swap import normalize_embedding
tgt_emb = normalize_embedding(src_emb)
checksum = jax.jit(lambda x: jnp.sum(x[..., :1].astype(jnp.float32)))

t0 = time.time()
out = pipe._swap_fused_j(pipe._vars, frame, tgt_emb, src_emb, False)
float(checksum(out))
print(f"first dispatch {time.time()-t0:.1f}s", flush=True)
reps = 30
t0 = time.time()
for _ in range(reps):
    out = pipe._swap_fused_j(pipe._vars, out, tgt_emb, src_emb, False)  # chained
    _ = float(checksum(out))
dt = (time.time()-t0)/reps*1000
print(f"fused image swap device-side: {dt:.1f} ms/image", flush=True)
