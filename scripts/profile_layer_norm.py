"""Pallas fused LayerNorm vs XLA on TPU (chained; backs the BENCH_EXTRA_r03 fused_layer_norm row and the block_rows=1024 default).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_layer_norm.py
"""
import time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/ghost_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp
import sys
sys.path.insert(0, "/root/repo")
from ghost_tpu.ops.pallas.layer_norm import fused_layer_norm, layer_norm_reference

rng = np.random.default_rng(0)
R, H = 8192, 1024  # rows x hidden (seq*batch x d_model scale)
x = jnp.asarray(rng.normal(0,1,(R,H)).astype(np.float32))
g = jnp.asarray(rng.normal(1,0.1,(H,)).astype(np.float32))
b = jnp.asarray(rng.normal(0,0.1,(H,)).astype(np.float32))

def bench(tag, fn, reps=3, K=16):
    def chain(x, g, b):
        def body(c, _):
            y = fn(c, g, b)
            s = jnp.sum(y[:1,:8].astype(jnp.float32))
            return c + (1e-30*s).astype(c.dtype), s
        _, ss = jax.lax.scan(body, x, None, length=K)
        return jnp.sum(ss)
    j = jax.jit(chain)
    try:
        t0=time.time(); float(j(x,g,b)); c=time.time()-t0
        t0=time.time()
        for _ in range(reps): float(j(x,g,b))
        dt=(time.time()-t0)/reps/K*1000
        print(f"{tag}: {dt:8.3f} ms (compile {c:.0f}s)", flush=True)
    except Exception as e:
        print(f"{tag}: FAIL {type(e).__name__} {str(e)[:80]}", flush=True)

bench("xla ln fwd", layer_norm_reference)
for br in (128, 512, 1024, 2048):
    bench(f"pallas ln fwd br{br}", lambda x,g,b,br=br: fused_layer_norm(x,g,b,1e-5,br))
gr = lambda x,g,b: jax.grad(lambda xx: jnp.sum(layer_norm_reference(xx,g,b).astype(jnp.float32)*0.01))(x)
bench("xla ln fwd+bwd", gr)
for br in (128, 512, 1024):
    gp = lambda x,g,b,br=br: jax.grad(lambda xx: jnp.sum(fused_layer_norm(xx,g,b,1e-5,br).astype(jnp.float32)*0.01))(x)
    bench(f"pallas ln fwd+bwd br{br}", gp)
