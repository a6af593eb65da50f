"""apex.RNN-parity LSTM scan timing on TPU (backs the BENCH_EXTRA_r03 lstm row).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_rnn.py
"""
import time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/ghost_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp
import sys
sys.path.insert(0, "/root/repo")
from ghost_tpu.nn.rnn import init_rnn_params, rnn_forward

T, B, H = 256, 32, 512
key = jax.random.key(0)
params = init_rnn_params(key, "lstm", H, H, num_layers=2)
x = jnp.asarray(np.random.default_rng(0).normal(0,1,(T,B,H)).astype(np.float32))

def chain(params, x):
    def body(c, _):
        y, _l = rnn_forward("lstm", params, c)
        s = jnp.sum(y[:1,:1,:8].astype(jnp.float32))
        return c + (1e-30*s).astype(c.dtype), s
    _, ss = jax.lax.scan(body, x, None, length=4)
    return jnp.sum(ss)

j = jax.jit(chain)
t0=time.time(); float(j(params,x)); c=time.time()-t0
t0=time.time()
for _ in range(3): float(j(params,x))
dt=(time.time()-t0)/3/4*1000
steps = T*2
print(f"lstm 2-layer T{T} B{B} H{H}: {dt:7.2f} ms/call ({dt/steps*1000:.0f} us/seq-step; compile {c:.0f}s)", flush=True)
