"""Profiling utilities + export round-trip."""

import jax
import jax.numpy as jnp
import numpy as np

from ghost_tpu.core.precision import FULL_PRECISION
from ghost_tpu.utils.profiling import StageTimer, annotate, flop_estimate


def test_stage_timer():
    t = StageTimer()
    with t.stage("a", items=10):
        sum(range(1000))
    with t.stage("a", items=10):
        pass
    with t.stage("b"):
        pass
    rep = t.report()
    assert "a" in rep and "b" in rep and "items/s" in rep
    assert t.counts["a"] == 2 and t.items["a"] == 20


def test_annotate_and_flops():
    def f(x):
        return x @ x

    x = jnp.ones((64, 64))
    with annotate("matmul"):
        f(x)
    cost = flop_estimate(f, x)
    # 2*N^3 = 524288 flops for 64^3 matmul
    assert cost["flops"] > 0


def test_export_roundtrip():
    from jax import export as jexport

    from ghost_tpu.cli.export import export_model
    from ghost_tpu.models.aei import AEINet

    mod = AEINet(backbone="unet", num_blocks=1, policy=FULL_PRECISION,
                 width=1 / 16)
    variables = mod.init(jax.random.key(0), jnp.zeros((1, 256, 256, 3)),
                         jnp.zeros((1, 512)))

    def fn(xt, z):
        return mod.apply(variables, xt, z)[0]

    exported = jexport.export(jax.jit(fn))(
        jax.ShapeDtypeStruct((2, 256, 256, 3), jnp.float32),
        jax.ShapeDtypeStruct((2, 512), jnp.float32),
    )
    blob = exported.serialize()
    assert len(blob) > 1000
    restored = jexport.deserialize(blob)
    out = restored.call(jnp.zeros((2, 256, 256, 3)), jnp.zeros((2, 512)))
    assert out.shape == (2, 256, 256, 3)
