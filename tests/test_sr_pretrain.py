"""Self-supervised LIP-encoder pretraining (SubAdd / Contrasive parity,
reference models/networks/generator.py:403-763)."""

import jax
import jax.numpy as jnp
import numpy as np

from ghost_tpu.core.precision import FULL_PRECISION
from ghost_tpu.models.sr.generator import LIPEncoder
from ghost_tpu.models.sr.pretrain import (
    NoiseClassPredictor,
    NoiseIntensityPredictor,
    make_contrasive_pretrain_step,
    make_subadd_pretrain_steps,
)


def _setup():
    enc = LIPEncoder(ngf=4, n_2xdown=3, policy=FULL_PRECISION)
    key = jax.random.key(0)
    x = jnp.zeros((2, 32, 32, 3))
    e_vars = enc.init(key, x)
    feats = enc.apply(e_vars, x)
    return enc, e_vars["params"], feats.shape


def test_intensity_predictor_shapes():
    _, _, fshape = _setup()
    sw = fshape[1]
    pred = NoiseIntensityPredictor(sw=sw, policy=FULL_PRECISION)
    v = pred.init(jax.random.key(1), jnp.zeros(fshape))
    out, _ = pred.apply(v, jnp.zeros(fshape), mutable=["batch_stats"])
    assert out.shape == (fshape[0],)

    cls = NoiseClassPredictor(sw=sw, outdim=3, policy=FULL_PRECISION)
    vc = cls.init(jax.random.key(2), jnp.zeros(fshape))
    outc, _ = cls.apply(vc, jnp.zeros(fshape), mutable=["batch_stats"])
    assert outc.shape == (fshape[0], 3)


def test_subadd_steps_update_and_losses_finite():
    enc, e_params, fshape = _setup()
    disc = NoiseIntensityPredictor(sw=fshape[1], policy=FULL_PRECISION)
    d_vars = disc.init(jax.random.key(1), jnp.zeros(fshape))

    enc_apply = lambda p, x: enc.apply({"params": p}, x)
    e_step, d_step, e_tx, d_tx = make_subadd_pretrain_steps(enc_apply, disc)
    e_opt = e_tx.init(e_params)
    d_opt = d_tx.init(d_vars["params"])

    rng = np.random.default_rng(0)
    clean = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)), jnp.float32)
    noisy = jnp.asarray(clean + 0.3 * rng.standard_normal((2, 32, 32, 3)),
                        jnp.float32)
    label = jnp.asarray([0.5, 0.5], jnp.float32)

    e_step = jax.jit(e_step)
    d_step = jax.jit(d_step)
    e2, e_opt, em = e_step(e_params, e_opt, d_vars, clean, noisy)
    d2, d_opt, dm = d_step(d_vars, d_opt, e2, clean, noisy, label)
    for v in {**em, **dm}.values():
        assert np.isfinite(float(v))
    # params actually moved
    moved = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(lambda a, b: float(jnp.abs(a - b).sum()), e_params, e2))
    assert moved > 0
    # sum = 10*l1 + gan (generator.py:590)
    assert np.isclose(float(em["sum"]),
                      10 * float(em["l1"]) + float(em["gan_E"]), rtol=1e-5)


def test_contrasive_step_reduces_identical_views_to_zero():
    enc, e_params, _ = _setup()
    enc_apply = lambda p, x: enc.apply({"params": p}, x)
    step, tx = make_contrasive_pretrain_step(enc_apply)
    opt = tx.init(e_params)
    x = jnp.asarray(np.random.default_rng(1).uniform(-1, 1, (2, 32, 32, 3)),
                    jnp.float32)
    # identical clean/noisy -> (numerically) zero loss
    p2, opt, loss = jax.jit(step)(e_params, opt, x, x)
    assert float(loss) < 1e-6
    # distinct views -> positive loss
    y = x + 0.5
    _, _, loss2 = jax.jit(step)(e_params, opt, x, y)
    assert float(loss2) > 0.0
