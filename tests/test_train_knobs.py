"""Reference train.py regime knobs: StepLR scheduler and the
teacher-distill switches (--teacher_fine_tune/--teacher_inner_crop/
--teacher_lower_signal/--without_teacher_loss).

Totals are verified against the reference composition
(train.py:313-377) from the step's own reported loss terms.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ghost_tpu.core.precision import FULL_PRECISION
from ghost_tpu.models.aei import AEINet
from ghost_tpu.models.arcface import IResNet
from ghost_tpu.models.discriminator import MultiscaleDiscriminator
from ghost_tpu.train.optimizers import step_lr
from ghost_tpu.train.train_step import (
    TrainStepConfig,
    init_train_state,
    make_train_steps,
)

B = 2
UNIVERSAL = 100.0


def test_step_lr_schedule():
    """torch StepLR parity: lr * gamma^(count // step_size)."""
    s = step_lr(4e-4, step_size=3, gamma=0.1)
    assert np.isclose(float(s(0)), 4e-4)
    assert np.isclose(float(s(2)), 4e-4)
    assert np.isclose(float(s(3)), 4e-5)
    assert np.isclose(float(s(7)), 4e-6)


@pytest.fixture(scope="module")
def models():
    key = jax.random.key(0)
    gen = AEINet(backbone="unet", num_blocks=1, policy=FULL_PRECISION,
                 train=True, width=1 / 16)
    g_vars = gen.init(key, jnp.zeros((1, 256, 256, 3)), jnp.zeros((1, 512)))
    disc = MultiscaleDiscriminator(ndf=8, n_layers=3, num_D=2,
                                   policy=FULL_PRECISION)
    d_vars = disc.init(key, jnp.zeros((1, 256, 256, 3)))
    arc = IResNet(layers=(1, 1, 1, 1), policy=FULL_PRECISION)
    a_vars = arc.init(key, jnp.zeros((1, 112, 112, 3)))
    arc_apply = lambda x: arc.apply(a_vars, x)
    return gen, g_vars, disc, d_vars, arc_apply


def distill_batch(rng):
    return {
        "xs": jnp.asarray(rng.uniform(-1, 1, (B, 256, 256, 3))
                          .astype(np.float32)),
        "xt": jnp.asarray(rng.uniform(-1, 1, (B, 256, 256, 3))
                          .astype(np.float32)),
        "embed": jnp.asarray(rng.standard_normal((B, 512),
                                                 dtype=np.float32)),
        "same_person": jnp.zeros(B, jnp.float32),
        "teacher_y": jnp.asarray(rng.uniform(-1, 1, (B, 256, 256, 3))
                                 .astype(np.float32)),
        "teacher_embed": jnp.asarray(
            rng.standard_normal((B, 512), dtype=np.float32)),
    }


def run_g(models, cfg, batch):
    gen, g_vars, disc, d_vars, arc_apply = models
    g_step, _ = make_train_steps(gen, disc, arc_apply, cfg)
    state = init_train_state(g_vars, d_vars, cfg)
    _, metrics, _ = g_step(state, batch)
    return {k: float(v) for k, v in metrics.items()}


def test_distill_knob_totals(models, rng):
    batch = distill_batch(rng)

    m = run_g(models, TrainStepConfig(mode="distill"), batch)
    expect = UNIVERSAL * (3.5 * m["L_id"] + 3.0 * m["L_id_hq"]
                          + 3.0 * m["L_attr"] + 30.0 * m["L_teacher"]
                          + 3000.0 * m["L_multi_round"]
                          + 0.5 * m["L_adv"])
    assert np.isclose(m["lossG"], expect, rtol=1e-5)

    # teacher_fine_tune: total = 1000 * mult * L_teacher only
    # (reference train.py:375-377)
    m = run_g(models, TrainStepConfig(mode="distill",
                                      teacher_fine_tune=True), batch)
    assert np.isclose(m["lossG"], 30.0 * 1000.0 * m["L_teacher"], rtol=1e-5)

    # teacher_lower_signal: id_hq/teacher/multi overridden to
    # .1/.5/50 (reference train.py:346-349)
    m = run_g(models, TrainStepConfig(mode="distill",
                                      teacher_lower_signal=True), batch)
    expect = UNIVERSAL * (3.5 * m["L_id"] + 0.1 * m["L_id_hq"]
                          + 3.0 * m["L_attr"] + 0.5 * m["L_teacher"]
                          + 50.0 * m["L_multi_round"] + 0.5 * m["L_adv"])
    assert np.isclose(m["lossG"], expect, rtol=1e-5)

    # without_teacher_loss: teacher/id_hq dropped from the total
    # (reference train.py:340-344); multi-round and id stay
    m = run_g(models, TrainStepConfig(mode="distill",
                                      without_teacher_loss=True), batch)
    expect = UNIVERSAL * (3.5 * m["L_id"] + 3.0 * m["L_attr"]
                          + 3000.0 * m["L_multi_round"]
                          + 0.5 * m["L_adv"])
    assert np.isclose(m["lossG"], expect, rtol=1e-5)


def test_inner_crop_changes_teacher_loss(models, rng):
    batch = distill_batch(rng)
    m_full = run_g(models, TrainStepConfig(mode="distill"), batch)
    m_crop = run_g(models, TrainStepConfig(mode="distill",
                                           teacher_inner_crop=True), batch)
    # the central-crop residual is over 16x fewer pixels -> strictly
    # smaller Frobenius norm on random data
    assert m_crop["L_teacher"] < m_full["L_teacher"]
    assert m_crop["L_teacher"] > 0


def test_id_hq_computed_in_graph_when_embed_absent(models, rng):
    """The native ONNX teacher supplies only teacher_y; id_hq must then
    be computed in-graph as netArc(area112(teacher_y)) (reference
    train.py:156-160), not silently dropped to 0."""
    from ghost_tpu.nn.layers import resize

    _, _, _, _, arc_apply = models
    batch = distill_batch(rng)
    host_embed = arc_apply(
        resize(batch["teacher_y"], (112, 112), method="area"))

    with_host = dict(batch, teacher_embed=host_embed)
    without = {k: v for k, v in batch.items() if k != "teacher_embed"}

    m_host = run_g(models, TrainStepConfig(mode="distill"), with_host)
    m_graph = run_g(models, TrainStepConfig(mode="distill"), without)
    assert m_graph["L_id_hq"] > 0
    assert np.isclose(m_graph["L_id_hq"], m_host["L_id_hq"], rtol=1e-5)
    assert np.isclose(m_graph["lossG"], m_host["lossG"], rtol=1e-5)


def test_upsampled_teacher_wraps_output(rng):
    """--teacher_upsample routes teacher_y through the upscale fn
    (reference train.py:228-229); other keys pass through untouched."""
    from ghost_tpu.train.distill import UpsampledTeacher

    y = rng.uniform(-1, 1, (B, 8, 8, 3)).astype(np.float32)
    emb = rng.standard_normal((B, 512), dtype=np.float32)

    def fake_teacher(xt, embed):
        return {"teacher_y": y, "teacher_embed": emb}

    t = UpsampledTeacher(fake_teacher, lambda img: jnp.asarray(img) * 0.5)
    out = t(np.zeros((B, 8, 8, 3), np.float32), emb)
    np.testing.assert_allclose(out["teacher_y"], y * 0.5, rtol=1e-6)
    assert out["teacher_y"].dtype == np.float32
    np.testing.assert_array_equal(out["teacher_embed"], emb)


def test_scheduler_decays_updates(models, rng):
    """With StepLR(step_size=1, gamma=0.1) the second Adam update is
    ~10x smaller than the first (bias-correction ratio aside)."""
    gen, g_vars, disc, d_vars, arc_apply = models
    cfg = TrainStepConfig(mode="canonical", scheduler=True,
                          scheduler_step=1, scheduler_gamma=0.1,
                          weight_decay=0.0)
    g_step, _ = make_train_steps(gen, disc, arc_apply, cfg)
    state = init_train_state(g_vars, d_vars, cfg)
    batch = {k: v for k, v in distill_batch(rng).items()
             if k in ("xs", "xt", "embed", "same_person")}
    s1, _, _ = g_step(state, batch)
    s2, _, _ = g_step(s1, batch)

    def max_delta(a, b):
        return max(jax.tree.leaves(jax.tree.map(
            lambda x, y: float(jnp.max(jnp.abs(x - y))), a, b)))

    d1 = max_delta(state.g_params, s1.g_params)
    d2 = max_delta(s1.g_params, s2.g_params)
    assert d2 < 0.5 * d1, (d1, d2)


def test_scheduler_d_decays_on_iteration_clock(models, rng):
    """The reference steps scheduler_D once per ITERATION while opt_D
    only updates every d_interval iterations (train.py:396-407,
    473-508). With scheduler_step == d_interval, D's lr must already be
    decayed by gamma at its SECOND update (iteration d_interval) — not
    after d_interval D-updates as a naive per-update schedule would."""
    gen, g_vars, disc, d_vars, arc_apply = models
    cfg = TrainStepConfig(mode="canonical", scheduler=True,
                          scheduler_step=4, scheduler_gamma=0.1,
                          d_interval=4, weight_decay=0.0)
    g_step, d_step = make_train_steps(gen, disc, arc_apply, cfg)
    state = init_train_state(g_vars, d_vars, cfg)
    batch = {k: v for k, v in distill_batch(rng).items()
             if k in ("xs", "xt", "embed", "same_person")}
    _, _, y = g_step(state, batch)

    def max_delta(a, b):
        return max(jax.tree.leaves(jax.tree.map(
            lambda x, y: float(jnp.max(jnp.abs(x - y))), a, b)))

    s1, _ = d_step(state, y, batch["xs"])  # D update 0 -> iteration 0
    s2, _ = d_step(s1, y, batch["xs"])     # D update 1 -> iteration 4
    d1 = max_delta(state.d_params, s1.d_params)
    d2 = max_delta(s1.d_params, s2.d_params)
    assert d2 < 0.5 * d1, (d1, d2)
