"""Jitted GAN train steps: generator + periodic discriminator.

Replaces the reference's train loops (reference train.py:62-459,
train-self.py:52-221, train-roundtrip.py:45-198) with pure functional
steps over a TrainState pytree:

  * G step: forward(+BN stat update), adversarial/id/attr/rec losses
    (canonical, utils/training/losses.py:14-50) or the fork's
    distillation set (teacher residual, multi-round, id-vs-teacher,
    train.py:201-377), one fused grad+Adam update;
  * D step: hinge real/fake on the CURRENT batch, executed every
    `d_interval` G steps (the reference's accumulation branch never
    reaches backward — train.py:400-407 — so cadence-only is exact);
  * dynamic loss multipliers stay host-side scalars
    (losses.ratchet_multiplier) fed into the jitted step as floats,
    reproducing train.py:328-338 without retracing (weights enter as
    traced scalars).

Under a pjit mesh the same step functions run SPMD: batch axis sharded,
params replicated, BN stats computed over the GLOBAL batch (the
apex-SyncBN equivalence, see parallel/dp.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ghost_tpu.nn.layers import resize
from ghost_tpu.train import losses as L
from ghost_tpu.train.optimizers import ghost_adam


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    g_params: Any
    g_stats: Any
    d_params: Any
    g_opt: Any
    d_opt: Any
    # EMA of adversarial loss (reference losses.py:48)
    loss_adv_accumulated: jnp.ndarray


@dataclasses.dataclass(frozen=True)
class TrainStepConfig:
    lr_g: float = 4e-4
    lr_d: float = 4e-4
    b1: float = 0.0
    b2: float = 0.999
    weight_decay: float = 1e-4
    d_interval: int = 10
    mode: str = "canonical"  # canonical | distill | self_distill | round_trip
    eye_loss: bool = False
    # StepLR on both optimizers (reference train.py:473-508)
    scheduler: bool = False
    scheduler_step: int = 5000
    scheduler_gamma: float = 0.2
    # distill-regime switches (reference train.py:276-377)
    teacher_inner_crop: bool = False  # residual on the central 7/32..21/32 crop (:277-291)
    teacher_fine_tune: bool = False  # total = 1000*mult*teacher only (:375-377)
    teacher_lower_signal: bool = False  # fixed low mults id_hq/teacher/multi (:346-349)
    without_teacher_loss: bool = False  # drop teacher/id_hq/eyes terms (:340-344)


def _make_txs(cfg: TrainStepConfig):
    """G/D optimizers; shared by init_train_state and make_train_steps
    so the opt-state trees always match."""
    from ghost_tpu.train.optimizers import step_lr

    lr_g, lr_d = cfg.lr_g, cfg.lr_d
    if cfg.scheduler:
        lr_g = step_lr(cfg.lr_g, cfg.scheduler_step, cfg.scheduler_gamma)
        # The reference steps scheduler_D once per ITERATION
        # (train.py:473-508) while opt_D.step() only fires every
        # d_interval iterations (train.py:396-407 accumulation branch).
        # optax schedules count tx.update() calls, i.e. D updates — map
        # D-update count k back to its iteration k*d_interval so D's lr
        # decays on the reference's per-iteration clock, not d_interval
        # times slower.
        lr_d_iter = step_lr(cfg.lr_d, cfg.scheduler_step, cfg.scheduler_gamma)
        lr_d = lambda count: lr_d_iter(count * cfg.d_interval)
    return (ghost_adam(lr_g, cfg.b1, cfg.b2, cfg.weight_decay),
            ghost_adam(lr_d, cfg.b1, cfg.b2, cfg.weight_decay))


def init_train_state(g_variables, d_variables, cfg: TrainStepConfig) -> TrainState:
    g_tx, d_tx = _make_txs(cfg)
    return TrainState(
        step=jnp.int32(0),
        g_params=g_variables["params"],
        g_stats=g_variables.get("batch_stats", {}),
        d_params=d_variables["params"],
        g_opt=g_tx.init(g_variables["params"]),
        d_opt=d_tx.init(d_variables["params"]),
        loss_adv_accumulated=jnp.float32(4.0),
    )


def _embed112(arc_apply, x_pm1):
    """ArcFace embed at 112 via area-downsample (reference train.py:235)."""
    return arc_apply(resize(x_pm1, (112, 112), method="area"))


def default_distill_mults():
    """Base multipliers of the fork's distillation objective
    (reference train.py:313-338); the id/id_hq/eyes entries are the
    ratchet starting points."""
    return {
        "id": 3.5,
        "id_hq": 3.0,
        "attr": 3.0,
        "teacher": 30.0,
        "multi_round": 3000.0,
        "adv": 0.5,
        # ratcheted from 1.0 until universal*mult*L_eyes >= 100
        # (reference train.py:336-338)
        "eyes": 1.0,
    }


def make_train_steps(
    gen_mod,
    disc_mod,
    arc_apply: Callable,
    cfg: TrainStepConfig,
    weights: L.GeneratorLossWeights = L.GeneratorLossWeights(),
    teacher_apply: Optional[Callable] = None,
    fan_apply: Optional[Callable] = None,
):
    """Returns (g_step, d_step), each jittable.

    arc_apply: frozen ArcFace (x_pm1 NHWC 112) -> (B,512); closed over
    its variables so it rides the jit as constants.
    teacher_apply: frozen teacher G for self-distillation
    ((xt, z) -> y), reference train-self.py:244-254.
    fan_apply: frozen FAN eye detector, images in [0,1] NHWC 256 ->
    final-stack (B,64,64,98) heatmaps; enables cfg.eye_loss (reference
    train.py:239-247, loss on pupil channels 96/97 per
    utils/training/detector.py:24-28).
    """
    g_tx, d_tx = _make_txs(cfg)

    def g_forward(params, stats, xt, z):
        variables = {"params": params, "batch_stats": stats}
        (y, attrs), updates = gen_mod.apply(
            variables, xt, z, mutable=["batch_stats"]
        )
        return y, attrs, updates["batch_stats"]

    def g_loss_fn(g_params, state: TrainState, batch, mults):
        xs, xt, embed, same_person = (
            batch["xs"], batch["xt"], batch["embed"], batch["same_person"],
        )
        diff_person = batch.get("diff_person", jnp.ones_like(same_person))

        y, xt_attrs, new_stats = g_forward(g_params, state.g_stats, xt, embed)

        # adversarial
        d_out = disc_mod.apply({"params": state.d_params}, y)
        l_adv = L.hinge_g_loss(d_out, diff_person)

        # identity: ZY = arcface(Y@112)
        zy = _embed112(arc_apply, y)
        l_id = L.id_cosine_loss(embed, zy)

        # attributes: G.get_attr(Y) vs encoder(Xt); train-mode BN also
        # touches running stats in the reference — recompute, discard
        y_attrs, _ = gen_mod.apply(
            {"params": g_params, "batch_stats": new_stats}, y,
            method=gen_mod.get_attr, mutable=["batch_stats"],
        )
        l_attr = L.attr_loss(xt_attrs, y_attrs)

        l_rec = L.reconstruction_loss(y, xt, same_person)

        l_eyes = None
        if cfg.eye_loss and fan_apply is not None:
            # eye target: the teacher output in distill mode
            # (train.py:239-247), Xt otherwise (canonical GHOST,
            # utils/training/losses.py:40-50). FAN eats [0,1] images
            # (detector.py:18-22 un-normalizes); target branch carries
            # no gradient, Y's branch backprops through frozen FAN.
            tgt_img = xt
            if cfg.mode == "distill" and "teacher_y" in batch:
                tgt_img = batch["teacher_y"]
            hm_t = jax.lax.stop_gradient(
                fan_apply(tgt_img * 0.5 + 0.5))
            hm_y = fan_apply(y * 0.5 + 0.5)
            l_eyes = L.eye_heatmap_loss(
                hm_t[..., 96], hm_t[..., 97], hm_y[..., 96], hm_y[..., 97])

        aux = {
            "L_adv": l_adv, "L_id": l_id, "L_attr": l_attr, "L_rec": l_rec,
            "batch_stats": new_stats, "Y": y,
        }
        if l_eyes is not None:
            aux["L_eyes"] = l_eyes

        if cfg.mode == "canonical":
            total = (
                weights.adv * l_adv
                + weights.attr * l_attr
                + weights.id * l_id
                + weights.rec * l_rec
            )
            if l_eyes is not None:
                total = total + weights.eyes * l_eyes
        elif cfg.mode in ("distill", "self_distill", "round_trip"):
            # teacher output: provided by the host (ONNX inswapper stage,
            # train.py:139-145) or computed from a frozen JAX teacher
            # (train-self.py:150)
            if cfg.mode == "self_distill" and teacher_apply is not None:
                teacher_y = teacher_apply(xt, embed)
            else:
                teacher_y = batch["teacher_y"]
            y2, _, _ = g_forward(g_params, new_stats, y, embed)
            if cfg.teacher_inner_crop:
                # central 56/128 crop of the face (reference
                # train.py:277-291, crop 28:84 in 128-space; the same
                # fraction at our native 256 residual is 56:168)
                lo = xt.shape[1] * 28 // 128
                hi = xt.shape[1] * 84 // 128
                l_teacher = L.teacher_residual_loss(
                    xt[:, lo:hi, lo:hi], teacher_y[:, lo:hi, lo:hi],
                    y[:, lo:hi, lo:hi])
            else:
                l_teacher = L.teacher_residual_loss(xt, teacher_y, y)
            l_multi = L.multi_round_loss(y2, y)
            t_embed = batch.get("teacher_embed")
            if t_embed is None:
                # reference train.py:156-160: PRED = netArc(area112(
                # teacher_y)) under no_grad. The host teacher stage may
                # supply it precomputed (OnnxInswapperTeacher); the
                # native ONNX teacher returns only teacher_y, so
                # compute it in-graph — never silently drop id_hq.
                t_embed = jax.lax.stop_gradient(
                    _embed112(arc_apply, teacher_y))
            l_id_hq = L.id_cosine_loss(t_embed, zy)
            # reference train.py:313-377: total = universal * sum(mult_i * L_i)
            # with base mults id=3.5, id_hq=3.0, attr=3.0, teacher=30,
            # multi_round=3000, adv=0.5 (ratcheted host-side)
            m_id_hq = mults["id_hq"]
            m_teacher = mults["teacher"]
            m_multi = mults["multi_round"]
            if cfg.teacher_lower_signal:
                # fixed low-signal overrides applied AFTER the host
                # ratchets (reference train.py:346-349)
                m_id_hq, m_teacher, m_multi = 0.1, 0.5, 50.0
            zero = cfg.without_teacher_loss  # reference train.py:340-344
            if cfg.teacher_fine_tune:
                # teacher-only fine-tune: total = 1000*mult*teacher, no
                # universal multiplier (reference train.py:375-377)
                total = (m_teacher * 1000.0) * l_teacher
            else:
                total = weights.universal * (
                    mults["id"] * l_id
                    + (0.0 if zero else m_id_hq * l_id_hq)
                    + mults["attr"] * l_attr
                    + (0.0 if zero else m_teacher * l_teacher)
                    + m_multi * l_multi
                    + mults["adv"] * l_adv
                )
                if l_eyes is not None and not zero:
                    total = total + weights.universal * \
                        mults.get("eyes", 1.0) * l_eyes
            if cfg.mode == "round_trip":
                # G(Y, embed_of_Xt) should reproduce Xt
                # (reference train-roundtrip.py:104-105)
                zt = _embed112(arc_apply, xt)
                y_rt, _, _ = g_forward(g_params, new_stats, y, zt)
                total = total + weights.universal * mults.get(
                    "round_trip", 1.0
                ) * L.round_trip_loss(y_rt, xt)
            aux.update({"L_teacher": l_teacher, "L_multi_round": l_multi,
                        "L_id_hq": l_id_hq})
        else:
            raise ValueError(cfg.mode)

        return total, aux

    def g_step(state: TrainState, batch, mults=None):
        mults = mults or default_distill_mults()
        (loss, aux), grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            state.g_params, state, batch, mults
        )
        updates, new_opt = g_tx.update(grads, state.g_opt, state.g_params)
        new_params = optax.apply_updates(state.g_params, updates)
        new_acc = state.loss_adv_accumulated * 0.98 + aux["L_adv"] * 0.02
        new_state = state.replace(
            step=state.step + 1,
            g_params=new_params,
            g_stats=aux["batch_stats"],
            g_opt=new_opt,
            loss_adv_accumulated=new_acc,
        )
        metrics = {k: v for k, v in aux.items()
                   if k not in ("batch_stats", "Y")}
        metrics["lossG"] = loss
        return new_state, metrics, aux["Y"]

    def d_loss_fn(d_params, y_detached, xs, diff_person):
        d_fake = disc_mod.apply({"params": d_params}, y_detached)
        d_real = disc_mod.apply({"params": d_params}, xs)
        return L.hinge_d_loss(d_fake, d_real, diff_person)

    def d_step(state: TrainState, y_detached, xs, diff_person=None):
        if diff_person is None:
            diff_person = jnp.ones(xs.shape[0], jnp.float32)
        loss, grads = jax.value_and_grad(d_loss_fn)(
            state.d_params, jax.lax.stop_gradient(y_detached), xs, diff_person
        )
        updates, new_opt = d_tx.update(grads, state.d_opt, state.d_params)
        new_params = optax.apply_updates(state.d_params, updates)
        return state.replace(d_params=new_params, d_opt=new_opt), loss

    return g_step, d_step
