"""GHOST training losses — canonical set + the distillation fork's.

Canonical GHOST (reference utils/training/losses.py:7-67):
  hinge adversarial (G and D), identity cosine, attribute L2 over the 8
  encoder maps, same-person reconstruction L2, eye-heatmap L2.

Fork additions (reference train.py:201-338, train-self.py:92-159,
train-roundtrip.py:104-105, utils/training/helpers.py):
  teacher residual matching ||(Xt - tY) - (Xt - Y)||_2, multi-round
  stability ||G(G(x)) - G(x)||^2, round-trip ||G(Xs, Z_Y) - Xs||^2,
  plus auxiliary color/edge/emboss/structural consistency losses.

All losses are pure jnp on NHWC tensors; masking vectors (same_person /
diff_person) reproduce the reference's weighted means exactly.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax.numpy as jnp


# --------------------------------------------------------------- adversarial
def hinge_g_loss(d_outputs, diff_person):
    """Generator hinge: sum over scales of mean relu(1 - D(Y)), weighted
    by diff-person mask (losses.py:17-20)."""
    total = 0.0
    for di in d_outputs:
        per_sample = jnp.mean(jnp.maximum(1.0 - di[-1], 0.0), axis=(1, 2, 3))
        total = total + per_sample
    return jnp.sum(total * diff_person) / (jnp.sum(diff_person) + 1e-4)


def hinge_d_loss(d_fake, d_real, diff_person):
    """Discriminator hinge (losses.py:53-67)."""
    loss_fake = 0.0
    for di in d_fake:
        per = jnp.mean(jnp.maximum(di[-1] + 1.0, 0.0), axis=(1, 2, 3))
        loss_fake = loss_fake + jnp.sum(per * diff_person) / (
            jnp.sum(diff_person) + 1e-4
        )
    loss_real = 0.0
    for di in d_real:
        per = jnp.mean(jnp.maximum(1.0 - di[-1], 0.0), axis=(1, 2, 3))
        loss_real = loss_real + jnp.sum(per * diff_person) / (
            jnp.sum(diff_person) + 1e-4
        )
    return 0.5 * (loss_real + loss_fake)


# ------------------------------------------------------------------ identity
def id_cosine_loss(embed_src, embed_out):
    """(1 - cos) mean (losses.py:23; train.py:273,311)."""
    num = jnp.sum(embed_src * embed_out, axis=-1)
    den = jnp.linalg.norm(embed_src, axis=-1) * jnp.linalg.norm(embed_out, axis=-1)
    return jnp.mean(1.0 - num / jnp.maximum(den, 1e-8))


# ----------------------------------------------------------------- attribute
def attr_loss(xt_attrs: Sequence, y_attrs: Sequence):
    """0.5 * sum_k mean_b mean_i (xt_k - y_k)^2 (losses.py:31-34)."""
    total = 0.0
    for xa, ya in zip(xt_attrs, y_attrs):
        per_sample = jnp.mean(
            jnp.square(xa.astype(jnp.float32) - ya.astype(jnp.float32)),
            axis=(1, 2, 3),
        )
        total = total + jnp.mean(per_sample)
    return total / 2.0


# ------------------------------------------------------------ reconstruction
def reconstruction_loss(y, xt, same_person):
    """0.5 * MSE per sample, averaged over same-person pairs only
    (losses.py:37)."""
    per = 0.5 * jnp.mean(
        jnp.square(y.astype(jnp.float32) - xt.astype(jnp.float32)), axis=(1, 2, 3)
    )
    return jnp.sum(per * same_person) / (jnp.sum(same_person) + 1e-6)


# ------------------------------------------------------------------- eyes
def eye_heatmap_loss(xt_left, xt_right, y_left, y_right):
    """L2 on eye heatmaps (losses.py:40-42, helpers.py:252-256)."""
    return jnp.mean(jnp.square(xt_left - y_left)) + jnp.mean(
        jnp.square(xt_right - y_right)
    )


# ----------------------------------------------------- distillation (fork)
def teacher_residual_loss(xt, teacher_y, y):
    """||(Xt - tY) - (Xt - Y)||_2 — Frobenius norm, not mean
    (train.py:284-301)."""
    diff = (xt - teacher_y) - (xt - y)
    return jnp.sqrt(jnp.sum(jnp.square(diff.astype(jnp.float32))) + 1e-12)


def multi_round_loss(y2, y):
    """MSE(G(G(x)), G(x)) stability (train.py:203-204)."""
    return jnp.mean(jnp.square(y2.astype(jnp.float32) - y.astype(jnp.float32)))


def round_trip_loss(x_round_trip, xs):
    """MSE(G(Y, Z_Xt_id...) , Xs) (train-roundtrip.py:104-105)."""
    return jnp.mean(
        jnp.square(x_round_trip.astype(jnp.float32) - xs.astype(jnp.float32))
    )


# ------------------------------------------------- aux consistency (helpers)
def to_grayscale(x):
    """Luminosity grayscale (helpers.py:222-234), NHWC."""
    w = jnp.asarray([0.2989, 0.5870, 0.1140], x.dtype)
    return jnp.sum(x * w, axis=-1, keepdims=True)


def structural_loss(a, b):
    """Grayscale MSE (helpers.py:236-250)."""
    return jnp.mean(jnp.square(to_grayscale(a) - to_grayscale(b)))


def edge_loss(a, b, n: int = 5):
    """MSE over the n-px border bands (helpers.py:117-148)."""
    loss = (
        jnp.mean(jnp.square(a[:, :n] - b[:, :n]))
        + jnp.mean(jnp.square(a[:, -n:] - b[:, -n:]))
        + jnp.mean(jnp.square(a[:, :, :n] - b[:, :, :n]))
        + jnp.mean(jnp.square(a[:, :, -n:] - b[:, :, -n:]))
    )
    return loss


def emboss_loss(a, b):
    """Emboss-filtered grayscale MSE (helpers.py:192-220)."""
    k = jnp.asarray(
        [[-2.0, -1.0, 0.0], [-1.0, 1.0, 1.0], [0.0, 1.0, 2.0]], jnp.float32
    )

    def emboss(x):
        g = jnp.mean(x, axis=-1, keepdims=True)
        g = (g - g.min()) / (g.max() - g.min() + 1e-5)
        import jax.lax as lax

        return lax.conv_general_dilated(
            g, k[:, :, None, None], (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    return jnp.mean(jnp.square(emboss(a) - emboss(b)))


def masked_color_consistency_loss(images, masks):
    """Mean per-channel color variance over unmasked (mask==0) pixels
    (helpers.py:271-315)."""
    valid = (masks == 0).astype(jnp.float32)
    num = jnp.maximum(jnp.sum(valid, axis=(1, 2)), 1.0)
    mean = jnp.sum(images * valid, axis=(1, 2)) / num
    sq = jnp.sum(jnp.square(images) * valid, axis=(1, 2)) / num
    var = sq - jnp.square(mean)
    return jnp.mean(jnp.mean(var, axis=-1))


# ----------------------------------------------------------------- weights
@dataclasses.dataclass(frozen=True)
class GeneratorLossWeights:
    """Canonical GHOST weights (train CLI defaults) + fork multipliers
    (train.py:313-318: universal x100, attr x3, adv x0.5, teacher x30,
    multi-round x(teacher*100))."""

    adv: float = 1.0
    attr: float = 10.0
    id: float = 15.0
    rec: float = 10.0
    eyes: float = 0.0
    # fork-style distillation weights
    universal: float = 100.0
    teacher: float = 30.0
    multi_round: float = 3000.0
    round_trip: float = 0.0


def ratchet_multiplier(value: float, multiplier: float, floor: float,
                       universal: float = 100.0, factor: float = 1.1,
                       max_mult: float = 1e6) -> float:
    """Host-side dynamic loss-multiplier ratchet (train.py:328-338):
    grow `multiplier` by 1.1x until universal*multiplier*value >= floor.
    Pure python on scalars — feeds the jitted step as a plain float."""
    value = float(value)
    if value <= 0.0:
        return multiplier
    while universal * multiplier * value < floor and multiplier < max_mult:
        multiplier *= factor
    return multiplier
