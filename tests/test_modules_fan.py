"""apex-parity modules + FAN hourglass tests."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as TF

from ghost_tpu.core.precision import FULL_PRECISION
from ghost_tpu.models.fan import FAN, eye_heatmaps, heatmaps_to_points
from ghost_tpu.nn.modules import MLP, MultiheadAttention, softmax_cross_entropy


def test_mlp_shapes():
    mlp = MLP(features=(32, 16, 8), policy=FULL_PRECISION)
    x = jnp.zeros((4, 64))
    variables = mlp.init(jax.random.key(0), x)
    out = mlp.apply(variables, x)
    assert out.shape == (4, 8)


def test_mha_self_attention_shapes():
    mha = MultiheadAttention(num_heads=2, head_dim=16, policy=FULL_PRECISION,
                             use_pallas=False)
    x = jnp.zeros((2, 64, 32))
    variables = mha.init(jax.random.key(0), x)
    out = mha.apply(variables, x)
    assert out.shape == (2, 64, 32)


def test_mha_norm_add_residual():
    mha = MultiheadAttention(num_heads=2, head_dim=8, norm_add=True,
                             policy=FULL_PRECISION, use_pallas=False)
    x = jnp.ones((1, 16, 16)) * 3.0
    variables = mha.init(jax.random.key(0), x)
    out = mha.apply(variables, x)
    assert out.shape == x.shape


def test_xentropy_vs_torch(rng):
    logits = rng.standard_normal((8, 20), dtype=np.float32)
    labels = rng.integers(0, 20, 8)
    for smoothing in (0.0, 0.1):
        ours = np.asarray(softmax_cross_entropy(
            jnp.asarray(logits), jnp.asarray(labels), smoothing))
        ref = TF.cross_entropy(torch.from_numpy(logits),
                               torch.from_numpy(labels),
                               label_smoothing=smoothing, reduction="none")
        np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-5, atol=1e-5)


def test_fan_output_shapes():
    fan = FAN(num_stacks=2, features=32, policy=FULL_PRECISION)
    x = jnp.zeros((1, 128, 128, 3))
    variables = fan.init(jax.random.key(0), x)
    outs = fan.apply(variables, x)
    assert len(outs) == 2
    assert outs[0].shape == (1, 32, 32, 98)
    left, right = eye_heatmaps(outs[-1])
    assert left.shape == (1, 32, 32, 9)
    assert right.shape == (1, 32, 32, 9)


def test_heatmap_decode(rng):
    hm = np.zeros((1, 32, 32, 3), np.float32)
    hm[0, 10, 20, 0] = 1.0
    hm[0, 10, 21, 0] = 0.5  # neighbor pulls +x
    hm[0, 5, 7, 1] = 1.0
    hm[0, 30, 2, 2] = 1.0
    pts = np.asarray(heatmaps_to_points(jnp.asarray(hm)))
    assert pts.shape == (1, 3, 2)
    np.testing.assert_allclose(pts[0, 0], [20.25, 10.0], atol=0.3)
    np.testing.assert_allclose(pts[0, 1], [7.0, 5.0], atol=0.3)
