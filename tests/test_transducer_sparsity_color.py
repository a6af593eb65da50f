"""Transducer loss, 2:4 sparsity, HSV helpers vs references."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from ghost_tpu.nn.transducer import (
    transducer_joint,
    transducer_loss,
    transducer_loss_reference,
)
from ghost_tpu.train.color import get_hsv, hsv_to_rgb, is_any_nan
from ghost_tpu.train.sparsity import (
    apply_masks,
    compute_masks,
    mask_2to4_last_axis,
    sparsity_ratio,
)


def test_transducer_joint_shape(rng):
    f = jnp.asarray(rng.standard_normal((2, 5, 8), dtype=np.float32))
    g = jnp.asarray(rng.standard_normal((2, 4, 8), dtype=np.float32))
    j = transducer_joint(f, g)
    assert j.shape == (2, 5, 4, 8)
    np.testing.assert_allclose(np.asarray(j[0, 1, 2]),
                               np.asarray(f[0, 1]) + np.asarray(g[0, 2]),
                               rtol=1e-6)


def test_transducer_loss_vs_dp(rng):
    b, t, u, v = 2, 6, 3, 5
    logits = rng.standard_normal((b, t, u + 1, v), dtype=np.float32)
    log_probs = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    labels = rng.integers(1, v, (b, u))
    f_len = np.array([t, t - 2])
    y_len = np.array([u, u - 1])
    ours = np.asarray(transducer_loss(log_probs, jnp.asarray(labels),
                                      jnp.asarray(f_len), jnp.asarray(y_len)))
    ref = transducer_loss_reference(np.asarray(log_probs), labels, f_len, y_len)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_transducer_loss_grad_finite(rng):
    logits = jnp.asarray(rng.standard_normal((1, 4, 3, 4), dtype=np.float32))
    labels = jnp.asarray([[1, 2]])

    def loss(lg):
        lp = jax.nn.log_softmax(lg, axis=-1)
        return jnp.sum(transducer_loss(lp, labels, jnp.asarray([4]),
                                       jnp.asarray([2])))

    g = jax.grad(loss)(logits)
    assert np.all(np.isfinite(np.asarray(g)))


def test_2to4_mask(rng):
    w = jnp.asarray(rng.standard_normal((8, 16), dtype=np.float32))
    m = np.asarray(mask_2to4_last_axis(w))
    groups = m.reshape(8, 4, 4)
    assert (groups.sum(-1) == 2).all()
    # kept entries are the two largest |w| in each group
    wg = np.abs(np.asarray(w)).reshape(8, 4, 4)
    for i in range(8):
        for g in range(4):
            kept = wg[i, g][groups[i, g]]
            dropped = wg[i, g][~groups[i, g]]
            assert kept.min() >= dropped.max() - 1e-6


def test_sparsity_tree(rng):
    params = {"layer": {"kernel": jnp.asarray(
        rng.standard_normal((3, 3, 8, 16), dtype=np.float32)),
        "bias": jnp.zeros(16)}}
    masks = compute_masks(params)
    pruned = apply_masks(params, masks)
    assert sparsity_ratio(masks) > 0.2
    assert np.count_nonzero(np.asarray(pruned["layer"]["kernel"])) < \
        np.asarray(params["layer"]["kernel"]).size
    np.testing.assert_array_equal(np.asarray(pruned["layer"]["bias"]),
                                  np.zeros(16))


def test_hsv_roundtrip_vs_numpy(rng):
    import colorsys

    img01 = rng.uniform(0.05, 0.95, (1, 4, 4, 3)).astype(np.float32)
    hsv = np.asarray(get_hsv(jnp.asarray(img01 * 2 - 1)))
    for y in range(4):
        for x in range(4):
            r, g, b = img01[0, y, x]
            h_ref, s_ref, v_ref = colorsys.rgb_to_hsv(r, g, b)
            assert abs(hsv[0, y, x, 2] - v_ref) < 1e-5
            assert abs(hsv[0, y, x, 1] - s_ref) < 1e-4
            dh = abs(hsv[0, y, x, 0] - h_ref) % 1.0
            assert min(dh, 1 - dh) < 1e-4
    back = np.asarray(hsv_to_rgb(jnp.asarray(hsv)))
    np.testing.assert_allclose(back, img01, rtol=1e-4, atol=1e-4)


def test_is_any_nan():
    assert not is_any_nan({"a": jnp.ones(3)})
    assert is_any_nan({"a": jnp.asarray([1.0, np.nan])})


def test_weight_norm_torch_parity():
    import pytest

    """apex.reparameterization equivalent: w = g * v/||v|| with the norm
    over all non-output axes (torch.nn.utils.weight_norm semantics)."""
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp

    from ghost_tpu.nn.modules import weight_norm

    torch.manual_seed(0)
    lin = torch.nn.Linear(6, 4)
    wn = torch.nn.utils.weight_norm(lin)
    with torch.no_grad():
        w_ref = wn.weight.detach().numpy()  # (out, in)
    v = wn.weight_v.detach().numpy().T  # (in, out)
    g = wn.weight_g.detach().numpy().reshape(-1)
    w = np.asarray(weight_norm(jnp.asarray(v), jnp.asarray(g), axis=-1))
    np.testing.assert_allclose(w.T, w_ref, atol=1e-6)


def test_quality_metrics():
    """id-sim / PSNR / perceptual distance harness sanity."""
    import jax
    import jax.numpy as jnp

    from ghost_tpu.core.precision import FULL_PRECISION
    from ghost_tpu.models.arcface import IResNet
    from ghost_tpu.utils.quality import (id_similarity, perceptual_distance,
                                         psnr)

    rng = np.random.default_rng(0)
    arc = IResNet(layers=(1, 1, 1, 1), policy=FULL_PRECISION)
    v = arc.init(jax.random.key(0), jnp.zeros((1, 112, 112, 3)))
    arc_apply = lambda x: arc.apply(v, x)

    a = jnp.asarray(rng.uniform(-1, 1, (2, 112, 112, 3)).astype(np.float32))
    sim_self = np.asarray(id_similarity(arc_apply, a, a))
    np.testing.assert_allclose(sim_self, 1.0, atol=1e-5)

    u8 = (np.asarray(a) * 127.5 + 127.5).astype(np.uint8)
    assert float(psnr(jnp.asarray(u8), jnp.asarray(u8))[0]) > 80.0
    noisy = np.clip(u8.astype(np.int32) + 10, 0, 255).astype(np.uint8)
    assert float(psnr(jnp.asarray(u8), jnp.asarray(noisy))[0]) < 40.0

    feats = lambda x: [x, x[:, ::2, ::2]]  # stand-in feature pyramid
    d_same = np.asarray(perceptual_distance(feats, a, a))
    d_diff = np.asarray(perceptual_distance(feats, a, -a))
    assert np.all(d_same < 1e-6) and np.all(d_diff > d_same + 1e-3)
