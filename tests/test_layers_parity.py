"""Golden-reference parity: each NN primitive vs torch CPU.

This is the rebuild's version of the reference's kernel-vs-framework
golden tests (reference apex/apex/contrib/test/*): fixed seeds, allclose
with dtype tolerance. Passing here means converted PyTorch weights will
reproduce reference activations through our NHWC layers.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as TF

from ghost_tpu import nn as gnn

TOL = dict(rtol=1e-4, atol=1e-5)


def nchw(x_nhwc: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(np.ascontiguousarray(x_nhwc.transpose(0, 3, 1, 2)))


def to_nhwc(t: torch.Tensor) -> np.ndarray:
    return t.detach().numpy().transpose(0, 2, 3, 1)


@pytest.mark.parametrize("k,s,p", [(4, 2, 1), (3, 1, 1), (1, 1, 0), (7, 2, 3)])
def test_conv_parity(rng, k, s, p):
    x = rng.standard_normal((2, 16, 16, 5), dtype=np.float32)
    w = rng.standard_normal((7, 5, k, k), dtype=np.float32) * 0.1
    b = rng.standard_normal(7, dtype=np.float32)

    ref = TF.conv2d(nchw(x), torch.from_numpy(w), torch.from_numpy(b), stride=s, padding=p)

    conv = gnn.Conv(features=7, kernel_size=k, stride=s, padding=p)
    params = {"params": {"Conv_0": {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
                                    "bias": jnp.asarray(b)}}}
    out = conv.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), to_nhwc(ref), **TOL)


@pytest.mark.parametrize("k,s,p", [(4, 2, 1), (2, 1, 0), (3, 2, 1)])
def test_conv_transpose_parity(rng, k, s, p):
    x = rng.standard_normal((2, 8, 8, 6), dtype=np.float32)
    w = rng.standard_normal((6, 4, k, k), dtype=np.float32) * 0.1  # torch (cin,cout,kh,kw)
    b = rng.standard_normal(4, dtype=np.float32)

    ref = TF.conv_transpose2d(nchw(x), torch.from_numpy(w), torch.from_numpy(b),
                              stride=s, padding=p)

    mod = gnn.ConvTranspose(features=4, kernel_size=k, stride=s, padding=p)
    params = {"params": {"kernel": jnp.asarray(w.transpose(2, 3, 0, 1)),
                         "bias": jnp.asarray(b)}}
    out = mod.apply(params, jnp.asarray(x))
    assert out.shape[1] == (8 - 1) * s - 2 * p + k
    np.testing.assert_allclose(np.asarray(out), to_nhwc(ref), **TOL)


def test_instance_norm_parity(rng):
    x = rng.standard_normal((3, 10, 12, 8), dtype=np.float32)
    ref = TF.instance_norm(nchw(x), eps=1e-5)
    out = gnn.instance_norm(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), to_nhwc(ref), **TOL)


def test_rms_instance_norm_parity(rng):
    x = rng.standard_normal((2, 6, 6, 4), dtype=np.float32)
    t = nchw(x)
    ref = t * torch.rsqrt(torch.mean(t * t, (2, 3), True) + 1e-8)
    out = gnn.rms_instance_norm(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), to_nhwc(ref), **TOL)


def test_batch_norm_train_parity(rng):
    x = rng.standard_normal((4, 8, 8, 5), dtype=np.float32)
    gamma = rng.standard_normal(5, dtype=np.float32)
    beta = rng.standard_normal(5, dtype=np.float32)

    bn_t = torch.nn.BatchNorm2d(5)
    with torch.no_grad():
        bn_t.weight.copy_(torch.from_numpy(gamma))
        bn_t.bias.copy_(torch.from_numpy(beta))
    bn_t.train()
    ref = bn_t(nchw(x))

    mod = gnn.BatchNorm(use_running_average=False)
    variables = {
        "params": {"BatchNorm_0": {"scale": jnp.asarray(gamma), "bias": jnp.asarray(beta)}},
        "batch_stats": {"BatchNorm_0": {"mean": jnp.zeros(5), "var": jnp.ones(5)}},
    }
    out, updates = mod.apply(variables, jnp.asarray(x), mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out), to_nhwc(ref), rtol=1e-3, atol=1e-4)
    # running stats update (torch momentum .1 == flax momentum .9, torch uses
    # unbiased var for the running estimate)
    np.testing.assert_allclose(
        np.asarray(updates["batch_stats"]["BatchNorm_0"]["mean"]),
        bn_t.running_mean.numpy(), rtol=1e-3, atol=1e-4)


def test_prelu_parity(rng):
    x = rng.standard_normal((2, 4, 4, 3), dtype=np.float32)
    a = rng.random(3, dtype=np.float32)
    ref = TF.prelu(nchw(x), torch.from_numpy(a))
    mod = gnn.PReLU()
    out = mod.apply({"params": {"alpha": jnp.asarray(a)}}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), to_nhwc(ref), **TOL)


@pytest.mark.parametrize("align", [True, False])
@pytest.mark.parametrize("size", [(16, 16), (7, 9), (3, 3)])
def test_bilinear_resize_parity(rng, align, size):
    x = rng.standard_normal((2, 8, 8, 3), dtype=np.float32)
    ref = TF.interpolate(nchw(x), size=size, mode="bilinear", align_corners=align)
    out = gnn.resize(jnp.asarray(x), size, method="bilinear", align_corners=align)
    np.testing.assert_allclose(np.asarray(out), to_nhwc(ref), **TOL)


def test_bilinear_scale_factor_parity(rng):
    x = rng.standard_normal((1, 5, 5, 2), dtype=np.float32)
    ref = TF.interpolate(nchw(x), scale_factor=2, mode="bilinear", align_corners=True)
    out = gnn.resize_like_torch(jnp.asarray(x), 2.0, align_corners=True)
    np.testing.assert_allclose(np.asarray(out), to_nhwc(ref), **TOL)
    ref = TF.interpolate(nchw(x), scale_factor=0.5, mode="bilinear", align_corners=True)
    out = gnn.resize_like_torch(jnp.asarray(x), 0.5, align_corners=True)
    np.testing.assert_allclose(np.asarray(out), to_nhwc(ref), **TOL)


@pytest.mark.parametrize("size", [(112, 112), (128, 128), (4, 4)])
def test_area_resize_parity(rng, size):
    x = rng.standard_normal((2, 256, 256, 3), dtype=np.float32)
    ref = TF.interpolate(nchw(x), size=size, mode="area")
    out = gnn.resize(jnp.asarray(x), size, method="area")
    np.testing.assert_allclose(np.asarray(out), to_nhwc(ref), rtol=1e-3, atol=1e-4)


def test_avg_pool_parity(rng):
    x = rng.standard_normal((2, 15, 17, 4), dtype=np.float32)
    ref = torch.nn.AvgPool2d(3, stride=2, padding=1, count_include_pad=False)(nchw(x))
    out = gnn.avg_pool_3x3s2(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), to_nhwc(ref), **TOL)


def test_leaky_relu_parity(rng):
    x = rng.standard_normal((2, 4, 4, 3), dtype=np.float32)
    for slope in (0.1, 0.2):
        ref = TF.leaky_relu(nchw(x), slope)
        out = gnn.leaky_relu(jnp.asarray(x), slope)
        np.testing.assert_allclose(np.asarray(out), to_nhwc(ref), **TOL)


def test_conv3x3_wpack_exact_and_grads():
    """The width-packed 3x3 lowering (nn/layers._Conv3x3WPack) is
    bit-level exact vs the plain conv (same params, same padding
    semantics) in forward AND parameter gradients, at a gated shape
    (cin<=64, W>=256, 'same' 3x3)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ghost_tpu.nn import layers

    mod = layers.Conv(24, 3, 1, padding=1, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (1, 8, 256, 16)).astype(np.float32))
    variables = mod.init(jax.random.key(0), x)
    # the packed path must expose the identical param tree
    k = variables["params"]["Conv_0"]["kernel"]
    assert k.shape == (3, 3, 16, 24)

    def run(flag):
        old = layers.CONV3X3_WPACK
        layers.CONV3X3_WPACK = flag
        try:
            def loss(v, x):
                return jnp.sum(jnp.tanh(mod.apply(v, x)))

            y = mod.apply(variables, x)
            g = jax.grad(loss)(variables, x)
            return np.asarray(y), g
        finally:
            layers.CONV3X3_WPACK = old

    y_ref, g_ref = run(False)
    y_pk, g_pk = run(True)
    np.testing.assert_allclose(y_pk, y_ref, rtol=1e-5, atol=1e-5)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_pk)):
        # f32 accumulation-order noise in the conv VJP (measured max
        # 4e-5 abs on O(50) grads)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-3, atol=1e-4)


def test_conv3x3_wpack_gating():
    """Ungated shapes (odd W, tiny cin, stride 2) fall through to the
    plain conv: apply works and matches the flag-off path."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ghost_tpu.nn import layers

    rng = np.random.default_rng(1)
    for shape, kwargs in [
        ((1, 4, 255, 16), dict(kernel_size=3, padding=1)),   # odd W
        ((1, 4, 256, 3), dict(kernel_size=3, padding=1)),    # cin < 8
        ((1, 4, 256, 16), dict(kernel_size=3, stride=2, padding=1)),
    ]:
        mod = layers.Conv(8, dtype=jnp.float32, **kwargs)
        x = jnp.asarray(rng.normal(0, 1, shape).astype(np.float32))
        v = mod.init(jax.random.key(0), x)
        old = layers.CONV3X3_WPACK
        try:
            layers.CONV3X3_WPACK = False
            y_off = mod.apply(v, x)
            layers.CONV3X3_WPACK = True
            y_on = mod.apply(v, x)
        finally:
            layers.CONV3X3_WPACK = old
        np.testing.assert_allclose(np.asarray(y_on), np.asarray(y_off),
                                   rtol=0, atol=0)
