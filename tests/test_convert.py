"""Converter tests: synthetic torch state_dicts -> our pytrees.

Real reference checkpoints aren't shipped with the repo, so we build
state_dicts with the reference's exact parameter names/shapes and
verify (a) the converted tree matches model.init structure+shapes leaf
for leaf, and (b) the AAD gamma/beta fusion is numerically exact
against the reference formula computed directly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ghost_tpu.core.precision import FULL_PRECISION
from ghost_tpu.convert.torch_loader import (
    convert_aei_state_dict,
    convert_arcface_state_dict,
)
from ghost_tpu.models.aei import AADLayer, AEINet
from ghost_tpu.models.arcface import IResNet


def _rand(rng, *shape):
    return rng.standard_normal(shape, dtype=np.float32) * 0.05


def _bn_entries(rng, sd, name, ch):
    sd[f"{name}.weight"] = _rand(rng, ch) + 1.0
    sd[f"{name}.bias"] = _rand(rng, ch)
    sd[f"{name}.running_mean"] = _rand(rng, ch)
    sd[f"{name}.running_var"] = np.abs(_rand(rng, ch)) + 1.0


def _aad_entries(rng, sd, prefix, c_x, c_attr, c_id=512):
    sd[f"{prefix}.conv1.weight"] = _rand(rng, c_x, c_attr, 1, 1)
    sd[f"{prefix}.conv1.bias"] = _rand(rng, c_x)
    sd[f"{prefix}.conv2.weight"] = _rand(rng, c_x, c_attr, 1, 1)
    sd[f"{prefix}.conv2.bias"] = _rand(rng, c_x)
    sd[f"{prefix}.fc1.weight"] = _rand(rng, c_x, c_id)
    sd[f"{prefix}.fc1.bias"] = _rand(rng, c_x)
    sd[f"{prefix}.fc2.weight"] = _rand(rng, c_x, c_id)
    sd[f"{prefix}.fc2.bias"] = _rand(rng, c_x)
    sd[f"{prefix}.conv_h.weight"] = _rand(rng, 1, c_x, 1, 1)
    sd[f"{prefix}.conv_h.bias"] = _rand(rng, 1)


def make_aei_unet_state_dict(rng, num_blocks=2):
    sd = {}
    down = [(3, 32), (32, 64), (64, 128), (128, 256), (256, 512), (512, 1024),
            (1024, 1024)]
    for i, (cin, cout) in enumerate(down, 1):
        sd[f"encoder.conv{i}.0.weight"] = _rand(rng, cout, cin, 4, 4)
        _bn_entries(rng, sd, f"encoder.conv{i}.1", cout)
    up = [(1024, 1024), (2048, 512), (1024, 256), (512, 128), (256, 64), (128, 32)]
    for i, (cin, cout) in enumerate(up, 1):
        sd[f"encoder.deconv{i}.deconv.weight"] = _rand(rng, cin, cout, 4, 4)
        _bn_entries(rng, sd, f"encoder.deconv{i}.bn", cout)

    sd["generator.up1.weight"] = _rand(rng, 512, 1024, 2, 2)
    sd["generator.up1.bias"] = _rand(rng, 1024)
    cin_l = (1024, 1024, 1024, 1024, 512, 256, 128, 64)
    cout_l = (1024, 1024, 1024, 512, 256, 128, 64, 3)
    cattr_l = (1024, 2048, 1024, 512, 256, 128, 64, 64)
    for k in range(8):
        cin, cout, cattr = cin_l[k], cout_l[k], cattr_l[k]
        pre = f"generator.AADBlk{k + 1}"
        for b in range(num_blocks):
            out_ch = cin if b < num_blocks - 1 else cout
            _aad_entries(rng, sd, f"{pre}.add_blocks.{3 * b}", cin, cattr)
            sd[f"{pre}.add_blocks.{3 * b + 2}.weight"] = _rand(rng, out_ch, cin, 3, 3)
        if cin != cout:
            _aad_entries(rng, sd, f"{pre}.last_add_block.0", cin, cattr)
            sd[f"{pre}.last_add_block.2.weight"] = _rand(rng, cout, cin, 3, 3)
    return sd


def tree_shapes(tree):
    return jax.tree.map(lambda x: tuple(x.shape), tree)


def test_aei_converter_structure(rng):
    sd = make_aei_unet_state_dict(rng)
    converted = convert_aei_state_dict(sd, backbone="unet", num_blocks=2)

    model = AEINet(backbone="unet", num_blocks=2, policy=FULL_PRECISION)
    ref_vars = jax.eval_shape(
        model.init,
        jax.random.key(0),
        jnp.zeros((1, 256, 256, 3)),
        jnp.zeros((1, 512)),
    )
    ref_shapes = tree_shapes({"params": ref_vars["params"],
                              "batch_stats": ref_vars["batch_stats"]})
    got_shapes = tree_shapes(converted)
    assert ref_shapes == got_shapes


def test_aei_converted_forward_runs(rng):
    sd = make_aei_unet_state_dict(rng)
    variables = jax.tree.map(jnp.asarray, convert_aei_state_dict(sd))
    model = AEINet(backbone="unet", num_blocks=2, policy=FULL_PRECISION)
    y, attrs = model.apply(variables, jnp.zeros((1, 256, 256, 3)),
                           jnp.zeros((1, 512)))
    assert y.shape == (1, 256, 256, 3)
    assert np.isfinite(np.asarray(y)).all()


def make_arcface_state_dict(rng, layers=(1, 1, 1, 1)):
    sd = {}
    sd["conv1.weight"] = _rand(rng, 64, 3, 3, 3)
    _bn_entries(rng, sd, "bn1", 64)
    sd["prelu.weight"] = _rand(rng, 64) + 0.25
    inplanes = 64
    for stage, (planes, n) in enumerate(zip((64, 128, 256, 512), layers), 1):
        for b in range(n):
            t = f"layer{stage}.{b}"
            _bn_entries(rng, sd, f"{t}.bn1", inplanes if b == 0 else planes)
            sd[f"{t}.conv1.weight"] = _rand(rng, planes,
                                            inplanes if b == 0 else planes, 3, 3)
            _bn_entries(rng, sd, f"{t}.bn2", planes)
            sd[f"{t}.prelu.weight"] = _rand(rng, planes) + 0.25
            sd[f"{t}.conv2.weight"] = _rand(rng, planes, planes, 3, 3)
            _bn_entries(rng, sd, f"{t}.bn3", planes)
            if b == 0:
                sd[f"{t}.downsample.0.weight"] = _rand(rng, planes, inplanes, 1, 1)
                _bn_entries(rng, sd, f"{t}.downsample.1", planes)
        inplanes = planes
    _bn_entries(rng, sd, "bn2", 512)
    sd["fc.weight"] = _rand(rng, 512, 512 * 7 * 7)
    sd["fc.bias"] = _rand(rng, 512)
    _bn_entries(rng, sd, "features", 512)
    return sd


def test_arcface_converter_structure(rng):
    sd = make_arcface_state_dict(rng)
    converted = convert_arcface_state_dict(sd, layers=(1, 1, 1, 1))
    model = IResNet(layers=(1, 1, 1, 1), policy=FULL_PRECISION)
    ref_vars = jax.eval_shape(model.init, jax.random.key(0),
                              jnp.zeros((1, 112, 112, 3)))
    assert tree_shapes({"params": ref_vars["params"],
                        "batch_stats": ref_vars["batch_stats"]}) == tree_shapes(converted)
    # and it runs
    variables = jax.tree.map(jnp.asarray, converted)
    e = model.apply(variables, jnp.zeros((2, 112, 112, 3)))
    assert e.shape == (2, 512)


def test_aad_fusion_numerics(rng):
    """Fused attr_gb/id_gb AADLayer == the reference formula
    out = (1-M)*(ga*IN(h)+ba) + M*(gi*IN(h)+bi), M = sigmoid(conv_h(IN(h)))
    (reference network/AADLayer.py:20-38), with gamma/beta from separate
    1x1 convs / FCs."""
    c_x, c_attr, c_id, hw = 8, 6, 12, 5
    sd = {}
    _aad_entries(rng, sd, "L", c_x, c_attr, c_id)

    h = rng.standard_normal((2, hw, hw, c_x), dtype=np.float32)
    z_attr = rng.standard_normal((2, hw, hw, c_attr), dtype=np.float32)
    z_id = rng.standard_normal((2, c_id), dtype=np.float32)

    # direct formula in numpy (NHWC)
    mean = h.mean(axis=(1, 2), keepdims=True)
    var = ((h - mean) ** 2).mean(axis=(1, 2), keepdims=True)
    hn = (h - mean) / np.sqrt(var + 1e-5)
    ga = np.einsum("bhwc,oc->bhwo", z_attr, sd["L.conv1.weight"][:, :, 0, 0]) + sd["L.conv1.bias"]
    ba = np.einsum("bhwc,oc->bhwo", z_attr, sd["L.conv2.weight"][:, :, 0, 0]) + sd["L.conv2.bias"]
    gi = (z_id @ sd["L.fc1.weight"].T + sd["L.fc1.bias"])[:, None, None, :]
    bi = (z_id @ sd["L.fc2.weight"].T + sd["L.fc2.bias"])[:, None, None, :]
    m = 1 / (1 + np.exp(-(np.einsum("bhwc,oc->bhwo", hn, sd["L.conv_h.weight"][:, :, 0, 0]) + sd["L.conv_h.bias"])))
    ref = (1 - m) * (ga * hn + ba) + m * (gi * hn + bi)

    from ghost_tpu.convert.torch_loader import _aad_layer

    params = jax.tree.map(jnp.asarray, _aad_layer(sd, "L"))
    layer = AADLayer(c_x=c_x, policy=FULL_PRECISION)
    out = layer.apply({"params": params}, jnp.asarray(h), jnp.asarray(z_attr),
                      jnp.asarray(z_id))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)
