"""2d106det landmark net: the reference's EXACT MXNet topology.

The reference's 106-point landmarker is insightface's `2d106det` MXNet
model (reference coordinate_reg/image_infer.py:96-141); its symbol
graph ships in the repo (coordinate_reg/model/2d106det-symbol.json, 259
nodes) while the .params blob is in .MISSING_LARGE_BLOBS. This module
reproduces the symbol graph structurally — verified node-for-node by
tests/test_landmark_mxnet.py parsing the mounted JSON — so the day real
params appear the converter below is mechanical:

  (x - 127.5) * 0.0078125
  conv_1: 3x3 s2 f16 + BN(fix_gamma) + PReLU            192 -> 96
  conv_2..14: depthwise 3x3 (+BN+PReLU) then pointwise 1x1 (+BN+PReLU)
      filters 16/32, 32/64, 64/64, 64/128, 128/128, 128/256 x6, 256/512,
      512/512; strides 2 at conv_3, conv_5, conv_7, conv_13   96 -> 6
  conv_15: 3x3 s2 pad1 f64 + BN + PReLU                       6 -> 3
  Flatten -> FC 212  (decode: (p + 1) * 96, image_infer.py:147-151)

Round-3 note: conv_15's pad=(1,1) (-> 3x3 spatial, FC in-dim 576) was
initially mis-transcribed as pad 0; the conv plan now carries padding
and the graph-interpreter round-trip test
(tests/test_mxnet_roundtrip.py) executes the mounted symbol JSON
directly, so topology errors of this kind can't survive.

MXNet BatchNorm semantics: eps defaults to 1e-3 and fix_gamma=True
freezes gamma at 1 (the stored gamma is ignored).
"""

from __future__ import annotations

import json
from typing import Any, Dict, List, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ghost_tpu.core.precision import Policy, DEFAULT_POLICY
from ghost_tpu.nn.layers import BatchNorm, Conv, PReLU

# (dw_filters, pw_filters, dw_stride) for conv_2..conv_14
_PAIRS: Tuple[Tuple[int, int, int], ...] = (
    (16, 32, 1), (32, 64, 2), (64, 64, 1), (64, 128, 2), (128, 128, 1),
    (128, 256, 2), (256, 256, 1), (256, 256, 1), (256, 256, 1),
    (256, 256, 1), (256, 256, 1), (256, 512, 2), (512, 512, 1),
)


def conv_plan() -> List[Tuple[str, Tuple[int, int], int, int, int, int]]:
    """[(name, kernel, stride, pad, filters, groups)] — the full
    Convolution sequence of the symbol graph, for the structure test."""
    plan = [("conv_1_conv2d", (3, 3), 2, 1, 16, 1)]
    for i, (dw, pw, s) in enumerate(_PAIRS, start=2):
        plan.append((f"conv_{i}_dw_conv2d", (3, 3), s, 1, dw, dw))
        plan.append((f"conv_{i}_conv2d", (1, 1), 1, 0, pw, 1))
    plan.append(("conv_15_conv2d", (3, 3), 2, 1, 64, 1))
    return plan


def parse_symbol_plan(path: str):
    """Extract the same plan from an MXNet symbol JSON."""
    nodes = json.load(open(path))["nodes"]
    plan = []
    for n in nodes:
        if n["op"] == "Convolution":
            a = n["attrs"]
            plan.append((
                n["name"],
                tuple(int(x) for x in a["kernel"].strip("()").split(",")),
                int(a["stride"].strip("()").split(",")[0]),
                int(a.get("pad", "(0, 0)").strip("()").split(",")[0]),
                int(a["num_filter"]),
                int(a["num_group"]),
            ))
    return plan


class _ConvBlock(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    padding: int = 1
    groups: int = 1
    policy: Policy = DEFAULT_POLICY
    train: bool = False

    @nn.compact
    def __call__(self, x):
        cd = self.policy.compute_dtype
        pd = self.policy.param_dtype
        x = Conv(self.features, self.kernel, self.stride,
                 padding=self.padding, use_bias=False,
                 feature_group_count=self.groups, dtype=cd, param_dtype=pd,
                 name="conv")(x)
        # MXNet BatchNorm: eps 1e-3; fix_gamma=True -> scale frozen at 1
        x = BatchNorm(use_running_average=not self.train, epsilon=1e-3,
                      use_scale=False, dtype=cd, param_dtype=pd,
                      name="bn")(x)
        return PReLU(param_dtype=pd, name="act")(x)


class Landmark106Det(nn.Module):
    """(B,192,192,3) raw-pixel RGB -> (B,106,2) raw net coords (decode
    with (p+1)*96 like image_infer.py:147-151)."""

    policy: Policy = DEFAULT_POLICY
    train: bool = False

    @nn.compact
    def __call__(self, x):
        cd = self.policy.compute_dtype
        x = (x.astype(cd) - 127.5) * 0.0078125
        x = _ConvBlock(16, 3, 2, 1, 1, self.policy, self.train,
                       name="conv_1")(x)
        for i, (dw, pw, s) in enumerate(_PAIRS, start=2):
            x = _ConvBlock(dw, 3, s, 1, dw, self.policy, self.train,
                           name=f"conv_{i}_dw")(x)
            x = _ConvBlock(pw, 1, 1, 0, 1, self.policy, self.train,
                           name=f"conv_{i}")(x)
        x = _ConvBlock(64, 3, 2, 1, 1, self.policy, self.train,
                       name="conv_15")(x)
        x = x.reshape(x.shape[0], -1).astype(jnp.float32)
        x = nn.Dense(212, dtype=jnp.float32,
                     param_dtype=self.policy.param_dtype, name="fc1")(x)
        return x.reshape(-1, 106, 2)


def convert_2d106det_params(params: Dict[str, np.ndarray],
                            aux: Dict[str, np.ndarray] | None = None):
    """MXNet arg/aux dict -> Landmark106Det variables.

    Accepts either a single dict with 'arg:'/'aux:' prefixed keys (the
    mx.nd.load layout) or separate arg/aux dicts. MXNet conv weights
    are (O, I/g, kh, kw); flax grouped convs want (kh, kw, I/g, O)."""
    if aux is None:
        arg = {k.split(":", 1)[1]: v for k, v in params.items()
               if k.startswith("arg:")}
        aux = {k.split(":", 1)[1]: v for k, v in params.items()
               if k.startswith("aux:")}
        if not arg:
            arg = dict(params)
    else:
        arg = dict(params)

    p: Dict[str, Any] = {}
    s: Dict[str, Any] = {}

    def block(flax_name, mx_conv, mx_bn, mx_act):
        p[flax_name] = {
            "conv": {"Conv_0": {
                "kernel": np.transpose(arg[f"{mx_conv}_weight"], (2, 3, 1, 0))
            }},
            "bn": {"BatchNorm_0": {"bias": arg[f"{mx_bn}_beta"]}},
            "act": {"alpha": arg[f"{mx_act}_gamma"].reshape(-1)},
        }
        s[flax_name] = {"bn": {"BatchNorm_0": {
            "mean": aux[f"{mx_bn}_moving_mean"],
            "var": aux[f"{mx_bn}_moving_var"],
        }}}

    block("conv_1", "conv_1_conv2d", "conv_1_batchnorm", "conv_1_relu")
    for i in range(2, 15):
        block(f"conv_{i}_dw", f"conv_{i}_dw_conv2d",
              f"conv_{i}_dw_batchnorm", f"conv_{i}_dw_relu")
        block(f"conv_{i}", f"conv_{i}_conv2d",
              f"conv_{i}_batchnorm", f"conv_{i}_relu")
    block("conv_15", "conv_15_conv2d", "conv_15_batchnorm", "conv_15_relu")
    # MXNet Flatten runs over NCHW -> the FC input dim is ordered
    # (C=64, H=3, W=3); our NHWC reshape orders it (H, W, C)
    w = arg["fc1_weight"].reshape(212, 64, 3, 3)
    w = np.transpose(w, (0, 2, 3, 1)).reshape(212, -1)
    p["fc1"] = {"kernel": np.transpose(w, (1, 0)), "bias": arg["fc1_bias"]}
    return {"params": p, "batch_stats": s}
