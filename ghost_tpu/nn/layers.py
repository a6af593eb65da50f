"""Torch-parity primitive layers in NHWC, built for the MXU.

Every model family in the reference is assembled from the same few
primitives: 4x4 stride-2 convs, 4x4 stride-2 transposed convs, batch /
instance norm, leaky relu / prelu, and bilinear or area interpolation
(reference network/AEI_Net.py:19-41, arcface iresnet, SCRFD, SPADE).
This module provides those primitives with *bit-matching semantics* so
that converted PyTorch weights reproduce reference outputs, while the
layout (NHWC, channels-last) and dtype policy (bf16 compute / f32
params) are TPU-native. Parity is locked in by tests/test_layers_parity.py
which compares each primitive against torch CPU.

Design notes:
  * convs use jax.lax via flax.linen.Conv with explicit per-edge padding
    (torch 'padding=N' == ((N,N),(N,N)));
  * transposed conv is expressed as an input-dilated correlation with a
    spatially-flipped kernel — the exact algebraic equivalent of
    torch.nn.ConvTranspose2d(k, s, p) — so XLA lowers it to a single MXU
    convolution instead of scatter;
  * resize is a separable gather (two 1-D interpolations); 'area' mode
    uses a precomputed (out, in) overlap matrix applied as an einsum,
    which the MXU eats for free.
"""

from __future__ import annotations

import functools
from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np
from jax import lax

# ---------------------------------------------------------------------------
# Convolutions
# ---------------------------------------------------------------------------

# module-level toggle (checked at trace time) for the 1x1-conv einsum
# lowering — lets A/B profiling scripts flip lowerings between jits
CONV1X1_EINSUM = True

# toggle for the width-packed 3x3 lowering at narrow channel counts
# (see _Conv3x3WPack). Default OFF: the isolated chained win (1.55x at
# blk8's 64ch@256^2 shape, scripts/profile_wpack.py) does NOT survive
# inside the full generator program (same-process A/B 127.6 vs
# 128.7-131.6 ms, scripts/profile_wpack_gen.py) — XLA's fusion of the
# surrounding AAD elementwise work already hides the half-empty-lane
# cost the isolated measurement exposes.
CONV3X3_WPACK = False


class _Conv1x1Einsum(nn.Module):
    """1x1 conv lowered as a channel einsum (plain MXU matmul).

    XLA's conv lowering for 1x1 kernels at small channel counts pays
    layout/im2col overhead a dot does not (measured ~3x net on v5e for
    64->128 @256^2, scripts/profile_conv.py). Param tree is identical
    to nn.Conv — (1,1,cin,cout) "kernel" + (cout,) "bias" — so weight
    converters and checkpoints are unaffected."""

    features: int
    use_bias: bool = True
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.xavier_normal(),
            (1, 1, cin, self.features), self.param_dtype)
        y = jnp.einsum("bhwc,cd->bhwd", x.astype(self.dtype),
                       kernel[0, 0].astype(self.dtype))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), self.param_dtype)
            y = y + bias.astype(self.dtype)
        return y


class _Conv3x3WPack(nn.Module):
    """3x3 stride-1 'same' conv lowered over a width-packed layout.

    At C<=64 the 128-wide vector lanes run half empty and the conv sits
    4-8x off the HBM roof (measured: 64ch@256^2 ~9 ms/op chained vs
    2.8 ms for the equal-FLOP 128ch@128^2, scripts/profile_wpack.py).
    Packing width phases into channels — X[b,i,jp,ph*C+c] =
    x[b,i,2jp+ph,c], a pure reshape — turns the op into an EXACT conv3x3
    over (B,H,W/2,2C) with a packed kernel assembled from the same
    (3,3,cin,cout) parameter at trace time:

      y[2j]   = k0·X1[j-1] + k1·X0[j] + k2·X1[j]   (out block 0)
      y[2j+1] = k0·X0[j]   + k1·X1[j] + k2·X0[j+1] (out block 1)

    2x the MACs (half the packed kernel is structurally zero) but full
    lanes: measured 1.55x faster at blk8's shape in isolation (5.8 vs
    9.0 ms/op chained, same process) yet NEUTRAL inside the full AEI
    forward (see CONV3X3_WPACK above) — kept OFF by default as a
    documented negative result. Param tree identical to nn.Conv, so
    converters and checkpoints are unaffected; autodiff flows through
    the assembly, so the lowering is train-safe.
    """

    features: int
    use_bias: bool = True
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, cin = x.shape
        cout = self.features
        kernel = self.param(
            "kernel", nn.initializers.xavier_normal(),
            (3, 3, cin, self.features), self.param_dtype)
        k = kernel.astype(self.dtype)
        z = jnp.zeros_like(k[:, 0])  # (3, cin, cout)

        def blk(i0o0, i0o1, i1o0, i1o1):
            return jnp.concatenate(
                [jnp.concatenate([i0o0, i0o1], -1),
                 jnp.concatenate([i1o0, i1o1], -1)], -2)

        kp = jnp.stack([
            blk(z, z, k[:, 0], z),                       # packed w-offset -1
            blk(k[:, 1], k[:, 0], k[:, 2], k[:, 1]),     # packed w-offset 0
            blk(z, k[:, 2], z, z),                       # packed w-offset +1
        ], axis=1)  # (3, 3, 2cin, 2cout)

        xp = x.astype(self.dtype).reshape(b, h, w // 2, 2 * cin)
        y = lax.conv_general_dilated(
            xp, kp, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = y.reshape(b, h, w, cout)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), self.param_dtype)
            y = y + bias.astype(self.dtype)
        return y


class Conv(nn.Module):
    """NHWC conv with torch Conv2d semantics (explicit symmetric padding).

    Kernel layout (kh, kw, cin, cout); converters map torch (cout, cin,
    kh, kw) via transpose(2, 3, 1, 0).
    """

    features: int
    kernel_size: int | Sequence[int] = 3
    stride: int | Sequence[int] = 1
    padding: int | Sequence[int] = 0
    use_bias: bool = True
    feature_group_count: int = 1
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        ks = (
            (self.kernel_size, self.kernel_size)
            if isinstance(self.kernel_size, int)
            else tuple(self.kernel_size)
        )
        st = (self.stride, self.stride) if isinstance(self.stride, int) else tuple(self.stride)
        pd = (self.padding, self.padding) if isinstance(self.padding, int) else tuple(self.padding)
        if (CONV1X1_EINSUM and ks == (1, 1) and st == (1, 1) and pd == (0, 0)
                and self.feature_group_count == 1 and x.ndim == 4):
            return _Conv1x1Einsum(
                self.features, self.use_bias, self.dtype, self.param_dtype,
                name="Conv_0")(x)
        if (CONV3X3_WPACK and ks == (3, 3) and st == (1, 1) and pd == (1, 1)
                and self.feature_group_count == 1 and x.ndim == 4
                and 8 <= x.shape[-1] <= 64 and x.shape[2] % 2 == 0
                and x.shape[2] >= 256):
            return _Conv3x3WPack(
                self.features, self.use_bias, self.dtype, self.param_dtype,
                name="Conv_0")(x)
        return nn.Conv(
            features=self.features,
            kernel_size=ks,
            strides=st,
            padding=((pd[0], pd[0]), (pd[1], pd[1])),
            use_bias=self.use_bias,
            feature_group_count=self.feature_group_count,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            kernel_init=nn.initializers.xavier_normal(),
        )(x)


class ConvTranspose(nn.Module):
    """Torch ConvTranspose2d(k, s, p) parity in NHWC.

    output_size = (in - 1) * s - 2p + k.  Implemented as correlation of
    the stride-dilated input (lhs_dilation = s) padded by (k - 1 - p)
    with the spatially flipped kernel — algebraically identical to the
    torch op, but a single dense conv for the MXU.

    Kernel layout (kh, kw, cin, cout); converters map torch
    (cin, cout, kh, kw) via transpose(2, 3, 0, 1) (no flip — the flip
    happens here at apply time).
    """

    features: int
    kernel_size: int = 4
    stride: int = 2
    padding: int = 1
    use_bias: bool = True
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        k, s, p = self.kernel_size, self.stride, self.padding
        cin = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.xavier_normal(),
            (k, k, cin, self.features),
            self.param_dtype,
        )
        kernel = jnp.flip(kernel, axis=(0, 1)).astype(self.dtype)
        x = x.astype(self.dtype)
        pad = k - 1 - p
        y = lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(1, 1),
            padding=((pad, pad), (pad, pad)),
            lhs_dilation=(s, s),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), self.param_dtype
            )
            y = y + bias.astype(self.dtype)
        return y


class Dense(nn.Module):
    """Torch Linear parity; converters transpose torch (out, in)."""

    features: int
    use_bias: bool = True
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Dense(
            features=self.features,
            use_bias=self.use_bias,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(x)


# ---------------------------------------------------------------------------
# Normalization
# ---------------------------------------------------------------------------


class BatchNorm(nn.Module):
    """Torch BatchNorm2d parity (momentum 0.1 ⇒ flax momentum 0.9).

    When `axis_name` is set and the module runs inside a mapped/sharded
    train step, batch statistics are averaged across that mesh axis —
    the TPU-native SyncBatchNorm (reference
    apex/apex/parallel/sync_batchnorm.py:9 and
    models/networks/sync_batchnorm/batchnorm.py:57 collapse to this one
    argument; no master-slave pipes or welford CUDA kernels needed).
    """

    use_running_average: bool = True
    momentum: float = 0.9
    epsilon: float = 1e-5
    use_scale: bool = True
    use_bias: bool = True
    axis_name: str | None = None
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, use_running_average: bool | None = None):
        return nn.BatchNorm(
            use_running_average=(
                self.use_running_average
                if use_running_average is None
                else use_running_average
            ),
            momentum=self.momentum,
            epsilon=self.epsilon,
            use_scale=self.use_scale,
            use_bias=self.use_bias,
            axis_name=self.axis_name,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(x)


def instance_norm(x, eps: float = 1e-5):
    """Torch InstanceNorm2d(affine=False) parity: per-sample per-channel,
    biased variance over H, W (reference network/AADLayer.py:16,24).

    Statistics accumulate in f32 regardless of input dtype, but the
    full-size tensors stay in the INPUT dtype — for bf16 activations
    this halves the HBM traffic of the hot AAD normalizations (the
    generator is bandwidth-bound) versus casting the whole tensor up.
    For f32 inputs the math is bit-identical to the naive form."""
    mean = jnp.mean(x, axis=(1, 2), keepdims=True, dtype=jnp.float32)
    xc = x - mean.astype(x.dtype)
    var = jnp.mean(jnp.square(xc), axis=(1, 2), keepdims=True,
                   dtype=jnp.float32)
    return xc * lax.rsqrt(var + eps).astype(x.dtype)


def rms_instance_norm(x, eps: float = 1e-8):
    """SPADE's custom mean-free InstanceNorm2d: x * rsqrt(mean(x^2)+eps)
    (reference models/networks/normalization.py:51-60)."""
    ms = jnp.mean(jnp.square(x), axis=(1, 2), keepdims=True)
    return x * lax.rsqrt(ms + eps)


class PReLU(nn.Module):
    """Torch PReLU parity (per-channel slope, init 0.25)."""

    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        alpha = self.param(
            "alpha",
            nn.initializers.constant(0.25),
            (x.shape[-1],),
            self.param_dtype,
        )
        alpha = alpha.astype(x.dtype)
        return jnp.where(x >= 0, x, alpha * x)


def leaky_relu(x, negative_slope: float = 0.1):
    return jnp.where(x >= 0, x, negative_slope * x)


# ---------------------------------------------------------------------------
# Resize (torch F.interpolate parity)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=128)
def _linear_weights(in_size: int, out_size: int, align_corners: bool):
    """1-D bilinear gather plan: (idx0, idx1, w1) as numpy constants."""
    if out_size == 1:
        src = np.zeros(1)
    elif align_corners:
        src = np.arange(out_size) * (in_size - 1) / (out_size - 1)
    else:
        src = np.maximum((np.arange(out_size) + 0.5) * in_size / out_size - 0.5, 0.0)
    i0 = np.clip(np.floor(src).astype(np.int32), 0, in_size - 1)
    i1 = np.minimum(i0 + 1, in_size - 1)
    w1 = (src - i0).astype(np.float32)
    return i0, i1, w1


@functools.lru_cache(maxsize=128)
def _area_matrix(in_size: int, out_size: int):
    """(out, in) averaging matrix for torch 'area' resize.

    torch's F.interpolate(mode='area') is adaptive_avg_pool: window
    [floor(o*in/out), ceil((o+1)*in/out)) with uniform weights."""
    mat = np.zeros((out_size, in_size), dtype=np.float32)
    for o in range(out_size):
        i0 = int(np.floor(o * in_size / out_size))
        i1 = int(np.ceil((o + 1) * in_size / out_size))
        mat[o, i0:i1] = 1.0 / (i1 - i0)
    return mat


@functools.lru_cache(maxsize=128)
def _linear_matrix(in_size: int, out_size: int, align_corners: bool):
    """Dense (out, in) interpolation matrix. Dense-matmul resize runs on
    the MXU and is ~15x faster than gather-based `take` on TPU."""
    i0, i1, w1 = _linear_weights(in_size, out_size, align_corners)
    mat = np.zeros((out_size, in_size), dtype=np.float32)
    rows = np.arange(out_size)
    np.add.at(mat, (rows, i0), 1.0 - w1)
    np.add.at(mat, (rows, i1), w1)
    return mat


def _apply_matrix_axis(x, mat, axis: int):
    m = jnp.asarray(mat).astype(x.dtype)
    x_moved = jnp.moveaxis(x, axis, -1)
    y = jnp.einsum("...i,oi->...o", x_moved, m)
    return jnp.moveaxis(y, -1, axis)


def _interp_axis(x, axis: int, out_size: int, align_corners: bool):
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    return _apply_matrix_axis(
        x, _linear_matrix(in_size, out_size, align_corners), axis
    )


def _area_axis(x, axis: int, out_size: int):
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    mat = jnp.asarray(_area_matrix(in_size, out_size)).astype(x.dtype)
    x_moved = jnp.moveaxis(x, axis, -1)
    y = jnp.einsum("...i,oi->...o", x_moved, mat)
    return jnp.moveaxis(y, -1, axis)


def resize(
    x,
    size: tuple[int, int],
    method: str = "bilinear",
    align_corners: bool = False,
):
    """Resize NHWC (or HWC) images. method ∈ {bilinear, area, nearest}.

    Matches torch.nn.functional.interpolate semantics for each mode;
    'nearest' uses torch's legacy floor convention.
    """
    hw_axes = (1, 2) if x.ndim == 4 else (0, 1)
    h, w = size
    if method == "bilinear":
        x = _interp_axis(x, hw_axes[0], h, align_corners)
        x = _interp_axis(x, hw_axes[1], w, align_corners)
        return x
    if method == "area":
        x = _area_axis(x, hw_axes[0], h)
        x = _area_axis(x, hw_axes[1], w)
        return x
    if method == "nearest":
        in_h, in_w = x.shape[hw_axes[0]], x.shape[hw_axes[1]]
        x = _apply_matrix_axis(x, _nearest_matrix(in_h, h), hw_axes[0])
        x = _apply_matrix_axis(x, _nearest_matrix(in_w, w), hw_axes[1])
        return x
    raise ValueError(f"unknown resize method {method!r}")


@functools.lru_cache(maxsize=128)
def _nearest_matrix(in_size: int, out_size: int):
    mat = np.zeros((out_size, in_size), dtype=np.float32)
    idx = (np.arange(out_size) * in_size // out_size).astype(np.int64)
    mat[np.arange(out_size), idx] = 1.0
    return mat


def resize_like_torch(x, scale_factor: float, method="bilinear", align_corners=True):
    """F.interpolate(scale_factor=...) parity: out = floor(in * factor)."""
    hw_axes = (1, 2) if x.ndim == 4 else (0, 1)
    h = int(np.floor(x.shape[hw_axes[0]] * scale_factor))
    w = int(np.floor(x.shape[hw_axes[1]] * scale_factor))
    return resize(x, (h, w), method=method, align_corners=align_corners)


# ---------------------------------------------------------------------------
# Pooling
# ---------------------------------------------------------------------------


def avg_pool_3x3s2(x):
    """AvgPool2d(3, stride=2, padding=1, count_include_pad=False) parity —
    the multiscale-discriminator downsample (reference
    network/MultiscaleDiscriminator.py:73)."""
    dims = (1, 3, 3, 1)
    strides = (1, 2, 2, 1)
    pads = ((0, 0), (1, 1), (1, 1), (0, 0))
    summed = lax.reduce_window(x, 0.0, lax.add, dims, strides, pads)
    ones = jnp.ones(x.shape[1:3], dtype=x.dtype)[None, :, :, None]
    counts = lax.reduce_window(ones, 0.0, lax.add, dims, strides, pads)
    return summed / counts
