"""AEI-Net: the GHOST one-shot swap generator, TPU-native.

Semantics match the reference exactly (reference network/AEI_Net.py:143,
network/AADLayer.py:5) so converted weights reproduce outputs:

  * MLAttrEncoder: 7 conv4x4(stride 2, BN, LeakyReLU 0.1) downs producing
    feature maps 32..1024, then 6 deconv4x4 ups with unet skip-concat
    (or linknet skip-add), final 2x bilinear align_corners upsample
    (reference network/AEI_Net.py:44-95);
  * AADGenerator: z_id -> ConvTranspose(k2) to 2x2, then 8 AAD res-blocks
    each followed by 2x bilinear upsample, tanh output
    (reference network/AEI_Net.py:98-139);
  * AADLayer: InstanceNorm(h), attr gamma/beta via 1x1 convs, id
    gamma/beta via FCs, learned blend mask M = sigmoid(conv1x1(h)),
    out = (1-M)*A + M*I (reference network/AADLayer.py:20-38).

TPU-first departures: NHWC layout; bf16 compute via Policy; the whole
forward is one jittable function of (params, Xt, z_id); the 1x1-conv
gamma/beta pairs of every AAD layer are fused into a single conv with
2*c_x outputs (one MXU pass instead of two), and the two id FCs into one
matmul — both split afterwards, preserving numerics; weight converters
(convert/torch_loader.py) handle the packing.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ghost_tpu.core.precision import Policy, DEFAULT_POLICY
from ghost_tpu.nn.layers import (
    BatchNorm,
    Conv,
    ConvTranspose,
    Dense,
    instance_norm,
    leaky_relu,
    resize_like_torch,
)

# channel plans keyed by backbone (reference network/AEI_Net.py:56-69,103-118)
_DOWN_CH = (32, 64, 128, 256, 512, 1024, 1024)
_UP_IN_UNET = (1024, 2048, 1024, 512, 256, 128)
_UP_IN_LINK = (1024, 1024, 512, 256, 128, 64)
_UP_OUT = (1024, 512, 256, 128, 64, 32)
_AAD_CIN = (1024, 1024, 1024, 1024, 512, 256, 128, 64)
_AAD_COUT = (1024, 1024, 1024, 512, 256, 128, 64, 3)
_AAD_CATTR_UNET = (1024, 2048, 1024, 512, 256, 128, 64, 64)
_AAD_CATTR_LINK = (1024, 1024, 512, 256, 128, 64, 32, 32)


def _scaled(ch: int, width: float) -> int:
    """Scale a channel count, keeping it even (for gamma/beta splits)."""
    if width == 1.0:
        return ch
    return max(4, int(round(ch * width / 2)) * 2)


class DownBlock(nn.Module):
    """conv4x4 stride-2 + BN + LeakyReLU(0.1) (reference AEI_Net.py:19-24)."""

    features: int
    policy: Policy = DEFAULT_POLICY
    train: bool = False

    @nn.compact
    def __call__(self, x):
        x = Conv(self.features, kernel_size=4, stride=2, padding=1, use_bias=False,
                 dtype=self.policy.compute_dtype, param_dtype=self.policy.param_dtype,
                 name="conv")(x)
        # Under pjit global-view SPMD, batch stats are computed over the
        # GLOBAL batch — this IS the reference's SyncBatchNorm (see
        # ghost_tpu/parallel/dp.py); axis_name is only needed in shard_map.
        x = BatchNorm(use_running_average=not self.train,
                      dtype=self.policy.compute_dtype, param_dtype=self.policy.param_dtype,
                      name="bn")(x)
        return leaky_relu(x, 0.1)


class UpBlock(nn.Module):
    """deconv4x4 stride-2 + BN + LeakyReLU(0.1), then skip concat (unet)
    or add (linknet) (reference AEI_Net.py:27-41)."""

    features: int
    backbone: str = "unet"
    policy: Policy = DEFAULT_POLICY
    train: bool = False

    @nn.compact
    def __call__(self, x, skip):
        x = ConvTranspose(self.features, kernel_size=4, stride=2, padding=1,
                          use_bias=False, dtype=self.policy.compute_dtype,
                          param_dtype=self.policy.param_dtype, name="deconv")(x)
        x = BatchNorm(use_running_average=not self.train,
                      dtype=self.policy.compute_dtype, param_dtype=self.policy.param_dtype,
                      name="bn")(x)
        x = leaky_relu(x, 0.1)
        if self.backbone == "linknet":
            return x + skip
        return jnp.concatenate([x, skip], axis=-1)


class MLAttrEncoder(nn.Module):
    """Multi-level attribute encoder: returns 8 maps coarse->fine
    (z_attr1 at 2x2 ... z_attr8 at 256x256) (reference AEI_Net.py:72-95)."""

    backbone: str = "unet"
    policy: Policy = DEFAULT_POLICY
    train: bool = False
    width: float = 1.0  # channel multiplier (1.0 == reference plan)

    @nn.compact
    def __call__(self, xt):
        feats = []
        h = xt.astype(self.policy.compute_dtype)
        for i, ch in enumerate(_DOWN_CH):
            ch = _scaled(ch, self.width)
            h = DownBlock(ch, self.policy, self.train, name=f"down{i + 1}")(h)
            feats.append(h)
        # feats: 128,64,32,16,8,4,2 spatial; z_attr1 = deepest (2x2)
        attrs = [feats[-1]]
        h = feats[-1]
        for i, ch in enumerate(_UP_OUT):
            ch = _scaled(ch, self.width)
            skip = feats[-2 - i]
            h = UpBlock(ch, self.backbone, self.policy, self.train, name=f"up{i + 1}")(h, skip)
            attrs.append(h)
        attrs.append(resize_like_torch(h, 2.0, method="bilinear", align_corners=True))
        return tuple(attrs)


class _Conv1x1Params(nn.Module):
    """Parameters of a 1x1 Conv (same tree/init as `nn.layers.Conv`)
    WITHOUT applying it — lets the fused AAD path own the compute while
    converters/checkpoints keep addressing mask/Conv_0/{kernel,bias}."""

    cin: int
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.xavier_normal(),
                       (1, 1, self.cin, 1), self.param_dtype)
        b = self.param("bias", nn.initializers.zeros, (1,),
                       self.param_dtype)
        return k, b


class _MaskParams(nn.Module):
    cin: int
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self):
        return _Conv1x1Params(self.cin, self.param_dtype, name="Conv_0")()


class AADLayer(nn.Module):
    """Adaptive Attentional Denormalization (reference AADLayer.py:5-38).

    Fusions vs reference: one conv emits [gamma_attr|beta_attr]
    (2*c_x channels) and one matmul emits [gamma_id|beta_id].

    attr_upsample=2 accepts z_attr at HALF the spatial resolution of h
    and bilinearly upsamples the conv OUTPUT instead of the input: the
    1x1 conv is per-pixel affine and align_corners bilinear weights sum
    to 1 at every output pixel, so conv(up(z)) == up(conv(z)) exactly —
    this runs the conv on 1/4 the pixels (the finest attr map of the
    unet/linknet encoders is itself a pure 2x bilinear upsample,
    reference AEI_Net.py:94).

    fused=True routes the IN-apply + mask conv + blend through the
    Pallas `ops.pallas.aad.aad_modulate` kernel (one VMEM pass instead
    of ~3 XLA round trips; measured 1.5x on v5e for c_x>=128 —
    half-empty lanes make it SLOWER at c_x=64, so callers gate on
    channel count). Inference-only (no VJP); training keeps the jnp
    path. Param tree is identical either way."""

    c_x: int
    policy: Policy = DEFAULT_POLICY
    attr_upsample: int = 1
    fused: bool = False

    @nn.compact
    def __call__(self, h_in, z_attr, z_id):
        cd = self.policy.compute_dtype

        ab_attr = Conv(2 * self.c_x, kernel_size=1, dtype=cd,
                       param_dtype=self.policy.param_dtype, name="attr_gb")(z_attr)
        if self.attr_upsample > 1:
            ab_attr = resize_like_torch(ab_attr, float(self.attr_upsample),
                                        method="bilinear", align_corners=True)
        gamma_attr, beta_attr = jnp.split(ab_attr, 2, axis=-1)

        ab_id = Dense(2 * self.c_x, dtype=cd,
                      param_dtype=self.policy.param_dtype, name="id_gb")(z_id)

        if self.fused:
            from ghost_tpu.ops.pallas.aad import aad_modulate

            mask_k, mask_b = _MaskParams(
                self.c_x, self.policy.param_dtype, name="mask")()
            return aad_modulate(h_in.astype(cd), gamma_attr, beta_attr,
                                ab_id, mask_k, mask_b)

        # stats in f32, tensors stay in compute dtype (bandwidth-bound)
        h = instance_norm(h_in.astype(cd))
        gamma_id, beta_id = jnp.split(ab_id, 2, axis=-1)
        gamma_id = gamma_id[:, None, None, :]
        beta_id = beta_id[:, None, None, :]

        m = nn.sigmoid(Conv(1, kernel_size=1, dtype=cd,
                            param_dtype=self.policy.param_dtype, name="mask")(h))
        a = gamma_attr * h + beta_attr
        i = gamma_id * h + beta_id
        return (1.0 - m) * a + m * i


class AADResBlock(nn.Module):
    """num_blocks x (AAD -> ReLU -> conv3x3) + AAD shortcut when channels
    change (reference AADLayer.py:53-80)."""

    cin: int
    cout: int
    num_blocks: int = 2
    policy: Policy = DEFAULT_POLICY
    attr_upsample: int = 1
    fused: bool = False

    @nn.compact
    def __call__(self, h, z_attr, z_id):
        cd = self.policy.compute_dtype
        x = h
        for i in range(self.num_blocks):
            out_ch = self.cin if i < self.num_blocks - 1 else self.cout
            x = AADLayer(self.cin, self.policy, self.attr_upsample,
                         self.fused, name=f"aad{i}")(x, z_attr, z_id)
            x = nn.relu(x)
            x = Conv(out_ch, kernel_size=3, padding=1, use_bias=False, dtype=cd,
                     param_dtype=self.policy.param_dtype, name=f"conv{i}")(x)
        if self.cin != self.cout:
            s = AADLayer(self.cin, self.policy, self.attr_upsample,
                         self.fused, name="aad_short")(h, z_attr, z_id)
            s = nn.relu(s)
            s = Conv(self.cout, kernel_size=3, padding=1, use_bias=False, dtype=cd,
                     param_dtype=self.policy.param_dtype, name="conv_short")(s)
            return x + s
        return x + h


class AADGenerator(nn.Module):
    """8 AAD res-blocks with 2x bilinear upsampling between them, tanh out
    (reference AEI_Net.py:98-139)."""

    backbone: str = "unet"
    c_id: int = 512
    num_blocks: int = 2
    policy: Policy = DEFAULT_POLICY
    width: float = 1.0
    fused_aad: bool = False  # Pallas AAD-modulate on the C>=128 blocks

    @nn.compact
    def __call__(self, z_attrs: Sequence[Any], z_id):
        cd = self.policy.compute_dtype
        z_id = z_id.astype(cd)
        m = ConvTranspose(_scaled(1024, self.width), kernel_size=2, stride=1,
                          padding=0, dtype=cd,
                          param_dtype=self.policy.param_dtype, name="up1")(
            z_id[:, None, None, :]
        )
        # blk8's attr map (unet/linknet) is a pure 2x bilinear upsample
        # of z_attr7 (reference AEI_Net.py:94), and blk8 only consumes it
        # through 1x1 convs — feed the 128-res map and upsample the conv
        # outputs instead (exact commute, 1/4 the conv pixels; measured
        # ~9 ms/chunk-64 on v5e). The resnet encoder's finest map is a
        # real conv output, so it keeps the direct path.
        commute8 = self.backbone in ("unet", "linknet")
        for k in range(8):
            cin = _scaled(_AAD_CIN[k], self.width)
            cout = _AAD_COUT[k] if k == 7 else _scaled(_AAD_COUT[k], self.width)
            za = z_attrs[k]
            ups = 1
            if k == 7 and commute8:
                za = z_attrs[6]
                ups = 2
            # Pallas fused modulate wins only with full 128-lane channel
            # tiles and non-trivial spatial extent (k>=4: 32^2 and up);
            # at 64 channels (blk8) the half-empty lanes make it slower
            # than the XLA chain (scripts/profile_kernels_ab.py)
            fused = self.fused_aad and cin >= 128 and k >= 4
            y = AADResBlock(cin, cout, self.num_blocks, self.policy, ups,
                            fused, name=f"blk{k + 1}")(m, za.astype(cd), z_id)
            if k < 7:
                m = resize_like_torch(y, 2.0, method="bilinear", align_corners=True)
        return jnp.tanh(y).astype(self.policy.output_dtype)


class AEINet(nn.Module):
    """forward(Xt[B,256,256,3], z_id[B,512]) -> (Y, z_attrs)
    (reference network/AEI_Net.py:143-159). `get_attr` == encoder only."""

    backbone: str = "unet"
    c_id: int = 512
    num_blocks: int = 2
    policy: Policy = DEFAULT_POLICY
    train: bool = False
    width: float = 1.0  # 1.0 == reference channel plan; <1 for tests/serving
    fused_aad: bool = False  # inference-only Pallas AAD kernel (no VJP)

    def setup(self):
        if self.backbone in ("unet", "linknet"):
            self.encoder = MLAttrEncoder(self.backbone, self.policy, self.train,
                                         self.width)
        elif self.backbone == "resnet":
            from ghost_tpu.models.aei_resnet import MLAttrEncoderResnet

            self.encoder = MLAttrEncoderResnet(policy=self.policy, train=self.train)
        else:
            raise ValueError(f"unknown backbone {self.backbone!r}")
        self.generator = AADGenerator(self.backbone, self.c_id, self.num_blocks,
                                      self.policy, self.width, self.fused_aad)

    def __call__(self, xt, z_id):
        attrs = self.encoder(xt)
        y = self.generator(attrs, z_id)
        return y, attrs

    def get_attr(self, xt):
        return self.encoder(xt)
