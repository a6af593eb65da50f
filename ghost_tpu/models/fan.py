"""FAN stacked-hourglass landmark network (eye-heatmap loss support).

The reference uses a 4-stack hourglass FAN trained on WFLW-98 (weights
WFLW_4HG.pth from the AdaptiveWingLoss project — the submodule itself is
empty, reference README.md:50-51, download_models.sh:20) to produce
98-channel heatmaps; the training loss takes the eye-region channels
(96, 97 are the pupil points; the eye contours are 60-75 and 88-95...
the reference extracts left/right eye heatmaps in
utils/training/detector.py:18-28) and L2-compares them between Xt and Y
(reference train.py:239-247, utils/training/losses.py:40-42).

From-scratch TPU-native implementation: standard hourglass with
conv-bn-relu residual bottlenecks, `num_stacks` stacks at 64x64
resolution on a 256 input, 98 output channels each; `eye_heatmaps`
slices the eye channels. Heatmap argmax decoding
(`heatmaps_to_points`) matches get_preds_fromhm semantics (argmax +
quarter-pixel refinement toward the larger neighbor).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ghost_tpu.core.precision import Policy, DEFAULT_POLICY
from ghost_tpu.nn.layers import BatchNorm, Conv, resize

# WFLW-98 eye landmark channel groups (contours + pupils)
LEFT_EYE_CHANNELS = tuple(range(60, 68)) + (96,)
RIGHT_EYE_CHANNELS = tuple(range(68, 76)) + (97,)


class ConvBlock(nn.Module):
    """FAN residual block: 3 convs at c/2, c/4, c/4 concatenated."""

    features: int
    policy: Policy = DEFAULT_POLICY
    train: bool = False

    @nn.compact
    def __call__(self, x):
        cd = self.policy.compute_dtype
        pd = self.policy.param_dtype
        ura = not self.train
        c = self.features

        def bn_relu_conv(h, out, k, name):
            h = BatchNorm(use_running_average=ura, dtype=cd, param_dtype=pd,
                          name=f"{name}_bn")(h)
            h = nn.relu(h)
            return Conv(out, k, padding=k // 2, use_bias=False, dtype=cd,
                        param_dtype=pd, name=f"{name}_conv")(h)

        o1 = bn_relu_conv(x, c // 2, 3, "b1")
        o2 = bn_relu_conv(o1, c // 4, 3, "b2")
        o3 = bn_relu_conv(o2, c // 4, 3, "b3")
        out = jnp.concatenate([o1, o2, o3], axis=-1)
        if x.shape[-1] != c:
            x = bn_relu_conv(x, c, 1, "ds")
        return out + x


class Hourglass(nn.Module):
    depth: int = 4
    features: int = 256
    policy: Policy = DEFAULT_POLICY
    train: bool = False

    @nn.compact
    def __call__(self, x):
        def recurse(level, inp):
            up1 = ConvBlock(self.features, self.policy, self.train,
                            name=f"up1_{level}")(inp)
            low = nn.avg_pool(inp, (2, 2), (2, 2))
            low = ConvBlock(self.features, self.policy, self.train,
                            name=f"low1_{level}")(low)
            if level > 1:
                low = recurse(level - 1, low)
            else:
                low = ConvBlock(self.features, self.policy, self.train,
                                name=f"low2_{level}")(low)
            low = ConvBlock(self.features, self.policy, self.train,
                            name=f"low3_{level}")(low)
            up2 = resize(low, (low.shape[1] * 2, low.shape[2] * 2),
                         method="nearest")
            return up1 + up2

        return recurse(self.depth, x)


class FAN(nn.Module):
    """(B,256,256,3) in [0,1] -> list of num_stacks (B,64,64,98) heatmaps."""

    num_stacks: int = 4
    num_landmarks: int = 98
    features: int = 256
    policy: Policy = DEFAULT_POLICY
    train: bool = False

    @nn.compact
    def __call__(self, x):
        cd = self.policy.compute_dtype
        pd = self.policy.param_dtype
        ura = not self.train
        x = x.astype(cd)
        x = Conv(64, 7, 2, padding=3, dtype=cd, param_dtype=pd, name="stem")(x)
        x = BatchNorm(use_running_average=ura, dtype=cd, param_dtype=pd,
                      name="stem_bn")(x)
        x = nn.relu(x)
        x = ConvBlock(128, self.policy, self.train, name="block1")(x)
        x = nn.avg_pool(x, (2, 2), (2, 2))
        x = ConvBlock(128, self.policy, self.train, name="block2")(x)
        x = ConvBlock(self.features, self.policy, self.train, name="block3")(x)

        outputs = []
        prev = x
        for s in range(self.num_stacks):
            hg = Hourglass(4, self.features, self.policy, self.train,
                           name=f"hg{s}")(prev)
            ll = ConvBlock(self.features, self.policy, self.train,
                           name=f"top{s}")(hg)
            ll = Conv(self.features, 1, dtype=cd, param_dtype=pd,
                      name=f"fc{s}")(ll)
            ll = BatchNorm(use_running_average=ura, dtype=cd, param_dtype=pd,
                           name=f"fc_bn{s}")(ll)
            ll = nn.relu(ll)
            hm = Conv(self.num_landmarks, 1, dtype=cd, param_dtype=pd,
                      name=f"head{s}")(ll)
            outputs.append(hm.astype(self.policy.output_dtype))
            if s < self.num_stacks - 1:
                prev = prev + Conv(self.features, 1, dtype=cd, param_dtype=pd,
                                   name=f"merge_feat{s}")(ll) + Conv(
                    self.features, 1, dtype=cd, param_dtype=pd,
                    name=f"merge_hm{s}")(hm)
        return outputs


def eye_heatmaps(heatmaps):
    """(B,64,64,98) -> left (B,64,64,9), right (B,64,64,9) eye channels
    (reference utils/training/detector.py:18-28 behavior)."""
    left = heatmaps[..., jnp.asarray(LEFT_EYE_CHANNELS)]
    right = heatmaps[..., jnp.asarray(RIGHT_EYE_CHANNELS)]
    return left, right


def heatmaps_to_points(heatmaps):
    """Argmax + quarter-offset decode (get_preds_fromhm parity,
    reference utils/training/detector.py:6-16 lineage)."""
    b, h, w, c = heatmaps.shape
    flat = heatmaps.reshape(b, h * w, c)
    idx = jnp.argmax(flat, axis=1)  # (B,C)
    ys = (idx // w).astype(jnp.float32)
    xs = (idx % w).astype(jnp.float32)

    def refine(hm, x, y):
        xi = x.astype(jnp.int32)
        yi = y.astype(jnp.int32)
        x0 = jnp.clip(xi - 1, 0, w - 1)
        x1 = jnp.clip(xi + 1, 0, w - 1)
        y0 = jnp.clip(yi - 1, 0, h - 1)
        y1 = jnp.clip(yi + 1, 0, h - 1)
        dx = hm[yi, x1] - hm[yi, x0]
        dy = hm[y1, xi] - hm[y0, xi]
        return x + jnp.sign(dx) * 0.25, y + jnp.sign(dy) * 0.25

    def per_sample(hm_s, xs_s, ys_s):
        return jax.vmap(lambda c_idx: refine(hm_s[..., c_idx],
                                             xs_s[c_idx], ys_s[c_idx]))(
            jnp.arange(c)
        )

    out = jax.vmap(per_sample)(heatmaps, xs, ys)  # ((B,C),(B,C))
    return jnp.stack([out[0], out[1]], axis=-1)  # (B,C,2)
