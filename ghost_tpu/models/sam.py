"""Segment Anything (SAM) — TPU-native implementation.

The reference precomputes mask-training targets by prompting
`SamPredictor` (sam_vit_h) with the 5 face keypoints (reference
segment_anything_celeba.py:53-63, train-mask.py:236-274). This is a
from-scratch NHWC flax implementation of the SAM architecture (layer
plan per the public `segment_anything/modeling` sources):

  * ImageEncoderViT — 16x16 patch embed, absolute pos embed, ViT
    blocks with 14x14 windowed attention + decomposed relative
    positions (global attention on the configured blocks), 256-ch neck;
  * PromptEncoder — random-Fourier positional encoding, point labels;
  * MaskDecoder — IoU/mask tokens through a two-way transformer,
    4x upscaling, hypernetwork mask heads.

TPU-first notes: window partition is pure reshape (static shapes under
jit); attention is batched dense matmul (B*windows*heads lanes fill the
MXU); the decomposed rel-pos bias is two einsums. Everything from
pixels to mask logits is one jittable function. Presets: vit_b/l/h via
`sam_image_encoder_*`; `SamPredictor.predict_points` reproduces the
upstream predictor's resize/normalize/threshold pipeline for square
crops. Converter: `convert_sam_state_dict` (convert/torch_loader.py).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ghost_tpu.core.precision import DEFAULT_POLICY, Policy
from ghost_tpu.nn.layers import Conv, ConvTranspose, Dense, resize

SAM_PIXEL_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
SAM_PIXEL_STD = np.array([58.395, 57.12, 57.375], np.float32)


def layer_norm_2d(x, scale, bias, eps: float = 1e-6):
    """SAM's LayerNorm2d: per-pixel normalization over channels."""
    x = x.astype(jnp.float32)
    mu = x.mean(axis=-1, keepdims=True)
    var = ((x - mu) ** 2).mean(axis=-1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps) * scale + bias


class LayerNorm2d(nn.Module):
    features: int
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones,
                           (self.features,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), self.param_dtype)
        return layer_norm_2d(x, scale, bias)


def window_partition(x, ws: int):
    """(B,H,W,C) -> (B*nw, ws, ws, C) with zero pad to multiples."""
    b, h, w, c = x.shape
    ph, pw = (ws - h % ws) % ws, (ws - w % ws) % ws
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    hp, wp = h + ph, w + pw
    x = x.reshape(b, hp // ws, ws, wp // ws, ws, c)
    return (x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, c),
            (hp, wp))


def window_unpartition(win, ws: int, pad_hw, hw):
    hp, wp = pad_hw
    h, w = hw
    b = win.shape[0] // (hp // ws * (wp // ws))
    x = win.reshape(b, hp // ws, wp // ws, ws, ws, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)
    return x[:, :h, :w]


def _get_rel_pos(q_size: int, k_size: int, rel_pos):
    """Index the (2*max-1, head_dim) table into (q, k, head_dim)
    (upstream get_rel_pos; equal q/k sizes in every SAM call site)."""
    max_rel_dist = 2 * max(q_size, k_size) - 1
    if rel_pos.shape[0] != max_rel_dist:
        rel_pos = resize(rel_pos[None, :, :, None].astype(jnp.float32),
                         (max_rel_dist, rel_pos.shape[1]),
                         method="bilinear", align_corners=False)[0, :, :, 0]
    q_coords = np.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = np.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    rel = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel_pos[jnp.asarray(rel.astype(np.int32))]


class VitAttention(nn.Module):
    """ViT block attention with decomposed relative positions."""

    dim: int
    num_heads: int
    use_rel_pos: bool = True
    input_size: Tuple[int, int] = (14, 14)
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x):
        cd, pd = self.policy.compute_dtype, self.policy.param_dtype
        b, h, w, _ = x.shape
        hd = self.dim // self.num_heads
        qkv = Dense(3 * self.dim, dtype=cd, param_dtype=pd,
                    name="qkv")(x.reshape(b, h * w, self.dim))
        qkv = qkv.reshape(b, h * w, 3, self.num_heads, hd)
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3)
                   .reshape(b * self.num_heads, h * w, hd)
                   for i in range(3))
        attn = (q * (hd ** -0.5)) @ k.transpose(0, 2, 1)
        if self.use_rel_pos:
            rel_h = self.param("rel_pos_h", nn.initializers.zeros,
                               (2 * self.input_size[0] - 1, hd), pd)
            rel_w = self.param("rel_pos_w", nn.initializers.zeros,
                               (2 * self.input_size[1] - 1, hd), pd)
            Rh = _get_rel_pos(h, h, rel_h).astype(cd)
            Rw = _get_rel_pos(w, w, rel_w).astype(cd)
            r_q = q.reshape(b * self.num_heads, h, w, hd)
            dh = jnp.einsum("bhwc,hkc->bhwk", r_q, Rh)
            dw = jnp.einsum("bhwc,wkc->bhwk", r_q, Rw)
            attn = (attn.reshape(-1, h, w, h, w)
                    + dh[:, :, :, :, None] + dw[:, :, :, None, :]
                    ).reshape(-1, h * w, h * w)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(cd)
        out = (attn @ v).reshape(b, self.num_heads, h * w, hd)
        out = out.transpose(0, 2, 1, 3).reshape(b, h, w, self.dim)
        return Dense(self.dim, dtype=cd, param_dtype=pd, name="proj")(out)


class VitBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    window_size: int = 14  # 0 = global attention
    input_size: Tuple[int, int] = (64, 64)
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x):
        cd, pd = self.policy.compute_dtype, self.policy.param_dtype
        sc = x
        # upstream build_sam constructs the image encoder with
        # norm_layer=partial(nn.LayerNorm, eps=1e-6) — NOT torch's 1e-5
        # default (decoder norms keep 1e-5)
        x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, param_dtype=pd,
                         name="norm1")(x.astype(jnp.float32)).astype(cd)
        hw = x.shape[1:3]
        if self.window_size > 0:
            x, pad_hw = window_partition(x, self.window_size)
            attn_size = (self.window_size, self.window_size)
        else:
            attn_size = self.input_size
        x = VitAttention(self.dim, self.num_heads, True, attn_size,
                         self.policy, name="attn")(x)
        if self.window_size > 0:
            x = window_unpartition(x, self.window_size, pad_hw, hw)
        x = sc + x
        y = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, param_dtype=pd,
                         name="norm2")(x.astype(jnp.float32)).astype(cd)
        y = Dense(int(self.dim * self.mlp_ratio), dtype=cd, param_dtype=pd,
                  name="mlp_lin1")(y)
        y = Dense(self.dim, dtype=cd, param_dtype=pd,
                  name="mlp_lin2")(nn.gelu(y, approximate=False))
        return x + y


class ImageEncoderViT(nn.Module):
    img_size: int = 1024
    patch_size: int = 16
    embed_dim: int = 1280
    depth: int = 32
    num_heads: int = 16
    window_size: int = 14
    global_attn_indexes: Sequence[int] = (7, 15, 23, 31)
    out_chans: int = 256
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, x):
        cd, pd = self.policy.compute_dtype, self.policy.param_dtype
        grid = self.img_size // self.patch_size
        x = Conv(self.embed_dim, self.patch_size, stride=self.patch_size,
                 dtype=cd, param_dtype=pd, name="patch_embed")(x.astype(cd))
        pos = self.param("pos_embed", nn.initializers.zeros,
                         (1, grid, grid, self.embed_dim), pd)
        x = x + pos.astype(cd)
        for i in range(self.depth):
            ws = 0 if i in self.global_attn_indexes else self.window_size
            x = VitBlock(self.embed_dim, self.num_heads, 4.0, ws,
                         (grid, grid), self.policy, name=f"block_{i}")(x)
        x = Conv(self.out_chans, 1, use_bias=False, dtype=cd,
                 param_dtype=pd, name="neck_conv1")(x)
        x = LayerNorm2d(self.out_chans, pd, name="neck_ln1")(x).astype(cd)
        x = Conv(self.out_chans, 3, padding=1, use_bias=False, dtype=cd,
                 param_dtype=pd, name="neck_conv2")(x)
        x = LayerNorm2d(self.out_chans, pd, name="neck_ln2")(x)
        return x.astype(cd)


def sam_image_encoder_vit_b(**kw):
    return ImageEncoderViT(embed_dim=768, depth=12, num_heads=12,
                           global_attn_indexes=(2, 5, 8, 11), **kw)


def sam_image_encoder_vit_l(**kw):
    return ImageEncoderViT(embed_dim=1024, depth=24, num_heads=16,
                           global_attn_indexes=(5, 11, 17, 23), **kw)


def sam_image_encoder_vit_h(**kw):
    return ImageEncoderViT(embed_dim=1280, depth=32, num_heads=16,
                           global_attn_indexes=(7, 15, 23, 31), **kw)


class PromptEncoder(nn.Module):
    """Point prompts only (the reference's sole SAM prompt mode)."""

    embed_dim: int = 256
    image_size: int = 1024
    grid: int = 64
    policy: Policy = DEFAULT_POLICY

    def _pe(self, coords01, gauss):
        c = 2.0 * coords01 - 1.0
        c = (2.0 * np.pi) * (c @ gauss)
        return jnp.concatenate([jnp.sin(c), jnp.cos(c)], axis=-1)

    @nn.compact
    def __call__(self, points, labels):
        """points (B,N,2) pixel coords in the ENCODER's input frame
        (1024-side), labels (B,N): 1 fg, 0 bg, -1 pad.
        Returns (sparse (B,N,256), dense (B,grid,grid,256),
        dense_pe (1,grid,grid,256))."""
        pd = self.policy.param_dtype
        gauss = self.param("pe_gauss", nn.initializers.normal(1.0),
                           (2, self.embed_dim // 2), pd).astype(jnp.float32)
        pts = (jnp.asarray(points, jnp.float32) + 0.5) / self.image_size
        pe = self._pe(pts, gauss)  # (B,N,256)
        emb = [self.param(f"point_embed_{i}", nn.initializers.normal(1.0),
                          (self.embed_dim,), pd) for i in range(4)]
        not_a_point = self.param("not_a_point", nn.initializers.normal(1.0),
                                 (self.embed_dim,), pd)
        lab = jnp.asarray(labels)[..., None]
        sparse = jnp.where(lab == -1, not_a_point[None, None], pe)
        sparse = sparse + jnp.where(lab == 0, emb[0][None, None], 0.0)
        sparse = sparse + jnp.where(lab == 1, emb[1][None, None], 0.0)

        no_mask = self.param("no_mask_embed", nn.initializers.normal(1.0),
                             (self.embed_dim,), pd)
        b = pts.shape[0]
        dense = jnp.broadcast_to(no_mask[None, None, None],
                                 (b, self.grid, self.grid, self.embed_dim))
        ys = (np.arange(self.grid, dtype=np.float32) + 0.5) / self.grid
        xs = ys
        gy, gx = np.meshgrid(ys, xs, indexing="ij")
        grid01 = jnp.asarray(np.stack([gx, gy], axis=-1))  # (g,g,2) [x,y]
        dense_pe = self._pe(grid01, gauss)[None]
        return sparse, dense, dense_pe


class DecoderAttention(nn.Module):
    embed_dim: int = 256
    num_heads: int = 8
    downsample_rate: int = 1
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, q, k, v):
        cd, pd = self.policy.compute_dtype, self.policy.param_dtype
        idim = self.embed_dim // self.downsample_rate
        hd = idim // self.num_heads

        def split(t):
            b, n, _ = t.shape
            return t.reshape(b, n, self.num_heads, hd).transpose(0, 2, 1, 3)

        q = split(Dense(idim, dtype=cd, param_dtype=pd, name="q_proj")(q))
        k = split(Dense(idim, dtype=cd, param_dtype=pd, name="k_proj")(k))
        v = split(Dense(idim, dtype=cd, param_dtype=pd, name="v_proj")(v))
        attn = (q / math.sqrt(hd)) @ k.transpose(0, 1, 3, 2)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(cd)
        out = attn @ v
        b, _, n, _ = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, n, idim)
        return Dense(self.embed_dim, dtype=cd, param_dtype=pd,
                     name="out_proj")(out)


class TwoWayBlock(nn.Module):
    skip_first_layer_pe: bool = False
    embed_dim: int = 256
    num_heads: int = 8
    mlp_dim: int = 2048
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe):
        cd, pd = self.policy.compute_dtype, self.policy.param_dtype

        def ln(name, t):
            return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, param_dtype=pd,
                                name=name)(t.astype(jnp.float32)).astype(cd)

        if self.skip_first_layer_pe:
            queries = DecoderAttention(
                self.embed_dim, self.num_heads, 1, self.policy,
                name="self_attn")(queries, queries, queries)
        else:
            q = queries + query_pe
            queries = queries + DecoderAttention(
                self.embed_dim, self.num_heads, 1, self.policy,
                name="self_attn")(q, q, queries)
        queries = ln("norm1", queries)
        q, k = queries + query_pe, keys + key_pe
        queries = queries + DecoderAttention(
            self.embed_dim, self.num_heads, 2, self.policy,
            name="cross_attn_token_to_image")(q, k, keys)
        queries = ln("norm2", queries)
        y = Dense(self.mlp_dim, dtype=cd, param_dtype=pd,
                  name="mlp_lin1")(queries)
        y = Dense(self.embed_dim, dtype=cd, param_dtype=pd,
                  name="mlp_lin2")(nn.relu(y))
        queries = ln("norm3", queries + y)
        q, k = queries + query_pe, keys + key_pe
        keys = keys + DecoderAttention(
            self.embed_dim, self.num_heads, 2, self.policy,
            name="cross_attn_image_to_token")(k, q, queries)
        keys = ln("norm4", keys)
        return queries, keys


class MaskDecoder(nn.Module):
    embed_dim: int = 256
    num_heads: int = 8
    mlp_dim: int = 2048
    depth: int = 2
    num_mask_tokens: int = 4  # 1 primary + 3 multimask
    policy: Policy = DEFAULT_POLICY

    @nn.compact
    def __call__(self, image_embed, dense_pe, sparse, dense):
        """image_embed (B,g,g,256), dense_pe (1,g,g,256), sparse
        (B,N,256), dense (B,g,g,256). Returns (mask logits
        (B,num_mask_tokens,4g,4g), iou_pred (B,num_mask_tokens))."""
        cd, pd = self.policy.compute_dtype, self.policy.param_dtype
        b, g, _, c = image_embed.shape
        iou_token = self.param("iou_token", nn.initializers.normal(1.0),
                               (1, self.embed_dim), pd)
        mask_tokens = self.param("mask_tokens", nn.initializers.normal(1.0),
                                 (self.num_mask_tokens, self.embed_dim), pd)
        out_tokens = jnp.concatenate(
            [iou_token, mask_tokens], axis=0).astype(cd)
        tokens = jnp.concatenate(
            [jnp.broadcast_to(out_tokens[None],
                              (b, 1 + self.num_mask_tokens, self.embed_dim)),
             sparse.astype(cd)], axis=1)

        src = (image_embed + dense).reshape(b, g * g, c).astype(cd)
        pos = jnp.broadcast_to(dense_pe.reshape(1, g * g, c),
                               (b, g * g, c)).astype(cd)
        queries, keys = tokens, src
        for i in range(self.depth):
            queries, keys = TwoWayBlock(
                i == 0, self.embed_dim, self.num_heads, self.mlp_dim,
                self.policy, name=f"layer_{i}")(queries, keys, tokens, pos)
        q = queries + tokens
        k = keys + pos
        queries = queries + DecoderAttention(
            self.embed_dim, self.num_heads, 2, self.policy,
            name="final_attn")(q, k, keys)
        queries = nn.LayerNorm(
            epsilon=1e-5, dtype=jnp.float32, param_dtype=pd, name="norm_final")(
                queries.astype(jnp.float32)).astype(cd)

        iou_out = queries[:, 0]
        mask_out = queries[:, 1:1 + self.num_mask_tokens]

        up = keys.reshape(b, g, g, c)
        up = ConvTranspose(self.embed_dim // 4, 2, 2, 0, dtype=cd,
                           param_dtype=pd, name="upscale_conv1")(up)
        up = LayerNorm2d(self.embed_dim // 4, pd,
                         name="upscale_ln")(up).astype(cd)
        up = nn.gelu(up, approximate=False)
        up = ConvTranspose(self.embed_dim // 8, 2, 2, 0, dtype=cd,
                           param_dtype=pd, name="upscale_conv2")(up)
        up = nn.gelu(up, approximate=False)  # (B,4g,4g,32)

        hyper = []
        for i in range(self.num_mask_tokens):
            t = mask_out[:, i]
            for j, feats in enumerate((self.embed_dim, self.embed_dim,
                                       self.embed_dim // 8)):
                t = Dense(feats, dtype=cd, param_dtype=pd,
                          name=f"hyper_{i}_lin{j}")(t)
                if j < 2:
                    t = nn.relu(t)
            hyper.append(t)
        hyper = jnp.stack(hyper, axis=1)  # (B,M,32)
        masks = jnp.einsum("bmc,bhwc->bmhw", hyper, up)

        t = iou_out
        for j, feats in enumerate((self.embed_dim, self.embed_dim,
                                   self.num_mask_tokens)):
            t = Dense(feats, dtype=cd, param_dtype=pd,
                      name=f"iou_lin{j}")(t)
            if j < 2:
                t = nn.relu(t)
        return masks, t


class Sam(nn.Module):
    """Full SAM: image -> point-prompted mask logits at 1/4 encoder
    input resolution. multimask selection happens at the call site."""

    image_encoder: ImageEncoderViT
    prompt_encoder: PromptEncoder
    mask_decoder: MaskDecoder

    @property
    def img_size(self):
        return self.image_encoder.img_size

    def __call__(self, image, points, labels):
        """image (B,H,W,3) normalized ((x-mean)/std), H=W=img_size;
        points (B,N,2) [x,y] in image pixels; labels (B,N)."""
        embed = self.image_encoder(image)
        sparse, dense, dense_pe = self.prompt_encoder(points, labels)
        return self.mask_decoder(embed, dense_pe, sparse, dense)


def build_sam(preset: str = "vit_h", img_size: int = 1024,
              policy: Policy = DEFAULT_POLICY) -> Sam:
    """sam_model_registry parity: vit_b / vit_l / vit_h."""
    maker = {"vit_b": sam_image_encoder_vit_b,
             "vit_l": sam_image_encoder_vit_l,
             "vit_h": sam_image_encoder_vit_h}[preset]
    return Sam(
        image_encoder=maker(img_size=img_size, policy=policy),
        prompt_encoder=PromptEncoder(image_size=img_size,
                                     grid=img_size // 16, policy=policy),
        mask_decoder=MaskDecoder(policy=policy))


class SamPredictor:
    """Upstream SamPredictor parity for square crops: resize to the
    encoder size, normalize, predict, resize mask logits back,
    threshold at 0 (predictor.py / transforms.ResizeLongestSide)."""

    def __init__(self, model: Sam, variables):
        self.model = model
        self.vars = variables
        self._predict_j = jax.jit(self._predict_impl)

    def _predict_impl(self, variables, image_u8, points, labels):
        size = self.model.img_size
        h, w = image_u8.shape[1:3]
        x = image_u8.astype(jnp.float32)
        x = resize(x, (size, size), method="bilinear", align_corners=False)
        x = (x - jnp.asarray(SAM_PIXEL_MEAN)) / jnp.asarray(SAM_PIXEL_STD)
        pts = points.astype(jnp.float32)
        pts = pts * jnp.asarray([size / w, size / h], jnp.float32)
        masks, iou = self.model.apply(variables, x, pts, labels)
        # upstream postprocess_masks resizes in TWO bilinear steps
        # (256-grid -> img_size -> original); one direct step is NOT
        # the same function and flips near-zero logits across the >0
        # threshold on mask boundaries
        logits = resize(masks.transpose(0, 2, 3, 1), (size, size),
                        method="bilinear", align_corners=False)
        logits = resize(logits, (h, w), method="bilinear",
                        align_corners=False)
        return logits.transpose(0, 3, 1, 2), iou

    def predict_points(self, image_rgb_u8, point_coords, point_labels,
                       multimask_output: bool = False):
        """image (H,W,3) u8; point_coords (N,2) [x,y]; labels (N,).
        Returns (masks bool (M,H,W), iou (M,), logits (M,H,W)) like the
        upstream predictor."""
        img = jnp.asarray(image_rgb_u8)[None]
        # pad the point list with one (0,0)/-1 entry like the upstream
        # point-only path (prompt_encoder._embed_points pad=True)
        pts = np.concatenate(
            [np.asarray(point_coords, np.float32), np.zeros((1, 2))], 0)
        lab = np.concatenate(
            [np.asarray(point_labels, np.float32), -np.ones((1,))], 0)
        logits, iou = self._predict_j(self.vars, img,
                                      jnp.asarray(pts)[None],
                                      jnp.asarray(lab)[None])
        logits, iou = np.asarray(logits[0]), np.asarray(iou[0])
        sel = slice(1, None) if multimask_output else slice(0, 1)
        logits, iou = logits[sel], iou[sel]
        return logits > 0.0, iou, logits
