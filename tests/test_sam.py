"""Native SAM parity vs a torch replica with the official state_dict
layout (public segment_anything/modeling sources; the segment-anything
pip package is absent from this image, reference train-mask.py:236).
Tiny config: 48px image -> 3x3 token grid (window 2 exercises pad +
unpad), depth 2 with one global block, 16-dim decoder."""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from ghost_tpu.convert.torch_loader import convert_sam_state_dict
from ghost_tpu.core.precision import FULL_PRECISION
from ghost_tpu.models.sam import (ImageEncoderViT, MaskDecoder,
                                  PromptEncoder, Sam, SamPredictor)

# tiny config
IMG, PATCH, DIM, HEADS, DEPTH = 48, 16, 8, 2, 2
GLOBAL, WS, OUT_CH = (1,), 2, 16
GRID = IMG // PATCH  # 3


class TLayerNorm2d(tnn.Module):
    def __init__(self, ch, eps=1e-6):
        super().__init__()
        self.weight = tnn.Parameter(torch.ones(ch))
        self.bias = tnn.Parameter(torch.zeros(ch))
        self.eps = eps

    def forward(self, x):
        u = x.mean(1, keepdim=True)
        s = (x - u).pow(2).mean(1, keepdim=True)
        x = (x - u) / torch.sqrt(s + self.eps)
        return self.weight[:, None, None] * x + self.bias[:, None, None]


def t_window_partition(x, ws):
    b, h, w, c = x.shape
    ph, pw = (ws - h % ws) % ws, (ws - w % ws) % ws
    if ph or pw:
        x = F.pad(x, (0, 0, 0, pw, 0, ph))
    hp, wp = h + ph, w + pw
    x = x.view(b, hp // ws, ws, wp // ws, ws, c)
    return (x.permute(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, c), (hp, wp))


def t_window_unpartition(win, ws, pad_hw, hw):
    hp, wp = pad_hw
    h, w = hw
    b = win.shape[0] // (hp * wp // ws // ws)
    x = win.view(b, hp // ws, wp // ws, ws, ws, -1)
    x = x.permute(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)
    return x[:, :h, :w]


def t_get_rel_pos(q, k, rel_pos):
    qc = torch.arange(q)[:, None] * max(k / q, 1.0)
    kc = torch.arange(k)[None, :] * max(q / k, 1.0)
    rel = (qc - kc) + (k - 1) * max(q / k, 1.0)
    return rel_pos[rel.long()]


class TVitAttention(tnn.Module):
    def __init__(self, dim, heads, input_size):
        super().__init__()
        self.num_heads = heads
        hd = dim // heads
        self.scale = hd ** -0.5
        self.qkv = tnn.Linear(dim, 3 * dim)
        self.proj = tnn.Linear(dim, dim)
        self.rel_pos_h = tnn.Parameter(
            torch.randn(2 * input_size[0] - 1, hd) * 0.02)
        self.rel_pos_w = tnn.Parameter(
            torch.randn(2 * input_size[1] - 1, hd) * 0.02)

    def forward(self, x):
        b, h, w, _ = x.shape
        qkv = (self.qkv(x).reshape(b, h * w, 3, self.num_heads, -1)
               .permute(2, 0, 3, 1, 4))
        q, k, v = qkv.reshape(3, b * self.num_heads, h * w, -1).unbind(0)
        attn = (q * self.scale) @ k.transpose(-2, -1)
        Rh = t_get_rel_pos(h, h, self.rel_pos_h)
        Rw = t_get_rel_pos(w, w, self.rel_pos_w)
        r_q = q.reshape(b * self.num_heads, h, w, -1)
        rel_h = torch.einsum("bhwc,hkc->bhwk", r_q, Rh)
        rel_w = torch.einsum("bhwc,wkc->bhwk", r_q, Rw)
        attn = (attn.view(-1, h, w, h, w) + rel_h[:, :, :, :, None]
                + rel_w[:, :, :, None, :]).view(-1, h * w, h * w)
        attn = attn.softmax(dim=-1)
        x = ((attn @ v).view(b, self.num_heads, h, w, -1)
             .permute(0, 2, 3, 1, 4).reshape(b, h, w, -1))
        return self.proj(x)


class TMLPBlock(tnn.Module):
    def __init__(self, dim, mlp_dim):
        super().__init__()
        self.lin1 = tnn.Linear(dim, mlp_dim)
        self.lin2 = tnn.Linear(mlp_dim, dim)

    def forward(self, x):
        return self.lin2(F.gelu(self.lin1(x)))


class TVitBlock(tnn.Module):
    def __init__(self, dim, heads, window_size, input_size):
        super().__init__()
        self.window_size = window_size
        # upstream build_sam: image-encoder norm_layer eps=1e-6
        self.norm1 = tnn.LayerNorm(dim, eps=1e-6)
        self.attn = TVitAttention(
            dim, heads,
            input_size if window_size == 0 else (window_size, window_size))
        self.norm2 = tnn.LayerNorm(dim, eps=1e-6)
        self.mlp = TMLPBlock(dim, dim * 4)

    def forward(self, x):
        sc = x
        x = self.norm1(x)
        if self.window_size > 0:
            hw = (x.shape[1], x.shape[2])
            x, pad_hw = t_window_partition(x, self.window_size)
        x = self.attn(x)
        if self.window_size > 0:
            x = t_window_unpartition(x, self.window_size, pad_hw, hw)
        x = sc + x
        return x + self.mlp(self.norm2(x))


class TPatchEmbed(tnn.Module):
    def __init__(self, dim):
        super().__init__()
        self.proj = tnn.Conv2d(3, dim, PATCH, PATCH)

    def forward(self, x):
        return self.proj(x).permute(0, 2, 3, 1)


class TImageEncoder(tnn.Module):
    def __init__(self):
        super().__init__()
        self.patch_embed = TPatchEmbed(DIM)
        self.pos_embed = tnn.Parameter(torch.randn(1, GRID, GRID, DIM) * 0.02)
        self.blocks = tnn.ModuleList([
            TVitBlock(DIM, HEADS, 0 if i in GLOBAL else WS, (GRID, GRID))
            for i in range(DEPTH)])
        self.neck = tnn.Sequential(
            tnn.Conv2d(DIM, OUT_CH, 1, bias=False), TLayerNorm2d(OUT_CH),
            tnn.Conv2d(OUT_CH, OUT_CH, 3, padding=1, bias=False),
            TLayerNorm2d(OUT_CH))

    def forward(self, x):
        x = self.patch_embed(x) + self.pos_embed
        for blk in self.blocks:
            x = blk(x)
        return self.neck(x.permute(0, 3, 1, 2))


class TPromptEncoder(tnn.Module):
    def __init__(self, dim, image_size, grid):
        super().__init__()
        self.dim, self.image_size, self.grid = dim, image_size, grid
        self.register_buffer(
            "gauss_placeholder", torch.empty(0), persistent=False)
        self.pe_layer = tnn.Module()
        self.pe_layer.register_buffer(
            "positional_encoding_gaussian_matrix", torch.randn(2, dim // 2))
        self.point_embeddings = tnn.ModuleList(
            [tnn.Embedding(1, dim) for _ in range(4)])
        self.not_a_point_embed = tnn.Embedding(1, dim)
        self.no_mask_embed = tnn.Embedding(1, dim)

    def _pe(self, coords01):
        c = 2 * coords01 - 1
        c = c @ self.pe_layer.positional_encoding_gaussian_matrix
        c = 2 * np.pi * c
        return torch.cat([torch.sin(c), torch.cos(c)], dim=-1)

    def forward(self, points, labels):
        pts = (points + 0.5) / self.image_size
        pe = self._pe(pts)
        pe[labels == -1] = 0.0
        pe[labels == -1] += self.not_a_point_embed.weight[0]
        pe[labels == 0] += self.point_embeddings[0].weight[0]
        pe[labels == 1] += self.point_embeddings[1].weight[0]
        b = points.shape[0]
        dense = (self.no_mask_embed.weight.reshape(1, -1, 1, 1)
                 .expand(b, -1, self.grid, self.grid))
        ys = (torch.arange(self.grid, dtype=torch.float32) + 0.5) / self.grid
        gy, gx = torch.meshgrid(ys, ys, indexing="ij")
        dense_pe = self._pe(torch.stack([gx, gy], dim=-1))
        return pe, dense, dense_pe.permute(2, 0, 1)


class TDecoderAttention(tnn.Module):
    def __init__(self, dim, heads, downsample=1):
        super().__init__()
        self.idim = dim // downsample
        self.num_heads = heads
        self.q_proj = tnn.Linear(dim, self.idim)
        self.k_proj = tnn.Linear(dim, self.idim)
        self.v_proj = tnn.Linear(dim, self.idim)
        self.out_proj = tnn.Linear(self.idim, dim)

    def forward(self, q, k, v):
        q, k, v = self.q_proj(q), self.k_proj(k), self.v_proj(v)

        def sep(t):
            b, n, c = t.shape
            return t.reshape(b, n, self.num_heads,
                             c // self.num_heads).transpose(1, 2)

        q, k, v = sep(q), sep(k), sep(v)
        attn = q @ k.permute(0, 1, 3, 2) / math.sqrt(q.shape[-1])
        out = (torch.softmax(attn, dim=-1) @ v).transpose(1, 2)
        return self.out_proj(out.reshape(out.shape[0], out.shape[1], -1))


class TTwoWayBlock(tnn.Module):
    def __init__(self, dim, heads, mlp_dim, skip_first_layer_pe):
        super().__init__()
        self.skip_first_layer_pe = skip_first_layer_pe
        self.self_attn = TDecoderAttention(dim, heads)
        self.norm1 = tnn.LayerNorm(dim)
        self.cross_attn_token_to_image = TDecoderAttention(dim, heads, 2)
        self.norm2 = tnn.LayerNorm(dim)
        self.mlp = TMLPBlock(dim, mlp_dim)
        self.norm3 = tnn.LayerNorm(dim)
        self.cross_attn_image_to_token = TDecoderAttention(dim, heads, 2)
        self.norm4 = tnn.LayerNorm(dim)

    def forward(self, queries, keys, query_pe, key_pe):
        if self.skip_first_layer_pe:
            queries = self.self_attn(queries, queries, queries)
        else:
            q = queries + query_pe
            queries = queries + self.self_attn(q, q, queries)
        queries = self.norm1(queries)
        q, k = queries + query_pe, keys + key_pe
        queries = self.norm2(
            queries + self.cross_attn_token_to_image(q, k, keys))
        # torch MLPBlock uses relu in the decoder transformer
        mlp_out = self.mlp.lin2(F.relu(self.mlp.lin1(queries)))
        queries = self.norm3(queries + mlp_out)
        q, k = queries + query_pe, keys + key_pe
        keys = self.norm4(keys + self.cross_attn_image_to_token(k, q, queries))
        return queries, keys


class TMLP(tnn.Module):
    def __init__(self, dims):
        super().__init__()
        self.layers = tnn.ModuleList(
            [tnn.Linear(a, b) for a, b in zip(dims[:-1], dims[1:])])

    def forward(self, x):
        for i, l in enumerate(self.layers):
            x = l(x) if i == len(self.layers) - 1 else F.relu(l(x))
        return x


class TTransformer(tnn.Module):
    def __init__(self, dim, heads, mlp_dim, depth=2):
        super().__init__()
        self.layers = tnn.ModuleList(
            [TTwoWayBlock(dim, heads, mlp_dim, i == 0) for i in range(depth)])
        self.final_attn_token_to_image = TDecoderAttention(dim, heads, 2)
        self.norm_final_attn = tnn.LayerNorm(dim)

    def forward(self, image_embed, image_pe, tokens):
        b, c, h, w = image_embed.shape
        keys = image_embed.flatten(2).permute(0, 2, 1)
        pos = image_pe.flatten(2).permute(0, 2, 1)
        queries = tokens
        for layer in self.layers:
            queries, keys = layer(queries, keys, tokens, pos)
        q, k = queries + tokens, keys + pos
        queries = queries + self.final_attn_token_to_image(q, k, keys)
        return self.norm_final_attn(queries), keys


class TMaskDecoder(tnn.Module):
    def __init__(self, dim, heads, mlp_dim):
        super().__init__()
        self.iou_token = tnn.Embedding(1, dim)
        self.mask_tokens = tnn.Embedding(4, dim)
        self.transformer = TTransformer(dim, heads, mlp_dim)
        self.output_upscaling = tnn.Sequential(
            tnn.ConvTranspose2d(dim, dim // 4, 2, 2), TLayerNorm2d(dim // 4),
            tnn.GELU(), tnn.ConvTranspose2d(dim // 4, dim // 8, 2, 2),
            tnn.GELU())
        self.output_hypernetworks_mlps = tnn.ModuleList(
            [TMLP([dim, dim, dim, dim // 8]) for _ in range(4)])
        self.iou_prediction_head = TMLP([dim, dim, dim, 4])

    def forward(self, image_embed, image_pe, sparse, dense):
        b = sparse.shape[0]
        out_tokens = torch.cat(
            [self.iou_token.weight, self.mask_tokens.weight], dim=0)
        tokens = torch.cat(
            [out_tokens.unsqueeze(0).expand(b, -1, -1), sparse], dim=1)
        src = image_embed + dense
        hs, src = self.transformer(src, image_pe.expand(b, -1, -1, -1),
                                   tokens)
        iou_out, mask_out = hs[:, 0], hs[:, 1:5]
        g = image_embed.shape[-1]
        src = src.transpose(1, 2).view(b, -1, g, g)
        up = self.output_upscaling(src)
        hyper = torch.stack(
            [m(mask_out[:, i])
             for i, m in enumerate(self.output_hypernetworks_mlps)], dim=1)
        masks = (hyper @ up.flatten(2)).view(b, -1, up.shape[-2],
                                             up.shape[-1])
        return masks, self.iou_prediction_head(iou_out)


class TSam(tnn.Module):
    def __init__(self):
        super().__init__()
        self.image_encoder = TImageEncoder()
        self.prompt_encoder = TPromptEncoder(OUT_CH, IMG, GRID)
        self.mask_decoder = TMaskDecoder(OUT_CH, HEADS, 32)

    def forward(self, image, points, labels):
        embed = self.image_encoder(image)
        sparse, dense, dense_pe = self.prompt_encoder(points, labels)
        return self.mask_decoder(embed, dense_pe.unsqueeze(0), sparse, dense)


def build_tiny_jax_sam():
    return Sam(
        image_encoder=ImageEncoderViT(
            img_size=IMG, patch_size=PATCH, embed_dim=DIM, depth=DEPTH,
            num_heads=HEADS, window_size=WS, global_attn_indexes=GLOBAL,
            out_chans=OUT_CH, policy=FULL_PRECISION),
        prompt_encoder=PromptEncoder(
            embed_dim=OUT_CH, image_size=IMG, grid=GRID,
            policy=FULL_PRECISION),
        mask_decoder=MaskDecoder(embed_dim=OUT_CH, num_heads=HEADS,
                                 mlp_dim=32, policy=FULL_PRECISION))


def test_sam_torch_golden():
    torch.manual_seed(0)
    tm = TSam().eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = convert_sam_state_dict(sd, depth=DEPTH)

    model = build_tiny_jax_sam()
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (2, IMG, IMG, 3)).astype(np.float32)
    pts = rng.uniform(0, IMG, (2, 6, 2)).astype(np.float32)
    labels = np.array([[1, 1, 1, 1, 1, -1]] * 2, np.float32)

    with torch.no_grad():
        rm, riou = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                      torch.from_numpy(pts), torch.from_numpy(labels))
    masks, iou = jax.jit(model.apply)(
        variables, jnp.asarray(x), jnp.asarray(pts), jnp.asarray(labels))
    assert masks.shape == tuple(rm.shape) == (2, 4, 4 * GRID, 4 * GRID)
    np.testing.assert_allclose(np.asarray(iou), riou.numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(masks), rm.numpy(),
                               rtol=2e-4, atol=2e-4)


def test_sam_predictor_shapes():
    """Predictor pre/post pipeline on a square crop: bool masks at
    input resolution, single-mask and multimask selection."""
    model = build_tiny_jax_sam()
    rng = np.random.default_rng(1)
    variables = model.init(jax.random.key(0),
                           jnp.zeros((1, IMG, IMG, 3)),
                           jnp.zeros((1, 3, 2)), jnp.zeros((1, 3)))
    pred = SamPredictor(model, variables)
    img = rng.integers(0, 255, (96, 96, 3), dtype=np.uint8)
    kps = rng.uniform(0, 96, (5, 2)).astype(np.float32)
    masks, iou, logits = pred.predict_points(img, kps, np.ones(5))
    assert masks.shape == (1, 96, 96) and masks.dtype == bool
    assert iou.shape == (1,)
    m3, i3, _ = pred.predict_points(img, kps, np.ones(5),
                                    multimask_output=True)
    assert m3.shape == (3, 96, 96) and i3.shape == (3,)


def test_precompute_masks_sam_loop(tmp_path):
    """cli/precompute_masks --sam_path loop over a crop dir: one mask
    png per input, keypoint prompts at the scaled arcface template
    (reference segment_anything_celeba.py:53-63)."""
    cv2 = pytest.importorskip("cv2")
    from ghost_tpu.cli.precompute_masks import sam_mask_loop

    model = build_tiny_jax_sam()
    variables = model.init(jax.random.key(0),
                           jnp.zeros((1, IMG, IMG, 3)),
                           jnp.zeros((1, 3, 2)), jnp.zeros((1, 3)))
    pred = SamPredictor(model, variables)

    src, dst = tmp_path / "crops", tmp_path / "masks"
    src.mkdir(), dst.mkdir()
    rng = np.random.default_rng(2)
    for name in ("a.jpg", "b.png"):
        cv2.imwrite(str(src / name),
                    rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))
    sam_mask_loop(pred, str(src), str(dst))
    for name in ("a.png", "b.png"):
        m = cv2.imread(str(dst / name), cv2.IMREAD_GRAYSCALE)
        assert m is not None and m.shape == (256, 256)
        assert set(np.unique(m)) <= {0, 255}
