"""ArcFaceOnnx adapter: insightface recognition .onnx packs
(glintr100-class, reference download_models.sh:6) produce embeddings
natively through the JAX ONNX executor, as a drop-in for the
pipeline's (IResNet, variables) pair.

Builds a tiny recognition-shaped graph (Conv -> PRelu -> Flatten ->
Gemm to 512) with planted weights and checks (a) the adapter output
matches the torch math on the pipeline's [-1,1] NHWC contract, and
(b) float weights ride through `variables` as jit ARGUMENTS —
swapping a weight in `variables` changes the output without touching
the file (the relay HTTP-413 rule)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from test_onnx_exec import model_bytes, node  # noqa: E402


def _build(tmp_path, size=12):
    rng = np.random.default_rng(0)
    w_conv = rng.normal(0, 0.2, (4, 3, 3, 3)).astype(np.float32)
    b_conv = rng.normal(0, 0.2, (4,)).astype(np.float32)
    slope = rng.uniform(0.05, 0.5, (4, 1, 1)).astype(np.float32)
    w_fc = rng.normal(0, 0.05,
                      (512, 4 * (size // 2) ** 2)).astype(np.float32)
    b_fc = rng.normal(0, 0.05, (512,)).astype(np.float32)
    nodes = [
        node("Conv", ["data", "w_conv", "b_conv"], ["c"],
             kernel_shape=[3, 3], strides=[2, 2], pads=[1, 1, 1, 1]),
        node("PRelu", ["c", "slope"], ["p"]),
        node("Flatten", ["p"], ["f"], axis=1),
        node("Gemm", ["f", "w_fc", "b_fc"], ["fc1"], transB=1),
    ]
    inits = {"w_conv": w_conv, "b_conv": b_conv, "slope": slope,
             "w_fc": w_fc, "b_fc": b_fc}
    p = tmp_path / "rec.onnx"
    p.write_bytes(model_bytes(nodes, inits, ["data"], ["fc1"]))
    return str(p), inits


def _torch_ref(inits, x_nchw):
    t = torch.from_numpy(x_nchw)
    c = F.conv2d(t, torch.from_numpy(inits["w_conv"]),
                 torch.from_numpy(inits["b_conv"]), stride=2, padding=1)
    p = F.prelu(c, torch.from_numpy(inits["slope"]).reshape(-1))
    f = p.flatten(1)
    return (f @ torch.from_numpy(inits["w_fc"]).T
            + torch.from_numpy(inits["b_fc"])).numpy()


def test_arcface_onnx_adapter(tmp_path):
    from ghost_tpu.models.arcface_onnx import ArcFaceOnnx

    path, inits = _build(tmp_path)
    arc = ArcFaceOnnx(path, min_arg_bytes=256)
    # the big tensors travel as variables; tiny biases stay baked
    assert "w_fc" in arc.variables and "w_conv" in arc.variables

    rng = np.random.default_rng(1)
    x = rng.uniform(-1, 1, (2, 12, 12, 3)).astype(np.float32)
    variables = jax.tree.map(jnp.asarray, arc.variables)
    emb = jax.jit(arc.apply)(variables, jnp.asarray(x))
    ref = _torch_ref(inits, x.transpose(0, 3, 1, 2))
    assert emb.shape == (2, 512)
    np.testing.assert_allclose(np.asarray(emb), ref, rtol=1e-4, atol=1e-4)

    # feeds shadow initializers: scaling the Gemm weight through
    # `variables` must scale the output, proving the baked numpy copy
    # is not what executes
    v2 = dict(variables)
    v2["w_fc"] = variables["w_fc"] * 2.0
    emb2 = jax.jit(arc.apply)(v2, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(emb2),
                               2.0 * (ref - inits["b_fc"]) + inits["b_fc"],
                               rtol=1e-4, atol=1e-4)


def test_arcface_onnx_in_pipeline_embed(tmp_path):
    """The adapter slots into SwapPipeline's arcface seat: embeddings
    come back (T,512) via embed_sources and feed the match path."""
    from ghost_tpu.models.arcface_onnx import ArcFaceOnnx
    from ghost_tpu.pipeline.swap import (SwapConfig, SwapPipeline,
                                         build_random_pipeline)

    path, _ = _build(tmp_path, size=112)
    arc = ArcFaceOnnx(path, min_arg_bytes=256)

    cfg = SwapConfig(chunk_size=2, max_faces=2, det_size=128,
                     crop_size=112, match_faces=1)
    base = build_random_pipeline(cfg, arcface_layers=(1, 1, 1, 1))
    pipe = SwapPipeline((base.det_mod, base._vars["det"]),
                        (arc, jax.tree.map(jnp.asarray, arc.variables)),
                        (base.gen_mod, base._vars["gen"]),
                        (base.lmk_mod, base._vars["lmk"]), config=cfg)
    rng = np.random.default_rng(2)
    src = rng.integers(0, 255, (1, 112, 112, 3), dtype=np.uint8)
    emb = np.asarray(pipe.embed_sources(src))
    assert emb.shape == (1, 512) and np.isfinite(emb).all()
