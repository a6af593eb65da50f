"""Native JAX inswapper_128 teacher (no onnxruntime).

The reference's distillation regime drives an onnxruntime session per
batch (inswapper_128.onnx + the `emap` embedding projection stored in
the model's own initializers — reference train.py:42-57,139-145). Here
the whole teacher runs as ONE jitted TPU program: area-resize 256->128,
emap projection + L2 normalize, the inswapper graph via the native ONNX
executor (convert/onnx_exec.py), bilinear resize back to 256.

Divergence note: the reference upsamples teacher outputs with cv2
INTER_CUBIC (train.py:150-152 lineage); this uses bilinear — a
sub-pixel low-pass difference on an already-lossy 128->256 upsample.
"""

from __future__ import annotations

import numpy as np


class NativeInswapperTeacher:
    """TeacherProtocol impl: (xt_256_pm1 NHWC, source_embed (B,512)) ->
    {'teacher_y': (B,256,256,3) pm1 NHWC}."""

    def __init__(self, model_path: str):
        import jax
        import jax.numpy as jnp

        from ghost_tpu.convert.onnx_exec import OnnxExecutor
        from ghost_tpu.convert.onnx_reader import read_onnx_graph

        graph = read_onnx_graph(model_path)
        if len(graph.inputs) != 2:
            raise ValueError(
                f"expected (target, source) graph inputs, got {graph.inputs}")
        # insightface stores the 512x512 embedding projection as a graph
        # initializer named 'emap' (the INSwapper wrapper reads
        # graph.initializer[-1])
        emap = graph.initializers.get("emap")
        if emap is None:
            for arr in reversed(list(graph.initializers.values())):
                if arr.shape == (512, 512):
                    emap = arr
                    break
        self.emap = np.asarray(emap, np.float32) if emap is not None else None
        executor = OnnxExecutor(graph)
        in_img, in_src = graph.inputs
        emap_c = jnp.asarray(self.emap) if self.emap is not None else None

        def run(xt_pm1, embed):
            from ghost_tpu.nn.layers import resize

            x01 = xt_pm1 * 0.5 + 0.5
            x128 = resize(x01, (128, 128), method="area")
            blob = jnp.transpose(x128, (0, 3, 1, 2))  # NCHW
            latent = embed
            if emap_c is not None:
                latent = latent @ emap_c
            latent = latent / jnp.maximum(
                jnp.linalg.norm(latent, axis=-1, keepdims=True), 1e-12)
            (pred,) = executor({in_img: blob, in_src: latent})
            y = jnp.transpose(pred, (0, 2, 3, 1))
            y = resize(y, (256, 256), method="bilinear")
            return y * 2.0 - 1.0

        self._run = jax.jit(run)

    def __call__(self, xt_256_pm1, source_embed):
        import jax.numpy as jnp

        y = self._run(jnp.asarray(xt_256_pm1, jnp.float32),
                      jnp.asarray(source_embed, jnp.float32))
        return {"teacher_y": np.asarray(y)}
