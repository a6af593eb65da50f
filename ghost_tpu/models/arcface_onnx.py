"""Run insightface recognition ONNX packs natively (no onnxruntime).

The reference's antelope pack ships glintr100.onnx (reference
download_models.sh:6, loaded by insightface's FaceAnalysis model zoo);
the swap itself embeds with the torch ArcFace backbone, but the
recognition pack is part of the reference's deployable surface. Given
such a file, this adapter is a drop-in for the pipeline's
`(IResNet, variables)` pair: construct `ArcFaceOnnx(path)` and pass
`(adapter, adapter.variables)` anywhere SwapPipeline expects the
ArcFace module — `apply(variables, x)` consumes the pipeline's [-1,1]
RGB NHWC 112-crops (identical to insightface's own preprocessing,
(x - 127.5)/127.5 on RGB, model_zoo/arcface_onnx.py) and returns raw
(B, 512) embeddings; the pipeline L2-normalizes where the reference
does.

Relay/TPU note: float weights ride through `variables` as jit
ARGUMENTS (feeds override same-named initializers inside the
executor), so the graph's parameters never become embedded HLO
constants — the HTTP-413 rule every pipeline module follows. Small
and integer initializers (Reshape shapes, axes) stay concrete numpy so
shape-carrying operands remain static at trace time.
"""

from __future__ import annotations

import numpy as np


class ArcFaceOnnx:
    """Callable module mirroring `IResNet.apply(variables, x)`,
    built from an insightface recognition .onnx file."""

    def __init__(self, model_path: str, min_arg_bytes: int = 4096):
        from ghost_tpu.convert.onnx_exec import OnnxExecutor
        from ghost_tpu.convert.onnx_reader import read_onnx_graph

        graph = read_onnx_graph(model_path)
        if len(graph.inputs) != 1:
            raise ValueError(f"expected one graph input, got {graph.inputs}")
        self.input_name = graph.inputs[0]
        # float tensors big enough to matter travel as arguments; the
        # concrete copies stay in graph.initializers but feeds shadow
        # them by name, so they are never traced into the program
        self.variables = {
            k: v for k, v in graph.initializers.items()
            if v.dtype.kind == "f" and v.nbytes >= min_arg_bytes}
        self._ex = OnnxExecutor(graph)

    def apply(self, variables, x):
        """x (B,112,112,3) NHWC RGB in [-1,1] -> (B,512) embeddings."""
        import jax.numpy as jnp

        blob = jnp.transpose(x.astype(jnp.float32), (0, 3, 1, 2))
        outs = self._ex({**variables, self.input_name: blob})
        return outs[0]
