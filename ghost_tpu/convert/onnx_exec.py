"""Native JAX executor for ONNX graphs (no onnxruntime).

Runs the reference's ONNX models (inswapper_128 teacher, train.py:44;
detector/recognizer packs, download_models.sh:6-8) directly on TPU:
`read_onnx_graph` (onnx_reader) supplies topology + weights, this
module interprets the node list into jnp operations once per trace —
under `jax.jit` the interpretation cost vanishes and XLA sees one flat
graph it can fuse like any hand-written model.

Semantics notes:
  * executes in ONNX's native NCHW layout; XLA re-layouts internally
    for the TPU, so no manual transposition pass is needed;
  * shape-carrying values (Shape outputs, Constant ints, slice/axes
    operands) are propagated as CONCRETE numpy arrays at trace time —
    Reshape/Slice/Resize therefore stay static-shaped as XLA requires;
  * eval-mode semantics (BatchNormalization uses stored moments,
    Dropout = identity).

Covers the op set used by the insightface-era CNN graphs; unsupported
ops raise at construction with the op name so gaps are explicit.
"""

from __future__ import annotations

from typing import Any, Dict, List

import numpy as np

from ghost_tpu.convert.onnx_reader import OnnxGraph


def _np(v):
    return isinstance(v, (np.ndarray, np.generic, int, float, list, tuple))


class OnnxExecutor:
    def __init__(self, graph: OnnxGraph):
        self.graph = graph
        missing = sorted({n.op_type for n in graph.nodes
                          if not hasattr(self, f"op_{n.op_type}")})
        if missing:
            raise NotImplementedError(f"unsupported ONNX ops: {missing}")

    # ------------------------------------------------------------- driver
    def __call__(self, feeds: Dict[str, Any]) -> List[Any]:
        import jax.numpy as jnp  # noqa: F401

        vals: Dict[str, Any] = {}
        vals.update(self.graph.initializers)
        for k, v in feeds.items():
            vals[k] = v
        for node in self.graph.nodes:
            args = [vals[i] if i else None for i in node.inputs]
            outs = getattr(self, f"op_{node.op_type}")(node, args)
            if not isinstance(outs, (list, tuple)):
                outs = (outs,)
            for name, val in zip(node.outputs, outs):
                if name:
                    vals[name] = val
        return [vals[o] for o in self.graph.outputs]

    # ------------------------------------------------------------ helpers
    @staticmethod
    def _lib(*args):
        import jax.numpy as jnp

        return np if all(_np(a) or a is None for a in args) else jnp

    @staticmethod
    def _ints(v) -> List[int]:
        if v is None:
            return []
        return [int(x) for x in np.asarray(v).reshape(-1)]

    # -------------------------------------------------------- elementwise
    def op_Add(self, n, a):
        return a[0] + a[1]

    def op_Sub(self, n, a):
        return a[0] - a[1]

    def op_Mul(self, n, a):
        return a[0] * a[1]

    def op_Div(self, n, a):
        x, y = a
        if _np(x) and _np(y) and np.issubdtype(np.asarray(x).dtype, np.integer):
            return np.asarray(x) // np.asarray(y)
        return x / y

    def op_Pow(self, n, a):
        return a[0] ** a[1]

    def op_Sqrt(self, n, a):
        return self._lib(a[0]).sqrt(a[0])

    def op_Exp(self, n, a):
        return self._lib(a[0]).exp(a[0])

    def op_Neg(self, n, a):
        return -a[0]

    def op_Abs(self, n, a):
        return self._lib(a[0]).abs(a[0])

    def op_Erf(self, n, a):
        import jax

        return jax.scipy.special.erf(a[0])

    def op_Relu(self, n, a):
        return self._lib(a[0]).maximum(a[0], 0)

    def op_LeakyRelu(self, n, a):
        alpha = n.attrs.get("alpha", 0.01)
        lib = self._lib(a[0])
        return lib.where(a[0] >= 0, a[0], alpha * a[0])

    def op_PRelu(self, n, a):
        import jax.numpy as jnp

        x, slope = a
        slope = jnp.asarray(slope)
        if slope.ndim == 1 and x.ndim == 4:  # per-channel on NCHW
            slope = slope.reshape(1, -1, 1, 1)
        return jnp.where(x >= 0, x, slope * x)

    def op_Sigmoid(self, n, a):
        import jax

        return jax.nn.sigmoid(a[0])

    def op_Tanh(self, n, a):
        return self._lib(a[0]).tanh(a[0])

    def op_Softmax(self, n, a):
        import jax

        return jax.nn.softmax(a[0], axis=n.attrs.get("axis", -1))

    def op_Clip(self, n, a):
        import jax.numpy as jnp

        lo = a[1] if len(a) > 1 and a[1] is not None else n.attrs.get("min")
        hi = a[2] if len(a) > 2 and a[2] is not None else n.attrs.get("max")
        x = a[0]
        if lo is not None:
            x = jnp.maximum(x, lo)
        if hi is not None:
            x = jnp.minimum(x, hi)
        return x

    def op_Where(self, n, a):
        return self._lib(*a).where(a[0], a[1], a[2])

    def op_Equal(self, n, a):
        return a[0] == a[1]

    def op_Greater(self, n, a):
        return a[0] > a[1]

    def op_Less(self, n, a):
        return a[0] < a[1]

    # ---------------------------------------------------------- structure
    def op_Identity(self, n, a):
        return a[0]

    def op_Dropout(self, n, a):
        return a[0]

    def op_Cast(self, n, a):
        from ghost_tpu.convert.onnx_reader import _DTYPE

        dt = _DTYPE[int(n.attrs["to"])]
        if _np(a[0]):
            return np.asarray(a[0]).astype(dt)
        return a[0].astype(dt)

    def op_Constant(self, n, a):
        for key in ("value", "value_float", "value_int", "value_ints",
                    "value_floats"):
            if key in n.attrs:
                return np.asarray(n.attrs[key])
        raise ValueError("Constant node without value")

    def op_ConstantOfShape(self, n, a):
        shape = self._ints(a[0])
        fill = n.attrs.get("value")
        fill = np.asarray(fill).reshape(-1) if fill is not None else \
            np.zeros(1, np.float32)
        return np.full(shape, fill[0], dtype=np.asarray(fill).dtype)

    def op_Shape(self, n, a):
        return np.asarray(np.shape(a[0]), np.int64)

    def op_Reshape(self, n, a):
        shape = self._ints(a[1])
        cur = list(np.shape(a[0]))
        shape = [cur[i] if s == 0 else s for i, s in enumerate(shape)]
        return a[0].reshape(shape) if not _np(a[0]) else \
            np.asarray(a[0]).reshape(shape)

    def op_Flatten(self, n, a):
        ax = n.attrs.get("axis", 1)
        sh = np.shape(a[0])
        lead = int(np.prod(sh[:ax])) if ax else 1
        return a[0].reshape(lead, -1)

    def op_Transpose(self, n, a):
        perm = n.attrs.get("perm")
        lib = self._lib(a[0])
        return lib.transpose(a[0], perm)

    def op_Concat(self, n, a):
        lib = self._lib(*a)
        return lib.concatenate([lib.asarray(x) for x in a],
                               axis=n.attrs.get("axis", 0))

    def op_Split(self, n, a):
        import jax.numpy as jnp

        axis = n.attrs.get("axis", 0)
        sizes = n.attrs.get("split") or (self._ints(a[1]) if len(a) > 1 else None)
        if sizes is None:
            k = len(n.outputs)
            return tuple(jnp.split(a[0], k, axis=axis))
        idx = np.cumsum(sizes)[:-1]
        return tuple(jnp.split(a[0], idx, axis=axis))

    def op_Gather(self, n, a):
        axis = n.attrs.get("axis", 0)
        lib = self._lib(*a)
        return lib.take(a[0], lib.asarray(a[1]).astype(
            np.int64 if lib is np else "int32"), axis=axis)

    def op_Unsqueeze(self, n, a):
        axes = n.attrs.get("axes") or self._ints(a[1])
        lib = self._lib(a[0])
        out = a[0]
        for ax in sorted(self._ints(axes)):
            out = lib.expand_dims(out, ax)
        return out

    def op_Squeeze(self, n, a):
        axes = n.attrs.get("axes")
        if axes is None and len(a) > 1 and a[1] is not None:
            axes = self._ints(a[1])
        lib = self._lib(a[0])
        if axes is None:
            return lib.squeeze(a[0])
        out = a[0]
        for ax in sorted(self._ints(axes), reverse=True):
            out = lib.squeeze(out, axis=ax)
        return out

    def op_Expand(self, n, a):
        shape = self._ints(a[1])
        lib = self._lib(a[0])
        cur = np.shape(a[0])
        # onnx Expand broadcasts; jnp.broadcast_to needs exact target
        tgt = list(shape)
        if len(cur) > len(tgt):
            tgt = [1] * (len(cur) - len(tgt)) + tgt
        cur = (1,) * (len(tgt) - len(cur)) + tuple(cur)
        tgt = [max(c, t) for c, t in zip(cur, tgt)]
        return lib.broadcast_to(a[0].reshape(cur), tgt)

    def op_Tile(self, n, a):
        lib = self._lib(a[0])
        return lib.tile(a[0], self._ints(a[1]))

    def op_Slice(self, n, a):
        x = a[0]
        if "starts" in n.attrs:  # opset < 10
            starts = n.attrs["starts"]
            ends = n.attrs["ends"]
            axes = n.attrs.get("axes", list(range(len(starts))))
            steps = [1] * len(starts)
        else:
            starts = self._ints(a[1])
            ends = self._ints(a[2])
            axes = self._ints(a[3]) if len(a) > 3 and a[3] is not None \
                else list(range(len(starts)))
            steps = self._ints(a[4]) if len(a) > 4 and a[4] is not None \
                else [1] * len(starts)
        idx = [slice(None)] * np.ndim(x)
        for s, e, ax, st in zip(starts, ends, axes, steps):
            idx[ax] = slice(int(s), int(e), int(st))
        return x[tuple(idx)]

    def op_Pad(self, n, a):
        import jax.numpy as jnp

        mode = n.attrs.get("mode", "constant")
        pads = n.attrs.get("pads") or self._ints(a[1])
        nd = np.ndim(a[0])
        pairs = [(int(pads[i]), int(pads[i + nd])) for i in range(nd)]
        jmode = {"constant": "constant", "reflect": "reflect",
                 "edge": "edge"}[mode]
        cval = 0.0
        if len(a) > 2 and a[2] is not None:
            cval = float(np.asarray(a[2]).reshape(-1)[0])
        if jmode == "constant":
            return jnp.pad(a[0], pairs, mode=jmode, constant_values=cval)
        return jnp.pad(a[0], pairs, mode=jmode)

    # ------------------------------------------------------------- linear
    def op_MatMul(self, n, a):
        lib = self._lib(*a)
        return lib.matmul(a[0], a[1])

    def op_Gemm(self, n, a):
        alpha = n.attrs.get("alpha", 1.0)
        beta = n.attrs.get("beta", 1.0)
        x = a[0].T if n.attrs.get("transA", 0) else a[0]
        w = a[1].T if n.attrs.get("transB", 0) else a[1]
        out = alpha * (x @ w)
        if len(a) > 2 and a[2] is not None:
            out = out + beta * a[2]
        return out

    # --------------------------------------------------------------- conv
    @staticmethod
    def _pads4(n, kh, kw):
        p = n.attrs.get("pads", [0, 0, 0, 0])
        auto = n.attrs.get("auto_pad", "NOTSET")
        if auto not in ("NOTSET", "", None):
            raise NotImplementedError(f"auto_pad={auto}")
        return ((int(p[0]), int(p[2])), (int(p[1]), int(p[3])))

    def op_Conv(self, n, a):
        from jax import lax

        x, w = a[0], a[1]
        kh, kw = np.shape(w)[2:4]
        strides = tuple(n.attrs.get("strides", [1, 1]))
        dil = tuple(n.attrs.get("dilations", [1, 1]))
        groups = int(n.attrs.get("group", 1))
        y = lax.conv_general_dilated(
            x, w, strides, self._pads4(n, kh, kw), rhs_dilation=dil,
            feature_group_count=groups,
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        if len(a) > 2 and a[2] is not None:
            y = y + a[2].reshape(1, -1, 1, 1)
        return y

    def op_ConvTranspose(self, n, a):
        import jax.numpy as jnp
        from jax import lax

        x, w = a[0], a[1]
        groups = int(n.attrs.get("group", 1))
        if groups != 1:
            raise NotImplementedError("grouped ConvTranspose")
        kh, kw = np.shape(w)[2:4]
        strides = tuple(n.attrs.get("strides", [1, 1]))
        pads = n.attrs.get("pads", [0, 0, 0, 0])
        opad = n.attrs.get("output_padding", [0, 0])
        # (I, O, kh, kw) -> flipped (O, I, kh, kw) correlation over the
        # stride-dilated input: the algebraic equivalent of the torch /
        # onnx deconvolution (see nn/layers.py ConvTranspose)
        wt = jnp.flip(jnp.transpose(jnp.asarray(w), (1, 0, 2, 3)),
                      axis=(2, 3))
        pad = ((kh - 1 - int(pads[0]), kh - 1 - int(pads[2]) + int(opad[0])),
               (kw - 1 - int(pads[1]), kw - 1 - int(pads[3]) + int(opad[1])))
        y = lax.conv_general_dilated(
            x, wt, (1, 1), pad, lhs_dilation=strides,
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        if len(a) > 2 and a[2] is not None:
            y = y + a[2].reshape(1, -1, 1, 1)
        return y

    # ------------------------------------------------------------ pooling
    def _pool(self, n, x, init, op, avg: bool):
        from jax import lax

        kh, kw = n.attrs["kernel_shape"]
        strides = tuple(n.attrs.get("strides", [1, 1]))
        (pt, pb), (pl, pr) = self._pads4(n, kh, kw)
        if n.attrs.get("ceil_mode", 0):
            h, w = np.shape(x)[2:4]
            pb += (-(h + pt + pb - kh) % strides[0])
            pr += (-(w + pl + pr - kw) % strides[1])
        dims = (1, 1, kh, kw)
        st = (1, 1) + strides
        pads = ((0, 0), (0, 0), (pt, pb), (pl, pr))
        out = lax.reduce_window(x, init, op, dims, st, pads)
        if avg:
            if n.attrs.get("count_include_pad", 0):
                out = out / (kh * kw)
            else:
                import jax.numpy as jnp

                ones = jnp.ones((1, 1) + np.shape(x)[2:4], x.dtype)
                cnt = lax.reduce_window(ones, 0.0, lax.add, dims, st, pads)
                out = out / cnt
        return out

    def op_MaxPool(self, n, a):
        from jax import lax

        return self._pool(n, a[0], -np.inf, lax.max, avg=False)

    def op_AveragePool(self, n, a):
        from jax import lax

        return self._pool(n, a[0], 0.0, lax.add, avg=True)

    def op_GlobalAveragePool(self, n, a):
        return a[0].mean(axis=(2, 3), keepdims=True)

    # ------------------------------------------------------------- norms
    def op_BatchNormalization(self, n, a):
        x, scale, bias, mean, var = a[:5]
        eps = n.attrs.get("epsilon", 1e-5)
        shape = (1, -1) + (1,) * (np.ndim(x) - 2)
        inv = 1.0 / np.sqrt(np.asarray(var) + eps) if _np(var) else \
            (var + eps) ** -0.5
        return (x - mean.reshape(shape)) * (scale * inv).reshape(shape) \
            + bias.reshape(shape)

    def op_InstanceNormalization(self, n, a):
        x, scale, bias = a
        eps = n.attrs.get("epsilon", 1e-5)
        axes = tuple(range(2, np.ndim(x)))
        mu = x.mean(axis=axes, keepdims=True)
        var = ((x - mu) ** 2).mean(axis=axes, keepdims=True)
        shape = (1, -1) + (1,) * (np.ndim(x) - 2)
        return (x - mu) / self._lib(x).sqrt(var + eps) \
            * scale.reshape(shape) + bias.reshape(shape)

    # ------------------------------------------------------------ reduce
    def _reduce(self, n, a, fn_name):
        axes = n.attrs.get("axes")
        if axes is None and len(a) > 1 and a[1] is not None:
            axes = self._ints(a[1])
        keep = bool(n.attrs.get("keepdims", 1))
        lib = self._lib(a[0])
        fn = getattr(lib, fn_name)
        ax = tuple(self._ints(axes)) if axes is not None else None
        return fn(a[0], axis=ax, keepdims=keep)

    def op_ReduceMean(self, n, a):
        return self._reduce(n, a, "mean")

    def op_ReduceSum(self, n, a):
        return self._reduce(n, a, "sum")

    def op_ReduceMax(self, n, a):
        return self._reduce(n, a, "max")

    # ------------------------------------------------------------ resize
    def op_Upsample(self, n, a):
        scales = n.attrs.get("scales") or self._ints(a[1]) or \
            np.asarray(a[1]).tolist()
        return self._resize(a[0], scales=np.asarray(scales, np.float64),
                            mode=n.attrs.get("mode", "nearest"))

    def op_Resize(self, n, a):
        mode = n.attrs.get("mode", "nearest")
        scales = None
        sizes = None
        if len(a) > 2 and a[2] is not None and np.size(a[2]):
            scales = np.asarray(a[2], np.float64)
        if len(a) > 3 and a[3] is not None and np.size(a[3]):
            sizes = self._ints(a[3])
        return self._resize(a[0], scales=scales, sizes=sizes, mode=mode,
                            coord=n.attrs.get(
                                "coordinate_transformation_mode",
                                "half_pixel"))

    @staticmethod
    def _resize(x, scales=None, sizes=None, mode="nearest",
                coord="asymmetric"):
        import jax.numpy as jnp

        from ghost_tpu.nn.layers import resize as nhwc_resize

        b, c, h, w = np.shape(x)
        if sizes is not None:
            oh, ow = int(sizes[2]), int(sizes[3])
        else:
            oh, ow = int(h * scales[2]), int(w * scales[3])
        xn = jnp.transpose(x, (0, 2, 3, 1))
        if mode.startswith("nearest"):
            out = nhwc_resize(xn, (oh, ow), method="nearest")
        elif mode in ("linear", "bilinear"):
            out = nhwc_resize(xn, (oh, ow), method="bilinear",
                              align_corners=(coord == "align_corners"))
        else:
            raise NotImplementedError(f"resize mode {mode}")
        return jnp.transpose(out, (0, 3, 1, 2))


def make_jitted_executor(graph: OnnxGraph):
    """Returns a jitted fn(*inputs in graph.inputs order) -> outputs."""
    import jax

    ex = OnnxExecutor(graph)

    @jax.jit
    def run(*args):
        return ex(dict(zip(graph.inputs, args)))

    return run
