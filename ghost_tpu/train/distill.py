"""Teacher-distillation host stage.

The reference's dominant training cost is a per-sample host loop:
interp to 128 -> numpy -> white-border pad -> insightface buffalo_l
detect/embed -> inswapper_128.onnx session.run -> ArcFace re-embed
(reference train.py:94-174, SURVEY.md §3.2). The rebuild keeps the
teacher where it must live (ONNX Runtime has no TPU backend) but makes
it a *batched, prefetched pipeline stage*:

  * `OnnxInswapperTeacher` wraps the inswapper session + embedding
    projection (`emap`, train.py:42-57) behind `TeacherProtocol`,
    gated on onnxruntime availability;
  * `JaxTeacher` is a frozen ghost-tpu generator (the self-distillation
    teacher of reference train-self.py:244-254) running on-device;
  * `TeacherPrefetcher` runs the teacher one batch ahead on a worker
    thread so the jitted G step never waits on the host (the reference
    runs the teacher synchronously inside the step).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional, Protocol

import numpy as np


class TeacherProtocol(Protocol):
    def __call__(self, xt_256_pm1: np.ndarray,
                 source_embed: np.ndarray) -> dict:
        """Returns {'teacher_y': (B,256,256,3) pm1, 'teacher_embed': (B,512)}."""


class JaxTeacher:
    """Frozen ghost-tpu AEI generator as teacher (train-self.py parity)."""

    def __init__(self, gen_mod, gen_vars, arc_apply: Optional[Callable] = None):
        import jax

        self._fwd = jax.jit(
            lambda v, xt, z: gen_mod.apply(v, xt, z)[0]
        )
        self.gen_vars = gen_vars
        self.arc_apply = arc_apply

    def __call__(self, xt_256_pm1, source_embed):
        import jax.numpy as jnp

        y = self._fwd(self.gen_vars, jnp.asarray(xt_256_pm1),
                      jnp.asarray(source_embed))
        out = {"teacher_y": np.asarray(y)}
        if self.arc_apply is not None:
            from ghost_tpu.nn.layers import resize

            emb = self.arc_apply(resize(y, (112, 112), method="area"))
            out["teacher_embed"] = np.asarray(emb)
        return out


class OnnxInswapperTeacher:
    """insightface inswapper_128.onnx teacher (reference train.py:42-174).

    Batched: one session.run per batch at 128x128 instead of the
    reference's per-sample loop. Requires onnxruntime + the model file;
    construction raises ImportError/FileNotFoundError otherwise (callers
    gate on `onnx_teacher_available`).
    """

    def __init__(self, model_path: str, emap: Optional[np.ndarray] = None):
        import onnxruntime  # noqa: F401  (gated dependency)

        self.session = onnxruntime.InferenceSession(
            model_path, providers=["CPUExecutionProvider"]
        )
        # emap: 512x512 embedding projection shipped inside the
        # inswapper model metadata (reference train.py:50-57)
        self.emap = emap
        inputs = self.session.get_inputs()
        self.input_names = [i.name for i in inputs]

    def project_embedding(self, embed: np.ndarray) -> np.ndarray:
        e = embed
        if self.emap is not None:
            e = e @ self.emap
        n = np.linalg.norm(e, axis=-1, keepdims=True)
        return (e / np.maximum(n, 1e-12)).astype(np.float32)

    def __call__(self, xt_256_pm1, source_embed):
        import cv2

        b = xt_256_pm1.shape[0]
        # inswapper eats 128x128 [0,1] NCHW RGB
        blobs = np.empty((b, 3, 128, 128), np.float32)
        for i in range(b):
            img01 = (xt_256_pm1[i] * 0.5 + 0.5).astype(np.float32)
            img = cv2.resize(img01, (128, 128), interpolation=cv2.INTER_AREA)
            blobs[i] = img.transpose(2, 0, 1)
        latent = self.project_embedding(source_embed)
        pred = self.session.run(
            None, {self.input_names[0]: blobs, self.input_names[1]: latent}
        )[0]
        # back to 256 pm1 NHWC
        out = np.empty((b, 256, 256, 3), np.float32)
        for i in range(b):
            img = pred[i].transpose(1, 2, 0)
            out[i] = cv2.resize(img, (256, 256), interpolation=cv2.INTER_CUBIC)
        return {"teacher_y": out * 2.0 - 1.0}


class UpsampledTeacher:
    """--teacher_upsample (reference train.py:228-229): teacher outputs
    are routed through the SR upscaler before the residual loss. The
    reference wraps GFPGAN/RealESRGAN `upscale`
    (utils/training/upsampler.py:107-120); natively any jitted
    (B,256,256,3) pm1 -> pm1 enhancer works (extra_trainers
    .sr_upscale_fn over LIPSPADE is the CLI default)."""

    def __init__(self, teacher, upscale_fn):
        self.teacher = teacher
        self.upscale_fn = upscale_fn

    def __call__(self, xt_256_pm1, source_embed):
        out = self.teacher(xt_256_pm1, source_embed)
        out["teacher_y"] = np.asarray(
            self.upscale_fn(out["teacher_y"]), np.float32)
        return out


def build_inswapper_teacher(model_path: str):
    """Best-available inswapper_128 teacher for --mode distill.

    Prefers the native JAX graph executor (ghost_tpu.convert.onnx_exec)
    so distillation runs without onnxruntime — the reference hard-
    depends on an onnxruntime session per batch (train.py:42-57).
    Falls back to OnnxInswapperTeacher when onnxruntime is installed.
    """
    import os

    if not model_path:
        raise SystemExit("--mode distill needs --teacher_onnx <inswapper_128.onnx>")
    if not os.path.exists(model_path):
        raise SystemExit(f"teacher model not found: {model_path!r}")
    try:
        from ghost_tpu.train.distill_native import NativeInswapperTeacher

        return NativeInswapperTeacher(model_path)
    except Exception as e:  # graph uses ops the executor lacks
        if onnx_teacher_available():
            print(f"native ONNX executor failed ({e}); "
                  "falling back to onnxruntime")
            return OnnxInswapperTeacher(model_path)
        raise SystemExit(
            f"cannot build inswapper teacher: native executor failed "
            f"({e}) and onnxruntime is unavailable")


def onnx_teacher_available() -> bool:
    try:
        import onnxruntime  # noqa: F401

        return True
    except ImportError:
        return False


class TeacherPrefetcher:
    """Runs the teacher one batch ahead on a worker thread."""

    def __init__(self, teacher: TeacherProtocol, batches: Iterator[dict],
                 depth: int = 2):
        self.teacher = teacher
        self._out: queue.Queue = queue.Queue(maxsize=depth)
        self._thread = threading.Thread(
            target=self._run, args=(batches,), daemon=True
        )
        self._thread.start()

    def _run(self, batches):
        for batch in batches:
            t = self.teacher(batch["xt"], batch["embed"])
            batch = dict(batch)
            batch.update(t)
            self._out.put(batch)
        self._out.put(None)

    def __iter__(self):
        while True:
            item = self._out.get()
            if item is None:
                return
            yield item
