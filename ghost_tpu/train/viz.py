"""Training visualization helpers (reference utils/training/image_processing.py).

`make_image_list` builds the side-by-side comparison grid the reference
dumps every show_step; `get_faceswap` is the sanity-swap smoke check
(:69-88): swap a fixed (source, target) pair through the current G.
"""

from __future__ import annotations

import numpy as np


def tensor_to_image(x_pm1) -> np.ndarray:
    """(H,W,3) pm1 -> uint8 RGB (torch2image parity)."""
    x = np.asarray(x_pm1)
    return np.clip((x * 0.5 + 0.5) * 255.0, 0, 255).astype(np.uint8)


def make_image_list(batches, max_rows: int = 4) -> np.ndarray:
    """List of (B,H,W,3) pm1 arrays -> one uint8 grid (columns = batches)."""
    rows = []
    n = min(min(b.shape[0] for b in batches), max_rows)
    for i in range(n):
        rows.append(np.concatenate([tensor_to_image(b[i]) for b in batches],
                                   axis=1))
    return np.concatenate(rows, axis=0)


def get_faceswap(gen_apply, variables, source_path: str, target_path: str,
                 arc_apply=None):
    """Sanity swap of two image files through the current generator."""
    import cv2
    import jax.numpy as jnp

    from ghost_tpu.nn.layers import resize

    src = cv2.imread(source_path)[:, :, ::-1]
    tgt = cv2.imread(target_path)[:, :, ::-1]
    src = cv2.resize(src, (224, 224)).astype(np.float32) / 127.5 - 1.0
    tgt = cv2.resize(tgt, (256, 256)).astype(np.float32) / 127.5 - 1.0
    if arc_apply is not None:
        emb = arc_apply(resize(jnp.asarray(src[None]), (112, 112),
                               method="area"))
    else:
        emb = jnp.zeros((1, 512))
    y = gen_apply(variables, jnp.asarray(tgt[None]), emb)
    if isinstance(y, tuple):
        y = y[0]
    return make_image_list([src[None], tgt[None], np.asarray(y)])
