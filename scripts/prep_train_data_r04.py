"""Build the round-4 overfit training set: aligned 256px face crops.

Runs the REAL SCRFD-2.5GF checkpoint (the one real weight file in this
image, reference coordinate_reg/model/SCRFD/model_25GF.pth) over the
reference's example portraits (reference examples/images/) through our
own detect -> estimate_norm -> warp_affine alignment path, and saves
the top-scoring face crop of each as assets/train_crops_r04.npy
(N,256,256,3 uint8 RGB).

This is the fixed dataset the TRAIN_r04 convergence runs overfit
(VERDICT round 3, next-round item 1). CPU-only — keeps the TPU relay
queue free for the training job itself.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/prep_train_data_r04.py
"""

from __future__ import annotations

import os

import numpy as np

CKPT = "/root/reference/coordinate_reg/model/SCRFD/model_25GF.pth"
IMAGES = "/root/reference/examples/images"
OUT = os.path.join(os.path.dirname(__file__), "..", "assets",
                   "train_crops_r04.npy")


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import cv2
    import jax.numpy as jnp

    from ghost_tpu.convert.torch_loader import (convert_scrfd_state_dict,
                                                load_torch_checkpoint)
    from ghost_tpu.core.precision import FULL_PRECISION
    from ghost_tpu.models.scrfd import decode_detections, preprocess_frames
    from ghost_tpu.models.scrfd_v1e import SCRFD_2_5GF, SCRFDV1e
    sd = load_torch_checkpoint(CKPT)
    variables = jax.tree.map(jnp.asarray, convert_scrfd_state_dict(sd))
    model = SCRFDV1e(arch=SCRFD_2_5GF, policy=FULL_PRECISION)

    @jax.jit
    def detect(frame):
        canvas, scale = preprocess_frames(frame, 640)
        outs = model.apply(variables, canvas.astype(jnp.float32))
        scores, boxes, _kps = decode_detections(
            outs, input_size=640, score_thresh=0.45, max_faces=4,
            iou_thresh=0.45)
        # NOTE: model_25GF.pth is the kps-LESS SCRFD-2.5GF variant (no
        # landmark branch in the checkpoint — decode returns anchor
        # centers for kps), so crops come from the BOX: expanded to a
        # square with 30% margin, resized to 256. Rough-but-centered
        # alignment is all an overfit convergence run needs.
        return scores, boxes / scale

    names = sorted(
        n for n in os.listdir(IMAGES)
        if n.lower().endswith((".jpg", ".jpeg", ".png"))
    )
    crops = []
    for name in names:
        img = cv2.cvtColor(cv2.imread(os.path.join(IMAGES, name)),
                           cv2.COLOR_BGR2RGB)
        scores, boxes = detect(jnp.asarray(img[None]))
        scores = np.asarray(scores[0])
        if scores[0] <= 0:
            print(f"{name}: no face, skipped")
            continue
        x0, y0, x1, y1 = np.asarray(boxes[0, 0])
        cx, cy = (x0 + x1) / 2, (y0 + y1) / 2
        half = max(x1 - x0, y1 - y0) * 0.65
        h, w = img.shape[:2]
        lx, ly = int(max(cx - half, 0)), int(max(cy - half, 0))
        hx, hy = int(min(cx + half, w)), int(min(cy + half, h))
        crop = cv2.resize(img[ly:hy, lx:hx], (256, 256),
                          interpolation=cv2.INTER_AREA)
        crops.append(crop)
        print(f"{name}: score={scores[0]:.3f} -> crop {crops[-1].shape}")

    crops = np.stack(crops)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.save(OUT, crops)
    # contact sheet for eyeballing alignment
    sheet = np.concatenate(list(crops), axis=1)
    cv2.imwrite(os.path.join(os.path.dirname(OUT), "train_crops_r04.jpg"),
                sheet[:, :, ::-1])
    print(f"saved {crops.shape} -> {OUT}")


if __name__ == "__main__":
    main()
