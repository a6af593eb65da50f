"""Build the round-4 VIDEO training set: aligned 256px face crops from
the reference's example videos.

The 7-portrait fixed set (prep_train_data_r04.py) is ideal for the
distillation-collapse records but degenerate for canonical GAN
dynamics: a full-width multiscale D memorizes 7 reals within a few
hundred steps, the hinge saturates, and G can fall into the
instance-norm blind spot (constant output) — observed as the black Y
column at step 1200 of the first canonical_noaug run (TRAIN_r04.json).
A few hundred DISTINCT frames keep D honest, so reconstruction/identity
actually converge the way the reference's multi-day runs do
(reference TRAINME.txt:267-288).

Harvest: decode every reference example mp4 (reference
examples/videos/*.mp4) at a stride that lands ~200 frames per video,
detect with the REAL SCRFD-2.5GF checkpoint (the one real weight file
in this image), crop the top face per frame exactly like
prep_train_data_r04.py (square box, 30% margin, 256px), and save
assets-sized batches to /tmp (the array is ~100 MB — too big to commit;
the contact-sheet sample + this script are the committed provenance).

CPU-only — keeps the TPU relay queue free for the training job itself.
Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/prep_video_data_r04.py
"""

from __future__ import annotations

import os

import numpy as np

CKPT = "/root/reference/coordinate_reg/model/SCRFD/model_25GF.pth"
VIDEOS = "/root/reference/examples/videos"
OUT = "/tmp/ghost_video_crops_r04.npy"
SHEET = os.path.join(os.path.dirname(__file__), "..", "assets",
                     "train_video_crops_r04_sample.jpg")
PER_VIDEO = int(os.environ.get("GHOST_PREP_PER_VIDEO", "200"))


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
        return scores, boxes / scale

    crops = []
    for name in sorted(os.listdir(VIDEOS)):
        if not name.endswith(".mp4"):
            continue
        cap = cv2.VideoCapture(os.path.join(VIDEOS, name))
        n_frames = int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) or 1
        stride = max(1, n_frames // PER_VIDEO)
        kept, idx = 0, 0
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            idx += 1
            if (idx - 1) % stride:
                continue
            img = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
            scores, boxes = detect(jnp.asarray(img[None]))
            scores = np.asarray(scores[0])
            if scores[0] <= 0:
                continue
            x0, y0, x1, y1 = np.asarray(boxes[0, 0])
            cx, cy = (x0 + x1) / 2, (y0 + y1) / 2
            half = max(x1 - x0, y1 - y0) * 0.65
            h, w = img.shape[:2]
            lx, ly = int(max(cx - half, 0)), int(max(cy - half, 0))
            hx, hy = int(min(cx + half, w)), int(min(cy + half, h))
            if hx - lx < 32 or hy - ly < 32:
                continue
            crops.append(cv2.resize(img[ly:hy, lx:hx], (256, 256),
                                    interpolation=cv2.INTER_AREA))
            kept += 1
        cap.release()
        print(f"{name}: {n_frames} frames, stride {stride}, "
              f"kept {kept} crops", flush=True)

    crops = np.stack(crops)
    np.save(OUT, crops)
    # 16-crop contact sheet for eyeballing alignment (committed)
    sel = crops[:: max(1, len(crops) // 16)][:16]
    sheet = np.concatenate(list(sel), axis=1)
    cv2.imwrite(SHEET, sheet[:, :, ::-1])
    print(f"saved {crops.shape} -> {OUT}; sheet -> {SHEET}")


if __name__ == "__main__":
    main()
