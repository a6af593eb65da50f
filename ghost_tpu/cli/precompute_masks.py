"""Precompute soft face masks for mask training.

The reference precomputes Segment-Anything masks prompted with the 5
face keypoints (reference segment_anything_celeba.py:53-63) as targets
for train-mask.py. Two target sources are supported:

- default: the 106-landmark convex-hull soft mask (ops/mask.py — the
  same construction the inference paste-back uses, reference
  utils/inference/masks.py);
- --sam_path ckpt.pth: the native Segment-Anything port
  (models/sam.py) prompted with the 5 face keypoints, matching the
  reference's segment_anything_celeba.py flow.

Precomputed .npy masks from any external tool also work — point
train-mask's --mask_source at them.

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
    p.add_argument("--sam_path", default="",
                   help="SAM checkpoint (.pth): generate targets with the "
                        "native Segment-Anything prompted by the 5 face "
                        "keypoints (reference segment_anything_celeba.py:"
                        "53-63) instead of hull masks")
    p.add_argument("--sam_preset", default="vit_h",
                   choices=["vit_b", "vit_l", "vit_h"])
    return p


def sam_mask_loop(pred, input_dir: str, output_dir: str):
    """SAM targets (reference train-mask.py:236-274): prompt with the
    5 face keypoints. Inputs are norm_crop-aligned crops, so the
    keypoints sit at the arcface template scaled to the crop — no
    detector pass needed on already-aligned data."""
    import cv2
    import numpy as np

    from ghost_tpu.ops.umeyama import ARCFACE_TEMPLATE

    kps = np.asarray(ARCFACE_TEMPLATE, np.float32) * (256.0 / 112.0)
    for f in sorted(glob.glob(os.path.join(input_dir, "*.*g"))):
        img = cv2.imread(f)
        if img is None:
            continue
        img = cv2.resize(img[:, :, ::-1], (256, 256))
        masks, _iou, _logits = pred.predict_points(
            img, kps, np.ones(5), multimask_output=False)
        base = os.path.splitext(os.path.basename(f))[0]
        cv2.imwrite(os.path.join(output_dir, f"{base}.png"),
                    (masks[0] * 255).astype(np.uint8))


def main(argv=None):
    import cv2
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ghost_tpu.models.landmark import Landmark106, landmarks_from_crops
    from ghost_tpu.ops.mask import face_mask_batch

    args = build_parser().parse_args(argv)
    os.makedirs(args.output_dir, exist_ok=True)

    if args.sam_path:
        from ghost_tpu.models.sam import SamPredictor, build_sam

        model = build_sam(args.sam_preset)
        if args.sam_path.endswith(".msgpack"):
            from ghost_tpu.core.checkpoint import load_msgpack

            tree = load_msgpack(args.sam_path)
        else:
            from ghost_tpu.convert.torch_loader import (
                convert_sam_state_dict, load_torch_checkpoint)

            depth = {"vit_b": 12, "vit_l": 24, "vit_h": 32}[args.sam_preset]
            tree = convert_sam_state_dict(
                load_torch_checkpoint(args.sam_path), depth=depth)
        variables = jax.tree.map(jnp.asarray, tree)
        sam_mask_loop(SamPredictor(model, variables),
                      args.input_dir, args.output_dir)
        print("done (SAM)")
        return

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
        imgs, kept = [], []
        for f in chunk:
            img = cv2.imread(f)
            if img is None:
                # zip against the KEPT files only: pairing masks with the
                # original chunk would shift every mask after an unreadable
                # file onto the wrong basename
                continue
            imgs.append(cv2.resize(img[:, :, ::-1], (256, 256)))
            kept.append(f)
        if not imgs:
            continue
        # Pad short chunks (tail, or unreadable files skipped) up to
        # batch_size by repeating the last kept image: every call to the
        # jitted masks_for then sees ONE batch shape, so skipped files
        # can't trigger per-shape retraces (expensive over the TPU
        # relay). Only the first len(kept) outputs are written.
        n_kept = len(imgs)
        while len(imgs) < args.batch_size:
            imgs.append(imgs[-1])
        batch = jnp.asarray(np.stack(imgs), jnp.float32)
        out = np.asarray(masks_for(batch))[:n_kept]
        for f, m in zip(kept, out):
            base = os.path.splitext(os.path.basename(f))[0]
            cv2.imwrite(os.path.join(args.output_dir, f"{base}.png"),
                        (m[..., 0] * 255).astype(np.uint8))
    print("done")


if __name__ == "__main__":
    main()
