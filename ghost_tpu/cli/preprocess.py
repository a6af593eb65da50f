"""Dataset preprocessing CLI — preprocess_{vgg,celeba,gender}.py parity.

  * vgg mode: VGGFace2-style tree -> per-identity aligned crops, capped
    at --max_images_per_dir (reference preprocess_vgg.py:14-43);
  * celeba mode: flat dir -> 256 aligned crops with optional
    --max_darken brightness sweep (reference preprocess_celeba.py:31-47);
  * gender mode: split aligned crops into male/female dirs via a
    logistic head over the ArcFace embedding (the TPU-native stand-in
    for insightface buffalo_l's genderage model the reference drives,
    preprocess_gender.py:8-39); head weights via --gender_head_path.

Detection/alignment run on-device through the SwapPipeline's detector
in batches instead of per-image host calls.
"""

from __future__ import annotations

import argparse
import glob
import os


def build_parser():
    p = argparse.ArgumentParser(description="ghost-tpu dataset preprocessing")
    p.add_argument("--mode", default="celeba",
                   choices=["vgg", "celeba", "gender"])
    p.add_argument("--input_dir", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--gender_head_path", default="",
                   help="msgpack {'w': (512,), 'b': ()} logistic gender "
                        "head over ArcFace embeddings (--mode gender)")
    p.add_argument("--arcface_path", default="weights/backbone.pth")
    p.add_argument("--crop_size", default=256, type=int)
    p.add_argument("--max_images_per_dir", default=8, type=int)
    p.add_argument("--max_darken", default=0, type=int,
                   help="emit N progressively darkened variants per crop")
    p.add_argument("--detector_path", default="")
    return p


def main(argv=None):
    import cv2
    import numpy as np

    from ghost_tpu.pipeline.swap import SwapConfig, build_random_pipeline

    args = build_parser().parse_args(argv)
    cfg = SwapConfig(crop_size=args.crop_size)
    pipe = build_random_pipeline(cfg)
    if args.detector_path:
        from ghost_tpu.core.checkpoint import load_msgpack

        pipe.det_vars = load_msgpack(args.detector_path)
        pipe._vars["det"] = pipe.det_vars
    else:
        print("WARNING: random detector weights; crops will be arbitrary")

    if args.mode == "vgg":
        folders = sorted(glob.glob(os.path.join(args.input_dir, "*")))
        for folder in folders:
            out_dir = os.path.join(args.output_dir, os.path.basename(folder))
            os.makedirs(out_dir, exist_ok=True)
            images = sorted(glob.glob(os.path.join(folder, "*.*g")))
            kept = 0
            for path in images:
                if kept >= args.max_images_per_dir:
                    break
                img = cv2.imread(path)
                if img is None:
                    continue
                crops, scores = pipe.crop_faces(img[:, :, ::-1])
                if crops.shape[0] == 0:
                    continue
                cv2.imwrite(os.path.join(out_dir, f"{kept}.jpg"),
                            crops[0][:, :, ::-1])
                kept += 1
    elif args.mode == "gender":
        # preprocess_gender parity (reference preprocess_gender.py:8-39):
        # split aligned crops into male/female dirs. The reference uses
        # insightface buffalo_l's genderage model; TPU-native path: a
        # logistic head over the ArcFace embedding (gender is ~linearly
        # separable in that space). Head weights via --gender_head_path.
        from ghost_tpu.core.checkpoint import load_msgpack

        if args.gender_head_path:
            head = load_msgpack(args.gender_head_path)
            w = np.asarray(head["w"], np.float32)
            b = float(np.asarray(head["b"]))
        else:
            print("WARNING: random gender head (--gender_head_path not "
                  "given); split will be arbitrary")
            w = np.random.default_rng(0).normal(0, 0.1, (512,)).astype(
                np.float32)
            b = 0.0
        male_dir = os.path.join(args.output_dir, "male")
        female_dir = os.path.join(args.output_dir, "female")
        os.makedirs(male_dir, exist_ok=True)
        os.makedirs(female_dir, exist_ok=True)
        images = sorted(glob.glob(os.path.join(args.input_dir, "*.*g")))
        for path in images:
            img = cv2.imread(path)
            if img is None:
                continue
            crops, _ = pipe.crop_faces(img[:, :, ::-1])
            if crops.shape[0] == 0:
                continue
            emb = np.asarray(pipe.embed_targets(crops[:1]))[0]
            is_male = float(emb @ w + b) > 0.0
            out_dir = male_dir if is_male else female_dir
            cv2.imwrite(os.path.join(out_dir, os.path.basename(path)),
                        crops[0][:, :, ::-1])
    else:  # celeba
        os.makedirs(args.output_dir, exist_ok=True)
        images = sorted(glob.glob(os.path.join(args.input_dir, "*.*g")))
        for path in images:
            img = cv2.imread(path)
            if img is None:
                continue
            crops, _ = pipe.crop_faces(img[:, :, ::-1])
            if crops.shape[0] == 0:
                continue
            base = os.path.splitext(os.path.basename(path))[0]
            crop = crops[0]
            cv2.imwrite(os.path.join(args.output_dir, f"{base}.jpg"),
                        crop[:, :, ::-1])
            # brightness sweep (preprocess_celeba.py:31-47)
            for d in range(1, args.max_darken + 1):
                factor = 1.0 - d / (args.max_darken + 1)
                dark = np.clip(crop.astype(np.float32) * factor, 0,
                               255).astype(np.uint8)
                cv2.imwrite(
                    os.path.join(args.output_dir, f"{base}_d{d}.jpg"),
                    dark[:, :, ::-1])
    print("done")


if __name__ == "__main__":
    main()
