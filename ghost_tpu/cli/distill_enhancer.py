"""Distill a heavy enhancer teacher into a cheap serving trunk.

The reference's enhancement quality path is pinned to GFPGAN/RealESRGAN
FLOP walls (reference utils/training/upsampler.py:20-120; RRDB x4plus
is compute-walled at ~1.4 fps for 1080p on any chip). This CLI is the
TPU-native escape hatch: train an SRVGGNetCompact student to mimic a
converted teacher on degraded data, then serve the student
(cli/inference.py --bg_model srvgg / the face seat).

    # background: RRDB x4plus -> SRVGG x4
    python -m ghost_tpu.cli.distill_enhancer --task background \
        --dataset_path frames/ --teacher_path RealESRGAN_x4plus.pth \
        --out srvgg_distilled.msgpack --steps 20000

    # face: GFPGAN 512-crop restorer -> SRVGG x2 reading 256
    python -m ghost_tpu.cli.distill_enhancer --task face \
        --dataset_path crops512/ --teacher_path GFPGANv1.4.pth \
        --out face_student.msgpack

Teacher weights: official torch checkpoints (.pth, converted on load)
or already-converted .msgpack trees. The whole HQ->degrade->teacher->
student->loss graph runs as two jits per step (teacher pass + student
update), static shapes throughout.
"""

from __future__ import annotations

import argparse
import glob
import os


def build_parser():
    p = argparse.ArgumentParser(description="enhancer distillation")
    p.add_argument("--task", default="background",
                   choices=["background", "face"])
    p.add_argument("--dataset_path", required=True,
                   help="dir of HQ images (frames for background, "
                        "aligned crops for face)")
    p.add_argument("--teacher_path", default="",
                   help="RRDB/GFPGAN weights (.pth or .msgpack)")
    p.add_argument("--student_path", default="", help="resume student")
    p.add_argument("--out", required=True, help="student msgpack out")
    p.add_argument("--hq_size", default=256, type=int,
                   help="HQ patch size (face: crop size, use 512 for "
                        "the real GFPGAN teacher)")
    p.add_argument("--student_feats", default=64, type=int)
    p.add_argument("--student_convs", default=32, type=int)
    p.add_argument("--batch_size", default=8, type=int)
    p.add_argument("--steps", default=10000, type=int)
    p.add_argument("--lr", default=2e-4, type=float)
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--log_every", default=50, type=int)
    p.add_argument("--save_every", default=1000, type=int)
    p.add_argument("--allow_random_weights", action="store_true",
                   help="random teacher (smoke tests only)")
    from ghost_tpu.cli import str2bool

    p.add_argument("--bf16", default=True, type=str2bool)
    return p


def _load_teacher_vars(path: str, module, convert_fn, allow_random: bool,
                       init_shape):
    import jax
    import jax.numpy as jnp

    from ghost_tpu.convert.torch_loader import load_torch_checkpoint
    from ghost_tpu.core.checkpoint import load_msgpack

    if path:
        # an explicitly given path that does not exist is an error even
        # under --allow_random_weights: silently distilling a 10k-step
        # student against a random teacher because of a typo'd filename
        # is the worst possible failure mode
        if not os.path.exists(path):
            raise SystemExit(f"--teacher_path {path!r} does not exist")
        if path.endswith(".msgpack"):
            return load_msgpack(path)
        return jax.tree.map(jnp.asarray,
                            convert_fn(load_torch_checkpoint(path)))
    if allow_random:
        print("WARNING: random teacher weights (smoke mode)")
        return module.init(jax.random.key(1), jnp.zeros(init_shape))
    raise SystemExit("missing --teacher_path")


def _image_batches(paths, size: int, batch: int, seed: int):
    """Endless host-side HQ sampler: decode, random-crop/resize to
    `size`, stack to (B, size, size, 3) in [0, 1] RGB."""
    import cv2
    import numpy as np

    rng = np.random.default_rng(seed)
    while True:
        out = []
        while len(out) < batch:
            f = paths[int(rng.integers(len(paths)))]
            img = cv2.imread(f)
            if img is None:
                continue
            img = img[:, :, ::-1]
            h, w = img.shape[:2]
            if h > size and w > size:
                y = int(rng.integers(h - size + 1))
                x = int(rng.integers(w - size + 1))
                img = img[y:y + size, x:x + size]
            else:
                img = cv2.resize(img, (size, size))
            out.append(img.astype(np.float32) / 255.0)
        yield np.stack(out)


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from ghost_tpu.core.checkpoint import load_msgpack, save_msgpack
    from ghost_tpu.core.precision import DEFAULT_POLICY, FULL_PRECISION
    from ghost_tpu.models.sr.srvgg import SRVGGNetCompact
    from ghost_tpu.train.distill_enhancer import (
        degrade,
        face_student_wrapper,
        make_enhancer_distill_step,
    )

    args = build_parser().parse_args(argv)
    policy = DEFAULT_POLICY if args.bf16 else FULL_PRECISION
    hq = args.hq_size

    paths = sorted(
        f for f in glob.glob(os.path.join(args.dataset_path, "*.*"))
        if f.lower().endswith((".png", ".jpg", ".jpeg", ".bmp", ".webp")))
    if not paths:
        raise SystemExit(f"no images under {args.dataset_path!r}")

    if args.task == "background":
        from ghost_tpu.convert.torch_loader import convert_rrdbnet_state_dict
        from ghost_tpu.models.sr.rrdb import RRDBNet

        teacher_mod = RRDBNet(policy=policy)
        t_vars = _load_teacher_vars(
            args.teacher_path, teacher_mod, convert_rrdbnet_state_dict,
            args.allow_random_weights, (1, hq // 4, hq // 4, 3))
        student = SRVGGNetCompact(num_feat=args.student_feats,
                                  num_conv=args.student_convs,
                                  upscale=4, policy=policy)
        s_init_shape = (1, hq // 4, hq // 4, 3)
        step_student = student

        # teacher vars ride as a jit ARGUMENT (closure capture embeds
        # them as HLO constants — relay HTTP 413, see CLAUDE.md)
        def sample(tv, key, hq01):
            lq = degrade(key, hq01, (hq // 4, hq // 4))
            target = jnp.clip(teacher_mod.apply(tv, lq), 0.0, 1.0)
            return lq, target

    else:  # face
        from ghost_tpu.convert.torch_loader import convert_gfpgan_state_dict
        from ghost_tpu.models.sr.gfpgan import GFPGANClean

        teacher_mod = GFPGANClean(out_size=hq, policy=policy)
        t_vars = _load_teacher_vars(
            args.teacher_path, teacher_mod, convert_gfpgan_state_dict,
            args.allow_random_weights, (1, hq, hq, 3))
        student = SRVGGNetCompact(num_feat=args.student_feats,
                                  num_conv=args.student_convs,
                                  upscale=2, policy=policy)
        s_init_shape = (1, hq // 2, hq // 2, 3)
        step_student = face_student_wrapper(student)

        def sample(tv, key, hq01):
            # same-size degradation; teacher restores the pm1 crop
            deg = degrade(key, hq01, (hq, hq))
            lq_pm1 = deg * 2.0 - 1.0
            out, _ = teacher_mod.apply(tv, lq_pm1)
            return lq_pm1, jnp.clip(out, -1.0, 1.0)

    if args.student_path:
        s_vars = load_msgpack(args.student_path)
    else:
        s_vars = student.init(jax.random.key(args.seed),
                              jnp.zeros(s_init_shape))
    s_params = s_vars["params"]

    step, tx = make_enhancer_distill_step(step_student, lr=args.lr)
    s_opt = tx.init(s_params)
    sample_j = jax.jit(sample)
    step_j = jax.jit(step, donate_argnums=(0, 1))

    key = jax.random.key(args.seed)
    batches = _image_batches(paths, hq, args.batch_size, args.seed)
    for it in range(args.steps):
        key, sub = jax.random.split(key)
        hq01 = jnp.asarray(next(batches))
        lq, target = sample_j(t_vars, sub, hq01)
        s_params, s_opt, metrics = step_j(s_params, s_opt, lq, target)
        if it % args.log_every == 0:
            print(f"step {it}: l1={float(metrics['l1']):.5f}")
        if args.save_every and it and it % args.save_every == 0:
            save_msgpack(args.out, {"params": s_params})
    save_msgpack(args.out, {"params": s_params})
    print(f"saved student to {args.out}")


if __name__ == "__main__":
    main()
