"""Train and SHIP the serving-seat SR student (round 5).

`cli/inference --use_sr 1 --sr_model srvgg_student --sr_path <ckpt>`
mounts SRVGGStudentSeat (models/sr/srvgg.py) — the 98.6-fps config-4
quality path (BENCH_EXTRA_r05.json) — but until this round the repo
shipped no trained checkpoint for it: users had to run
`cli/distill_enhancer` themselves and the bench/value artifacts used
session-local weights. This script trains the PRODUCT seat student
(SRVGGNetCompact 32f/16c, x2 — exactly the config the seat serves and
the bench measured) on the round-5 corpus (658 aligned video face
crops + the 16 reference portraits, scripts/prep_video_data_r04.py)
with the same Real-ESRGAN-style degradation self-supervision as
DISTILL_VALUE_r05, and commits:

  * assets/srvgg_student_x2_r05.msgpack  (~0.8 MB, f32 params) —
    loadable by the CLI via core.checkpoint.load_msgpack +
    srvgg_from_variables (hyperparams inferred from shapes);
  * docs/student_seat_r05.json — held-out metrics for the shipped
    weights (same protocol as DISTILL_VALUE_r05: 3 portraits never
    trained on, fixed eval degradations, PSNR vs bilinear x2).

tests/test_student_seat_asset.py executes the committed checkpoint
end-to-end (load -> seat -> output sane; beats bilinear on held-out).

Reference anchor: realesr-general-x4v3 — the compact distilled weight
the reference actually serves (reference Dockerfile:65-68) — is the
CUDA-world version of this artifact.

Usage (TPU, background, no timeout):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/train_student_seat_r05.py
CPU smoke: GHOST_SEAT_R05_TINY=1.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
VIDEO_CROPS = "/tmp/ghost_video_crops_r04.npy"
TINY = os.environ.get("GHOST_SEAT_R05_TINY", "") == "1"
CKPT = os.path.join(REPO, "assets", "srvgg_student_x2_r05.msgpack")
METRICS = os.path.join(REPO, "docs", "student_seat_r05.json")
if TINY:
    CKPT, METRICS = "/tmp/seat_tiny.msgpack", "/tmp/seat_tiny.json"
STEPS = int(os.environ.get("GHOST_SEAT_R05_STEPS",
                           "60" if TINY else "60000"))
HELD_OUT = ("beckham.jpg", "murakami.jpg", "tgt2.png")
PATCH, SCALE, BATCH = 128, 2, 8 if TINY else 128


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def main():
    import jax

    if TINY:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/ghost_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp
    import optax

    from ghost_tpu.core.checkpoint import save_msgpack
    from ghost_tpu.core.precision import DEFAULT_POLICY, FULL_PRECISION
    from ghost_tpu.models.sr.srvgg import SRVGGNetCompact
    from ghost_tpu.nn.layers import resize
    from ghost_tpu.train.distill_enhancer import (degrade,
                                                  make_enhancer_distill_step)
    from ghost_tpu.utils.quality import psnr

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from distill_value_r05 import (images_in_dir, patches_from_crops,
                                   patches_from_images)

    rng = np.random.default_rng(0)
    names = images_in_dir() + images_in_dir("training")
    train_names = [n for n in names
                   if os.path.basename(n) not in HELD_OUT]
    portrait = patches_from_images(train_names, 64, rng)

    crops = np.load(VIDEO_CROPS)
    if not TINY and len(crops) < 300:
        raise SystemExit("stale crops file — run prep_video_data_r04.py")
    if TINY:
        crops = crops[:8]
    video = patches_from_crops(crops, 3, rng)
    train_hq = np.stack(portrait + video)
    test_hq = np.stack(patches_from_images(HELD_OUT, 16, rng))
    assert len(test_hq) == 16 * len(HELD_OUT), test_hq.shape
    log(f"train {train_hq.shape}, held-out {test_hq.shape}")

    policy = FULL_PRECISION if TINY else DEFAULT_POLICY
    feat, nconv = (8, 2) if TINY else (32, 16)  # THE seat config
    student = SRVGGNetCompact(num_feat=feat, num_conv=nconv,
                              upscale=SCALE, policy=policy)
    lq_size = (PATCH // SCALE, PATCH // SCALE)
    s_vars = student.init(jax.random.key(0), jnp.zeros((1, *lq_size, 3)))
    lr = 2e-4 if TINY else optax.cosine_decay_schedule(
        3e-4, STEPS, alpha=0.02)
    step, tx = make_enhancer_distill_step(student, lr=lr)
    params, opt = s_vars["params"], tx.init(s_vars["params"])

    train_hq_d = jnp.asarray(
        np.clip(train_hq * 255.0 + 0.5, 0, 255).astype(np.uint8))

    @jax.jit
    def train_step(params, opt, key, hq_all_u8):
        k_b, k_d = jax.random.split(key)
        idx = jax.random.randint(k_b, (BATCH,), 0, hq_all_u8.shape[0])
        hq = hq_all_u8[idx].astype(jnp.float32) / 255.0
        lq = degrade(k_d, hq, lq_size)
        return step(params, opt, lq, hq)

    deg = jax.jit(lambda k, x: degrade(k, x, lq_size))
    eval_lq = jnp.asarray(deg(jax.random.key(99), jnp.asarray(test_hq)))
    hq_j = jnp.asarray(test_hq)

    @jax.jit
    def eval_pair(params):
        y = student.apply({"params": params}, eval_lq)
        y = jnp.clip(y.astype(jnp.float32), 0.0, 1.0)
        b = jnp.clip(resize(eval_lq, (PATCH, PATCH), method="bilinear"),
                     0.0, 1.0)
        return (jnp.mean(psnr(y * 255.0, hq_j * 255.0)),
                jnp.mean(psnr(b * 255.0, hq_j * 255.0)))

    key = jax.random.key(1)
    t0 = time.time()
    for it in range(STEPS):
        key, k = jax.random.split(key)
        params, opt, metrics = train_step(params, opt, k, train_hq_d)
        if it % 2000 == 0 or it == STEPS - 1:
            log(f"step {it}: l1={float(metrics['l1']):.5f} "
                f"({time.time() - t0:.0f}s)")
    wall = time.time() - t0

    s_db, b_db = eval_pair(params)
    s_db, b_db = float(s_db), float(b_db)

    params_f32 = jax.tree.map(
        lambda a: np.asarray(a, np.float32), params)
    save_msgpack(CKPT, {"params": params_f32})
    out = {
        "round": 5,
        "checkpoint": os.path.relpath(CKPT, REPO),
        "student": {"num_feat": feat, "num_conv": nconv,
                    "upscale": SCALE},
        "protocol": ("DISTILL_VALUE_r05 protocol at the seat's x2 "
                     "scale: 658-video-crop + portrait corpus, 3 "
                     "held-out portraits, fixed eval degradations "
                     "(key 99)"),
        "steps": STEPS, "batch": BATCH,
        "train_patches": int(train_hq.shape[0]),
        "held_out_psnr_db": {
            "student": round(s_db, 3),
            "bilinear_x2": round(b_db, 3),
            "gain_vs_bilinear": round(s_db - b_db, 3),
        },
        "wall_s": round(wall, 1),
    }
    with open(METRICS, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1), flush=True)
    sz = os.path.getsize(CKPT)
    log(f"wrote {CKPT} ({sz / 1e6:.2f} MB) + {METRICS}")


if __name__ == "__main__":
    main()
