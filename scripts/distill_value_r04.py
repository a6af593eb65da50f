"""DISTILL_VALUE_r04: show the enhancer-distillation machinery learns
real super-resolution (VERDICT round 3, next-round item 5).

`cli/distill_enhancer` exists because the quality path's frozen oracles
(GFPGAN/RRDB, reference utils/training/upsampler.py:20-120) are
FLOP-walled at serving (PERF.md §3); its value claim — quality at
serving FLOPs — had only smoke/contract tests. This script demonstrates
the value with no external weights: HR images are their own ground
truth through the on-device degradation sampler
(train/distill_enhancer.degrade — blur + resize wobble + noise + x4
downscale), i.e. the standard Real-ESRGAN self-supervised recipe.

  * data: 128x128 HR patches from the reference example images,
    3 images HELD OUT entirely (never sampled for training);
  * student: SRVGGNetCompact x4 (the serving bg trunk);
  * train: a few thousand steps of make_enhancer_distill_step on
    (degrade(hq) -> hq) pairs, fresh random degradations every step;
  * report: held-out PSNR of student(lq) vs hq, against (a) bicubic
    upscale of lq and (b) the untrained student — the student must
    beat both by a clear margin.

Runs on the TPU (background, no timeout — relay rule). CPU smoke:
GHOST_DISTILL_R04_TINY=1 (narrow student, few steps, /tmp artifact).

Writes DISTILL_VALUE_r04.json at the repo root.
Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/distill_value_r04.py
"""

from __future__ import annotations

import glob
import json
import os
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
IMAGES = "/root/reference/examples/images"
TINY = os.environ.get("GHOST_DISTILL_R04_TINY", "") == "1"
OUT = "/tmp/DISTILL_VALUE_r04.json" if TINY else os.path.join(
    REPO, "DISTILL_VALUE_r04.json")
STEPS = int(os.environ.get("GHOST_DISTILL_R04_STEPS",
                           "60" if TINY else "40000"))
HELD_OUT = ("beckham.jpg", "murakami.jpg", "tgt2.png")
PATCH, SCALE, BATCH = 128, 4, 64


def harvest_patches(names, per_image, rng):
    """Detail-biased patch harvest: sample 4x candidates per image and
    keep the quarter with the highest gradient energy — smooth portrait
    backgrounds make x4 SR trivially invertible (a bilinear upscale
    already scores ~34 dB there), so the value demo must run on patches
    where detail actually exists to recover."""
    import cv2

    out = []
    for name in names:
        img = cv2.imread(os.path.join(IMAGES, name))
        if img is None:
            continue
        img = img[:, :, ::-1].astype(np.float32) / 255.0
        h, w = img.shape[:2]
        if min(h, w) < PATCH:
            continue
        cands = []
        for _ in range(4 * per_image):
            y = rng.integers(0, h - PATCH + 1)
            x = rng.integers(0, w - PATCH + 1)
            p = img[y:y + PATCH, x:x + PATCH]
            g = np.abs(np.diff(p, axis=0)).mean() + np.abs(
                np.diff(p, axis=1)).mean()
            cands.append((float(g), p))
        cands.sort(key=lambda t: -t[0])
        out.extend(p for _, p in cands[:per_image])
    return np.stack(out)


def main():
    import jax

    if TINY:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/ghost_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp

    from ghost_tpu.core.precision import DEFAULT_POLICY, FULL_PRECISION
    from ghost_tpu.models.sr.srvgg import SRVGGNetCompact
    from ghost_tpu.nn.layers import resize
    from ghost_tpu.train.distill_enhancer import (degrade,
                                                  make_enhancer_distill_step)
    from ghost_tpu.utils.quality import psnr

    def images_in(rel=""):
        d = os.path.join(IMAGES, rel)
        return sorted(
            os.path.join(rel, n) for n in os.listdir(d)
            if n.lower().endswith((".jpg", ".jpeg", ".png")))

    # top-level portraits + the reference's examples/images/training set
    names = images_in() + images_in("training")
    train_names = [n for n in names if os.path.basename(n) not in
                   HELD_OUT]
    rng = np.random.default_rng(0)
    train_hq = harvest_patches(train_names, 64, rng)
    test_hq = harvest_patches(HELD_OUT, 16, rng)
    print(f"train patches: {train_hq.shape}, held-out: {test_hq.shape}",
          flush=True)

    policy = FULL_PRECISION if TINY else DEFAULT_POLICY
    feat, nconv = (8, 2) if TINY else (64, 32)  # serving trunk size
    student = SRVGGNetCompact(num_feat=feat, num_conv=nconv,
                              upscale=SCALE, policy=policy)
    lq_size = (PATCH // SCALE, PATCH // SCALE)
    s_vars = student.init(jax.random.key(0),
                          jnp.zeros((1, *lq_size, 3)))
    # cosine-decayed Adam (b1=0.9 default — the Real-ESRGAN recipe;
    # see make_enhancer_distill_step's docstring for why NOT ghost_adam)
    import optax
    lr = 2e-4 if TINY else optax.cosine_decay_schedule(
        3e-4, STEPS, alpha=0.05)
    step, tx = make_enhancer_distill_step(student, lr=lr)
    s_params0, s_opt = s_vars["params"], tx.init(s_vars["params"])

    # one fused jitted step: batch selection + fresh degradation +
    # student update in a single program. The training set stays
    # device-resident (uploading the 18 MB patch array every step costs
    # ~0.2 s over this relay's ~100 MB/s H2D — it dominated the step).
    train_hq_d = jnp.asarray(train_hq)

    @jax.jit
    def train_step(params, opt, key, hq_all):
        k_b, k_d = jax.random.split(key)
        idx = jax.random.randint(k_b, (BATCH,), 0, hq_all.shape[0])
        hq = hq_all[idx]
        lq = degrade(k_d, hq, lq_size)
        return step(params, opt, lq, hq)

    # held-out evaluation: FIXED degradations (same lq for every
    # contestant), PSNR in [0,1] space
    eval_lq = np.asarray(jax.jit(
        lambda k, x: degrade(k, x, lq_size))(jax.random.key(99),
                                             jnp.asarray(test_hq)))

    @jax.jit
    def eval_psnr(params, lq, hq):
        y = student.apply({"params": params}, lq)
        y = jnp.clip(y.astype(jnp.float32), 0.0, 1.0)
        return jnp.mean(psnr(y * 255.0, hq * 255.0))

    @jax.jit
    def bicubic_psnr(lq, hq):
        y = jnp.clip(resize(lq, (PATCH, PATCH), method="bilinear"),
                     0.0, 1.0)
        return jnp.mean(psnr(y * 255.0, hq * 255.0))

    lq_j, hq_j = jnp.asarray(eval_lq), jnp.asarray(test_hq)
    base_interp = float(bicubic_psnr(lq_j, hq_j))
    base_untrained = float(eval_psnr(s_params0, lq_j, hq_j))

    params, opt = s_params0, s_opt
    key = jax.random.key(1)
    t0 = time.time()
    losses = {}
    for it in range(STEPS):
        key, k = jax.random.split(key)
        params, opt, metrics = train_step(params, opt, k, train_hq_d)
        if it % 200 == 0 or it == STEPS - 1:
            l1 = float(metrics["l1"])
            losses[it] = round(l1, 5)
            print(f"step {it}: l1={l1:.5f} "
                  f"({(time.time() - t0):.0f}s)", flush=True)
    wall = time.time() - t0

    final = float(eval_psnr(params, lq_j, hq_j))
    artifact = {
        "round": 4,
        "methodology": (
            "self-supervised SR value demo: SRVGG x4 student trained on "
            "(degrade(HR) -> HR) pairs via make_enhancer_distill_step; "
            "held-out images NEVER sampled in training; all contestants "
            "evaluated on the SAME fixed degradations."),
        "student": {"num_feat": feat, "num_conv": nconv,
                    "upscale": SCALE},
        "steps": STEPS,
        "train_patches": int(train_hq.shape[0]),
        "held_out_patches": int(test_hq.shape[0]),
        "held_out_images": list(HELD_OUT),
        "l1_series": losses,
        "psnr_db": {
            "bilinear_upscale_baseline": round(base_interp, 3),
            "student_untrained": round(base_untrained, 3),
            "student_trained": round(final, 3),
            "gain_vs_bilinear": round(final - base_interp, 3),
            "gain_vs_untrained": round(final - base_untrained, 3),
        },
        "wall_s": round(wall, 1),
    }
    with open(OUT, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps(artifact["psnr_db"], indent=1), flush=True)
    print(f"wrote {OUT}", flush=True)


if __name__ == "__main__":
    main()
