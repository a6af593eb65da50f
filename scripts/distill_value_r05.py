"""DISTILL_VALUE_r05: make the distillation value decisive (VERDICT r4
item 4).

Round 4 proved the machinery *learns* (+1.95 dB over the untrained
student) but the margin over plain bilinear upscale was +0.09 dB — a
wash — and the run self-limited to 16 training images when 658 aligned
video face crops had already been harvested with the real SCRFD
checkpoint (scripts/prep_video_data_r04.py). This round retrains on the
full corpus under the SAME held-out protocol and must clear >=0.3 dB
over the BILINEAR baseline (not the untrained-student strawman).

Identical to r04 (scripts/distill_value_r04.py) in everything that
defines the protocol:
  * student: SRVGGNetCompact(64f/32c, x4) — the serving bg trunk;
  * degradation: train/distill_enhancer.degrade, default ranges;
  * held-out images: beckham.jpg / murakami.jpg / tgt2.png, NEVER
    sampled for training; fixed eval degradations (key 99); PSNR in
    [0,255] space vs the same bilinear-upscale baseline.
Changed (the VERDICT-prescribed levers):
  * training data: detail-biased 128px patches from the 658 aligned
    256px video face crops (re-harvested via prep_video_data_r04.py)
    PLUS the 16 portrait/training images — ~3.3k patches vs r04's 1024;
  * batch 64 -> 128 and steps 40k -> 60k (steps are dispatch-bound over
    this relay, r04 measured ~10 ms/step — the extra compute is free);
  * patches ride to device as uint8 (normalization inside the jitted
    step) so the bigger corpus still uploads in ~1 s.
Added diagnostics (not protocol changes):
  * per-held-out-image PSNR breakdown, so a residual gap can be
    localized instead of hand-waved;
  * a training-DISTRIBUTION held-out split (5% of video crops, never
    trained on) evaluated the same way — separates "didn't learn SR"
    from "these 3 portraits are off-distribution".

Reference anchor: the Real-ESRGAN degradation-self-supervision recipe
the reference wraps as a frozen oracle (reference
utils/training/upsampler.py:90-120); realesr-general-x4v3 — the weight
the reference actually serves — is itself such a distilled compact
model.

Runs on the TPU (background, no timeout — relay rule). CPU smoke:
GHOST_DISTILL_R05_TINY=1. Writes DISTILL_VALUE_r05.json at the repo
root. Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/distill_value_r05.py
(Re-harvest the crops first if /tmp was wiped:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/prep_video_data_r04.py)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
IMAGES = "/root/reference/examples/images"
VIDEO_CROPS = "/tmp/ghost_video_crops_r04.npy"
TINY = os.environ.get("GHOST_DISTILL_R05_TINY", "") == "1"
OUT = "/tmp/DISTILL_VALUE_r05.json" if TINY else os.path.join(
    REPO, "DISTILL_VALUE_r05.json")
STEPS = int(os.environ.get("GHOST_DISTILL_R05_STEPS",
                           "60" if TINY else "60000"))
HELD_OUT = ("beckham.jpg", "murakami.jpg", "tgt2.png")
PATCH, SCALE, BATCH = 128, 4, 8 if TINY else 128


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def detail_biased(cands, keep, rng=None):
    """Keep the `keep` highest-gradient-energy patches (r04 harvest
    rule: smooth portrait backgrounds make x4 SR trivially invertible,
    the value demo must run where detail exists to recover)."""
    g = [float(np.abs(np.diff(p, axis=0)).mean()
               + np.abs(np.diff(p, axis=1)).mean()) for p in cands]
    order = np.argsort(g)[::-1]
    return [cands[i] for i in order[:keep]]


def images_in_dir(rel=""):
    d = os.path.join(IMAGES, rel)
    return sorted(
        os.path.join(rel, n) for n in os.listdir(d)
        if n.lower().endswith((".jpg", ".jpeg", ".png")))


def patches_from_images(names, per_image, rng):
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
            cands.append(img[y:y + PATCH, x:x + PATCH])
        out.extend(detail_biased(cands, per_image))
    return out


def patches_from_crops(crops_u8, per_crop, rng):
    """Detail-biased 128px patches from aligned 256px face crops."""
    out = []
    span = crops_u8.shape[1] - PATCH
    for crop in crops_u8:
        img = crop.astype(np.float32) / 255.0
        cands = []
        for _ in range(4 * per_crop):
            y = rng.integers(0, span + 1)
            x = rng.integers(0, span + 1)
            cands.append(img[y:y + PATCH, x:x + PATCH])
        out.extend(detail_biased(cands, per_crop))
    return out


def main():
    import jax

    if TINY:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/ghost_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp
    import optax

    from ghost_tpu.core.precision import DEFAULT_POLICY, FULL_PRECISION
    from ghost_tpu.models.sr.srvgg import SRVGGNetCompact
    from ghost_tpu.nn.layers import resize
    from ghost_tpu.train.distill_enhancer import (degrade,
                                                  make_enhancer_distill_step)
    from ghost_tpu.utils.quality import psnr

    rng = np.random.default_rng(0)

    # --- corpus -----------------------------------------------------------
    names = images_in_dir() + images_in_dir("training")
    train_names = [n for n in names
                   if os.path.basename(n) not in HELD_OUT]
    portrait = patches_from_images(train_names, 64, rng)

    crops = np.load(VIDEO_CROPS)
    n_crops = len(crops)
    if not TINY and n_crops < 300:
        raise SystemExit(
            f"{VIDEO_CROPS} has only {n_crops} crops — re-harvest the real "
            "corpus first (scripts/prep_video_data_r04.py; /tmp was wiped)")
    perm = rng.permutation(n_crops)
    n_hold = max(4, n_crops // 20) if not TINY else 2
    hold_idx, train_idx = perm[:n_hold], perm[n_hold:]
    if TINY:
        train_idx = train_idx[:8]
    video_train = patches_from_crops(crops[train_idx], 3, rng)
    video_hold = patches_from_crops(crops[hold_idx], 3, rng)

    train_hq = np.stack(portrait + video_train)
    test_hq = np.stack(patches_from_images(HELD_OUT, 16, rng))
    # patches_from_images silently drops unreadable/small images; the
    # per-image breakdown below slices test_hq by position, so a
    # short-count here would misattribute metrics to the wrong names
    assert len(test_hq) == 16 * len(HELD_OUT), test_hq.shape
    vhold_hq = np.stack(video_hold)
    log(f"train patches {train_hq.shape} ({len(portrait)} portrait + "
        f"{len(video_train)} video from {len(train_idx)} crops); "
        f"held-out portraits {test_hq.shape}; held-out video crops "
        f"{vhold_hq.shape} from {n_hold} crops")

    # --- student + step ---------------------------------------------------
    policy = FULL_PRECISION if TINY else DEFAULT_POLICY
    feat, nconv = (8, 2) if TINY else (64, 32)
    student = SRVGGNetCompact(num_feat=feat, num_conv=nconv,
                              upscale=SCALE, policy=policy)
    lq_size = (PATCH // SCALE, PATCH // SCALE)
    s_vars = student.init(jax.random.key(0), jnp.zeros((1, *lq_size, 3)))
    lr = 2e-4 if TINY else optax.cosine_decay_schedule(
        3e-4, STEPS, alpha=0.02)
    step, tx = make_enhancer_distill_step(student, lr=lr)
    s_params0, s_opt = s_vars["params"], tx.init(s_vars["params"])

    # uint8 corpus on device; normalize inside the fused step
    train_hq_d = jnp.asarray(
        np.clip(train_hq * 255.0 + 0.5, 0, 255).astype(np.uint8))

    @jax.jit
    def train_step(params, opt, key, hq_all_u8):
        k_b, k_d = jax.random.split(key)
        idx = jax.random.randint(k_b, (BATCH,), 0, hq_all_u8.shape[0])
        hq = hq_all_u8[idx].astype(jnp.float32) / 255.0
        lq = degrade(k_d, hq, lq_size)
        return step(params, opt, lq, hq)

    # --- fixed-degradation eval (r04 protocol: key 99 on the portrait
    # set; key 98 on the video-crop split so the two suites stay
    # independent) ---------------------------------------------------------
    deg = jax.jit(lambda k, x: degrade(k, x, lq_size))
    eval_lq = np.asarray(deg(jax.random.key(99), jnp.asarray(test_hq)))
    vhold_lq = np.asarray(deg(jax.random.key(98), jnp.asarray(vhold_hq)))

    @jax.jit
    def per_patch_psnr(params, lq, hq):
        y = student.apply({"params": params}, lq)
        y = jnp.clip(y.astype(jnp.float32), 0.0, 1.0)
        return psnr(y * 255.0, hq * 255.0)

    @jax.jit
    def bilinear_per_patch(lq, hq):
        y = jnp.clip(resize(lq, (PATCH, PATCH), method="bilinear"),
                     0.0, 1.0)
        return psnr(y * 255.0, hq * 255.0)

    suites = {
        "held_out_portraits": (jnp.asarray(eval_lq), jnp.asarray(test_hq)),
        "held_out_video_crops": (jnp.asarray(vhold_lq),
                                 jnp.asarray(vhold_hq)),
    }

    def evaluate(params):
        out = {}
        for name, (lq_j, hq_j) in suites.items():
            s = np.asarray(per_patch_psnr(params, lq_j, hq_j))
            b = np.asarray(bilinear_per_patch(lq_j, hq_j))
            out[name] = {
                "student": round(float(s.mean()), 3),
                "bilinear": round(float(b.mean()), 3),
                "gain_vs_bilinear": round(float(s.mean() - b.mean()), 3),
            }
        return out

    base = evaluate(s_params0)
    log(f"untrained: {json.dumps(base)}")

    # --- train ------------------------------------------------------------
    params, opt = s_params0, s_opt
    key = jax.random.key(1)
    t0 = time.time()
    losses = {}
    for it in range(STEPS):
        key, k = jax.random.split(key)
        params, opt, metrics = train_step(params, opt, k, train_hq_d)
        if it % 1000 == 0 or it == STEPS - 1:
            l1 = float(metrics["l1"])
            losses[it] = round(l1, 5)
            log(f"step {it}: l1={l1:.5f} ({time.time() - t0:.0f}s)")
    wall = time.time() - t0

    final = evaluate(params)
    # per-image localization on the portrait suite (16 patches/image,
    # harvest order preserved)
    s = np.asarray(per_patch_psnr(params, *suites["held_out_portraits"]))
    b = np.asarray(bilinear_per_patch(*suites["held_out_portraits"]))
    per_image = {}
    npp = len(s) // len(HELD_OUT)
    for i, name in enumerate(HELD_OUT):
        sl = slice(i * npp, (i + 1) * npp)
        per_image[name] = {
            "student": round(float(s[sl].mean()), 3),
            "bilinear": round(float(b[sl].mean()), 3),
            "gain": round(float(s[sl].mean() - b[sl].mean()), 3),
        }

    artifact = {
        "round": 5,
        "methodology": (
            "r04 protocol (same student arch, degradation sampler, "
            "held-out images, fixed eval degradations) retrained on the "
            "658-video-crop corpus + 16 portraits; held-out portraits "
            "never sampled; 5% of video crops held out as a "
            "training-distribution suite."),
        "student": {"num_feat": feat, "num_conv": nconv, "upscale": SCALE},
        "steps": STEPS,
        "batch": BATCH,
        "train_patches": int(train_hq.shape[0]),
        "corpus": {"portrait_patches": len(portrait),
                   "video_patches": len(video_train),
                   "video_crops_total": int(n_crops),
                   "video_crops_held_out": int(n_hold)},
        "untrained": base,
        "trained": final,
        "per_held_out_image": per_image,
        "l1_series_every_1000": losses,
        "r04_comparison": {"gain_vs_bilinear_r04": 0.087,
                           "train_patches_r04": 1024},
        "wall_s": round(wall, 1),
    }
    with open(OUT, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps({k: artifact[k] for k in
                      ("trained", "per_held_out_image")}, indent=1),
          flush=True)
    print(f"wrote {OUT}", flush=True)


if __name__ == "__main__":
    main()
