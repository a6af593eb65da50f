"""TRAIN_r04: real >=1000-step convergence runs on the TPU.

VERDICT round 3, next-round item 1: the framework executed train steps
at 14.8/s but had never been shown to actually TRAIN. This script runs
two full-width overfit runs on the real chip through the PRODUCTION
components (FaceEmbedDataset -> PrefetchLoader -> make_train_steps ->
train_loop, the same wiring as cli/train.py):

  1. canonical GHOST mode (adv/id/attr/rec, D every 10, production
     augs) for 1200 steps — the GAN-dynamics record;
  1b. canonical WITHOUT augs (jitter off, same_prob 1.0) — the pure
     overfit whose reconstruction term can collapse multi-fold (with
     jitter on, L_rec bottoms out at the jitter spread);
  2. native-teacher distillation (mode distill: a frozen full-width AEI
     teacher runs as its OWN jitted program with variables passed as
     arguments — closure-capturing it in the G step embeds ~0.5 GB of
     HLO constants and the relay aborts the upload — feeding a
     device-resident batch["teacher_y"]; teacher-residual/multi-round/
     id_hq terms + host-side multiplier ratchets per reference
     train.py:328-338) for 1200 steps.

Dataset: the 7 real face crops produced by prep_train_data_r04.py
(reference example portraits located by the real SCRFD-2.5GF
checkpoint). Overfit on purpose — the artifact demonstrates GAN
dynamics (D cadence, ratchets firing AND stabilizing, bf16 stability,
no D collapse), not generalization.

Outputs:
  * TRAIN_r04.json — full per-step loss-term series, multiplier
    trajectories, D-loss series, finiteness counters, timing;
  * docs/train_r04/*.jpg — [Xs | Xt | (teacher) | Y] grids at the
    start and end of each run (train_loop's own show_step dumps).

Loss scaling note: there are NO loss-scale events to record — params
are f32 masters with bf16 compute (core/precision.Policy), which needs
no dynamic loss scaling; DynamicLossScale exists for fp16 paths and is
separately unit-tested. Recorded as such in the JSON for honesty.

Usage (background, no timeout — TPU relay jobs must never be killed):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/train_r04.py
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CROPS = os.path.join(REPO, "assets", "train_crops_r04.npy")
DATA_DIR = "/tmp/ghost_faces_r04"
OUT_JSON = os.path.join(REPO, "TRAIN_r04.json")
GRID_DIR = os.path.join(REPO, "docs", "train_r04")
STEPS = int(os.environ.get("GHOST_TRAIN_R04_STEPS", "1200"))
# GHOST_TRAIN_R04_TINY=1: narrow models + forced CPU for a logic smoke
# (the narrow-model pattern from the test suite); artifacts then go to
# /tmp instead of the repo so a smoke never clobbers the real record.
TINY = os.environ.get("GHOST_TRAIN_R04_TINY", "") == "1"
if TINY:
    OUT_JSON_TINY = "/tmp/TRAIN_r04_tiny.json"


def dump_dataset():
    import cv2

    crops = np.load(CROPS)
    os.makedirs(DATA_DIR, exist_ok=True)
    # 5 copies per identity so a 7-image set still fills B=8 batches
    # (PrefetchLoader drop_last=True needs len(ds) >= batch_size)
    for rep in range(5):
        for i, c in enumerate(crops):
            cv2.imwrite(os.path.join(DATA_DIR, f"id{i}_rep{rep}.png"),
                        c[:, :, ::-1])
    return crops.shape[0]


def main():
    global OUT_JSON, GRID_DIR
    if TINY:
        OUT_JSON = OUT_JSON_TINY
        GRID_DIR = "/tmp/ghost_train_r04/grids_tiny"
    n_ids = dump_dataset()

    import jax

    if TINY:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/ghost_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp

    from ghost_tpu.core.precision import DEFAULT_POLICY
    from ghost_tpu.data.datasets import FaceEmbedDataset
    from ghost_tpu.data.loader import PrefetchLoader
    from ghost_tpu.models.aei import AEINet
    from ghost_tpu.models.arcface import _DEPTHS, IResNet
    from ghost_tpu.models.discriminator import MultiscaleDiscriminator
    from ghost_tpu.nn.layers import resize
    from ghost_tpu.train.loop import LoopConfig, train_loop
    from ghost_tpu.train.losses import GeneratorLossWeights
    from ghost_tpu.train.train_step import (TrainStepConfig,
                                            init_train_state,
                                            make_train_steps)

    policy = DEFAULT_POLICY
    B = 8
    key = jax.random.key(0)

    width = 1.0 / 16 if TINY else 1.0
    n_layers, num_D = (2, 1) if TINY else (5, 3)
    arc_layers = (1, 1, 1, 1) if TINY else _DEPTHS["iresnet100"]

    # full-width production config (cli/train.py defaults)
    gen = AEINet(backbone="unet", num_blocks=2, policy=policy, train=True,
                 width=width)
    g_vars0 = gen.init(key, jnp.zeros((1, 256, 256, 3)), jnp.zeros((1, 512)))
    disc = MultiscaleDiscriminator(n_layers=n_layers, num_D=num_D,
                                   norm="instance", policy=policy)
    d_vars0 = disc.init(key, jnp.zeros((1, 256, 256, 3)))
    arc = IResNet(layers=arc_layers, policy=policy)
    a_vars = arc.init(key, jnp.zeros((1, 112, 112, 3)))
    arc_apply = lambda x: arc.apply(a_vars, x)

    # Embeddings are rescaled to the TRAINED-backbone statistic: a
    # random-init iresnet100 emits features with norm ~25,000 (trained
    # ArcFace backbones: O(25)), and at the raw scale the AAD
    # id-injection saturates the generator's tanh output 99.9% from
    # step 0 — gradients die and Y freezes bitwise (the first r04 runs
    # recorded exactly this: period-4 exact loss repeats, near-constant
    # end grids — the same "model that blacks out after 1k-2k runs"
    # failure the reference's own lab notebook hit, reference
    # TRAINME.txt:281). The production CLI feeds raw netArc features
    # like the reference (train.py:95) — correct WITH trained weights;
    # this rescale emulates the trained-weights statistic, which is the
    # only embedding property that matters for optimization.
    embed_fn = jax.jit(
        lambda x: arc_apply(resize(x, (112, 112), method="area")))

    def with_embeds(batches):
        for b in batches:
            e = embed_fn(jnp.asarray(b["xs_arcface"]))
            e = e / jnp.linalg.norm(e, axis=-1, keepdims=True) * 25.0
            b["embed"] = np.asarray(e)
            yield b

    def make_batch_iter(same_prob, jitter):
        ds = FaceEmbedDataset([DATA_DIR], same_prob=same_prob, seed=0)
        ds.jitter = jitter
        loader = PrefetchLoader(ds, B, num_workers=2, shuffle=True, seed=0)
        return lambda: with_embeds(iter(loader))

    # production-config runs use the reference augs (color jitter,
    # same_prob 0.8); the no-aug run overfits FIXED images so the
    # reconstruction term can collapse multi-fold (with jitter on,
    # L_rec's floor is the jitter spread itself, not trainability)
    batch_iter = make_batch_iter(0.8, True)

    # merge into an existing artifact (GHOST_TRAIN_R04_ONLY reruns a
    # single regime without clobbering the others' recorded runs)
    only = [x for x in os.environ.get(
        "GHOST_TRAIN_R04_ONLY", "").split(",") if x]
    prior_runs = {}
    if only and os.path.exists(OUT_JSON):
        try:
            with open(OUT_JSON) as f:
                prior_runs = json.load(f).get("runs", {})
        except Exception:
            pass

    results = {
        "dataset": {
            "n_identities": n_ids, "batch_size": B, "same_prob": 0.8,
            "source": "reference example portraits cropped by the REAL "
                      "SCRFD-2.5GF checkpoint (scripts/prep_train_data_r04.py)",
            "note": "fixed-set overfit per VERDICT r3 item 1; jitter "
                    "aug on except the canonical_noaug run (jitter off, "
                    "same_prob 1.0)",
        },
        "loss_scale": {
            "used": False,
            "reason": "f32 master params + bf16 compute (core/precision."
                      "Policy) — no fp16, no scaling needed; "
                      "DynamicLossScale covers fp16 paths (unit-tested); "
                      "per-step finiteness recorded instead",
        },
        "runs": prior_runs,
    }

    def flush():
        with open(OUT_JSON, "w") as f:
            json.dump(results, f)

    def run(name, mode, teacher_apply=None, b_iter=None, steps=None,
            show_step=None):
        steps = steps or STEPS
        print(f"=== {name} ===", flush=True)
        cfg = TrainStepConfig(mode=mode)
        g_step, d_step = make_train_steps(
            gen, disc, arc_apply, cfg, GeneratorLossWeights(),
            teacher_apply=teacher_apply)
        state = init_train_state(g_vars0, d_vars0, cfg)
        b_iter = b_iter or batch_iter

        series: dict = {}
        mult_series: dict = {}
        rec = {"steps": steps, "mode": mode, "series": series,
               "mults": mult_series, "nonfinite_steps": 0}
        results["runs"][name] = rec
        t_start = time.time()
        t_first = [None]

        def on_step(it, metrics, mults):
            if t_first[0] is None:
                t_first[0] = time.time() - t_start
                print(f"first step (incl. compile): {t_first[0]:.1f}s",
                      flush=True)
            ok = True
            for k, v in metrics.items():
                series.setdefault(k, []).append(
                    [it, v] if k == "lossD" else v)
                if not np.isfinite(v):
                    ok = False
            if not ok:
                rec["nonfinite_steps"] += 1
            for k, v in mults.items():
                mult_series.setdefault(k, []).append(v)
            if it % 100 == 0:
                flush()

        out_dir = f"/tmp/ghost_train_r04/{name}"
        loop_cfg = LoopConfig(
            max_epochs=100000, d_interval=10, print_interval=50,
            show_step=show_step or steps, save_interval=10 * steps,
            output_dir=out_dir, run_name=name,
            distill=(mode != "canonical"), ratchets=True)
        state, last = train_loop(state, g_step, d_step, b_iter,
                                 loop_cfg, max_steps=steps + 1,
                                 on_step=on_step)
        wall = time.time() - t_start
        rec["wall_s"] = wall
        rec["first_step_s"] = t_first[0]
        rec["steps_per_s_post_compile"] = (steps + 1 - 1) / max(
            wall - (t_first[0] or 0), 1e-9)
        rec["final_metrics"] = last

        # headline reductions: mean of first 20 vs last 20 steps
        def reduction(key):
            s = series.get(key)
            if not s or isinstance(s[0], list):
                return None
            a = float(np.mean(s[:20]))
            b = float(np.mean(s[-20:]))
            return {"first20_mean": a, "last20_mean": b,
                    "reduction_x": a / max(b, 1e-12)}

        rec["reductions"] = {k: reduction(k) for k in
                             ("lossG", "L_rec", "L_teacher", "L_id",
                              "L_attr", "L_multi_round")
                             if reduction(k) is not None}
        flush()

        os.makedirs(GRID_DIR, exist_ok=True)
        # sort by the STEP suffix of the filename, not lexically (epoch
        # numbers vary in width, e.g. 300_001200 sorts before 3_000012)
        grids = sorted(glob.glob(os.path.join(out_dir, "images", "*.jpg")),
                       key=lambda p: int(p.rsplit("_", 1)[1][:-4]))
        if grids:
            shutil.copy(grids[0], os.path.join(GRID_DIR, f"{name}_start.jpg"))
            shutil.copy(grids[-1], os.path.join(GRID_DIR, f"{name}_end.jpg"))
            if len(grids) > 2:  # mid-run progression snapshot
                shutil.copy(grids[len(grids) // 2],
                            os.path.join(GRID_DIR, f"{name}_mid.jpg"))
        print(f"{name}: wall={wall:.0f}s reductions="
              f"{json.dumps(rec['reductions'])}", flush=True)

    # run 1: canonical GHOST (production augs: the GAN-dynamics record)
    if not only or "canonical" in only:
        run("canonical", "canonical")

    # run 1b: canonical WITHOUT augs, same_prob=1 (pure overfit: the
    # multi-fold reconstruction-collapse record — with jitter on,
    # L_rec bottoms out at the jitter spread, not at trainability)
    if not only or "canonical_noaug" in only:
        run("canonical_noaug", "canonical",
            b_iter=make_batch_iter(1.0, False))

    # run 2: native-teacher distillation (frozen differently-initialized
    # AEI teacher). The teacher runs as its OWN jitted program with its
    # variables passed as ARGUMENTS and its output staying device-
    # resident in batch["teacher_y"] (mode="distill" — the same loss
    # terms as self_distill, train_step.py:213-260). Closure-capturing
    # a full-width teacher inside the G step embeds ~0.5 GB of HLO
    # constants, which the relay's remote_compile rejects mid-upload
    # (broken pipe — observed on the first r04 attempt; CLAUDE.md's
    # HTTP-413 rule).
    if not only or any(x.startswith("distill") for x in only):
        t_gen = AEINet(backbone="unet", num_blocks=2, policy=policy,
                       train=False, width=width)
        t_vars = t_gen.init(jax.random.key(7), jnp.zeros((1, 256, 256, 3)),
                            jnp.zeros((1, 512)))
        t_fwd = jax.jit(lambda v, xt, z: t_gen.apply(v, xt, z)[0])

        def with_teacher(batches, scale=1.0):
            for b in batches:
                b = dict(b)
                # device-resident: no D2H of the 6 MB teacher frame
                b["teacher_y"] = scale * t_fwd(
                    t_vars, jnp.asarray(b["xt"]), jnp.asarray(b["embed"]))
                yield b

        if not only or "distill" in only:
            run("distill_native_teacher", "distill",
                b_iter=lambda: with_teacher(batch_iter()))

        # run 2b: distillation WITHOUT augs (jitter off, same_prob 1.0):
        # the teacher's 7 outputs are FIXED targets the student can
        # memorize — the multi-fold teacher-loss collapse record (with
        # jitter on, the student must track the teacher as a FUNCTION
        # of a freshly-jittered input, a strictly harder target).
        if not only or "distill_noaug" in only:
            run("distill_noaug", "distill",
                b_iter=lambda: with_teacher(make_batch_iter(1.0, False)()))

    # run 3 (explicit-only: needs the video harvest): canonical GHOST
    # on ~500 DISTINCT video-frame crops (prep_video_data_r04.py). The
    # 7-portrait set is degenerate for canonical GAN dynamics — the
    # full-width multiscale D memorizes 7 reals in a few hundred steps,
    # the hinge saturates, and G can fall into the instance-norm
    # constant blind spot (the black-Y equilibrium the first
    # canonical_noaug run recorded). A few hundred distinct frames keep
    # D honest, so this is the GAN-dynamics record that matches how the
    # reference actually trains (reference TRAINME.txt:267-288).
    if "canonical_video" in only:
        import cv2

        crops = np.load("/tmp/ghost_video_crops_r04.npy")
        vdir = "/tmp/ghost_faces_video_r04"
        os.makedirs(vdir, exist_ok=True)
        for i, c in enumerate(crops):
            cv2.imwrite(os.path.join(vdir, f"f{i:04d}.png"),
                        c[:, :, ::-1])
        results["dataset"]["video_run"] = {
            "n_images": int(crops.shape[0]),
            "source": "reference example mp4 frames cropped by the REAL "
                      "SCRFD-2.5GF checkpoint "
                      "(scripts/prep_video_data_r04.py)"}

        def make_video_iter():
            ds = FaceEmbedDataset([vdir], same_prob=0.8, seed=0)
            loader = PrefetchLoader(ds, B, num_workers=2, shuffle=True,
                                    seed=0)
            return with_embeds(iter(loader))

        run("canonical_video", "canonical", b_iter=make_video_iter,
            steps=int(os.environ.get("GHOST_TRAIN_R04_VIDEO_STEPS",
                                     "3000")),
            show_step=500)

    flush()
    print("done ->", OUT_JSON, flush=True)


if __name__ == "__main__":
    main()
