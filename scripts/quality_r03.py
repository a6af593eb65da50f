"""Quality artifact: shared-weights torch-composition parity metrics.

BASELINE.md's quality targets are ArcFace id-sim within 0.01 of the
reference pipeline and LPIPS parity. The released checkpoints
(G_unet_2blocks.pth, backbone.pth, 10_net_G.pth) are absent from this
image, so quality is measured on the *shared-weights* path: the
reference's own composition — torch AEI_Net (+ optional torch
LIPSPADEGenerator) with seeded random weights + cv2 warp/paste math
exactly as `reference inference.py:55-124`,
`utils/inference/image_processing.py:51-77` and
`utils/inference/video_processing.py:225-235` compose it — versus our
full stage B running the SAME weights converted through
`ghost_tpu.convert.torch_loader`. Throughput/quality of the *assembled*
pipeline is weight-independent, so this bounds the composition error the
real checkpoints would see.

Matrix: precision {f32, bf16} x identities {1, 2} x SR {off, on}.

Metrics per config:
  * mean / p99 absolute full-frame difference (gray levels);
  * PSNR ours-vs-reference-math (full frame);
  * ArcFace id-sim between our output crop and the reference output
    crop (same net both sides; budget: 1 - cos <= 0.01);
  * LPIPS-style perceptual distance (ghost_tpu.utils.quality
    .perceptual_distance over VGG19 features). Pretrained torchvision
    VGG19 and the published LPIPS 'lin' heads are not in this image, so
    the feature net uses seeded random weights — a relative metric,
    identical for both paths (0 = identical images).

Both paths share the landmark NETWORK (our random-init Landmark106 —
the MXNet 2d106det params blob is absent) but each computes landmarks
and masks from its own swap output, as in production.

Runs on CPU. Writes QUALITY_r03.json at the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REF = "/root/reference"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_frame_and_kps(rng, n_faces):
    """Smooth synthetic 480x640 frame + plausible 5-pt kps per face."""
    import jax.numpy as jnp

    from ghost_tpu.nn.layers import resize as jresize

    coarse = rng.uniform(0, 255, (1, 30, 40, 3)).astype(np.float32)
    frame = np.asarray(jresize(jnp.asarray(coarse), (480, 640),
                               method="bilinear"))[0]
    frame_u8 = np.round(frame).astype(np.uint8)
    base = np.array([[280.0, 180.0], [360.0, 178.0], [322.0, 230.0],
                     [290.0, 270.0], [355.0, 272.0]], np.float32)
    shifts = [(0.0, 0.0), (-160.0, 40.0)][:n_faces]
    kps = np.stack([base + np.asarray(s, np.float32) for s in shifts])
    return frame, frame_u8, kps  # frame f32, (T,5,2)


def reference_composition(ref_g, ref_sr, frame_f32, kps_t, z_ids,
                          mask_fn, estimate_norm_np):
    """The reference's own math: cv2 crops -> torch G (-> torch SR) ->
    cv2 resize -> mask -> cv2 inverse-warp sequential paste-back."""
    import cv2
    import torch

    out = frame_f32.copy()
    crops224 = []
    for j in range(kps_t.shape[0]):
        m = estimate_norm_np(kps_t[j])
        crop = cv2.warpAffine(frame_f32, m, (224, 224))
        crop_256 = cv2.resize(crop, (256, 256),
                              interpolation=cv2.INTER_LINEAR)
        xt = (crop_256 / 255.0 - 0.5) / 0.5
        with torch.no_grad():
            y, _ = ref_g(torch.tensor(xt.transpose(2, 0, 1)[None]),
                         torch.tensor(z_ids[j:j + 1]))
            if ref_sr is not None:
                y = ref_sr(y)
        y = ((y[0].numpy().transpose(1, 2, 0) * 0.5 + 0.5) * 255.0)
        swap224 = cv2.resize(y, (224, 224), interpolation=cv2.INTER_LINEAR)
        mask = mask_fn(swap224)  # (224,224) from the ref swap's landmarks
        m_inv = cv2.invertAffineTransform(m)
        swap_t = cv2.warpAffine(swap224, m_inv, (640, 480))
        mask_t = cv2.warpAffine(mask, m_inv, (640, 480))[..., None]
        out = mask_t * swap_t + (1 - mask_t) * out
        crops224.append(swap224)
    return out, crops224


def run_config(precision, n_faces, use_sr, shared, record):
    import cv2
    import jax
    import jax.numpy as jnp

    from ghost_tpu.convert.torch_loader import (
        convert_aei_state_dict, convert_spade_generator_state_dict)
    from ghost_tpu.core.precision import DEFAULT_POLICY, FULL_PRECISION
    from ghost_tpu.models.aei import AEINet
    from ghost_tpu.models.landmark import landmarks_from_crops
    from ghost_tpu.models.sr.generator import LIPSPADEGenerator as OurSR
    from ghost_tpu.models.sr.vgg import imagenet_normalize_pm1
    from ghost_tpu.ops.mask import face_mask_batch
    from ghost_tpu.ops.umeyama import estimate_norm
    from ghost_tpu.pipeline.swap import SwapConfig, build_random_pipeline
    from ghost_tpu.utils.quality import perceptual_distance, psnr

    from ghost_tpu.utils.face_template import inject_landmark_template

    policy = FULL_PRECISION if precision == "f32" else DEFAULT_POLICY
    cfg = SwapConfig(chunk_size=1, max_faces=2, crop_size=224,
                     gen_groups=1, mask_per_shot=False)
    pipe = build_random_pipeline(cfg, policy=FULL_PRECISION, seed=0)
    pipe.gen_mod = AEINet(backbone="unet", num_blocks=2, policy=policy)
    pipe.gen_vars = shared["g_vars"]
    pipe._vars["gen"] = shared["g_vars"]
    # random-weight landmark nets cluster at the crop center and the
    # eroded hull mask vanishes -> the blend would be a no-op and every
    # metric trivially perfect. Inject the face template so the mask is
    # a real soft region (see utils/face_template.py).
    pipe.lmk_vars = inject_landmark_template(pipe.lmk_vars)
    pipe._vars["lmk"] = pipe.lmk_vars
    if use_sr:
        our_sr = OurSR(ngf=48, param_free="syncbatch", train=False,
                       policy=policy)
        pipe.sr = (our_sr, shared["sr_vars"])
        pipe._vars["sr"] = shared["sr_vars"]
    pipe._swap_blend_j = jax.jit(pipe._swap_blend_impl,
                                 static_argnums=(6,))

    rng = np.random.default_rng(0)
    frame_f32, frame_u8, kps = build_frame_and_kps(rng, n_faces)
    z_ids = rng.normal(0, 1, (n_faces, 512)).astype(np.float32)

    # mask from the swap's own landmarks, same net both paths
    lmk_apply = lambda v, imgs: pipe.lmk_mod.apply(v, imgs)

    mask_means = []

    def mask_fn(swap224_f32):
        lmks = landmarks_from_crops(lmk_apply, pipe.lmk_vars,
                                    jnp.asarray(swap224_f32[None]), 224)
        m = np.asarray(
            face_mask_batch(lmks, 224, cfg.mask_params))[0, ..., 0]
        mask_means.append(float(m.mean()))
        return m

    def estimate_norm_np(kps5):
        return np.asarray(estimate_norm(jnp.asarray(kps5[None]), 224))[0]

    final_ref, ref_crops = reference_composition(
        shared["ref_g"], shared["ref_sr"] if use_sr else None,
        frame_f32, kps, z_ids, mask_fn, estimate_norm_np)

    out = pipe._swap_blend(jnp.asarray(frame_u8[None]),
                           jnp.asarray(kps[None]),
                           jnp.ones((1, n_faces), bool),
                           jnp.asarray(z_ids))
    out = np.asarray(out)[0].astype(np.float32)

    diff = np.abs(out - final_ref)
    ref_u8 = np.clip(np.round(final_ref), 0, 255).astype(np.uint8)
    psnr_db = float(psnr(jnp.asarray(out[None]),
                         jnp.asarray(ref_u8[None], jnp.float32))[0])

    # per-face id-sim between our final-frame crop and the reference
    # composition's final-frame crop (the "within 0.01" comparison)
    sims = []
    for j in range(n_faces):
        m = estimate_norm_np(kps[j])
        ours_c = np.clip(cv2.warpAffine(out, m, (224, 224)),
                         0, 255).astype(np.uint8)
        ref_c = np.clip(cv2.warpAffine(final_ref.astype(np.float32), m,
                                       (224, 224)), 0, 255).astype(np.uint8)
        e = np.asarray(pipe.embed_targets(np.stack([ours_c, ref_c])))
        sims.append(float(e[0] @ e[1]))

    pd = float(perceptual_distance(
        lambda x: shared["vgg_mod"].apply(shared["vgg_vars"],
                                          imagenet_normalize_pm1(x)),
        jnp.asarray(out[None]) / 127.5 - 1.0,
        jnp.asarray(ref_u8[None], jnp.float32) / 127.5 - 1.0)[0])

    rec = {
        "precision": precision,
        "identities": n_faces,
        "sr": use_sr,
        "mean_abs_diff_gray": round(float(diff.mean()), 4),
        "p99_abs_diff_gray": round(float(np.quantile(diff, 0.99)), 3),
        "psnr_db": round(psnr_db, 2),
        "id_sim_ours_vs_ref": [round(s, 5) for s in sims],
        "id_sim_delta_max": round(1.0 - min(sims), 5),
        "perceptual_distance": round(pd, 6),
        "ref_mask_mean": round(float(np.mean(mask_means)), 4),
    }
    assert min(mask_means) > 0.02, "blend degenerated to a no-op"
    record.append(rec)
    print(json.dumps(rec), flush=True)


def build_shared():
    """Reference torch modules + converted weights + VGG metric net
    (shared across quality_r03/quality_r04 configs)."""
    import jax
    import jax.numpy as jnp
    import torch

    # the reference's models package imports torchvision at module scope
    # (architecture.py:9); it isn't installed here and the VGG19 class is
    # unused on this path — stub it (same trick as test_golden_reference)
    import types

    if "torchvision" not in sys.modules:
        try:
            import torchvision  # noqa: F401
        except ImportError:
            tv = types.ModuleType("torchvision")
            tv.models = types.ModuleType("torchvision.models")
            sys.modules["torchvision"] = tv
            sys.modules["torchvision.models"] = tv.models

    sys.path.insert(0, REF)
    from models.config_sr import TestOptions
    from models.networks.generator import LIPSPADEGenerator
    from network.AEI_Net import AEI_Net

    from ghost_tpu.convert.torch_loader import (
        convert_aei_state_dict, convert_spade_generator_state_dict)
    from ghost_tpu.models.sr.vgg import VGG19Features

    torch.manual_seed(0)
    ref_g = AEI_Net("unet", num_blocks=2, c_id=512).eval()
    sd = {k: v.detach().numpy() for k, v in ref_g.state_dict().items()}
    g_vars = jax.tree.map(jnp.asarray, convert_aei_state_dict(sd, "unet", 2))

    torch.manual_seed(4)
    ref_sr = LIPSPADEGenerator(TestOptions()).eval()
    sr_sd = {k: v.detach().numpy() for k, v in ref_sr.state_dict().items()}
    sr_vars = jax.tree.map(
        jnp.asarray,
        convert_spade_generator_state_dict(sr_sd, ngf=48, lip=True))

    vgg_mod = VGG19Features()
    vgg_vars = vgg_mod.init(jax.random.key(7),
                            jnp.zeros((1, 64, 64, 3)))

    return {"ref_g": ref_g, "ref_sr": ref_sr, "g_vars": g_vars,
            "sr_vars": sr_vars, "vgg_mod": vgg_mod,
            "vgg_vars": vgg_vars}


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    shared = build_shared()

    records = []
    t0 = time.time()
    for precision in ("f32", "bf16"):
        for n_faces in (1, 2):
            for use_sr in (False, True):
                run_config(precision, n_faces, use_sr, shared, records)

    artifact = {
        "round": 3,
        "methodology": (
            "shared-random-weights torch-composition parity: reference "
            "torch AEI_Net (+torch LIPSPADE when sr) + cv2 warp/paste "
            "math vs our full stage B with converted weights; same "
            "ArcFace both sides; perceptual distance uses seeded "
            "random-weight VGG19 features (pretrained VGG absent from "
            "image). id-sim budget: 1-cos <= 0.01 (BASELINE.md)."),
        "frame": "480x640 synthetic smooth",
        "wall_s": round(time.time() - t0, 1),
        "configs": records,
    }
    path = os.path.join(REPO, "QUALITY_r03.json")
    with open(path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
