"""QUALITY_r04: quality matrix + SR-breach isolation + enhancer parity.

VERDICT round 3, next-round items 3 and 6:

  * item 3 — the SR-on rows of QUALITY_r03 breached the 0.01 id-sim
    budget (up to 0.0395) with the *attributed but unisolated*
    explanation "an untrained SPADE GAN amplifies sub-pixel resize
    differences between the two compositions' crop paths". This script
    ISOLATES it: (a) run both compositions on BIT-IDENTICAL SR inputs
    (our pipeline's generator seat replaced by a fixed module returning
    the reference's own pre-SR tensor) and show the end-to-end delta
    collapses inside budget; (b) quantify the pre-SR deltas at every
    link in the chain (generator input, generator output, SR module at
    equal inputs) in gray levels.

  * item 6 — extend the shared-random-weights parity matrix to the
    enhancer composition: our fused FaceEnhancer (crop->GFPGAN->paste
    in one jitted program, pipeline/enhance.py) vs the upstream
    crop->GFPGAN->paste math (GFPGANer/facexlib FaceRestoreHelper:
    cv2 umeyama-align to the FFHQ 512 template, torch GFPGAN, inverse
    cv2.warpAffine paste — reference utils/training/upsampler.py:
    92-120 drives exactly that helper). Both paths share the SAME
    seeded GFPGAN weights (ours via convert_gfpgan_state_dict) and the
    SAME detections (a template-injected random SCRFD so the 5-pt
    geometry is face-plausible — utils/face_template.py).

Also re-runs the full r03 matrix so QUALITY_r04.json is self-contained.
Runs on CPU; writes QUALITY_r04.json at the repo root.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/quality_r04.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from quality_r03 import (REF, REPO, build_frame_and_kps, build_shared,
                         reference_composition, run_config)


class _FixedGen:
    """Generator-seat stand-in whose output is a fixed tensor — used to
    feed the production pipeline's SR stage a bit-identical copy of the
    reference composition's pre-SR tensor (isolation experiment a)."""

    def __init__(self, y_pm1_nhwc):
        import jax.numpy as jnp

        self._y = jnp.asarray(y_pm1_nhwc)

    def apply(self, variables, x, z):
        return self._y.astype(x.dtype), None


def sr_isolation(shared, out):
    import cv2
    import jax
    import jax.numpy as jnp
    import torch

    from ghost_tpu.core.precision import FULL_PRECISION
    from ghost_tpu.models.aei import AEINet
    from ghost_tpu.models.sr.generator import LIPSPADEGenerator as OurSR
    from ghost_tpu.nn.layers import resize
    from ghost_tpu.ops.umeyama import estimate_norm
    from ghost_tpu.ops.warp import warp_affine_similarity
    from ghost_tpu.pipeline.swap import SwapConfig, build_random_pipeline
    from ghost_tpu.utils.face_template import inject_landmark_template

    cfg = SwapConfig(chunk_size=1, max_faces=2, crop_size=224,
                     gen_groups=1, mask_per_shot=False)
    pipe = build_random_pipeline(cfg, policy=FULL_PRECISION, seed=0)
    pipe.gen_mod = AEINet(backbone="unet", num_blocks=2,
                          policy=FULL_PRECISION)
    pipe.gen_vars = shared["g_vars"]
    pipe._vars["gen"] = shared["g_vars"]
    pipe.lmk_vars = inject_landmark_template(pipe.lmk_vars)
    pipe._vars["lmk"] = pipe.lmk_vars
    our_sr = OurSR(ngf=48, param_free="syncbatch", train=False,
                   policy=FULL_PRECISION)
    pipe.sr = (our_sr, shared["sr_vars"])
    pipe._vars["sr"] = shared["sr_vars"]
    pipe._swap_blend_j = jax.jit(pipe._swap_blend_impl,
                                 static_argnums=(6,))

    rng = np.random.default_rng(0)
    frame_f32, frame_u8, kps = build_frame_and_kps(rng, 1)
    z = rng.normal(0, 1, (1, 512)).astype(np.float32)

    def estimate_norm_np(kps5):
        return np.asarray(estimate_norm(jnp.asarray(kps5[None]), 224))[0]

    # ---- reference pre-SR chain (exactly reference_composition's
    # steps, intermediates kept) ----
    m_np = estimate_norm_np(kps[0])
    crop224_ref = cv2.warpAffine(frame_f32, m_np, (224, 224))
    crop256_ref = cv2.resize(crop224_ref, (256, 256),
                             interpolation=cv2.INTER_LINEAR)
    xt_ref = (crop256_ref / 255.0 - 0.5) / 0.5
    with torch.no_grad():
        y_t, _ = shared["ref_g"](
            torch.tensor(xt_ref.transpose(2, 0, 1)[None]), torch.tensor(z))
    y_ref = y_t[0].numpy().transpose(1, 2, 0)  # pm1 HWC, the SR input

    # ---- (b) our pre-SR chain on the PRODUCTION crop path ----
    m_j = jnp.asarray(m_np)[None, None]  # (1,1,2,3)
    crops = warp_affine_similarity(jnp.asarray(frame_u8[None]), m_j, 224,
                                   subpix=cfg.crop_subpix,
                                   interp=cfg.crop_interp)
    gen_in = resize(crops / 255.0, (256, 256), method="bilinear")
    gen_in = (gen_in - 0.5) / 0.5
    y_ours, _ = pipe.gen_mod.apply(shared["g_vars"], gen_in, jnp.asarray(z))
    gen_in_np = np.asarray(gen_in)[0]
    y_ours_np = np.asarray(y_ours)[0]

    def gray(a):  # pm1 diffs -> gray levels
        d = np.abs(a) * 127.5
        return {"mean": round(float(d.mean()), 4),
                "p99": round(float(np.quantile(d, 0.99)), 3),
                "max": round(float(d.max()), 3)}

    chain = {
        "gen_input_delta_gray": gray(gen_in_np - xt_ref),
        "gen_output_delta_gray": gray(y_ours_np - y_ref),
    }

    # SR module exactness at EQUAL inputs (the already-golden link,
    # re-measured here so the whole chain is in one artifact)
    with torch.no_grad():
        sr_ref = shared["ref_sr"](y_t)[0].numpy().transpose(1, 2, 0)
    sr_ours = np.asarray(our_sr.apply(shared["sr_vars"],
                                      jnp.asarray(y_ref[None])))[0]
    chain["sr_module_delta_at_equal_input_gray"] = gray(sr_ours - sr_ref)
    # amplification factor the untrained GAN applies to its input delta
    with torch.no_grad():
        sr_of_ours = shared["ref_sr"](
            torch.tensor(y_ours_np.transpose(2, 0, 1)[None])
        )[0].numpy().transpose(1, 2, 0)
    d_in = float(np.abs(y_ours_np - y_ref).mean())
    d_out = float(np.abs(sr_of_ours - sr_ref).mean())
    chain["sr_amplification_x"] = round(d_out / max(d_in, 1e-12), 2)

    # ---- (a) end-to-end with BIT-IDENTICAL SR inputs ----
    # reference composition, unchanged (its SR sees y_ref)
    from ghost_tpu.models.landmark import landmarks_from_crops
    from ghost_tpu.ops.mask import face_mask_batch

    def mask_fn(swap224_f32):
        lmks = landmarks_from_crops(
            lambda v, imgs: pipe.lmk_mod.apply(v, imgs), pipe.lmk_vars,
            jnp.asarray(swap224_f32[None]), 224)
        return np.asarray(
            face_mask_batch(lmks, 224, cfg.mask_params))[0, ..., 0]

    final_ref, _ = reference_composition(
        shared["ref_g"], shared["ref_sr"], frame_f32, kps, z,
        mask_fn, estimate_norm_np)

    # our pipeline with the generator seat pinned to y_ref: its SR
    # stage unnormalizes/renormalizes through pixels ((y*.5+.5)*255
    # then /255-.5)*2 — f32-roundtrip noise ~1e-7, i.e. bit-identical
    # at gray-level resolution)
    pipe.gen_mod = _FixedGen(y_ref[None])
    pipe._swap_blend_j = jax.jit(pipe._swap_blend_impl,
                                 static_argnums=(6,))
    out_eq = np.asarray(pipe._swap_blend(
        jnp.asarray(frame_u8[None]), jnp.asarray(kps[None]),
        jnp.ones((1, 1), bool), jnp.asarray(z)))[0].astype(np.float32)

    diff = np.abs(out_eq - final_ref)
    m = estimate_norm_np(kps[0])
    ours_c = np.clip(cv2.warpAffine(out_eq, m, (224, 224)),
                     0, 255).astype(np.uint8)
    ref_c = np.clip(cv2.warpAffine(final_ref.astype(np.float32), m,
                                   (224, 224)), 0, 255).astype(np.uint8)
    e = np.asarray(pipe.embed_targets(np.stack([ours_c, ref_c])))
    id_sim = float(e[0] @ e[1])

    out["sr_isolation"] = {
        "methodology": (
            "both compositions' SR stages fed the BIT-IDENTICAL pre-SR "
            "tensor (the reference torch AEI's output); everything else "
            "is each path's own production math. If the r03 SR-on "
            "budget breach came from the untrained SPADE amplifying "
            "pre-SR input noise, the equalized end-to-end delta must "
            "collapse inside the 0.01 budget."),
        "pre_sr_chain_deltas": chain,
        "equalized_end_to_end": {
            "mean_abs_diff_gray": round(float(diff.mean()), 4),
            "p99_abs_diff_gray": round(float(np.quantile(diff, 0.99)), 3),
            "id_sim_ours_vs_ref": round(id_sim, 5),
            "id_sim_delta": round(1.0 - id_sim, 5),
            "within_budget": bool(1.0 - id_sim <= 0.01),
        },
    }
    print(json.dumps(out["sr_isolation"], indent=1), flush=True)


def enhancer_parity(out):
    import cv2
    import jax
    import jax.numpy as jnp
    import torch

    sys.path.insert(0, os.path.join(REPO, "tests"))
    from test_enhancers import TGFPGANv1Clean

    from ghost_tpu.convert.torch_loader import convert_gfpgan_state_dict
    from ghost_tpu.core.precision import FULL_PRECISION
    from ghost_tpu.models.scrfd import (SCRFD, decode_detections,
                                        preprocess_frames)
    from ghost_tpu.models.sr.gfpgan import GFPGANClean
    from ghost_tpu.pipeline.enhance import FFHQ_TEMPLATE_512, FaceEnhancer
    from ghost_tpu.utils.face_template import inject_detection_template

    # shared seeded GFPGAN weights both sides. 256-out / narrow 0.5
    # keeps the CPU run tractable (full GFPGAN-512 is the TPU serving
    # config; composition math is size-independent).
    out_size, nsf, cm, num_mlp, narrow = 256, 256, 2, 2, 0.5
    torch.manual_seed(2)
    tm = TGFPGANv1Clean(out_size, nsf, cm, num_mlp, narrow).eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    gfp = GFPGANClean(out_size=out_size, num_style_feat=nsf,
                      channel_multiplier=cm, num_mlp=num_mlp,
                      narrow=narrow, policy=FULL_PRECISION)
    gfp_vars = jax.tree.map(jnp.asarray, convert_gfpgan_state_dict(
        sd, out_size=out_size, num_style_feat=nsf))

    det = SCRFD(policy=FULL_PRECISION)
    det_vars = det.init(jax.random.key(3), jnp.zeros((1, 640, 640, 3)))
    det_vars = inject_detection_template(det_vars)

    rng = np.random.default_rng(1)
    # smooth synthetic frame (same generator as the swap rows)
    frame_f32, frame_u8, _ = build_frame_and_kps(rng, 1)
    h, w = frame_u8.shape[:2]

    enhancer = FaceEnhancer(det=(det, det_vars), gfpgan=(gfp, gfp_vars),
                            bg=None, det_thresh=0.5, max_faces=2,
                            crop_size=out_size)
    ours = enhancer.enhance(frame_u8[None])[0].astype(np.float32)

    # upstream math on the SAME detections: re-run the identical
    # detect stage standalone to extract (scores, kps), then the
    # facexlib FaceRestoreHelper steps with cv2 + torch
    @jax.jit
    def detect(frames):
        canvas, scale = preprocess_frames(frames, 640)
        outs = det.apply(det_vars, canvas)
        scores, _boxes, kps = decode_detections(
            outs, input_size=640, score_thresh=0.5, max_faces=2)
        return scores, kps / scale

    scores, kps = (np.asarray(a)[0] for a in detect(jnp.asarray(
        frame_u8[None])))
    present = scores > 0
    assert present.any(), "detection template produced no faces"

    from ghost_tpu.ops.umeyama import umeyama_similarity

    import math as _math

    template = FFHQ_TEMPLATE_512 * (out_size / 512.0)
    num_layers = (int(_math.log2(out_size)) - 2) * 2 + 1
    ref_out = frame_f32.copy()
    for lane in range(kps.shape[0]):
        if not present[lane]:
            continue
        m = np.asarray(umeyama_similarity(
            jnp.asarray(kps[lane][None]),
            jnp.asarray(template[None])))[0]
        crop = cv2.warpAffine(frame_f32, m, (out_size, out_size))
        x = crop / 127.5 - 1.0
        tnoise = [torch.zeros(1, 1, 2 ** ((j + 5) // 2),
                              2 ** ((j + 5) // 2))
                  for j in range(num_layers)]
        with torch.no_grad():
            r = tm(torch.tensor(x.transpose(2, 0, 1)[None],
                                dtype=torch.float32), tnoise)
        r = np.clip(r[0].numpy().transpose(1, 2, 0), -1, 1)
        restored = (r + 1.0) * 127.5
        # paste: inverse warp + our soft border mask (the documented
        # redesign: facexlib erode+blur of an all-ones mask ~= a soft
        # border taper; ours is the separable-matmul equivalent)
        from ghost_tpu.pipeline.enhance import _soft_border_mask

        mask = np.asarray(_soft_border_mask(out_size))[0, ..., 0]
        m_inv = cv2.invertAffineTransform(m)
        r_t = cv2.warpAffine(restored, m_inv, (w, h))
        m_t = cv2.warpAffine(mask, m_inv, (w, h))[..., None]
        ref_out = m_t * r_t + (1 - m_t) * ref_out

    diff = np.abs(ours - ref_out)
    from ghost_tpu.utils.quality import psnr

    psnr_db = float(psnr(jnp.asarray(ours[None]),
                         jnp.asarray(ref_out[None]))[0])
    out["enhancer_face_parity"] = {
        "methodology": (
            "shared seeded GFPGAN weights + SAME detections (template-"
            "injected random SCRFD): our fused FaceEnhancer program vs "
            "the upstream GFPGANer/FaceRestoreHelper math (cv2 umeyama "
            "align to FFHQ-512, torch GFPGAN, inverse-warp paste). "
            "Known intentional deltas: our crop warp is the single-tap "
            "nearest similarity path (subpix=3) vs cv2 bilinear, and "
            "the paste mask is the soft-border taper both sides."),
        "faces_detected": int(present.sum()),
        "mean_abs_diff_gray": round(float(diff.mean()), 4),
        "p99_abs_diff_gray": round(float(np.quantile(diff, 0.99)), 3),
        "psnr_db": round(psnr_db, 2),
    }
    print(json.dumps(out["enhancer_face_parity"], indent=1), flush=True)


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    t0 = time.time()
    shared = build_shared()

    records = []
    for precision in ("f32", "bf16"):
        for n_faces in (1, 2):
            for use_sr in (False, True):
                run_config(precision, n_faces, use_sr, shared, records)

    artifact = {
        "round": 4,
        "methodology": (
            "same shared-random-weights torch-composition parity as "
            "QUALITY_r03 (see that artifact), plus the SR-breach "
            "isolation experiment (VERDICT r3 item 3) and the enhancer "
            "composition parity row (item 6)."),
        "configs": records,
    }
    sr_isolation(shared, artifact)
    enhancer_parity(artifact)
    artifact["wall_s"] = round(time.time() - t0, 1)

    path = os.path.join(REPO, "QUALITY_r04.json")
    with open(path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
