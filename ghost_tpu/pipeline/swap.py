"""End-to-end face-swap pipeline: two jitted device stages + host control.

Replaces the reference's model_inference / crop_frames_and_get_transforms
/ get_final_video chain (reference utils/inference/core.py:29-90,
video_processing.py:111-243) whose per-frame CPU<->GPU ping-pong is the
top perf deficiency (SURVEY.md §3.1). Here video frames move to HBM
once per chunk and stay there:

  stage A (jit): letterbox -> SCRFD -> NMS -> umeyama align -> warp
      crops -> ArcFace embed -> cosine match vs targets
      -> per-target kps + similarity                    [detect_match]
  host: temporal keypoint smoothing w/ scene-cut breaks (tiny arrays)
  stage B (jit): umeyama on smoothed kps -> warp 224 crops -> resize 256
      -> AEI-Net swap with source embeds -> landmark net on swap ->
      soft mask -> fused inverse-warp paste-back blend  [swap_blend]

Static shapes throughout: chunk size B, target count T and face
capacity F are compile-time constants; missing faces ride through as
masked lanes (present=False) instead of Python branches, matching the
reference's `present` bookkeeping (video_processing.py:174-188).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ghost_tpu.core.precision import Policy, DEFAULT_POLICY
from ghost_tpu.models.aei import AEINet
from ghost_tpu.models.arcface import IResNet, normalize_embedding
from ghost_tpu.models.landmark import Landmark106, landmarks_from_crops
from ghost_tpu.models.scrfd import SCRFD, decode_detections, preprocess_frames
from ghost_tpu.nn.layers import resize
from ghost_tpu.ops.mask import face_mask_batch
from ghost_tpu.ops.umeyama import estimate_norm
from ghost_tpu.ops.warp import (warp_affine, warp_affine_similarity,
                                warp_and_blend, warp_and_blend_similarity)


@dataclasses.dataclass(frozen=True)
class SwapConfig:
    """Knobs mirror the reference CLI (reference inference.py:127-151)."""

    crop_size: int = 224
    similarity_th: float = 0.15
    det_thresh: float = 0.6
    det_size: int = 640
    max_faces: int = 8
    chunk_size: int = 32
    gen_size: int = 256
    use_sr: bool = False
    mask_params: tuple = (5.0, 5.0, 5.0, 2.0)
    # paste-back strategy: 'similarity' = rotation-in-crop-space + MXU
    # tent matmuls (measured ~25x faster than the direct gather at
    # 1080p, see ops/warp.py warp_and_blend_similarity); 'gather' = the
    # exact single-resample reference path
    pasteback: str = "similarity"
    # 'None' = reference best-of-5-pose-templates (video_processing.py:133);
    # 'arcface' = frontal template only (1/5 the alignment work; faces in
    # video are near-frontal so the argmin almost always picks it anyway)
    align_mode: str = "None"
    # stage-A matching crops sampled directly at 112 (the ArcFace input
    # size) instead of 224-then-downsample: half the gather volume, same
    # information content; affects MATCHING similarity only, never the
    # generator/paste-back quality path
    fast_match_crops: bool = True
    # crop extraction strategy: 'similarity' = axis-aligned MXU tent
    # matmuls + small rotation resample (ops/warp.py
    # warp_affine_similarity — the crop-direction mirror of the
    # similarity paste-back); 'gather' = direct single-resample
    # cv2-parity warp
    crop_mode: str = "similarity"
    # rotation-resample tap strategy (measured ~10 ns/gather-tap on
    # v5e): 'nearest' takes ONE tap from a subpix-oversampled grid
    # (error ~1/(2*subpix) px), 'bilinear' takes four
    crop_interp: str = "nearest"
    crop_subpix: int = 3
    # same tradeoff for the paste-back's crop-space rotation resample:
    # nearest taps from a 2x einsum-upsampled [swap|mask]
    blend_rot_subpix: int = 2
    # generator/landmark/mask micro-batch groups inside stage B
    # (lax.map): divides the transient activation peak by this factor —
    # chunk 64 sits within ~100 MB of the 16 GB HBM roof without it
    gen_groups: int = 2
    # stage-A MATCHING crops sample from an area-downsampled frame
    # (1 = full res). Embedding crops are 112 px from faces typically
    # >= 200 px, so 2x downsample loses nothing the ArcFace resize
    # wouldn't; affects matching similarity only, never quality
    match_downsample: int = 2
    # reference-parity per-shot mask parameters: landmark the ORIGINAL
    # target crop too, derive the x-offset statistic on the first
    # present face per target, select (erode, sigma_x, sigma_y,
    # eyebrow_mod) once and feed them as traced scalars
    # (reference masks.py:38-76 + video_processing.py:204-235 caching).
    # False = fixed `mask_params` (cheaper: no second landmark pass)
    mask_per_shot: bool = True
    # embed only the top-K score-sorted face lanes in stage A (None =
    # all max_faces lanes, exact reference semantics). Frames rarely
    # hold more real faces than targets; K >= actual face count is
    # lossless, so K = targets+1 is a safe speed knob for the bench
    match_faces: int | None = None
    # frames per micro-batch group of the FUSED detect->swap program
    # (covers the detector too, so chunk 128 stays within the chunk-32
    # stage-A HBM peak); 0 disables grouping
    fused_group: int = 32
    # per-TARGET-lane skip in stage B: wrap each lane's crop -> AEI ->
    # (SR) -> landmark -> mask -> paste-back in a scalar lax.cond on
    # "any frame in this micro-batch group has the lane present". The
    # reference swaps ONLY detected identities (reference
    # utils/inference/core.py:72-74): a T=2 video whose second identity
    # never appears pays ~1 generator pass there; the batched form
    # (False) pays T. All-present groups execute the same per-sample
    # math as the batched form (bit-match: tests/test_pipeline_lane_skip.py)
    lane_skip: bool = True


class SwapPipeline:
    """Bundles the five models + variables and compiles the two stages.

    models/variables are plain (module, variables) pairs so weights can
    come from converters or random init (benchmarks, tests).
    """

    def __init__(
        self,
        detector: tuple[SCRFD, Any],
        arcface: tuple[IResNet, Any],
        generator: tuple[AEINet, Any],
        landmarker: tuple[Landmark106, Any],
        sr: tuple[Any, Any] | None = None,
        config: SwapConfig = SwapConfig(),
    ):
        self.det_mod, self.det_vars = detector
        self.arc_mod, self.arc_vars = arcface
        self.gen_mod, self.gen_vars = generator
        self.lmk_mod, self.lmk_vars = landmarker
        self.sr = sr
        self.cfg = config
        # model variables enter the jitted stages as ARGUMENTS, not
        # closure constants — closed-over pytrees would be embedded in
        # the serialized HLO (hundreds of MB for iresnet100), bloating
        # compile payloads and defeating donation
        self._vars = {
            "det": self.det_vars,
            "arc": self.arc_vars,
            "gen": self.gen_vars,
            "lmk": self.lmk_vars,
            "sr": sr[1] if sr is not None else {},
        }
        self._detect_match_j = jax.jit(self._detect_match_impl)
        self._swap_blend_j = jax.jit(self._swap_blend_impl,
                                     static_argnums=(6,))
        self._embed_j = jax.jit(self._embed_impl)
        self._swap_fused_j = jax.jit(self._swap_fused_impl,
                                     static_argnums=4)
        self._detect_swap_j = jax.jit(self._detect_swap_impl,
                                      static_argnums=(5,))

    def _detect_match(self, frames_u8, target_embeds):
        return self._detect_match_j(self._vars, frames_u8, target_embeds)

    def _swap_blend(self, frames_u8, kps, present, source_embeds,
                    mask_params=None, probe=False):
        return self._swap_blend_j(self._vars, frames_u8, kps, present,
                                  source_embeds, mask_params, probe)

    def _detect_swap(self, frames_u8, target_embeds, source_embeds,
                     mask_params=None, match_targets=True,
                     present_override=None):
        """Fused single-program detect->match->swap->blend for one chunk
        (the steady-state no-smoothing video path: one dispatch instead
        of two, ~26 ms/chunk of relay dispatch floor saved).

        present_override: optional (B,T) bool replacing the
        similarity-threshold presence — measurement hook for pinning
        lane occupancy (e.g. the 1-of-2-present lane-skip benchmark);
        None (production) leaves the trace unchanged."""
        return self._detect_swap_j(self._vars, frames_u8, target_embeds,
                                   source_embeds, mask_params,
                                   match_targets, present_override)

    def _embed(self, crops_rgb_u8):
        return self._embed_j(self._vars, crops_rgb_u8)

    # ----------------------------------------------------------- embeds
    def _embed_impl(self, variables, crops_rgb_u8):
        """(B,crop,crop,3) RGB [0,255] -> L2-normalized (B,512).

        Matches the reference embed path: (x/255 - .5)/.5 then bilinear
        x0.5 align_corners to 112 (reference utils/inference/core.py:44-45,
        image_processing.py:23-48)."""
        x = crops_rgb_u8.astype(jnp.float32) / 255.0
        x = (x - 0.5) / 0.5
        x = resize(x, (112, 112), method="bilinear", align_corners=True)
        e = self.arc_mod.apply(variables["arc"], x)
        return normalize_embedding(e)

    def embed_sources(self, source_crops_rgb: np.ndarray):
        """Source face crops -> (T,512) embeddings (not normalized, like
        the reference's source path at core.py:51-54 which feeds raw
        embeddings to G)."""
        x = jnp.asarray(source_crops_rgb).astype(jnp.float32) / 255.0
        x = (x - 0.5) / 0.5
        x = resize(x, (112, 112), method="bilinear", align_corners=True)
        return self.arc_mod.apply(self.arc_vars, x)  # host-side one-shot

    def embed_targets(self, target_crops_rgb: np.ndarray):
        return self._embed(jnp.asarray(target_crops_rgb))

    # ----------------------------------------------------- stage A: detect
    def _detect_match_impl(self, variables, frames_u8, target_embeds):
        """frames (B,H,W,3) RGB uint8; target_embeds (T,512) normalized.

        Returns (kps (B,T,5,2) frame coords, sim (B,T), raw face count
        proxy scores (B,F))."""
        cfg = self.cfg
        canvas, scale = preprocess_frames(frames_u8, cfg.det_size)
        outs = self.det_mod.apply(variables["det"], canvas)
        scores, _boxes, kps = decode_detections(
            outs,
            input_size=cfg.det_size,
            score_thresh=cfg.det_thresh,
            max_faces=cfg.max_faces,
        )
        kps = kps / scale  # back to frame coordinates
        b, f = scores.shape
        h, w = frames_u8.shape[1:3]

        # align + crop the top-K face lanes (lanes are score-sorted by
        # decode_detections; masked lanes produce garbage crops which
        # lose the argmax anyway)
        k = f if cfg.match_faces is None else min(cfg.match_faces, f)
        kps_k = kps[:, :k]
        m = estimate_norm(kps_k.reshape(b * k, 5, 2), cfg.crop_size,
                          mode=cfg.align_mode)
        crop_px = 112 if cfg.fast_match_crops else cfg.crop_size
        m = m * (crop_px / cfg.crop_size)

        d = cfg.match_downsample
        if d > 1 and h % d == 0 and w % d == 0:
            # matching crops from an area-downsampled frame: the frame
            # reduce is one shared pair of matmuls instead of K
            # frame-sized warps; half->full pixel centers are
            # x_full = d*x_half + (d-1)/2, folded into the matrices
            small = resize(frames_u8.astype(jnp.bfloat16),
                           (h // d, w // d), method="area")
            a_part = m[..., :2]
            t_part = m[..., 2] + (d - 1) / 2.0 * (
                a_part[..., 0] + a_part[..., 1])
            m = jnp.concatenate([a_part * d, t_part[..., None]], axis=-1)
        else:
            small = frames_u8

        if cfg.crop_mode == "similarity":
            crops = warp_affine_similarity(
                small, m.reshape(b, k, 2, 3), crop_px, subpix=2,
                interp=cfg.crop_interp)
        else:
            rep = jnp.repeat(small.astype(jnp.float32), k, axis=0)
            crops = warp_affine(rep, m, (crop_px, crop_px))
        x = (crops / 255.0 - 0.5) / 0.5
        if not cfg.fast_match_crops:
            x = resize(x, (112, 112), method="bilinear", align_corners=True)
        e = self.arc_mod.apply(variables["arc"], x)
        embeds = normalize_embedding(e).reshape(b, k, -1)

        sim = jnp.einsum("bfc,tc->bft", embeds, target_embeds)
        valid = (scores[:, :k] > 0)[:, :, None]
        sim = jnp.where(valid, sim, -1.0)
        best = jnp.argmax(sim, axis=1)  # (B,T)
        best_sim = jnp.take_along_axis(sim, best[:, None, :], axis=1)[:, 0, :]
        best_kps = jnp.take_along_axis(
            kps_k, best[..., None, None], axis=1
        )
        return best_kps, best_sim, scores, kps

    # ----------------------------------------------------- stage B: swap
    def _swap_blend_impl(self, variables, frames_u8, kps, present,
                         source_embeds, mask_params=None, probe=False,
                         groups=None):
        """frames (B,H,W,3) RGB uint8; kps (B,T,5,2); present (B,T) bool;
        source_embeds (T,512). Returns blended uint8 frames.

        mask_params: None -> compile-time cfg.mask_params (single
        landmark pass); (T,4) traced array -> per-target dynamic mask
        params. With probe=True a SECOND landmark pass runs over the
        ORIGINAL target crops and the (B,T) mask-offset statistic
        (reference masks.py:44-47) is returned alongside for host-side
        parameter selection. Steady state (probe=False) skips that pass:
        the reference only landmarks the target crop while params are
        unset (video_processing.py:218-223); with cached params
        face_mask_static never reads landmarks_tgt (masks.py:65-67)."""
        cfg = self.cfg
        b, t = kps.shape[:2]
        cs = cfg.crop_size

        m_all = estimate_norm(kps.reshape(b * t, 5, 2), cs,
                              mode=cfg.align_mode).reshape(b, t, 2, 3)

        # micro-batch the per-frame body (crops -> G -> landmarks ->
        # mask -> blend) over gen_groups via lax.map: divides the
        # transient activation peak (chunk 64 otherwise grazes the HBM
        # roof) at negligible wall cost
        g = cfg.gen_groups if groups is None else groups
        if g <= 1 or b % g != 0 or b < g:
            g = 1

        def body(args):
            return self._swap_body(variables, *args,
                                   source_embeds=source_embeds,
                                   mask_params=mask_params, probe=probe)

        if g == 1:
            res = body((frames_u8, m_all, present))
        else:
            bg = b // g
            grouped = (
                frames_u8.reshape(g, bg, *frames_u8.shape[1:]),
                m_all.reshape(g, bg, t, 2, 3),
                present.reshape(g, bg, t),
            )
            res = jax.lax.map(body, grouped)
            res = jax.tree.map(
                lambda x: x.reshape((x.shape[0] * x.shape[1],)
                                    + x.shape[2:]), res)
        return res

    def _swap_body(self, variables, frames_u8, m, present, source_embeds,
                   mask_params, probe=False):
        """Per-frame stage-B body over one micro-batch: frames
        (B,H,W,3) u8, m (B,T,2,3), present (B,T)."""
        if self.cfg.lane_skip:
            return self._swap_body_lanes(variables, frames_u8, m, present,
                                         source_embeds, mask_params, probe)
        return self._swap_body_batched(variables, frames_u8, m, present,
                                       source_embeds, mask_params, probe)

    def _swap_body_lanes(self, variables, frames_u8, m, present,
                         source_embeds, mask_params, probe=False):
        """Per-target-lane stage-B body with whole-group absence skip.

        Reference parity: the reference's swap loop runs only over
        DETECTED identities (reference utils/inference/core.py:72-74 —
        `for i in range(len(crop_frames_list))` over faces that matched)
        so absent identities cost nothing. The lane structure here
        restores that: each lane's crop extraction, AEI forward,
        optional SR, landmark, mask and paste-back sit inside a scalar
        `lax.cond` on `jnp.any(present[:, j])` (the enhancer's one_lane
        pattern, pipeline/enhance.py). Lane granularity is the
        micro-batch group, so a target absent for a whole chunk costs T
        conds; all-present groups run the identical per-sample math as
        `_swap_body_batched` (bit-match tested)."""
        cfg = self.cfg
        b, t = m.shape[:2]
        cs = cfg.crop_size
        need_offsets = probe or isinstance(mask_params, str)
        lmk_apply = lambda v, imgs: self.lmk_mod.apply(v, imgs)

        def lane(j):
            m_j = m[:, j]  # (B,2,3)

            def run(_):
                if cfg.crop_mode == "similarity":
                    crops = warp_affine_similarity(
                        frames_u8, m_j[:, None], cs,
                        subpix=cfg.crop_subpix, interp=cfg.crop_interp)
                else:
                    crops = warp_affine(frames_u8.astype(jnp.float32),
                                        m_j, (cs, cs))
                gen_in = resize(crops / 255.0, (cfg.gen_size, cfg.gen_size),
                                method="bilinear")
                gen_in = (gen_in - 0.5) / 0.5
                src = jnp.tile(source_embeds[j][None], (b, 1))
                y, _ = self.gen_mod.apply(variables["gen"], gen_in, src)
                y = (y * 0.5 + 0.5) * 255.0
                if self.sr is not None:
                    # the lane cond subsumes the separate SR cond the
                    # batched body needs
                    sr_mod, _ = self.sr
                    r = sr_mod.apply(variables["sr"],
                                     (y / 255.0 - 0.5) / 0.5)
                    y = ((r * 0.5 + 0.5) * 255.0).astype(jnp.float32)
                swap224 = resize(y, (cs, cs), method="bilinear")

                offs_j = jnp.zeros((b,), jnp.float32)
                if mask_params is None:
                    lmks = landmarks_from_crops(lmk_apply, variables["lmk"],
                                                swap224, cs)
                    mask = face_mask_batch(lmks, cs, cfg.mask_params)
                else:
                    from ghost_tpu.ops.mask import (
                        mask_offset_from_landmarks,
                        mask_params_from_offset_traced,
                        soft_face_mask_dynamic)

                    if need_offsets:
                        both = jnp.concatenate(
                            [swap224, crops.astype(swap224.dtype)], axis=0)
                        lm_both = landmarks_from_crops(
                            lmk_apply, variables["lmk"], both, cs)
                        lmks, lmks_tgt = lm_both[:b], lm_both[b:]
                        offs_j = jax.vmap(mask_offset_from_landmarks)(
                            lmks, lmks_tgt)
                    else:
                        lmks = landmarks_from_crops(
                            lmk_apply, variables["lmk"], swap224, cs)
                    if isinstance(mask_params, str):  # "auto"
                        params_b = jax.vmap(
                            mask_params_from_offset_traced)(offs_j)
                    else:
                        params_b = jnp.tile(
                            jnp.asarray(mask_params, jnp.float32)[j][None],
                            (b, 1))
                    mask = jax.vmap(
                        lambda lm, p: soft_face_mask_dynamic(
                            lm, cs, p[0], p[1], p[2], p[3])
                    )(lmks, params_b)[..., None]
                return swap224, mask, offs_j

            aval = jax.eval_shape(run, 0)
            return jax.lax.cond(
                jnp.any(present[:, j]), run,
                lambda _: jax.tree.map(
                    lambda a: jnp.zeros(a.shape, a.dtype), aval), 0)

        lanes = [lane(j) for j in range(t)]

        # sequential per-target paste-back, each lane's blend behind the
        # same group-presence cond (blend into an untouched frame is a
        # masked no-op anyway — present=False keeps the frame — so
        # skipping changes nothing; tested)
        blend_dtype = (jnp.bfloat16 if cfg.pasteback == "similarity"
                       else jnp.float32)
        out = frames_u8.astype(blend_dtype)  # exact: u8 fits bf16
        for j in range(t):
            swap_j, mask_j, _ = lanes[j]

            def blend(o, j=j, swap_j=swap_j, mask_j=mask_j):
                if cfg.pasteback == "similarity":
                    r = warp_and_blend_similarity(
                        o, swap_j, mask_j, m[:, j], present=present[:, j],
                        rot_subpix=cfg.blend_rot_subpix)
                else:
                    r = warp_and_blend(o, swap_j, mask_j, m[:, j],
                                       present=present[:, j])
                return r.astype(blend_dtype)

            out = jax.lax.cond(jnp.any(present[:, j]), blend,
                               lambda o: o, out)
        out = jnp.clip(out, 0, 255).astype(jnp.uint8)
        if need_offsets and mask_params is not None:
            return out, jnp.stack([ln[2] for ln in lanes], axis=1)
        return out

    def _swap_body_batched(self, variables, frames_u8, m, present,
                           source_embeds, mask_params, probe=False):
        """All-lanes-batched stage-B body (lane_skip=False): frames
        (B,H,W,3) u8, m (B,T,2,3), present (B,T). Kept as the bit-match
        reference for the lane-skip body and for A/B measurement."""
        cfg = self.cfg
        b, t = m.shape[:2]
        cs = cfg.crop_size

        if cfg.crop_mode == "similarity":
            # tent-matmul crop extraction: no (B*T,H,W,3) f32 frame
            # replication, no frame-sized gathers
            crops = warp_affine_similarity(frames_u8, m, cs,
                                           subpix=cfg.crop_subpix,
                                           interp=cfg.crop_interp)
        else:
            frames_f = frames_u8.astype(jnp.float32)
            crops = warp_affine(jnp.repeat(frames_f, t, axis=0),
                                m.reshape(b * t, 2, 3), (cs, cs))

        # generator input: 256, [-1,1]
        gen_in = resize(crops / 255.0, (cfg.gen_size, cfg.gen_size),
                        method="bilinear")
        gen_in = (gen_in - 0.5) / 0.5
        src = jnp.tile(source_embeds, (b, 1))  # (B*T,512) frame-major
        y, _ = self.gen_mod.apply(variables["gen"], gen_in, src)
        y = (y * 0.5 + 0.5) * 255.0

        if self.sr is not None:
            # Per-TARGET-lane SR with a scalar cond skip (the enhancer's
            # lane-skip pattern, enhance.py one_lane): the reference runs
            # its SR on every final_frame unconditionally
            # (video_processing.py:263-285), but a lane absent across
            # the whole chunk contributes nothing to the paste — a
            # 1-identity-present multi-target video pays 1 SR lane
            # instead of T. All-present chunks (the bench) trace to the
            # same total SR work as the unconditional form.
            sr_mod, _ = self.sr
            gs = y.shape[1]
            y_l = y.reshape(b, t, gs, gs, 3)

            def sr_lane(y_lane, pres):
                def run(v):
                    r = sr_mod.apply(variables["sr"],
                                     (v / 255.0 - 0.5) / 0.5)
                    return ((r * 0.5 + 0.5) * 255.0).astype(jnp.float32)

                return jax.lax.cond(jnp.any(pres), run,
                                    lambda v: v.astype(jnp.float32),
                                    y_lane)

            y = jnp.stack([sr_lane(y_l[:, j], present[:, j])
                           for j in range(t)], axis=1)
            y = y.reshape(b * t, gs, gs, 3)

        swap224 = resize(y, (cs, cs), method="bilinear")

        lmk_apply = lambda v, imgs: self.lmk_mod.apply(v, imgs)
        offsets = None
        need_offsets = probe or isinstance(mask_params, str)
        if mask_params is None:
            lmks = landmarks_from_crops(lmk_apply, variables["lmk"],
                                        swap224, cs)
            mask = face_mask_batch(lmks, cs, self.cfg.mask_params)
        else:
            from ghost_tpu.ops.mask import (mask_offset_from_landmarks,
                                            mask_params_from_offset_traced,
                                            soft_face_mask_dynamic)

            if need_offsets:
                # one landmark pass over [swap | original target crop]:
                # the offset statistic needs BOTH (reference
                # video_processing.py:218-223 runs the handler on the
                # target crop only while params are unset)
                both = jnp.concatenate(
                    [swap224, crops.astype(swap224.dtype)], axis=0)
                lm_both = landmarks_from_crops(lmk_apply, variables["lmk"],
                                               both, cs)
                n = b * t
                lmks, lmks_tgt = lm_both[:n], lm_both[n:]
                offsets = jax.vmap(mask_offset_from_landmarks)(
                    lmks, lmks_tgt).reshape(b, t)
            else:
                # steady state: params are cached, face_mask_static
                # ignores landmarks_tgt (masks.py:65-67) — landmark the
                # swap only (halves the landmark work per chunk)
                lmks = landmarks_from_crops(lmk_apply, variables["lmk"],
                                            swap224, cs)
            if isinstance(mask_params, str):  # "auto": per-face params
                # on-device mask_params_from_offset (masks.py:49-76
                # thresholds) — the reference's IMAGE path selects
                # params from the image's own landmarks
                params_bt = jax.vmap(
                    mask_params_from_offset_traced)(offsets.reshape(-1))
            else:
                params_bt = jnp.tile(
                    jnp.asarray(mask_params, jnp.float32), (b, 1))  # (B*T,4)
            mask = jax.vmap(
                lambda lm, p: soft_face_mask_dynamic(
                    lm, cs, p[0], p[1], p[2], p[3])
            )(lmks, params_bt)[..., None]

        # iterative per-target blend keeps frame-major layout: blend
        # target 0 into frames, then target 1 into the result, matching
        # the reference's sequential per-identity paste-back
        # (video_processing.py:210-235). Frames enter as uint8 and the
        # blend runs bf16 so no full-frame f32 buffer ever materializes
        # (HBM headroom is what gates the chunk size).
        out = frames_u8
        swap224 = swap224.reshape(b, t, cs, cs, 3)
        mask = mask.reshape(b, t, cs, cs, 1)
        m = m.reshape(b, t, 2, 3)
        h = frames_u8.shape[1]
        for j in range(t):
            if cfg.pasteback == "similarity":
                out = warp_and_blend_similarity(
                    out, swap224[:, j], mask[:, j], m[:, j],
                    present=present[:, j],
                    rot_subpix=cfg.blend_rot_subpix)
            else:
                out = warp_and_blend(out, swap224[:, j], mask[:, j], m[:, j],
                                     present=present[:, j])
        out = jnp.clip(out, 0, 255).astype(jnp.uint8)
        if offsets is not None:
            return out, offsets
        return out

    def _swap_fused_impl(self, variables, frames_u8, target_embeds,
                         source_embeds, match_targets: bool):
        """Single-program detect->match->swap->blend (no host hop): the
        latency path for stills, where no temporal smoothing separates
        the stages. Semantics identical to stage A + stage B with
        smooth=False."""
        cfg = self.cfg
        kps, sim, scores, raw_kps = self._detect_match_impl(
            variables, frames_u8, target_embeds)
        t = target_embeds.shape[0]
        if match_targets:
            present = sim > cfg.similarity_th
        else:
            kps = raw_kps[:, :t]
            present = scores[:, :t] > 0.0
        # "auto" = per-face on-device mask-parameter selection: the
        # reference's image path derives params from the image's own
        # landmarks (masks.py:38-49 with params=None)
        mp = "auto" if cfg.mask_per_shot else None
        out = self._swap_blend_impl(variables, frames_u8, kps, present,
                                    source_embeds, mp)
        return out[0] if isinstance(out, tuple) else out

    def _detect_swap_impl(self, variables, frames_u8, target_embeds,
                          source_embeds, mask_params,
                          match_targets: bool, present_override=None):
        """Fused steady-state video chunk: detect -> match -> swap ->
        blend in ONE program. Semantics identical to stage A + stage B
        with smooth=False and cached per-shot mask params; the whole
        body (detector included) micro-batches over cfg.fused_group
        frames via lax.map so chunk 128 peaks like a chunk-32 stage A."""
        cfg = self.cfg
        b = frames_u8.shape[0]
        t = target_embeds.shape[0]
        gs = cfg.fused_group
        g = b // gs if (gs > 0 and b % gs == 0 and b > gs) else 1

        def body(fr, pov=None):
            kps, sim, scores, raw_kps = self._detect_match_impl(
                variables, fr, target_embeds)
            if match_targets:
                present = sim > cfg.similarity_th
            else:
                kps = raw_kps[:, :t]
                present = scores[:, :t] > 0.0
            if pov is not None:
                present = pov
            return self._swap_blend_impl(variables, fr, kps, present,
                                         source_embeds, mask_params,
                                         groups=1)

        if g == 1:
            return body(frames_u8, present_override)
        fr_g = frames_u8.reshape(g, gs, *frames_u8.shape[1:])
        if present_override is None:
            res = jax.lax.map(body, fr_g)
        else:
            res = jax.lax.map(
                lambda a: body(a[0], a[1]),
                (fr_g, present_override.reshape(g, gs, t)))
        return jax.tree.map(
            lambda x: x.reshape((x.shape[0] * x.shape[1],) + x.shape[2:]),
            res)

    def swap_image_fused(self, frame_rgb_u8: np.ndarray,
                         source_crops_rgb: np.ndarray,
                         target_crops_rgb: np.ndarray | None = None):
        """--image_to_image in ONE device program (vs two + host hop)."""
        src_emb = self.embed_sources(source_crops_rgb)
        match_targets = target_crops_rgb is not None
        tgt_emb = (self.embed_targets(target_crops_rgb) if match_targets
                   else normalize_embedding(src_emb))
        out = self._swap_fused_j(self._vars,
                                 jnp.asarray(frame_rgb_u8[None]),
                                 tgt_emb, src_emb, match_targets)
        return np.asarray(out)[0]

    # ------------------------------------------------------------ driver
    def swap_video_frames(
        self,
        frames_rgb_u8: np.ndarray,
        source_crops_rgb: np.ndarray,
        target_crops_rgb: np.ndarray | None,
        smooth: bool = True,
    ) -> np.ndarray:
        """Full chunked video swap on fixed-size chunks.

        frames: (N,H,W,3) RGB uint8; sources (T,crop,crop,3); targets
        same (or None: swap the single best face per frame, reference
        set_target=False semantics).
        """
        from ghost_tpu.pipeline.smoothing import smooth_tracks

        cfg = self.cfg
        n = frames_rgb_u8.shape[0]
        t = source_crops_rgb.shape[0]
        src_emb = self.embed_sources(source_crops_rgb)
        match_targets = target_crops_rgb is not None
        if match_targets:
            tgt_emb = self.embed_targets(target_crops_rgb)
        else:
            tgt_emb = normalize_embedding(src_emb)  # unused for selection

        # stage A over chunks
        kps_all = np.zeros((n, t, 5, 2), np.float32)
        sim_all = np.zeros((n, t), np.float32)
        bsz = cfg.chunk_size
        pad = (-n) % bsz
        frames_pad = np.concatenate(
            [frames_rgb_u8, np.repeat(frames_rgb_u8[-1:], pad, 0)], 0
        ) if pad else frames_rgb_u8
        for i in range(0, n + pad, bsz):
            chunk = jnp.asarray(frames_pad[i : i + bsz])
            kps, sim, scores, raw_kps = self._detect_match(chunk, tgt_emb)
            hi = min(i + bsz, n)
            take = hi - i
            if take <= 0:
                continue
            if match_targets:
                kps_all[i:hi] = np.asarray(kps)[:take]
                sim_all[i:hi] = np.asarray(sim)[:take]
            else:
                # no explicit targets: source j swaps the j-th
                # best-scored face (reference set_target=False picks any
                # face in the frame, video_processing.py:150-151)
                kps_all[i:hi] = np.asarray(raw_kps)[:take, :t]
                sim_all[i:hi] = np.asarray(scores)[:take, :t]

        present = sim_all > (cfg.similarity_th if match_targets else 0.0)
        if smooth:
            kps_all = smooth_tracks(kps_all, present, n=2)

        # stage B over chunks
        out = np.empty_like(frames_pad)
        present_pad = np.concatenate(
            [present, np.zeros((pad, t), bool)], 0
        ) if pad else present
        kps_pad = np.concatenate(
            [kps_all, np.zeros((pad, t, 5, 2), np.float32)], 0
        ) if pad else kps_all

        mask_params_t = None
        if cfg.mask_per_shot:
            # probe passes with default params: for each target, collect
            # the per-face offset statistic from the chunk holding its
            # FIRST present frame, select its params once, then process
            # every chunk with the selection — the reference's
            # params-from-first-frame caching derives params at each
            # face's first appearance (video_processing.py:204,218-223).
            # Typically all targets appear in chunk 0 => one probe.
            from ghost_tpu.ops.mask import mask_params_from_offset

            chosen = [tuple(cfg.mask_params)] * t
            need = set(range(t))
            for i in range(0, n + pad, bsz):
                js = [j for j in need
                      if present_pad[i:i + bsz, j].any()]
                if not js:
                    continue
                default = jnp.asarray(chosen, jnp.float32)
                _probe, offs = self._swap_blend(
                    jnp.asarray(frames_pad[i:i + bsz]),
                    jnp.asarray(kps_pad[i:i + bsz]),
                    jnp.asarray(present_pad[i:i + bsz]), src_emb, default,
                    probe=True)
                offs = np.asarray(offs)
                for j in js:
                    idx = np.nonzero(present_pad[i:i + bsz, j])[0]
                    chosen[j] = mask_params_from_offset(
                        float(offs[idx[0], j]))
                    need.discard(j)
                if not need:
                    break
            mask_params_t = jnp.asarray(chosen, jnp.float32)

        for i in range(0, n + pad, bsz):
            res = self._swap_blend(
                jnp.asarray(frames_pad[i : i + bsz]),
                jnp.asarray(kps_pad[i : i + bsz]),
                jnp.asarray(present_pad[i : i + bsz]),
                src_emb,
                mask_params_t,
            )
            out[i : i + bsz] = np.asarray(res)
        return out[:n]

    def swap_video_stream(
        self,
        chunks,
        source_crops_rgb: np.ndarray,
        target_crops_rgb: np.ndarray | None = None,
        smooth: bool = True,
    ):
        """Constant-memory streaming swap (reference reads the WHOLE
        video into RAM first, video_processing.py:37-66; this consumes
        an iterator of (<=chunk,H,W,3) RGB uint8 chunks — e.g.
        data.frames.stream_video_chunks' decode-thread ring — and
        yields swapped chunks in order).

        Stage B for chunk i is dispatched right after stage A for chunk
        i+1, so detection, generation and host decode overlap via async
        dispatch. Keypoint smoothing runs windowed with a one-chunk lag
        and 2-frame context tails — exact parity with the full-video
        smoothing for the reference's +-2-frame window.
        """
        from ghost_tpu.pipeline.smoothing import smooth_tracks

        cfg = self.cfg
        t = source_crops_rgb.shape[0]
        bsz = cfg.chunk_size
        src_emb = self.embed_sources(source_crops_rgb)
        match_targets = target_crops_rgb is not None
        tgt_emb = (self.embed_targets(target_crops_rgb) if match_targets
                   else normalize_embedding(src_emb))

        def run_a(frames_np):
            n = frames_np.shape[0]
            pad = bsz - n
            if pad:
                frames_np = np.concatenate(
                    [frames_np, np.repeat(frames_np[-1:], pad, 0)], 0)
            kps, sim, scores, raw_kps = self._detect_match(
                jnp.asarray(frames_np), tgt_emb)
            if match_targets:
                kps_np, sim_np = np.asarray(kps), np.asarray(sim)
            else:
                kps_np = np.asarray(raw_kps)[:, :t]
                sim_np = np.asarray(scores)[:, :t]
            present = sim_np > (cfg.similarity_th if match_targets else 0.0)
            if pad:
                present[n:] = False
            return frames_np, n, kps_np, sim_np, present

        # per-shot mask params, derived at each target's FIRST present
        # frame (the reference caches params from the first frame where
        # the face appears, video_processing.py:204,218-223). `need`
        # holds targets not yet probed; typically all appear in chunk 0
        # so exactly one probe dispatch happens.
        chosen = [tuple(cfg.mask_params)] * t
        need = set(range(t)) if cfg.mask_per_shot else set()
        mask_params_t = (jnp.asarray(chosen, jnp.float32)
                         if cfg.mask_per_shot else None)
        prev = None  # (frames, n, kps, present) awaiting stage B
        tail_kps = None  # raw kps/present of the previous chunk's tail
        tail_present = None

        def run_b(frames_np, n, kps_np, present, head_kps, head_present):
            nonlocal mask_params_t
            k = kps_np
            p = present
            if smooth:
                lo = 0 if tail_kps is None else tail_kps.shape[0]
                ctx_k = [kps_np[:n]]
                ctx_p = [present[:n]]
                if tail_kps is not None:
                    ctx_k.insert(0, tail_kps)
                    ctx_p.insert(0, tail_present)
                if head_kps is not None:
                    ctx_k.append(head_kps)
                    ctx_p.append(head_present)
                sm = smooth_tracks(np.concatenate(ctx_k, 0),
                                   np.concatenate(ctx_p, 0), n=2)
                k = kps_np.copy()
                k[:n] = sm[lo:lo + n]
            js = [j for j in need if p[:n, j].any()]
            if js:
                from ghost_tpu.ops.mask import mask_params_from_offset

                _probe, offs = self._swap_blend(
                    jnp.asarray(frames_np), jnp.asarray(k),
                    jnp.asarray(p), src_emb, mask_params_t, probe=True)
                offs = np.asarray(offs)
                for j in js:
                    idx = np.nonzero(p[:n, j])[0]
                    chosen[j] = mask_params_from_offset(
                        float(offs[idx[0], j]))
                    need.discard(j)
                mask_params_t = jnp.asarray(chosen, jnp.float32)
            res = self._swap_blend(jnp.asarray(frames_np), jnp.asarray(k),
                                   jnp.asarray(p), src_emb, mask_params_t)
            return np.asarray(res)[:n]

        if not smooth:
            # no smoothing separates the stages: steady state is the
            # FUSED detect->swap program, one dispatch per chunk. While
            # any target is still unprobed the chunk runs split (stage A
            # exposes per-target presence so the probe can fire at the
            # first appearance, then the chunk is reprocessed with the
            # selection — the reference's params-from-first-frame
            # caching, video_processing.py:204,218-223).
            #
            # Steady chunks run one-chunk-lookahead: chunk i's device
            # result is held while chunk i+1 is uploaded and dispatched,
            # so the D2H download of chunk i and the H2D upload of chunk
            # i+1 both overlap chunk i+1's on-device compute (async
            # dispatch) instead of serializing host<->device<->host per
            # chunk. The split (probe) path always runs before the first
            # steady chunk, so yield order is preserved. This replaces
            # the reference's whole-video-in-RAM + per-frame ping-pong
            # (video_processing.py:37-66).
            pending = None  # (device result, valid frame count)
            for frames_np in chunks:
                frames_np = np.asarray(frames_np)
                if need:
                    fpad, fn, kps_np, sim_np, present = run_a(frames_np)
                    yield run_b(fpad, fn, kps_np, present, None, None)
                    continue
                n = frames_np.shape[0]
                pad = bsz - n
                fpad = np.concatenate(
                    [frames_np, np.repeat(frames_np[-1:], pad, 0)], 0
                ) if pad else frames_np
                res = self._detect_swap(jnp.asarray(fpad), tgt_emb,
                                        src_emb, mask_params_t,
                                        match_targets)
                if pending is not None:
                    yield np.asarray(pending[0])[:pending[1]]
                pending = (res, n)
            if pending is not None:
                yield np.asarray(pending[0])[:pending[1]]
            return

        for frames_np in chunks:
            frames_np = np.asarray(frames_np)
            cur = run_a(frames_np)
            if prev is not None:
                pf, pn, pk, pp = prev
                out = run_b(pf, pn, pk, pp, cur[2][:2], cur[4][:2])
                tail_kps, tail_present = pk[max(pn - 2, 0):pn], \
                    pp[max(pn - 2, 0):pn]
                yield out
            prev = (cur[0], cur[1], cur[2], cur[4])
        if prev is not None:
            pf, pn, pk, pp = prev
            yield run_b(pf, pn, pk, pp, None, None)

    def swap_image(
        self,
        frame_rgb_u8: np.ndarray,
        source_crops_rgb: np.ndarray,
        target_crops_rgb: np.ndarray | None = None,
    ) -> np.ndarray:
        """Single-image path (reference --image_to_image)."""
        out = self.swap_video_frames(
            frame_rgb_u8[None], source_crops_rgb, target_crops_rgb, smooth=False
        )
        return out[0]

    def crop_faces(self, image_rgb_u8: np.ndarray, max_faces: int | None = None):
        """crop_face parity (reference image_processing.py:13-20):
        detect, align to crop_size, return crops sorted by score."""
        cfg = self.cfg
        frames = jnp.asarray(image_rgb_u8[None])
        canvas, scale = preprocess_frames(frames, cfg.det_size)
        outs = self.det_mod.apply(self.det_vars, canvas)
        scores, _boxes, kps = decode_detections(
            outs, input_size=cfg.det_size, score_thresh=cfg.det_thresh,
            max_faces=max_faces or cfg.max_faces,
        )
        kps = np.asarray(kps[0] / scale)
        scores = np.asarray(scores[0])
        n_valid = int((scores > 0).sum())
        if n_valid == 0:
            return np.zeros((0, cfg.crop_size, cfg.crop_size, 3), np.uint8), scores
        m = estimate_norm(jnp.asarray(kps[:n_valid]), cfg.crop_size)
        crops = warp_affine(
            jnp.repeat(frames.astype(jnp.float32), n_valid, axis=0),
            m, (cfg.crop_size, cfg.crop_size),
        )
        return np.asarray(jnp.clip(crops, 0, 255).astype(jnp.uint8)), scores


def build_random_pipeline(config: SwapConfig = SwapConfig(),
                          policy: Policy = DEFAULT_POLICY,
                          arcface_layers=(1, 1, 1, 1),
                          backbone: str = "unet",
                          seed: int = 0) -> SwapPipeline:
    """Random-init pipeline for tests and throughput benchmarks (weights
    affect quality only, not the compute graph)."""
    key = jax.random.key(seed)
    # jitted inits: eager init dispatches thousands of tiny ops — over
    # a remote-attached TPU that is minutes of ~25 ms dispatch floors
    # per model; one jitted (and persistently cached) program each
    # makes pipeline builds seconds instead (bench deliverability,
    # VERDICT r4 item 1)
    det = SCRFD(policy=policy)
    det_vars = jax.jit(det.init)(
        key, jnp.zeros((1, config.det_size, config.det_size, 3)))
    arc = IResNet(layers=arcface_layers, policy=policy)
    arc_vars = jax.jit(arc.init)(key, jnp.zeros((1, 112, 112, 3)))
    # Pallas fused AAD modulate on the C>=128 generator blocks (TPU
    # only — the kernel is serving-path; CPU tests keep the jnp chain)
    gen = AEINet(backbone=backbone, num_blocks=2, policy=policy,
                 fused_aad=jax.default_backend() == "tpu")
    gen_vars = jax.jit(gen.init)(
        key, jnp.zeros((1, config.gen_size, config.gen_size, 3)),
        jnp.zeros((1, 512)))
    lmk = Landmark106(policy=policy)
    lmk_vars = jax.jit(lmk.init)(key, jnp.zeros((1, 192, 192, 3)))
    return SwapPipeline((det, det_vars), (arc, arc_vars), (gen, gen_vars),
                        (lmk, lmk_vars), config=config)
