from ghost_tpu.ops.umeyama import estimate_norm, umeyama_similarity, ARCFACE_TEMPLATE
from ghost_tpu.ops.warp import warp_affine, invert_affine, warp_and_blend
from ghost_tpu.ops.mask import face_mask_batch, soft_face_mask

__all__ = [
    "estimate_norm",
    "umeyama_similarity",
    "ARCFACE_TEMPLATE",
    "warp_affine",
    "invert_affine",
    "warp_and_blend",
    "face_mask_batch",
    "soft_face_mask",
]
