from ghost_tpu.ops.pallas.attention import flash_attention
from ghost_tpu.ops.pallas.layer_norm import fused_layer_norm
from ghost_tpu.ops.pallas.warp_kernel import pasteback_pallas

__all__ = ["flash_attention", "fused_layer_norm", "pasteback_pallas"]
