from ghost_tpu.ops.pallas.attention import flash_attention
from ghost_tpu.ops.pallas.layer_norm import fused_layer_norm

__all__ = ["flash_attention", "fused_layer_norm"]
