from ghost_tpu.pipeline.swap import SwapPipeline, SwapConfig

__all__ = ["SwapPipeline", "SwapConfig"]
