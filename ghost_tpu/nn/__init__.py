from ghost_tpu.nn.layers import (
    Conv,
    ConvTranspose,
    Dense,
    BatchNorm,
    instance_norm,
    rms_instance_norm,
    PReLU,
    leaky_relu,
    resize,
    resize_like_torch,
    avg_pool_3x3s2,
)

__all__ = [
    "Conv",
    "ConvTranspose",
    "Dense",
    "BatchNorm",
    "instance_norm",
    "rms_instance_norm",
    "PReLU",
    "leaky_relu",
    "resize",
    "resize_like_torch",
    "avg_pool_3x3s2",
]
