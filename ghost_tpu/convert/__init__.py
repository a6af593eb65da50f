from ghost_tpu.convert.torch_loader import (
    convert_aei_state_dict,
    convert_arcface_state_dict,
    convert_discriminator_state_dict,
    load_torch_checkpoint,
)

__all__ = [
    "convert_aei_state_dict",
    "convert_arcface_state_dict",
    "convert_discriminator_state_dict",
    "load_torch_checkpoint",
]
