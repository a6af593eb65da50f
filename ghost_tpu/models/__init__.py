from ghost_tpu.models.aei import AEINet, AADGenerator, MLAttrEncoder, AADLayer, AADResBlock
from ghost_tpu.models.discriminator import MultiscaleDiscriminator, NLayerDiscriminator
from ghost_tpu.models.arcface import IResNet, iresnet100, iresnet50

__all__ = [
    "AEINet",
    "AADGenerator",
    "MLAttrEncoder",
    "AADLayer",
    "AADResBlock",
    "MultiscaleDiscriminator",
    "NLayerDiscriminator",
    "IResNet",
    "iresnet100",
    "iresnet50",
]
