from ghost_tpu.models.aei import AEINet, AADGenerator, MLAttrEncoder, AADLayer, AADResBlock
from ghost_tpu.models.discriminator import MultiscaleDiscriminator, NLayerDiscriminator
from ghost_tpu.models.arcface import IResNet, iresnet100, iresnet50
from ghost_tpu.models.scrfd import SCRFD, decode_detections
from ghost_tpu.models.landmark import Landmark106, landmarks_from_crops
from ghost_tpu.models.fan import FAN, eye_heatmaps

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
    "SCRFD",
    "decode_detections",
    "Landmark106",
    "landmarks_from_crops",
    "FAN",
    "eye_heatmaps",
]
