from ghost_tpu.models.sr.spade import SPADE, SPADEResnetBlock, SpectralConv
from ghost_tpu.models.sr.generator import (
    SPADEGenerator,
    LIPSPADEGenerator,
    LIPEncoder,
    SimplifiedLIP,
)

__all__ = [
    "SPADE",
    "SPADEResnetBlock",
    "SpectralConv",
    "SPADEGenerator",
    "LIPSPADEGenerator",
    "LIPEncoder",
    "SimplifiedLIP",
]
