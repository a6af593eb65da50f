"""SR network registry — the SPADE dynamic-lookup equivalent.

The reference resolves generators/discriminators by lowercase class
name at runtime ('lipspade' -> LIPSPADEGenerator; reference
models/networks/__init__.py:15-63, models/config_sr.py:21). Here it is
an explicit table (compile-friendly, typo-checked) with the same names.
"""

from __future__ import annotations

from typing import Callable, Dict

from ghost_tpu.models.discriminator import MultiscaleDiscriminator, NLayerDiscriminator
from ghost_tpu.models.sr.encoder import ConvEncoder
from ghost_tpu.models.sr.generator import (
    HiFaceGANGenerator,
    LIPSPADEGenerator,
    SPADEGenerator,
)

GENERATORS: Dict[str, Callable] = {
    "spade": SPADEGenerator,
    "lipspade": LIPSPADEGenerator,
    "hifacegan": HiFaceGANGenerator,
}

DISCRIMINATORS: Dict[str, Callable] = {
    "multiscale": MultiscaleDiscriminator,
    "nlayer": NLayerDiscriminator,
}

ENCODERS: Dict[str, Callable] = {"conv": ConvEncoder}


def define_g(name: str, **kwargs):
    try:
        return GENERATORS[name.lower()](**kwargs)
    except KeyError:
        raise KeyError(
            f"unknown SR generator {name!r}; options: {sorted(GENERATORS)}"
        ) from None


def define_d(name: str, **kwargs):
    try:
        return DISCRIMINATORS[name.lower()](**kwargs)
    except KeyError:
        raise KeyError(
            f"unknown SR discriminator {name!r}; options: {sorted(DISCRIMINATORS)}"
        ) from None


def define_e(name: str, **kwargs):
    try:
        return ENCODERS[name.lower()](**kwargs)
    except KeyError:
        raise KeyError(
            f"unknown SR encoder {name!r}; options: {sorted(ENCODERS)}"
        ) from None
