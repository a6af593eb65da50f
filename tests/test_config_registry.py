"""Config override tree + SR registry."""

import pytest

from ghost_tpu.core.config import GhostConfig, apply_overrides
from ghost_tpu.models.sr.registry import define_d, define_e, define_g


def test_overrides():
    cfg = GhostConfig()
    cfg = apply_overrides(cfg, ["train.lr_g=1e-3", "model.backbone=linknet",
                                "bf16=false", "mesh.model=2"])
    assert cfg.train.lr_g == 1e-3
    assert cfg.model.backbone == "linknet"
    assert cfg.bf16 is False
    assert cfg.mesh.model == 2
    # original untouched fields keep defaults
    assert cfg.train.lr_d == 4e-4


def test_override_errors():
    with pytest.raises(AttributeError):
        apply_overrides(GhostConfig(), ["train.nope=1"])
    with pytest.raises(ValueError):
        apply_overrides(GhostConfig(), ["train.lr_g"])


def test_registry():
    g = define_g("lipspade", ngf=4)
    assert g.ngf == 4
    d = define_d("multiscale", ndf=4)
    assert d.ndf == 4
    e = define_e("conv", ndf=4)
    assert e.ndf == 4
    with pytest.raises(KeyError):
        define_g("nope")
