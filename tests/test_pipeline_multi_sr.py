"""Config-4 coverage: multi-identity video swap with the SR generator
in the loop (reference inference.py --use_sr + multiple sources)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ghost_tpu.core.precision import FULL_PRECISION
from ghost_tpu.models.sr.generator import LIPSPADEGenerator
from ghost_tpu.pipeline.swap import SwapConfig, SwapPipeline, build_random_pipeline


@pytest.fixture(scope="module")
def sr_pipe():
    cfg = SwapConfig(det_size=320, chunk_size=2, max_faces=4, use_sr=True)
    base = build_random_pipeline(cfg, policy=FULL_PRECISION,
                                 arcface_layers=(1, 1, 1, 1))
    sr_mod = LIPSPADEGenerator(ngf=4, policy=FULL_PRECISION)
    sr_vars = sr_mod.init(jax.random.key(0), jnp.zeros((1, 256, 256, 3)))
    return SwapPipeline(
        (base.det_mod, base.det_vars),
        (base.arc_mod, base.arc_vars),
        (base.gen_mod, base.gen_vars),
        (base.lmk_mod, base.lmk_vars),
        sr=(sr_mod, sr_vars),
        config=cfg,
    )


def test_multi_identity_sr_video(sr_pipe, rng):
    frames = rng.integers(0, 255, (2, 256, 320, 3), dtype=np.uint8)
    sources = rng.integers(0, 255, (2, 224, 224, 3), dtype=np.uint8)
    targets = rng.integers(0, 255, (2, 224, 224, 3), dtype=np.uint8)
    out = sr_pipe.swap_video_frames(frames, sources, targets)
    assert out.shape == frames.shape
    assert out.dtype == np.uint8
