"""Auxiliary trainer CLI (train_extras): one-step smoke per mode.

Parity targets: reference train-discriminator.py, train-upsampler.py,
train-mask.py entry points (step math already unit-tested in
tests/test_extra_trainers.py; this exercises the CLI wiring:
dataset -> embeds -> jitted step -> msgpack save).
"""

import os

import numpy as np
import pytest


@pytest.fixture()
def crops_dir(tmp_path):
    import cv2

    d = tmp_path / "crops"
    d.mkdir()
    rng = np.random.default_rng(0)
    for i in range(4):
        cv2.imwrite(str(d / f"{i}.jpg"),
                    rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))
    return d


BASE = ["--batch_size", "2", "--max_steps", "1", "--width", "0.0625",
        "--arcface_depth", "tiny", "--bf16", "", "--num_blocks", "1",
        "--num_workers", "1", "--max_epochs", "1",
        "--allow_random_weights", "1"]


def test_discriminator_mode(crops_dir, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from ghost_tpu.cli.train_extras import main

    main(["--mode", "discriminator", "--dataset_path", str(crops_dir),
          "--run_name", "t"] + BASE)
    assert os.path.exists("t_discriminator.msgpack")


def test_upsampler_mode(crops_dir, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from ghost_tpu.cli.train_extras import main

    main(["--mode", "upsampler", "--dataset_path", str(crops_dir),
          "--run_name", "t", "--sr_ngf", "4"] + BASE)
    assert os.path.exists("t_upsampler.msgpack")


def test_mask_mode(crops_dir, tmp_path, monkeypatch):
    import cv2

    masks = tmp_path / "masks"
    masks.mkdir()
    rng = np.random.default_rng(1)
    for i in range(4):
        cv2.imwrite(str(masks / f"{i}.png"),
                    rng.integers(0, 255, (64, 64), dtype=np.uint8))

    monkeypatch.chdir(tmp_path)
    from ghost_tpu.cli.train_extras import main

    main(["--mode", "mask", "--dataset_path", str(crops_dir),
          "--mask_source", str(masks), "--run_name", "t"] + BASE)
    assert os.path.exists("t_mask.msgpack")


def test_mask_mode_requires_source(crops_dir):
    from ghost_tpu.cli.train_extras import main

    with pytest.raises(SystemExit, match="mask_source"):
        main(["--mode", "mask", "--dataset_path", str(crops_dir)] + BASE)


def test_random_weights_require_opt_in(crops_dir):
    """Unlike the old silent fallback, a full run without weights (and
    without --allow_random_weights) refuses to train on noise."""
    from ghost_tpu.cli.train_extras import main

    args = BASE[:-2]  # strip the trailing --allow_random_weights 1
    assert args[-1] == "1" and BASE[-2] == "--allow_random_weights"
    with pytest.raises(SystemExit, match="random"):
        main(["--mode", "discriminator", "--dataset_path", str(crops_dir),
              "--run_name", "t"] + args)


def test_explicit_missing_g_path_errors(crops_dir):
    from ghost_tpu.cli.train_extras import main

    with pytest.raises(SystemExit, match="does not exist"):
        main(["--mode", "discriminator", "--dataset_path", str(crops_dir),
              "--G_path", "nope_G.msgpack", "--run_name", "t"] + BASE)


def test_g_path_accepts_msgpack(crops_dir, tmp_path, monkeypatch):
    """The framework's own .msgpack G output loads back through
    --G_path (the distilled-G discriminator regime); previously any
    non-.pth path silently fell back to random weights."""
    monkeypatch.chdir(tmp_path)
    import jax
    import jax.numpy as jnp

    from ghost_tpu.cli.train_extras import main
    from ghost_tpu.core.checkpoint import save_msgpack
    from ghost_tpu.core.precision import FULL_PRECISION
    from ghost_tpu.models.aei import AEINet

    gen = AEINet(backbone="unet", num_blocks=1, width=0.0625,
                 policy=FULL_PRECISION)
    g_vars = gen.init(jax.random.key(7), jnp.zeros((1, 256, 256, 3)),
                      jnp.zeros((1, 512)))
    save_msgpack("g.msgpack", g_vars)
    main(["--mode", "discriminator", "--dataset_path", str(crops_dir),
          "--G_path", "g.msgpack", "--run_name", "t2"] + BASE)
    assert os.path.exists("t2_discriminator.msgpack")
