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
        "--num_workers", "1", "--max_epochs", "1"]


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
