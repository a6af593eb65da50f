"""CLI wiring: parsers + a one-step training run end to end."""

import numpy as np
import pytest


def test_inference_parser_reference_flags():
    from ghost_tpu.cli.inference import build_parser

    p = build_parser()
    args = p.parse_args([
        "--source_paths", "a.jpg", "b.jpg",
        "--target_faces_paths", "t.jpg",
        "--target_video", "in.mp4",
        "--out_video_name", "out.mp4",
        "--batch_size", "20",
        "--similarity_th", "0.2",
        "--backbone", "linknet",
        "--num_blocks", "3",
    ])
    assert args.source_paths == ["a.jpg", "b.jpg"]
    assert args.batch_size == 20
    assert args.similarity_th == 0.2
    assert args.backbone == "linknet"
    assert args.crop_size == 224  # reference default
    assert args.sr_model == "lipspade"  # reference-parity default seat
    assert p.parse_args(["--sr_model", "srvgg_student"]
                        ).sr_model == "srvgg_student"


def test_train_parser_reference_flags():
    """Every reference train.py:554-616 flag is accepted (modulo the
    documented renames: --vgg->--vgg_dataset, --celeb->--celeba,
    --max_epoch->--max_epochs, --optim_level->--bf16)."""
    from ghost_tpu.cli.train import build_parser

    p = build_parser()
    args = p.parse_args([
        "--dataset_path", "/d", "--pretrained", "", "--verbose_output",
        "x", "--diff_eq_same", "x", "--save_epoch", "3", "--scheduler",
        "1", "--teacher_fine_tune", "1", "--teacher_inner_crop", "1",
        "--teacher_lower_signal", "1", "--without_teacher_loss", "1",
        "--teacher_upsample", "1", "--fine_tune_filter", "foo",
        "--into_data_path", "/i", "--only_attractive", "1",
        "--normalize_training_images", "1",
    ])
    assert args.pretrained is False  # '' is the only falsy spelling
    assert args.verbose_output and args.diff_eq_same
    assert args.save_epoch == 3 and args.scheduler
    assert args.teacher_fine_tune and args.teacher_inner_crop
    assert args.teacher_lower_signal and args.without_teacher_loss


def test_export_parser():
    from ghost_tpu.cli.export import build_parser

    args = build_parser().parse_args(["--model", "aei", "--out", "x.hlo"])
    assert args.batch == -1


def test_train_cli_one_step(tmp_path):
    """Full train CLI on synthetic data: tiny models, 1 step."""
    import cv2

    d = tmp_path / "faces"
    d.mkdir()
    rng = np.random.default_rng(0)
    for i in range(4):
        cv2.imwrite(str(d / f"{i}.jpg"),
                    rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))

    from ghost_tpu.cli.train import main

    main([
        "--dataset_path", str(d),
        "--batch_size", "2",
        "--max_steps", "1",
        "--width", "0.0625",
        "--arcface_depth", "tiny",
        "--bf16", "",
        "--num_blocks", "1",
        "--num_workers", "1",
        "--run_name", str(tmp_path / "run"),
        "--save_interval", "100000",
        "--show_step", "100000",
        "--output_dir", str(tmp_path / "out"),
    ])


def test_train_cli_max_steps_per_process(tmp_path, capsys):
    """--max_steps_per_process auto-split: ONE CLI invocation runs a
    total step count larger than any single process's budget by
    chaining exact-resumed worker subprocesses (mitigates unbounded
    per-process RAM growth such as the dev relay client's per-step
    leak). The reference's snapshots (reference train.py:449-456) are
    the lossy version of this resume — they drop optimizer state."""
    import cv2

    d = tmp_path / "faces"
    d.mkdir()
    rng = np.random.default_rng(0)
    for i in range(4):
        cv2.imwrite(str(d / f"{i}.jpg"),
                    rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))

    from ghost_tpu.cli.train import main

    main([
        "--dataset_path", str(d),
        "--batch_size", "2",
        "--max_steps", "4",
        "--max_steps_per_process", "2",
        "--width", "0.0625",
        "--arcface_depth", "tiny",
        "--bf16", "",
        "--num_blocks", "1",
        "--num_workers", "1",
        "--run_name", str(tmp_path / "run"),
        "--save_interval", "100000",
        "--show_step", "100000",
        "--output_dir", str(tmp_path / "out"),
    ])
    out = capsys.readouterr().out
    # the 4 steps were split 2+2 across exactly two worker processes
    assert "worker process #2" in out
    assert "worker process #3" not in out
    assert "done after 2 worker processes" in out

    # the chain completed the full step count (steps 0..3; each slice's
    # cap checkpoint is what the next worker resumed from)
    from ghost_tpu.core.checkpoint import CheckpointManager

    assert CheckpointManager(str(tmp_path / "run")).latest_step() == 3


def test_train_cli_max_steps_per_process_resume_0(tmp_path, capsys):
    """--resume 0 with --max_steps_per_process must still chain: resume
    0 means 'start the RUN fresh', but workers after the first MUST
    resume the slice checkpoint (the supervisor appends a trailing
    --resume 1 override) — without it every worker would retrain steps
    0..cap and the chain would never terminate (the supervisor's
    no-progress backstop turns that into a loud abort)."""
    import cv2

    d = tmp_path / "faces"
    d.mkdir()
    rng = np.random.default_rng(0)
    for i in range(4):
        cv2.imwrite(str(d / f"{i}.jpg"),
                    rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))

    from ghost_tpu.cli.train import main

    main([
        "--dataset_path", str(d),
        "--batch_size", "2",
        "--max_steps", "4",
        "--max_steps_per_process", "2",
        "--resume", "0",
        "--width", "0.0625",
        "--arcface_depth", "tiny",
        "--bf16", "",
        "--num_blocks", "1",
        "--num_workers", "1",
        "--run_name", str(tmp_path / "run"),
        "--save_interval", "100000",
        "--show_step", "100000",
        "--output_dir", str(tmp_path / "out"),
    ])
    out = capsys.readouterr().out
    assert "done after 2 worker processes" in out

    from ghost_tpu.core.checkpoint import CheckpointManager

    assert CheckpointManager(str(tmp_path / "run")).latest_step() == 3


def test_train_cli_slice_requires_total():
    from ghost_tpu.cli.train import main

    with pytest.raises(SystemExit, match="max_steps"):
        main(["--dataset_path", "/nonexistent",
              "--max_steps_per_process", "2"])


def test_inference_cli_smoke(tmp_path):
    """Full inference CLI on synthetic media with random tiny weights."""
    import cv2

    rng = np.random.default_rng(0)
    src = tmp_path / "src.jpg"
    cv2.imwrite(str(src), rng.integers(0, 255, (120, 140, 3), dtype=np.uint8))
    tgt = tmp_path / "tgt.jpg"
    cv2.imwrite(str(tgt), rng.integers(0, 255, (160, 180, 3), dtype=np.uint8))
    out = tmp_path / "out.png"

    from ghost_tpu.cli.inference import main

    main([
        "--source_paths", str(src),
        "--image_to_image", "1",
        "--target_image", str(tgt),
        "--out_image_name", str(out),
        "--allow_random_weights", "1",
        "--width", "0.0625",
        "--arcface_depth", "tiny",
        "--det_size", "320",
        "--batch_size", "1",
        "--bf16", "",
    ])
    img = cv2.imread(str(out))
    assert img is not None and img.shape == (160, 180, 3)


def test_preprocess_gender_smoke(tmp_path):
    import cv2

    from ghost_tpu.cli.preprocess import main

    d = tmp_path / "imgs"
    d.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        cv2.imwrite(str(d / f"{i}.jpg"),
                    rng.integers(0, 255, (96, 96, 3), dtype=np.uint8))
    out = tmp_path / "out"
    main(["--mode", "gender", "--input_dir", str(d),
          "--output_dir", str(out)])
    assert (out / "male").is_dir() and (out / "female").is_dir()


def test_convert_cli_scrfd(tmp_path):
    """Convert the reference's real SCRFD checkpoint to msgpack and load
    it back identically."""
    import os

    ckpt = "/root/reference/coordinate_reg/model/SCRFD/model_25GF.pth"
    if not os.path.exists(ckpt):
        import pytest

        pytest.skip("reference checkpoint not mounted")
    import jax

    from ghost_tpu.cli.convert import main
    from ghost_tpu.core.checkpoint import load_msgpack
    from ghost_tpu.convert.torch_loader import (convert_scrfd_state_dict,
                                                load_torch_checkpoint)

    out = tmp_path / "scrfd.msgpack"
    main(["--kind", "scrfd", "--src", ckpt, "--out", str(out)])
    got = load_msgpack(str(out))
    ref = convert_scrfd_state_dict(load_torch_checkpoint(ckpt))
    diff = jax.tree.map(lambda a, b: float(np.abs(np.asarray(a) -
                                                  np.asarray(b)).max()),
                        got, ref)
    assert max(jax.tree.leaves(diff)) == 0.0


def test_convert_cli_srvgg(tmp_path):
    """convert --kind srvgg: torch SRVGGNetCompact checkpoint (official
    basicsr 'params' wrapper) -> msgpack that drives the native model."""
    import pytest

    torch = pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp

    from ghost_tpu.cli.convert import main
    from ghost_tpu.core.checkpoint import load_msgpack
    from ghost_tpu.core.precision import FULL_PRECISION
    from ghost_tpu.models.sr.srvgg import SRVGGNetCompact
    from tests.test_enhancers import TorchSRVGG

    torch.manual_seed(0)
    nf, nc = 8, 2
    tm = TorchSRVGG(3, 3, nf, nc, 4).eval()
    ckpt = tmp_path / "srvgg.pth"
    torch.save({"params": tm.state_dict()}, str(ckpt))

    out = tmp_path / "srvgg.msgpack"
    main(["--kind", "srvgg", "--src", str(ckpt), "--out", str(out),
          "--num_conv", str(nc)])
    variables = jax.tree.map(jnp.asarray, load_msgpack(str(out)))

    model = SRVGGNetCompact(num_feat=nf, num_conv=nc, upscale=4,
                            policy=FULL_PRECISION)
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (1, 8, 8, 3)).astype(np.float32)
    y = model.apply(variables, jnp.asarray(x))
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(y),
                               ref.numpy().transpose(0, 2, 3, 1),
                               rtol=2e-4, atol=2e-4)


def test_precompute_masks_hull_skips_unreadable(tmp_path):
    """Hull-mask CLI: an unreadable file inside a chunk must not shift
    the remaining masks onto the wrong basenames (masks pair with the
    KEPT files, not the original chunk)."""
    cv2 = pytest.importorskip("cv2")
    from ghost_tpu.cli.precompute_masks import main

    src, dst = tmp_path / "crops", tmp_path / "masks"
    src.mkdir(), dst.mkdir()
    rng = np.random.default_rng(0)
    for name in ("a.jpg", "c.jpg"):
        cv2.imwrite(str(src / name),
                    rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))
    (src / "b.jpg").write_bytes(b"not an image")  # sorts between a and c

    main(["--input_dir", str(src), "--output_dir", str(dst),
          "--batch_size", "4"])

    assert not (dst / "b.png").exists()
    for name in ("a.png", "c.png"):
        m = cv2.imread(str(dst / name), cv2.IMREAD_GRAYSCALE)
        assert m is not None and m.shape == (256, 256)
