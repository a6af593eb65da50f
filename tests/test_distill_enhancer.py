"""Enhancer distillation: degradation sampler, distill step, CLI.

The reference pins its quality path to external GFPGAN/RealESRGAN
oracles (reference utils/training/upsampler.py:20-120) with no way to
make them cheaper; train/distill_enhancer.py is the native machinery
to compress those teachers into the fast SRVGG serving trunk.
"""

from __future__ import annotations

import numpy as np
import pytest


def test_degrade_shapes_range_and_randomness():
    import jax
    import jax.numpy as jnp

    from ghost_tpu.train.distill_enhancer import degrade

    rng = np.random.default_rng(0)
    hq = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32))
    fn = jax.jit(lambda k, x: degrade(k, x, (8, 8)))
    a = fn(jax.random.key(0), hq)
    b = fn(jax.random.key(1), hq)
    assert a.shape == (2, 8, 8, 3)
    assert np.isfinite(np.asarray(a)).all()
    assert float(jnp.min(a)) >= 0.0 and float(jnp.max(a)) <= 1.0
    # different keys sample different degradations
    assert float(jnp.max(jnp.abs(a - b))) > 1e-4
    # blurred+downscaled stays correlated with the clean downscale
    from ghost_tpu.nn.layers import resize

    clean = resize(hq, (8, 8), method="area")
    assert float(jnp.mean(jnp.abs(a - clean))) < 0.25


def test_distill_step_learns_teacher():
    """Student converges toward a fixed teacher mapping (bilinear x2)
    on a fixed batch — the loss must drop by well over the noise."""
    import jax
    import jax.numpy as jnp

    from ghost_tpu.core.precision import FULL_PRECISION
    from ghost_tpu.models.sr.srvgg import SRVGGNetCompact
    from ghost_tpu.nn.layers import resize
    from ghost_tpu.train.distill_enhancer import make_enhancer_distill_step

    student = SRVGGNetCompact(num_feat=8, num_conv=1, upscale=2,
                              policy=FULL_PRECISION)
    rng = np.random.default_rng(0)
    lq = jnp.asarray(rng.uniform(0, 1, (2, 8, 8, 3)).astype(np.float32))
    target = resize(lq, (16, 16), method="bilinear")

    s_vars = student.init(jax.random.key(0), lq)
    step, tx = make_enhancer_distill_step(student, lr=3e-3)
    s_params, s_opt = s_vars["params"], tx.init(s_vars["params"])
    step = jax.jit(step)

    first = None
    for _ in range(80):
        s_params, s_opt, metrics = step(s_params, s_opt, lq, target)
        if first is None:
            first = float(metrics["l1"])
    last = float(metrics["l1"])
    assert np.isfinite(last)
    assert last < 0.5 * first, (first, last)


def test_face_student_wrapper_contract():
    """The GFPGAN-seat shim: pm1 in -> pm1-scaled out, same shape,
    grads flow. Deliberately NO output clamp inside the shim: clip's
    zero gradient on saturated pixels would freeze the very regions the
    L1 loss needs to pull back (serving clamps at the u8 write)."""
    import jax
    import jax.numpy as jnp

    from ghost_tpu.core.precision import FULL_PRECISION
    from ghost_tpu.models.sr.srvgg import SRVGGNetCompact
    from ghost_tpu.train.distill_enhancer import (
        face_student_wrapper,
        make_enhancer_distill_step,
    )

    student = SRVGGNetCompact(num_feat=8, num_conv=1, upscale=2,
                              policy=FULL_PRECISION)
    shim = face_student_wrapper(student)
    rng = np.random.default_rng(0)
    crop = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32))
    s_vars = student.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)))

    out = shim.apply(s_vars, crop)
    assert out.shape == crop.shape
    # random init wanders a bit outside [-1,1] — unclipped by design
    assert float(jnp.max(jnp.abs(out))) < 4.0

    step, tx = make_enhancer_distill_step(shim, lr=1e-3)
    s_params, s_opt = s_vars["params"], tx.init(s_vars["params"])
    new_params, _, metrics = jax.jit(step)(s_params, s_opt, crop, crop)
    assert np.isfinite(float(metrics["loss"]))
    diff = jax.tree_util.tree_reduce(
        lambda acc, ab: acc + float(jnp.sum(jnp.abs(ab))),
        jax.tree.map(lambda a, b: a - b, new_params, s_params), 0.0)
    assert diff > 0.0  # the update actually moved the student


def test_self_distill_batch_fn():
    import jax
    import jax.numpy as jnp

    from ghost_tpu.nn.layers import resize
    from ghost_tpu.train.distill_enhancer import make_self_distill_batch_fn

    def teacher(lq):
        return resize(lq, (16, 16), method="nearest")

    sample = jax.jit(make_self_distill_batch_fn(teacher, (8, 8)))
    rng = np.random.default_rng(0)
    hq = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32))
    lq, target = sample(jax.random.key(0), hq)
    assert lq.shape == (1, 8, 8, 3) and target.shape == (1, 16, 16, 3)


@pytest.mark.parametrize("task,hq", [("background", 32), ("face", 64)])
def test_cli_distill_smoke(tmp_path, task, hq):
    cv2 = pytest.importorskip("cv2")

    from ghost_tpu.cli.distill_enhancer import main
    from ghost_tpu.core.checkpoint import load_msgpack

    d = tmp_path / "imgs"
    d.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        cv2.imwrite(str(d / f"{i}.png"),
                    rng.integers(0, 255, (hq, hq, 3), dtype=np.uint8))
    out = tmp_path / "student.msgpack"
    main(["--task", task, "--dataset_path", str(d), "--out", str(out),
          "--steps", "2", "--hq_size", str(hq), "--batch_size", "2",
          "--student_feats", "4", "--student_convs", "1",
          "--save_every", "0", "--log_every", "1",
          "--allow_random_weights", "--bf16", "false"])
    tree = load_msgpack(str(out))
    assert "params" in tree


def test_explicit_missing_teacher_path_errors(tmp_path):
    """A typo'd --teacher_path must SystemExit even under
    --allow_random_weights: silently distilling against a random
    teacher is the worst failure mode."""
    import pytest

    from ghost_tpu.cli.distill_enhancer import _load_teacher_vars

    with pytest.raises(SystemExit):
        _load_teacher_vars(str(tmp_path / "nope.pth"), None, None,
                           allow_random=True, init_shape=(1, 16, 16, 3))


def test_teacher_fn_tuple_output_and_range():
    """make_teacher_fn must unwrap tuple-returning teachers (GFPGAN
    yields (image, rgbs)) and clip in the teacher's NATIVE range —
    clipping a [-1,1] model to [0,1] blacks out half its range."""
    import jax.numpy as jnp
    import numpy as np

    from ghost_tpu.train.distill_enhancer import make_teacher_fn

    class FakeGfp:
        def apply(self, variables, x):
            return x * 2.0 - 1.0, None  # [-1,1] image + rgbs slot

    teacher = make_teacher_fn(FakeGfp(), {}, out_range=(-1.0, 1.0))
    x = jnp.asarray(np.linspace(0, 1, 8, dtype=np.float32))
    y = np.asarray(teacher(x))
    np.testing.assert_allclose(y, np.linspace(-1, 1, 8), atol=1e-6)
    assert y.min() < -0.9  # negative half survives
