"""Landmark106Det vs the mounted 2d106det MXNet symbol graph.

The params blob is absent from the reference checkout
(.MISSING_LARGE_BLOBS), so correctness is established structurally: the
module's convolution plan must equal the plan parsed from the real
symbol JSON node-for-node, and the converter must fill the init tree
exactly from MXNet-named arrays (so real params load mechanically)."""

import os

import numpy as np
import pytest

SYMBOL = "/root/reference/coordinate_reg/model/2d106det-symbol.json"


def test_plan_matches_symbol_json():
    from ghost_tpu.models.landmark_mxnet import conv_plan, parse_symbol_plan

    if not os.path.exists(SYMBOL):
        pytest.skip("symbol json not mounted")
    assert conv_plan() == parse_symbol_plan(SYMBOL)


def _synthetic_mx_params(rng):
    from ghost_tpu.models.landmark_mxnet import conv_plan

    arg = {}
    aux = {}

    def bn(prefix, c):
        arg[f"{prefix}_beta"] = rng.normal(0, 0.1, (c,)).astype(np.float32)
        arg[f"{prefix}_gamma"] = np.ones((c,), np.float32)  # fix_gamma
        aux[f"{prefix}_moving_mean"] = rng.normal(0, 0.1, (c,)).astype(np.float32)
        aux[f"{prefix}_moving_var"] = np.abs(
            rng.normal(1, 0.1, (c,))).astype(np.float32)

    cin = 3
    for name, (kh, kw), _s, _p, f, g in conv_plan():
        arg[f"{name}_weight"] = rng.normal(
            0, 0.1, (f, cin // g, kh, kw)).astype(np.float32)
        base = name[: -len("_conv2d")]
        bn(f"{base}_batchnorm" if not base.endswith("_dw")
           else f"{base}_batchnorm", f)
        arg[f"{base}_relu_gamma"] = np.full((f,), 0.25, np.float32)
        cin = f
    arg["fc1_weight"] = rng.normal(0, 0.05, (212, 576)).astype(np.float32)
    arg["fc1_bias"] = np.zeros((212,), np.float32)
    return arg, aux


def test_converter_fills_init_tree_and_runs():
    import jax
    import jax.numpy as jnp

    from ghost_tpu.core.precision import FULL_PRECISION
    from ghost_tpu.models.landmark_mxnet import (Landmark106Det,
                                                 convert_2d106det_params)

    rng = np.random.default_rng(0)
    arg, aux = _synthetic_mx_params(rng)
    variables = jax.tree.map(jnp.asarray, convert_2d106det_params(arg, aux))

    model = Landmark106Det(policy=FULL_PRECISION)
    ref = model.init(jax.random.key(0), jnp.zeros((1, 192, 192, 3)))
    ref_paths = {jax.tree_util.keystr(p): v.shape for p, v in
                 jax.tree_util.tree_flatten_with_path(ref)[0]}
    got_paths = {jax.tree_util.keystr(p): np.shape(v) for p, v in
                 jax.tree_util.tree_flatten_with_path(variables)[0]}
    assert ref_paths == got_paths

    x = jnp.asarray(rng.uniform(0, 255, (2, 192, 192, 3)).astype(np.float32))
    out = jax.jit(model.apply)(variables, x)
    assert out.shape == (2, 106, 2)
    assert np.isfinite(np.asarray(out)).all()


def test_mx_prefixed_single_dict():
    import jax

    from ghost_tpu.models.landmark_mxnet import convert_2d106det_params

    rng = np.random.default_rng(1)
    arg, aux = _synthetic_mx_params(rng)
    merged = {f"arg:{k}": v for k, v in arg.items()}
    merged.update({f"aux:{k}": v for k, v in aux.items()})
    v1 = convert_2d106det_params(merged)
    v2 = convert_2d106det_params(arg, aux)
    d = jax.tree.map(lambda a, b: float(np.abs(a - b).max()), v1, v2)
    assert max(jax.tree.leaves(d)) == 0.0


def test_convert_cli_reads_raw_params_file(tmp_path):
    """docs/WEIGHTS.md promises `ghost-tpu-convert --kind landmark_mxnet
    --src 2d106det-0000.params` works on the raw MXNet NDArray file with
    no mxnet install: serialize synthetic params natively, run the CLI,
    and load the msgpack back into the model."""
    import jax
    import jax.numpy as jnp

    from ghost_tpu.cli.convert import main
    from ghost_tpu.convert.mxnet_nd import save_ndarray_dict
    from ghost_tpu.core.checkpoint import load_msgpack
    from ghost_tpu.models.landmark_mxnet import Landmark106Det

    rng = np.random.default_rng(2)
    arg, aux = _synthetic_mx_params(rng)
    blob = {f"arg:{k}": v for k, v in arg.items()}
    blob.update({f"aux:{k}": v for k, v in aux.items()})
    src = str(tmp_path / "2d106det-0000.params")
    out = str(tmp_path / "lmk.msgpack")
    save_ndarray_dict(src, blob)
    main(["--kind", "landmark_mxnet", "--src", src, "--out", out])

    variables = load_msgpack(out)
    pts = jax.jit(Landmark106Det().apply)(
        variables, jnp.zeros((1, 192, 192, 3)))
    assert pts.shape == (1, 106, 2)
    assert np.isfinite(np.asarray(pts)).all()


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
