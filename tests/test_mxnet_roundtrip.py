"""2d106det end-to-end without the params blob (round-3 verdict item 3).

Proves the whole MXNet ingestion path with synthetic weights:

  symbol JSON -> random params -> serialize to a real ``.params`` file
  (ghost_tpu.convert.mxnet_nd, the mx.nd.save format) -> load it back
  -> convert_2d106det_params -> Landmark106Det forward

and asserts forward EQUALITY against an independent MXNet-graph
interpreter executing the mounted symbol JSON node by node
(ghost_tpu.convert.mxnet_graph). The only remaining dependency on the
real checkpoint (`reference coordinate_reg/image_infer.py:96-141`,
blob in .MISSING_LARGE_BLOBS) is the literal file.
"""

import os

import numpy as np
import pytest

SYMBOL = "/root/reference/coordinate_reg/model/2d106det-symbol.json"

needs_symbol = pytest.mark.skipif(not os.path.exists(SYMBOL),
                                  reason="symbol json not mounted")


class TestParamsFileFormat:
    def test_roundtrip_exact(self, tmp_path):
        from ghost_tpu.convert.mxnet_nd import (load_ndarray_dict,
                                                save_ndarray_dict)

        rng = np.random.default_rng(0)
        arrays = {
            "arg:w": rng.normal(0, 1, (16, 3, 3, 3)).astype(np.float32),
            "arg:b": rng.normal(0, 1, (16,)).astype(np.float32),
            "aux:mean": rng.normal(0, 1, (16,)).astype(np.float64),
            "arg:idx": rng.integers(0, 100, (7, 2)).astype(np.int64),
            "arg:half": rng.normal(0, 1, (4, 4)).astype(np.float16),
            "arg:bytes": rng.integers(0, 255, (5,)).astype(np.uint8),
        }
        path = str(tmp_path / "test.params")
        save_ndarray_dict(path, arrays)
        loaded = load_ndarray_dict(path)
        assert list(loaded) == list(arrays)
        for k in arrays:
            assert loaded[k].dtype == arrays[k].dtype, k
            np.testing.assert_array_equal(loaded[k], arrays[k])

    def test_rejects_garbage(self, tmp_path):
        from ghost_tpu.convert.mxnet_nd import load_ndarray_dict

        path = str(tmp_path / "bad.params")
        with open(path, "wb") as f:
            f.write(b"\x00" * 64)
        with pytest.raises(ValueError):
            load_ndarray_dict(path)


@needs_symbol
class TestSymbolGraphEndToEnd:
    def test_interpreter_param_shapes_cover_all_inputs(self):
        import json

        from ghost_tpu.convert.mxnet_graph import MXNetGraphInterpreter

        interp = MXNetGraphInterpreter(SYMBOL)
        shapes = interp.param_shapes()
        nodes = json.load(open(SYMBOL))["nodes"]
        inputs = {n["name"] for n in nodes
                  if n["op"] == "null" and n["name"] != "data"}
        assert set(shapes) == inputs

    def test_converted_model_matches_graph_interpreter(self, tmp_path):
        import jax
        import jax.numpy as jnp

        from ghost_tpu.convert.mxnet_graph import MXNetGraphInterpreter
        from ghost_tpu.convert.mxnet_nd import (load_ndarray_dict,
                                                save_ndarray_dict)
        from ghost_tpu.core.precision import FULL_PRECISION
        from ghost_tpu.models.landmark_mxnet import (Landmark106Det,
                                                     convert_2d106det_params)

        interp = MXNetGraphInterpreter(SYMBOL)
        params = interp.init_params(seed=3)

        # write a REAL .params checkpoint (save_checkpoint layout:
        # moving stats are aux, everything else arg), then load it back
        prefixed = {
            (f"aux:{k}" if "moving_" in k else f"arg:{k}"): v
            for k, v in params.items()
        }
        path = str(tmp_path / "2d106det-0000.params")
        save_ndarray_dict(path, prefixed)
        blob = load_ndarray_dict(path)

        variables = jax.tree.map(jnp.asarray,
                                 convert_2d106det_params(blob))
        model = Landmark106Det(policy=FULL_PRECISION)

        rng = np.random.default_rng(1)
        x = rng.uniform(0, 255, (2, 192, 192, 3)).astype(np.float32)
        ours = np.asarray(model.apply(variables, jnp.asarray(x)))
        ref = interp.run(params, x.transpose(0, 3, 1, 2))

        np.testing.assert_allclose(ours.reshape(2, 212), ref,
                                   rtol=2e-4, atol=2e-4)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
