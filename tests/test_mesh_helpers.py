"""core.mesh.make_mesh_1d — the shared constructor behind the
parallel.{pp,sp,ep} named mesh helpers."""

import jax
import pytest

from ghost_tpu.core.mesh import make_mesh_1d


def test_make_mesh_1d_builds_named_axis():
    mesh = make_mesh_1d("pipe", 1)
    assert mesh.axis_names == ("pipe",)
    assert mesh.shape["pipe"] == 1
    assert list(mesh.devices.flat) == [jax.devices()[0]]


def test_make_mesh_1d_too_few_devices():
    with pytest.raises(ValueError, match="need"):
        make_mesh_1d("seq", len(jax.devices()) + 1)


def test_named_helpers_share_constructor():
    from ghost_tpu.parallel.ep import make_expert_mesh
    from ghost_tpu.parallel.pp import make_pipe_mesh
    from ghost_tpu.parallel.sp import make_seq_mesh

    assert make_pipe_mesh(1).axis_names == ("pipe",)
    assert make_seq_mesh(1).axis_names == ("seq",)
    assert make_expert_mesh(1).axis_names == ("expert",)
