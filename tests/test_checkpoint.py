"""Checkpoint round trips: msgpack single-tree + orbax train state.

The reference's checkpoint behavior is rolling latest + immutable
snapshots WITHOUT optimizer state (reference train.py:449-456); ours
must restore the FULL state exactly (SURVEY.md §5 'rebuild' note) — the
two-phase save/restore pattern of apex's checkpointing tests
(apex/apex/contrib/sparsity/test/checkpointing_test_part1/part2).
"""

import jax
import jax.numpy as jnp
import numpy as np

from ghost_tpu.core.checkpoint import CheckpointManager, load_msgpack, save_msgpack


def tree_equal(a, b):
    return all(
        np.array_equal(np.asarray(x), np.asarray(y))
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
    )


def test_msgpack_roundtrip(tmp_path, rng):
    tree = {
        "params": {"w": jnp.asarray(rng.standard_normal((4, 4), dtype=np.float32)),
                   "b": jnp.zeros(4)},
        "stats": {"mean": jnp.ones(3)},
    }
    path = str(tmp_path / "weights.msgpack")
    save_msgpack(path, tree)
    restored = load_msgpack(path, like=tree)
    assert tree_equal(tree, restored)
    # structure-free restore also works
    raw = load_msgpack(path)
    assert tree_equal(tree, raw)


def test_orbax_manager_rolling_and_restore(tmp_path, rng):
    state = {
        "step": jnp.int32(0),
        "params": {"k": jnp.asarray(rng.standard_normal((8,), dtype=np.float32))},
        "opt": {"mu": jnp.zeros(8), "nu": jnp.ones(8)},
    }
    mgr = CheckpointManager(str(tmp_path / "ckpt"), keep=2)
    for step in (100, 200, 300):
        state = dict(state)
        state["step"] = jnp.int32(step)
        state["params"] = {"k": state["params"]["k"] + 1.0}
        mgr.save(step, state)

    assert mgr.latest_step() == 300
    restored = mgr.restore(like=state)
    assert int(restored["step"]) == 300
    assert tree_equal(restored["params"], state["params"])
    assert tree_equal(restored["opt"], state["opt"])
    # keep=2: oldest snapshot evicted
    mgr2 = CheckpointManager(str(tmp_path / "ckpt"), keep=2)
    steps = [mgr2.latest_step()]
    assert 100 not in (mgr2.manager.all_steps() or [])
