"""Checkpointing: {params, opt_state, batch_stats, step, loss_scale}.

The reference dual-writes rolling `G_latest.pth` plus immutable
`G_{epoch}_{iter}.pth` snapshots every save_interval and does NOT save
optimizer state (reference train.py:449-456, SURVEY.md §5). The rebuild
keeps the rolling+immutable layout but checkpoints the FULL training
state (params, optimizer moments, BN stats, step, loss scale) via
orbax, so resume is exact instead of restarting Adam moments.

Small single-tree artifacts (detector/landmark weights shipped with the
framework) use flax msgpack serialization for a dependency-light path.
"""

from __future__ import annotations

import os
from typing import Any

import jax
from flax import serialization


# --------------------------------------------------------- msgpack single tree
def save_msgpack(path: str, tree: Any) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(tree)))


def load_msgpack(path: str, like: Any | None = None) -> Any:
    with open(path, "rb") as f:
        data = f.read()
    if like is not None:
        return serialization.from_bytes(like, data)
    return serialization.msgpack_restore(data)


# ------------------------------------------------------------- orbax train ckpt
class CheckpointManager:
    """Rolling 'latest' + immutable step-tagged snapshots.

    save(step, state): writes `<dir>/step_{step}` and updates
    `<dir>/latest` (orbax keeps the newest `keep` immutable snapshots).
    """

    def __init__(self, directory: str, keep: int = 5):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep, create=True, enable_async_checkpointing=False
            ),
        )

    def save(self, step: int, state: Any, force: bool = False) -> None:
        # jax.Arrays pass through as-is: orbax serializes per
        # addressable shard, which is what makes ZeRO/mesh-sharded
        # train state checkpointable (a host device_get of a
        # multi-device array would materialize the full value — and
        # aborts outright on some backends; see
        # tests/test_checkpoint_sharded.py). Non-array leaves
        # (ints/floats) are fine either way.
        #
        # force: orbax's should_save() silently no-ops when the
        # directory already holds a later-or-equal step (a restarted
        # run that hasn't caught up yet). force=True must mean "this
        # state IS step `step` from now on" — orbax still refuses to
        # overwrite an existing identical step, so evict a colliding
        # snapshot first (the old run's state at that step is stale
        # once the new run reaches it). Preemption saves use this.
        if force and step in set(self.manager.all_steps()):
            self.manager.delete(step)
        self.manager.save(
            step, args=self._ocp.args.StandardSave(state), force=force
        )
        self.manager.wait_until_finished()

    def restore(self, step: int | None = None, like: Any | None = None) -> Any:
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        if like is not None:
            return self.manager.restore(
                step, args=self._ocp.args.StandardRestore(like)
            )
        return self.manager.restore(step)

    def latest_step(self) -> int | None:
        return self.manager.latest_step()
