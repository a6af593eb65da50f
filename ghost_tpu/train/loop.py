"""Training loop driver: epochs, D cadence, ratchets, snapshots, grids.

Orchestration parity with the reference train scripts (reference
train.py:62-459 and variants):
  * D stepped every `d_interval` G steps (train.py:400-407);
  * dynamic loss-multiplier ratchets on host scalars fed into the
    jitted step (train.py:328-338 via losses.ratchet_multiplier);
  * loss dashboard printed every `print_interval` (train.py:423-443);
  * image grids [Xs | Xt | teacher | Y] dumped every `show_step`
    (train.py:413-421) to output/images/;
  * rolling 'latest' + immutable step checkpoints every `save_interval`
    (train.py:449-456) — but including optimizer state (the reference
    drops it, SURVEY.md §5).
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ghost_tpu.train.losses import ratchet_multiplier
from ghost_tpu.train.train_step import TrainState, default_distill_mults


@dataclasses.dataclass
class LoopConfig:
    max_epochs: int = 2000
    d_interval: int = 10
    print_interval: int = 10
    show_step: int = 250
    save_interval: int = 2500
    output_dir: str = "./output"
    run_name: str = "ghost"
    distill: bool = False
    ratchets: bool = True
    # save a force-checkpoint when stopping at max_steps (the cap exit
    # otherwise only persists state if the step landed on
    # save_interval) — load-bearing for cli/train's
    # --max_steps_per_process process-slicing, whose next worker
    # exact-resumes from this save
    save_on_stop: bool = False


def _image_grid(arrays, path):
    """[B,H,W,3] pm1 arrays side by side -> one uint8 grid image."""
    try:
        import cv2
    except ImportError:
        return
    rows = []
    for i in range(min(arrays[0].shape[0], 4)):
        row = np.concatenate([np.asarray(a[i]) for a in arrays], axis=1)
        rows.append(row)
    grid = np.concatenate(rows, axis=0)
    grid = np.clip((grid * 0.5 + 0.5) * 255.0, 0, 255).astype(np.uint8)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    cv2.imwrite(path, grid[:, :, ::-1])


def train_loop(
    state: TrainState,
    g_step: Callable,
    d_step: Callable,
    batches: Iterable[dict],
    cfg: LoopConfig,
    checkpoint_manager=None,
    max_steps: Optional[int] = None,
    preemption=None,
    start_iteration: int = 0,
    on_step: Optional[Callable] = None,
):
    """Run the GAN loop. Returns final state.

    `batches` is either a re-iterable (e.g. PrefetchLoader) or a
    zero-arg factory returning a fresh iterator — NOT a one-shot
    generator: epochs past the first would silently iterate an
    exhausted generator and the run would end after one dataset pass.
    """
    jit_g = jax.jit(g_step)
    jit_d = jax.jit(d_step)
    mults = default_distill_mults()
    # resuming a restored run continues the iteration count so
    # save_interval snapshots don't collide with (and get no-op'd by)
    # already-written steps
    iteration = start_iteration
    last_metrics: dict = {}
    t0 = time.time()

    for epoch in range(cfg.max_epochs):
        epoch_iter = batches() if callable(batches) else iter(batches)
        epoch_batches = 0
        for batch in epoch_iter:
            epoch_batches += 1
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            # multipliers enter as traced jnp scalars — python floats
            # would bake into the program and force a retrace whenever a
            # ratchet fires
            traced_mults = {k: jnp.float32(v) for k, v in mults.items()}
            state, metrics, y = jit_g(state, batch, traced_mults)
            if iteration % cfg.d_interval == 0:
                state, loss_d = jit_d(state, y, batch["xs"])
                metrics["lossD"] = loss_d

            if on_step is not None:
                # per-step observer for convergence artifacts
                # (TRAIN_r04): floats force a host sync each step —
                # only pass on_step when recording a run, not when
                # racing one
                on_step(iteration,
                        {k: float(v) for k, v in metrics.items()},
                        dict(mults))

            if cfg.distill and cfg.ratchets:
                # host-side multiplier ratchets (train.py:328-338):
                # grow each multiplier until its weighted term clears
                # the floor (id >= 200, id-vs-teacher >= 250)
                mults["id"] = ratchet_multiplier(
                    float(metrics["L_id"]), mults["id"], 200.0)
                if "L_id_hq" in metrics:
                    mults["id_hq"] = ratchet_multiplier(
                        float(metrics["L_id_hq"]), mults["id_hq"], 250.0)
                if "L_eyes" in metrics:
                    # reference train.py:336-338: grow until
                    # universal*mult*L_eyes >= 100
                    mults["eyes"] = ratchet_multiplier(
                        float(metrics["L_eyes"]), mults["eyes"], 100.0)

            if iteration % cfg.print_interval == 0:
                batch_time = time.time() - t0
                t0 = time.time()
                parts = [f"epoch {epoch} it {iteration}"]
                for k, v in metrics.items():
                    parts.append(f"{k}={float(v):.4f}")
                parts.append(f"batch_time={batch_time:.2f}s")
                print("  ".join(parts))
                last_metrics = {k: float(v) for k, v in metrics.items()}

            if iteration % cfg.show_step == 0:
                imgs = [batch["xs"], batch["xt"], y]
                if "teacher_y" in batch:
                    imgs.insert(2, batch["teacher_y"])
                _image_grid(
                    imgs,
                    os.path.join(cfg.output_dir, "images",
                                 f"generated_{cfg.run_name}_{epoch}_{iteration:06}.jpg"),
                )

            if checkpoint_manager is not None and iteration > 0 \
                    and iteration % cfg.save_interval == 0:
                checkpoint_manager.save(iteration, state)

            if preemption is not None and preemption.triggered:
                # SIGTERM latched (train/preempt.py): save the full
                # state for exact resume and stop cleanly. force=True:
                # a restarted-then-repreempted run may still be at or
                # below the directory's latest step, where a plain save
                # is a silent orbax no-op (and an equal step would
                # collide with the old run's stale snapshot — the
                # manager evicts it; see core/checkpoint.py).
                if checkpoint_manager is not None:
                    checkpoint_manager.save(iteration, state, force=True)
                    print(f"train_loop: preemption signal; saved step "
                          f"{iteration} and stopping")
                else:
                    print("train_loop: preemption signal; no checkpoint "
                          "dir configured, stopping without saving")
                return state, last_metrics

            iteration += 1
            if max_steps is not None and iteration >= max_steps:
                if cfg.save_on_stop and checkpoint_manager is not None:
                    # force: an exact-resumed slice may stop at a step
                    # for which the directory already holds a stale
                    # snapshot (see the preemption save above)
                    checkpoint_manager.save(iteration - 1, state,
                                            force=True)
                return state, last_metrics
        if epoch_batches == 0:
            # exhausted one-shot iterator (or empty dataset): stop
            # instead of spinning through the remaining epochs
            print(f"train_loop: no batches in epoch {epoch}; stopping")
            break
    return state, last_metrics
