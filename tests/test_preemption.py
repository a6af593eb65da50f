"""Preemption-aware shutdown (train/preempt.py + train_loop wiring).

SIGTERM mid-run must latch, save a final full-state checkpoint, and
stop the loop cleanly — the resilience the reference lacks entirely
(SURVEY.md §5: no preemption handling; reference train.py loses
everything since the last save_interval).
"""

from __future__ import annotations

import os
import signal

import jax.numpy as jnp
import numpy as np

from ghost_tpu.core.checkpoint import CheckpointManager
from ghost_tpu.train.loop import LoopConfig, train_loop
from ghost_tpu.train.preempt import PreemptionGuard


def _tiny_loop_parts(tmp_path):
    state = {"w": jnp.zeros((2,))}

    def g_step(state, batch, mults):
        new = {"w": state["w"] + 1.0}
        return new, {"lossG": jnp.sum(new["w"])}, batch["xt"]

    def d_step(state, y, xs):
        return state, jnp.float32(0.0)

    batch = {
        "xs": jnp.zeros((1, 8, 8, 3)),
        "xt": jnp.zeros((1, 8, 8, 3)),
    }
    cfg = LoopConfig(max_epochs=50, d_interval=10, print_interval=1000,
                     show_step=100000, save_interval=100000,
                     output_dir=str(tmp_path / "out"), run_name="t",
                     distill=False)
    return state, g_step, d_step, batch, cfg


def test_sigterm_saves_and_stops(tmp_path):
    state, g_step, d_step, batch, cfg = _tiny_loop_parts(tmp_path)
    mgr = CheckpointManager(str(tmp_path / "ckpt"), keep=2)

    fired = []

    def batches():
        # signal arrives while the third batch is being produced
        for i in range(100):
            if i == 2 and not fired:
                fired.append(True)
                os.kill(os.getpid(), signal.SIGTERM)
            yield batch

    prev_handler = signal.getsignal(signal.SIGTERM)
    with PreemptionGuard() as guard:
        final, _ = train_loop(state, g_step, d_step, batches, cfg,
                              checkpoint_manager=mgr, preemption=guard)
        assert guard.triggered
    # handler restored on exit
    assert signal.getsignal(signal.SIGTERM) is prev_handler

    # stopped at the signal (step 2), not after 100 batches x 50 epochs
    assert float(final["w"][0]) == 3.0
    step = mgr.latest_step()
    assert step == 2
    restored = mgr.restore(like=final)
    np.testing.assert_array_equal(np.asarray(restored["w"]),
                                  np.asarray(final["w"]))


def test_no_signal_runs_to_completion(tmp_path):
    state, g_step, d_step, batch, cfg = _tiny_loop_parts(tmp_path)
    with PreemptionGuard() as guard:
        final, _ = train_loop(state, g_step, d_step,
                              lambda: iter([batch] * 3), cfg,
                              max_steps=3, preemption=guard)
        assert not guard.triggered
    assert float(final["w"][0]) == 3.0


def test_resume_continues_iteration(tmp_path):
    """Restart-after-preemption flow: restore the saved state and
    continue the iteration count, so later save_interval snapshots
    land on NEW steps (a restarted count would collide with existing
    steps and be silently no-op'd by orbax's should_save)."""
    import dataclasses

    state, g_step, d_step, batch, cfg = _tiny_loop_parts(tmp_path)
    cfg = dataclasses.replace(cfg, save_interval=2)
    mgr = CheckpointManager(str(tmp_path / "ck"), keep=3)
    final, _ = train_loop(state, g_step, d_step,
                          lambda: iter([batch] * 5), cfg,
                          checkpoint_manager=mgr, max_steps=5)
    assert mgr.latest_step() == 4
    restored = mgr.restore(like=final)
    assert float(restored["w"][0]) == 5.0
    final2, _ = train_loop(restored, g_step, d_step,
                           lambda: iter([batch] * 5), cfg,
                           checkpoint_manager=mgr, max_steps=8,
                           start_iteration=5)
    assert float(final2["w"][0]) == 8.0  # steps 5, 6, 7 ran
    assert mgr.latest_step() == 6  # snapshot landed on a new step


def test_preempt_overwrites_stale_equal_step(tmp_path):
    """A fresh (--resume 0) run preempted at exactly a step an older
    run already checkpointed must still persist ITS state: force=True
    evicts the colliding stale snapshot (core/checkpoint.py) instead of
    silently skipping the save while logging success."""
    state, g_step, d_step, batch, cfg = _tiny_loop_parts(tmp_path)
    mgr = CheckpointManager(str(tmp_path / "ck"), keep=3)
    # old run: w counts 1.0/step, checkpoint at step 2 holds w=3
    old_final, _ = train_loop(state, g_step, d_step,
                              lambda: iter([batch] * 3), cfg, max_steps=3)
    mgr.save(2, old_final)  # w=3 at step 2
    assert mgr.latest_step() == 2

    def g_step2(state, batch, mults):  # new run counts 10.0/step
        new = {"w": state["w"] + 10.0}
        return new, {"lossG": jnp.sum(new["w"])}, batch["xt"]

    fired = []

    def batches():
        for i in range(100):
            if i == 2 and not fired:
                fired.append(True)
                os.kill(os.getpid(), signal.SIGTERM)
            yield batch

    with PreemptionGuard() as guard:
        final, _ = train_loop(state, g_step2, d_step, batches, cfg,
                              checkpoint_manager=mgr, preemption=guard)
    assert mgr.latest_step() == 2
    restored = mgr.restore(like=final)
    # the NEW run's state (w=30), not the stale old snapshot (w=3)
    assert float(restored["w"][0]) == 30.0


def test_handler_chains_to_previous(tmp_path):
    seen = []
    prev = signal.signal(signal.SIGTERM, lambda s, f: seen.append(s))
    try:
        with PreemptionGuard() as guard:
            os.kill(os.getpid(), signal.SIGTERM)
            assert guard.triggered
        assert seen == [signal.SIGTERM]
    finally:
        signal.signal(signal.SIGTERM, prev)
