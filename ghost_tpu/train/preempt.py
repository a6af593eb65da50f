"""Preemption-aware training shutdown (beyond-reference resilience).

The reference has no failure handling beyond per-sample try/except
skips and a NaN helper (SURVEY.md §5: "no elastic, no preemption
handling"); a SIGTERM mid-epoch loses everything since its last
save_interval snapshot. TPU VMs receive SIGTERM ahead of maintenance
events and spot reclaims, so the rebuild treats it as a first-class
signal: `PreemptionGuard` latches the signal on the host (nothing
device-side — the handler only sets a flag), and `train_loop` checks
the flag once per step, saves a final full-state checkpoint (params,
optimizer moments, step — exact resume, see core/checkpoint.py) and
returns cleanly.
"""

from __future__ import annotations

import signal
import threading


class PreemptionGuard:
    """Context manager latching shutdown signals into a step-poll flag.

    Default watches SIGTERM only (SIGINT stays ctrl-C). Chains to any
    previously installed handler so outer supervisors still see the
    signal. Use:

        with PreemptionGuard() as guard:
            train_loop(..., preemption=guard)
    """

    def __init__(self, signals=(signal.SIGTERM,)):
        self._signals = tuple(signals)
        self._flag = threading.Event()
        self._prev: dict = {}

    def __enter__(self) -> "PreemptionGuard":
        for s in self._signals:
            self._prev[s] = signal.signal(s, self._handler)
        return self

    def __exit__(self, *exc) -> None:
        for s, prev in self._prev.items():
            # signal.signal returns None when the previous handler was
            # installed outside Python (launchers, C extensions) —
            # passing None back raises TypeError, crashing an otherwise
            # clean exit; leave the native handler in place instead
            if prev is not None:
                signal.signal(s, prev)
        self._prev.clear()

    def _handler(self, signum, frame) -> None:
        self._flag.set()
        prev = self._prev.get(signum)
        if callable(prev):
            prev(signum, frame)

    @property
    def triggered(self) -> bool:
        return self._flag.is_set()
