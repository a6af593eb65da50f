"""Block-size fitting shared by the Pallas kernels.

The tuned per-kernel block defaults (attention 512/2048, LN 1024) are
preferences, not contracts: real callers bring arbitrary row/seq
counts, so every kernel fits its block down to the largest
quantum-aligned divisor of the actual extent. One shared helper keeps
the fitting logic (and its edge cases) identical across kernels.
"""

from __future__ import annotations


def fit_divisor(pref: int, n: int, quantum: int) -> int | None:
    """Largest block <= pref that divides n, stepping down in
    `quantum` multiples (n itself counts when n <= pref). None when no
    quantum-aligned divisor exists — callers choose their own fallback
    (a smaller quantum, a 1-step search, or a loud error) instead of
    silently running an n-sized block."""
    b = min(pref, n)
    if n % b == 0:
        return b
    for cand in range((b // quantum) * quantum, 0, -quantum):
        if n % cand == 0:
            return cand
    return None


def largest_divisor_below(n: int, cap: int) -> int:
    """Largest divisor of n that is <= cap (>= 1 always exists)."""
    for cand in range(min(cap, n), 0, -1):
        if n % cand == 0:
            return cand
    return 1
