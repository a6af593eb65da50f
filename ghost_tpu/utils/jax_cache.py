"""Persistent XLA compilation cache wiring.

Cold compiles of the fused video program are expensive (minutes on a
TPU); the reference has no equivalent concern (eager torch). Every CLI
entry point calls `enable_persistent_cache()` so deployments get warm
restarts by mounting a volume and setting GHOST_TPU_JAX_CACHE (see
Dockerfile), without each call site repeating the config dance.
"""

from __future__ import annotations

import os


def enable_persistent_cache(path: str | None = None) -> str | None:
    """Point jax's compilation cache at `path` (default: the
    GHOST_TPU_JAX_CACHE env var; no-op when neither is set).

    Returns the cache dir in use, or None when disabled."""
    path = path or os.environ.get("GHOST_TPU_JAX_CACHE")
    if not path:
        return None
    import jax

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache even fast-to-compile programs: dispatch-floor-sized CLIs
    # (convert/export) still benefit on 1-core hosts
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return path
