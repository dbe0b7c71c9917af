"""Persistent XLA compilation cache.

Grad-through-SCF graphs take 30s-3min each to compile on this class of
host, and the fit/validation/test entry points relaunch processes
constantly. Enabling JAX's persistent compilation cache makes every
recompile of an identical graph a disk hit instead.

Call `enable()` BEFORE the first jit execution (safe to call repeatedly).
The cache directory defaults to `.jax_cache/` at the repo root and can be
overridden with MQC_COMPILE_CACHE (set to "0" to disable).
"""

from __future__ import annotations

import os

_DEFAULT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
)


def enable(path: str | None = None) -> None:
    target = path or os.environ.get("MQC_COMPILE_CACHE") or _DEFAULT
    if target == "0":
        return
    import jax

    try:
        os.makedirs(target, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", target)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # cache is an optimization, never a hard dependency
        pass
