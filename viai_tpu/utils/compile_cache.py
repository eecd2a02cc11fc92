"""Persistent XLA compilation cache.

Compiles of the full train/infer programs cost minutes (and go through
a remote-compile relay in this environment); the persistent cache makes
every subsequent process start instant for unchanged programs. Enabled
by the CLIs and bench.py; set VIAI_CACHE_DIR to relocate, or
VIAI_NO_CACHE=1 to disable.
"""

from __future__ import annotations

import os


def enable(cache_dir: str | None = None):
    if os.environ.get("VIAI_NO_CACHE"):
        return
    import jax

    path = (
        cache_dir
        or os.environ.get("VIAI_CACHE_DIR")
        or os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")
    )
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without the flags
