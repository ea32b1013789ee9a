"""Persistent XLA compilation cache (shared helper)."""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    """Reuse XLA compiles across k-fold steps, runs, and processes. Safe on
    JAX versions without the config options (silently skipped)."""
    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            path or os.path.expanduser("~/.cache/jax_compilation"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
