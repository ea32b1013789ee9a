"""Persistent XLA compilation cache (shared helper).

The cache directory is keyed by a machine fingerprint (CPU arch + feature
flags): XLA:CPU persists AOT-compiled executables specialised to the
*compiling* host's CPU features, and loading such an entry on a different
machine makes XLA warn that it "could lead to execution errors such as
SIGILL" (cpu_aot_loader). A shared un-keyed directory (e.g. a home dir
mounted on several boxes, or an artifact copied between a dev box and the
driver machine) therefore risks crashes. Keying the directory makes
cross-machine reuse structurally impossible while keeping within-machine
reuse across k-fold steps, runs, and processes.
"""

from __future__ import annotations

import os

_LEGACY_ROOT = "~/.cache/jax_compilation"


def machine_fingerprint() -> str:
    """Short stable hash of this host's CPU architecture + feature flags.

    Two machines share a fingerprint only when their CPUs expose the same
    ISA extensions — exactly the condition under which XLA:CPU AOT entries
    are safe to exchange.
    """
    import hashlib
    import platform

    feats = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    feats = " ".join(sorted(set(line.split(":", 1)[1].split())))
                    break
    except OSError:
        pass  # non-Linux: arch alone still separates the common cases
    return hashlib.sha256(
        f"{platform.machine()}|{feats}".encode()
    ).hexdigest()[:12]


def default_cache_dir() -> str:
    """Machine-keyed default: ~/.cache/jax_compilation/<fingerprint>."""
    return os.path.join(os.path.expanduser(_LEGACY_ROOT), machine_fingerprint())


def enable_compilation_cache(path: str | None = None) -> None:
    """Reuse XLA compiles across k-fold steps, runs, and processes. Safe on
    JAX versions without the config options (silently skipped).

    No-op on the XLA:CPU backend unless `path` is given explicitly: XLA:CPU
    persists AOT executables whose target features include injected LLVM
    *tuning* flags (+prefer-no-gather/+prefer-no-scatter, the Downfall
    mitigation) that the load-time host-feature probe never reports, so
    EVERY persistent-cache hit logs a cpu_aot_loader feature-mismatch error
    — even for entries compiled on this very machine — and genuine
    cross-machine reuse is a documented SIGILL risk. Accelerator backends
    (TPU/axon) are unaffected. Pass an explicit `path` to force CPU caching
    (the test suite does, via its own conftest dir).
    """
    import jax

    try:
        if path is None and jax.default_backend() == "cpu":
            return
        jax.config.update("jax_compilation_cache_dir", path or default_cache_dir())
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def legacy_unkeyed_entries(root: str | None = None) -> list[str]:
    """Cache entries sitting directly in the legacy un-keyed root.

    These were written before the machine-keyed layout (or by another tool)
    and may have been compiled on a machine with different CPU features —
    the cpu_aot_loader SIGILL hazard. Returns their names (possibly empty);
    `doctor` surfaces them with the remediation.
    """
    root = os.path.expanduser(root or _LEGACY_ROOT)
    try:
        return sorted(
            e for e in os.listdir(root)
            if os.path.isfile(os.path.join(root, e)) and not e.startswith(".")
        )
    except OSError:
        return []
