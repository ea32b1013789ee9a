"""`vit-ae-tpu doctor` — environment diagnostics for this framework.

One place that answers "why doesn't it run here": JAX backend/devices,
compilation-cache health, native-augmenter buildability, virtual-mesh
readiness (the XLA:CPU scheduler workaround), key library versions, and the
optional extras (nibabel, pandas). Each check prints ok/warn/fail with a
one-line remedy; exit code 1 when any check fails.
"""

from __future__ import annotations

import os
from typing import Callable, List, Tuple

_OK, _WARN, _FAIL = "ok", "warn", "FAIL"


def _check_jax() -> Tuple[str, str]:
    import jax

    try:
        devs = jax.devices()
    except Exception as e:
        return _FAIL, f"jax {jax.__version__}: backend init failed: {e}"
    kinds = {d.platform for d in devs}
    detail = f"jax {jax.__version__}, {len(devs)} device(s): " + ", ".join(
        f"{d.device_kind}" for d in devs[:4]
    )
    if "cpu" in kinds and len(kinds) == 1:
        return _WARN, detail + " — CPU only (TPU runs need the TPU backend)"
    return _OK, detail


def _check_device_compute() -> Tuple[str, str]:
    import time

    import jax
    import jax.numpy as jnp

    try:
        t0 = time.time()
        x = jnp.ones((256, 256))
        s = float(jnp.sum(x @ x))  # host pull = real sync even on axon
        if s != 256.0 * 256 * 256:
            return _FAIL, f"matmul gave {s}, expected {256**3}"
        return _OK, f"256^2 matmul round trip in {time.time() - t0:.2f}s"
    except Exception as e:
        return _FAIL, f"device compute failed: {e}"


def _check_compilation_cache() -> Tuple[str, str]:
    from vit_ae_plus_plus_tpu.utils.cache import enable_compilation_cache

    try:
        enable_compilation_cache()
        import jax

        path = jax.config.jax_compilation_cache_dir
        if not path:
            if jax.default_backend() == "cpu":
                return _OK, (
                    "persistent cache disabled on XLA:CPU by design "
                    "(cpu_aot_loader tuning-flag mismatch on every load — "
                    "see utils/cache.py)"
                )
            return _WARN, "compilation cache not configured (first compiles slow)"
        os.makedirs(path, exist_ok=True)
        probe = os.path.join(path, ".doctor-probe")
        with open(probe, "w") as f:
            f.write("x")
        os.remove(probe)
        n = len(os.listdir(path))
        return _OK, f"{path} writable, {n} entrie(s)"
    except Exception as e:
        return _FAIL, f"compilation cache: {e}"


def _check_cache_machine_key(root: str | None = None) -> Tuple[str, str]:
    """Cross-machine compilation-cache hazard: XLA:CPU AOT entries are
    specialised to the compiling host's CPU features; loading one compiled
    elsewhere triggers cpu_aot_loader errors that XLA documents as a SIGILL
    risk. This framework keys its cache dir by machine fingerprint
    (utils/cache.py); entries sitting in the legacy UN-keyed root predate
    that layout and may be from another machine."""
    from vit_ae_plus_plus_tpu.utils.cache import (
        default_cache_dir, legacy_unkeyed_entries, machine_fingerprint,
    )

    stray = legacy_unkeyed_entries(root)
    if stray:
        shown = ", ".join(stray[:3]) + ("…" if len(stray) > 3 else "")
        return _WARN, (
            f"{len(stray)} cache entrie(s) in the un-keyed root may have been "
            f"compiled on another machine (SIGILL risk: {shown}) — delete "
            f"them or move them into the machine-keyed dir "
            f"{default_cache_dir()} if they are known-local"
        )
    return _OK, f"cache keyed by machine fingerprint {machine_fingerprint()}"


def _check_native_augment() -> Tuple[str, str]:
    try:
        from vit_ae_plus_plus_tpu.data import native_augment

        if native_augment.available():
            return _OK, "C++ augmenter built and loadable"
        return _WARN, ("C++ augmenter unavailable (scipy fallback will be "
                       "used) — check g++ and native/augment3d.cpp")
    except Exception as e:
        return _WARN, f"C++ augmenter: {e} (scipy fallback active)"


def _check_virtual_mesh_flags() -> Tuple[str, str]:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        return _OK, ("single-device mode (for virtual-mesh tests set "
                     "XLA_FLAGS=--xla_force_host_platform_device_count=8 "
                     "JAX_PLATFORMS=cpu)")
    if "xla_cpu_enable_concurrency_optimized_scheduler=false" not in flags:
        return _WARN, ("virtual mesh WITHOUT "
                       "--xla_cpu_enable_concurrency_optimized_scheduler="
                       "false: multi-collective programs can deadlock on "
                       "XLA:CPU (see tests/conftest.py)")
    return _OK, "virtual-mesh flags complete"


def _check_versions() -> Tuple[str, str]:
    import flax
    import numpy as np
    import optax
    import orbax.checkpoint as ocp

    return _OK, (f"flax {flax.__version__}, optax {optax.__version__}, "
                 f"orbax {getattr(ocp, '__version__', '?')}, "
                 f"numpy {np.__version__}")


def _check_optional() -> Tuple[str, str]:
    have = []
    missing = []
    for mod, why in (("pandas", "EGD CSV bootstrap"),
                     ("nibabel", "NIfTI via nibabel (built-in reader works without)"),
                     ("torch", "checkpoint import/export oracle"),
                     ("sklearn", "classical eval + splits")):
        try:
            __import__(mod)
            have.append(mod)
        except ImportError:
            missing.append(f"{mod} ({why})")
    msg = "present: " + ", ".join(have)
    if missing:
        return _WARN, msg + "; missing: " + "; ".join(missing)
    return _OK, msg


def _check_vitae_engines() -> Tuple[str, str]:
    """Stale `.vitae` fingerprints: a serialized executable is compiled FOR
    a platform/device-kind/jax-version — an artifact built elsewhere (or
    before a jax upgrade) refuses to load at serve time. Catch it here."""
    import glob
    import json
    import zipfile

    from vit_ae_plus_plus_tpu.serving_aot import _FORMAT_VERSION, _fingerprint

    paths = sorted(glob.glob("*.vitae") + glob.glob("*/*.vitae"))[:50]
    if not paths:
        return _OK, "no .vitae artifacts under the working directory"
    here = _fingerprint()
    stale = []
    for p in paths:
        try:
            with zipfile.ZipFile(p) as zf:
                meta = json.loads(zf.read("meta.json"))
        except Exception as e:
            stale.append(f"{p}: unreadable ({type(e).__name__})")
            continue
        if meta.get("format_version") != _FORMAT_VERSION:
            stale.append(f"{p}: format {meta.get('format_version')} "
                         f"(this build reads {_FORMAT_VERSION})")
            continue
        for key in ("platform", "device_kind", "jax_version"):
            if meta.get(key) != here[key]:
                stale.append(f"{p}: {key} {meta.get(key)!r} != {here[key]!r}")
                break
    if stale:
        return _WARN, ("stale engine artifact(s), rebuild with "
                       "`vit-ae-tpu compile-engine`: " + "; ".join(stale))
    return _OK, f"{len(paths)} artifact(s) match this platform"


CHECKS: List[Tuple[str, Callable[[], Tuple[str, str]]]] = [
    ("jax backend", _check_jax),
    ("device compute", _check_device_compute),
    ("compilation cache", _check_compilation_cache),
    ("cache machine key", _check_cache_machine_key),
    ("native augmenter", _check_native_augment),
    ("virtual-mesh flags", _check_virtual_mesh_flags),
    ("library versions", _check_versions),
    ("optional extras", _check_optional),
    ("engine artifacts", _check_vitae_engines),
]


def run_doctor(checks=None) -> int:
    """Run all checks; returns 0 when none FAIL."""
    failed = 0
    for name, fn in (checks or CHECKS):
        try:
            status, detail = fn()
        except Exception as e:  # a crashing check is itself a failure
            status, detail = _FAIL, f"check crashed: {type(e).__name__}: {e}"
        print(f"[{status:>4}] {name}: {detail}")
        failed += status == _FAIL
    print("doctor:", "all checks passed" if not failed else f"{failed} check(s) FAILED")
    return 1 if failed else 0
