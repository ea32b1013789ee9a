"""AOT-compiled serving engine artifacts (`.vitae` files).

TPU deployment reality: the first compile of a new program shape is slow —
minutes through a remote-compile path — and tracing + flax model
construction add their own startup cost. The persistent compilation cache
(utils/cache.py) only helps replicas that share a cache directory. This
module makes serving cold-start a file read instead:

    vit-ae-tpu compile-engine --checkpoint ckpt --out engine.vitae
    vit-ae-tpu serve --engine engine.vitae

``save_engine`` lowers a built engine's jitted slab step at its one fixed
shape, compiles it, and serializes the COMPILED executable
(jax.experimental.serialize_executable) together with the weight trees and
the metadata needed to rebuild the engine surface. ``load_engine``
deserializes and returns a ready engine: no model construction, no tracing,
no XLA compilation — the first request runs the prebuilt executable.

Weights are runtime ARGUMENTS of the serialized executable (never trace-time
constants), so the artifact stores them once as plain arrays and the loaded
engine stages them onto the device once at load.

Artifacts are device-specific by nature — an executable is compiled FOR a
device kind — so the loader checks a platform fingerprint and fails loudly
on mismatch rather than risking undefined execution.

SECURITY: a `.vitae` artifact embeds pickled weight/tree state, and
unpickling executes code — load engines only from artifacts you built
(same trust level as a Python wheel you install), never from untrusted
uploads.

The reference has no analogue (its deployment story is offline .npy feature
dumps, extract_ssl_features.py:20-154); this is TPU-native serving
infrastructure around the same model surface.
"""

from __future__ import annotations

import io
import json
import pickle
import threading
import zipfile

import numpy as np
import jax

from vit_ae_plus_plus_tpu.serving import ClassifierEngine, FeatureEngine, _SlabEngine

_FORMAT_VERSION = 1
_META = "meta.json"
_EXEC = "executable.bin"
_STATE = "state.pkl"


def _fingerprint() -> dict:
    dev = jax.devices()[0]
    return {
        "platform": jax.default_backend(),
        "device_kind": dev.device_kind,
        "n_devices": jax.device_count(),
        "jax_version": jax.__version__,
    }


def _host_tree(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_engine(engine: _SlabEngine, path: str) -> dict:
    """Compile `engine`'s slab step ahead of time and write a `.vitae`
    artifact. Returns the artifact metadata dict.

    Single-device engines only: a serialized executable bakes its device
    assignment, and mesh engines would additionally need the identical
    topology at load — build those from a checkpoint instead."""
    from jax.experimental import serialize_executable

    if getattr(engine, "mesh", None) is not None:
        raise NotImplementedError(
            "AOT artifacts are single-device (the serialized executable "
            "bakes its device assignment); build mesh engines from the "
            "checkpoint at startup instead"
        )

    slab = np.zeros((engine.batch_size, *engine.volume_shape), np.float32)
    meta = {
        "format_version": _FORMAT_VERSION,
        "quantize": engine.quantize,
        "batch_size": engine.batch_size,
        "volume_shape": list(engine.volume_shape),
        "normalize": engine.normalize,
        "resize": bool(engine.resize),
        **_fingerprint(),
    }
    if isinstance(engine, FeatureEngine):
        meta["kind"] = "features"
        meta["feature_dim"] = engine.feature_dim
        fn, lead_args = engine._jit_fn, engine._fn_args
        state = {"fn_args": _host_tree(lead_args)}
    elif isinstance(engine, ClassifierEngine):
        meta["kind"] = "classify"
        meta["num_classes"] = engine.num_classes
        meta["num_folds"] = engine.num_folds
        # ONE executable serves every fold (params are an argument); the
        # fold-mean loop is rebuilt by the loader
        fn, lead_args = engine._probs, (engine._params_list[0],)
        state = {"fn_args_list": _host_tree(engine._params_list)}
    else:
        raise TypeError(f"unsupported engine type {type(engine).__name__}")

    # compile FRESH, bypassing the persistent compilation cache: an
    # executable rehydrated from that cache does not re-serialize correctly
    # (measured on XLA:CPU: the deserialized copy loses fusion thunks —
    # "Buffer Definition Event: Function copy_bitcast_fusion.2 not found").
    # An AOT artifact must come from a real compile. Toggling the config
    # flag alone is NOT enough: jax memoizes cache-enablement at the
    # process's first compile (compilation_cache._cache_checked), so the
    # module state must be reset around the toggle.
    from jax._src import compilation_cache as _cc

    cache_was_on = jax.config.jax_enable_compilation_cache
    jax.config.update("jax_enable_compilation_cache", False)
    _cc.reset_cache()
    try:
        compiled = fn.lower(*lead_args, slab).compile()
    finally:
        jax.config.update("jax_enable_compilation_cache", cache_was_on)
        _cc.reset_cache()  # re-initialize lazily with the restored config
    payload, in_tree, out_tree = serialize_executable.serialize(compiled)
    state["in_tree"] = in_tree
    state["out_tree"] = out_tree

    with zipfile.ZipFile(path, "w", compression=zipfile.ZIP_DEFLATED) as zf:
        zf.writestr(_META, json.dumps(meta, indent=1))
        # the executable is already a compact binary; don't recompress it
        zf.writestr(
            zipfile.ZipInfo(_EXEC), payload, compress_type=zipfile.ZIP_STORED
        )
        zf.writestr(_STATE, pickle.dumps(state, protocol=4))
    return meta


class _AOTEngine(_SlabEngine):
    """An engine rebuilt from a `.vitae` artifact: same `_SlabEngine`
    surface (infer/prepare_one/warmup), `_step` backed by the deserialized
    executable. warmup() is a plain execution — nothing compiles."""

    def __init__(self, meta: dict, step):
        self.kind = meta["kind"]
        self.quantize = meta["quantize"]
        self.batch_size = int(meta["batch_size"])
        self.volume_shape = tuple(meta["volume_shape"])
        self.normalize = meta["normalize"]
        self.resize = bool(meta["resize"])
        if self.kind == "features":
            self.feature_dim = int(meta["feature_dim"])
        else:
            self.num_classes = int(meta["num_classes"])
            self.num_folds = int(meta["num_folds"])
        self.mesh = None
        self.meta = meta
        self._step = step
        self._lock = threading.Lock()


def load_engine(path: str) -> _AOTEngine:
    """Deserialize a `.vitae` artifact into a ready engine.

    Raises RuntimeError when the artifact's platform fingerprint (backend,
    device kind) does not match this process — executables are compiled FOR
    a device and cannot run elsewhere."""
    from jax.experimental import serialize_executable

    with zipfile.ZipFile(path) as zf:
        meta = json.loads(zf.read(_META))
        payload = zf.read(_EXEC)
        state = pickle.loads(zf.read(_STATE))

    if meta.get("format_version") != _FORMAT_VERSION:
        raise RuntimeError(
            f"{path}: unsupported engine format {meta.get('format_version')} "
            f"(this build reads version {_FORMAT_VERSION})"
        )
    here = _fingerprint()
    for key in ("platform", "device_kind"):
        if meta.get(key) != here[key]:
            raise RuntimeError(
                f"{path}: engine was compiled for {key}="
                f"{meta.get(key)!r} but this process has {here[key]!r} — "
                "rebuild with `vit-ae-tpu compile-engine` on this platform"
            )
    if meta.get("jax_version") != here["jax_version"]:
        # serialized executables are not guaranteed stable across jax
        # releases; fail with the actionable message rather than a
        # deserializer crash
        raise RuntimeError(
            f"{path}: engine was built with jax {meta.get('jax_version')}, "
            f"this process runs {here['jax_version']} — rebuild the artifact"
        )

    # artifacts are single-device (save_engine enforces it): pin execution to
    # one device, or a multi-device process (e.g. the virtual test mesh)
    # would hand the executable its whole device list
    loaded = serialize_executable.deserialize_and_load(
        payload, state["in_tree"], state["out_tree"],
        execution_devices=jax.devices()[:1],
    )
    if meta["kind"] == "features":
        # stage the weights once; every request then passes device-resident args
        fn_args = jax.device_put(state["fn_args"])
        step = lambda batch: loaded(*fn_args, batch)  # noqa: E731
    elif meta["kind"] == "classify":
        params_list = [jax.device_put(v) for v in state["fn_args_list"]]
        step = lambda batch: sum(  # noqa: E731
            loaded(v, batch) for v in params_list
        ) / len(params_list)
    else:
        raise RuntimeError(f"{path}: unknown engine kind {meta['kind']!r}")
    return _AOTEngine(meta, step)
