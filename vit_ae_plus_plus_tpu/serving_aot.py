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

Artifact container (format version 2 — no pickled weights/metadata):

    meta.json       engine surface + platform fingerprint + weight manifest
    weights.npz     all weight leaves as plain arrays (np.load with
                    allow_pickle=False; exotic dtypes like bfloat16 are
                    stored as same-width unsigned ints and re-viewed)
    args_tree.pb    PyTreeDef (proto) of the weight tree — rebuilds the
                    argument structure without unpickling anything
    in_tree.pb /    PyTreeDefs (proto) of the executable's calling
    out_tree.pb     convention
    executable.bin  QUARANTINED: jax's serialized executable bytes

SECURITY / trust boundary: weights, metadata, and tree structure are
non-executable containers (JSON / npz-without-pickle / pytree protos) — a
swapped weight payload can change predictions but cannot run code. The one
residual boundary is ``executable.bin``: jax's
``serialize_executable.deserialize_and_load`` is internally an unrestricted
``pickle.Unpickler`` (jax/experimental/serialize_executable.py), so loading
that segment from a hostile artifact is arbitrary code execution. Load
engines only from artifacts you built (same trust level as a Python wheel
you install); put integrity checking (signing, digest pinning) around the
artifact file in any deployment that moves `.vitae` files across trust
zones. Format-1 artifacts (whole state pickled) are refused by the loader.

The reference has no analogue (its deployment story is offline .npy feature
dumps, extract_ssl_features.py:20-154); this is TPU-native serving
infrastructure around the same model surface.
"""

from __future__ import annotations

import json
import threading
import zipfile

import numpy as np
import jax

from vit_ae_plus_plus_tpu.serving import ClassifierEngine, FeatureEngine, _SlabEngine

_FORMAT_VERSION = 2
_META = "meta.json"
_EXEC = "executable.bin"
_WEIGHTS = "weights.npz"
_ARGS_TREE = "args_tree.pb"
_IN_TREE = "in_tree.pb"
_OUT_TREE = "out_tree.pb"
_LEGACY_STATE = "state.pkl"  # format 1 — refused


def _fingerprint() -> dict:
    dev = jax.devices()[0]
    return {
        "platform": jax.default_backend(),
        "device_kind": dev.device_kind,
        "n_devices": jax.device_count(),
        "jax_version": jax.__version__,
    }


def _treedef_registry():
    from jax._src.tree_util import default_registry

    return default_registry


def _serialize_treedef(treedef) -> bytes:
    return treedef.serialize_using_proto()


def _deserialize_treedef(data: bytes):
    treedef_cls = type(jax.tree.structure(0))
    return treedef_cls.deserialize_using_proto(_treedef_registry(), data)


def _pack_leaves(leaves, prefix: str):
    """Host-transfer `leaves` and return ({npz_key: storable_array},
    [dtype names]). Dtypes npz can't take verbatim (bfloat16, float8...)
    are stored as same-width unsigned ints; the manifest records the real
    name so `_unpack_leaf` can re-view them."""
    arrays, dtypes = {}, []
    for i, leaf in enumerate(leaves):
        a = np.asarray(leaf)
        dtypes.append(a.dtype.name)
        if a.dtype.kind not in "biufc" or a.dtype.name not in np.sctypeDict:
            a = a.view(np.dtype(f"uint{8 * a.dtype.itemsize}"))
        arrays[f"{prefix}{i:05d}"] = a
    return arrays, dtypes


def _unpack_leaf(a: np.ndarray, dtype_name: str) -> np.ndarray:
    if a.dtype.name != dtype_name:
        import ml_dtypes

        return a.view(np.dtype(getattr(ml_dtypes, dtype_name)))
    return a


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
        "model_name": getattr(engine, "model_name", None),
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
        weight_leaves, args_treedef = jax.tree.flatten(lead_args)
    elif isinstance(engine, ClassifierEngine):
        meta["kind"] = "classify"
        meta["num_classes"] = engine.num_classes
        meta["num_folds"] = engine.num_folds
        # ONE executable serves every fold (params are an argument); the
        # fold-mean loop is rebuilt by the loader. The folds share one tree
        # structure, so the leaves of all folds concatenate under it.
        fn, lead_args = engine._probs, (engine._params_list[0],)
        weight_leaves, args_treedef = jax.tree.flatten(engine._params_list)
    else:
        raise TypeError(f"unsupported engine type {type(engine).__name__}")
    arrays, dtypes = _pack_leaves(weight_leaves, "w")
    meta["weight_dtypes"] = dtypes

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

    with zipfile.ZipFile(path, "w", compression=zipfile.ZIP_DEFLATED) as zf:
        zf.writestr(_META, json.dumps(meta, indent=1))
        # the executable is already a compact binary; don't recompress it
        zf.writestr(
            zipfile.ZipInfo(_EXEC), payload, compress_type=zipfile.ZIP_STORED
        )
        import io

        buf = io.BytesIO()
        np.savez(buf, **arrays)
        zf.writestr(zipfile.ZipInfo(_WEIGHTS), buf.getvalue(),
                    compress_type=zipfile.ZIP_STORED)
        zf.writestr(_ARGS_TREE, _serialize_treedef(args_treedef))
        zf.writestr(_IN_TREE, _serialize_treedef(in_tree))
        zf.writestr(_OUT_TREE, _serialize_treedef(out_tree))
    return meta


class _AOTEngine(_SlabEngine):
    """An engine rebuilt from a `.vitae` artifact: same `_SlabEngine`
    surface (infer/prepare_one/warmup), `_step` backed by the deserialized
    executable. warmup() is a plain execution — nothing compiles."""

    def __init__(self, meta: dict, step):
        self.kind = meta["kind"]
        self.model_name = meta.get("model_name")
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

    Weights/metadata/tree structure load from non-executable containers
    (JSON, npz with allow_pickle=False, pytree protos). `executable.bin`
    is the residual trust boundary — see the module docstring.

    Raises RuntimeError when the artifact's platform fingerprint (backend,
    device kind) does not match this process — executables are compiled FOR
    a device and cannot run elsewhere — or when the artifact uses the
    retired pickled-state format (version 1)."""
    from jax.experimental import serialize_executable

    with zipfile.ZipFile(path) as zf:
        names = set(zf.namelist())
        meta = json.loads(zf.read(_META))
        if meta.get("format_version") != _FORMAT_VERSION or _LEGACY_STATE in names:
            raise RuntimeError(
                f"{path}: unsupported engine format "
                f"{meta.get('format_version')} (this build reads version "
                f"{_FORMAT_VERSION}; version-1 artifacts carried pickled "
                "state and are refused — rebuild with "
                "`vit-ae-tpu compile-engine`)"
            )
        payload = zf.read(_EXEC)
        import io

        with np.load(io.BytesIO(zf.read(_WEIGHTS)), allow_pickle=False) as z:
            stored = {k: z[k] for k in z.files}
        args_treedef = _deserialize_treedef(zf.read(_ARGS_TREE))
        in_tree = _deserialize_treedef(zf.read(_IN_TREE))
        out_tree = _deserialize_treedef(zf.read(_OUT_TREE))

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

    dtypes = meta["weight_dtypes"]
    leaves = [
        _unpack_leaf(stored[f"w{i:05d}"], dtypes[i]) for i in range(len(dtypes))
    ]
    if len(leaves) != args_treedef.num_leaves:
        raise RuntimeError(
            f"{path}: weight payload has {len(leaves)} arrays but the tree "
            f"expects {args_treedef.num_leaves} — corrupt artifact"
        )

    # artifacts are single-device (save_engine enforces it): pin execution to
    # one device, or a multi-device process (e.g. the virtual test mesh)
    # would hand the executable its whole device list
    loaded = serialize_executable.deserialize_and_load(
        payload, in_tree, out_tree,
        execution_devices=jax.devices()[:1],
    )
    if meta["kind"] == "features":
        # stage the weights once; every request then passes device-resident args
        fn_args = jax.device_put(jax.tree.unflatten(args_treedef, leaves))
        step = lambda batch: loaded(*fn_args, batch)  # noqa: E731
    elif meta["kind"] == "classify":
        params_list = [
            jax.device_put(v) for v in jax.tree.unflatten(args_treedef, leaves)
        ]
        step = lambda batch: sum(  # noqa: E731
            loaded(v, batch) for v in params_list
        ) / len(params_list)
    else:
        raise RuntimeError(f"{path}: unknown engine kind {meta['kind']!r}")
    return _AOTEngine(meta, step)
