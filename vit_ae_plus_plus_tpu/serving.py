"""Production serving: a dynamic-batching feature-inference server.

The reference has no online-serving story — features are dumped offline by
post_training_utils/extract_ssl_features.py:20-154 and consumed from disk.
This module is the TPU-native deployment path for the same model surface:

- ``FeatureEngine``: checkpoint -> jitted FIXED-batch encoder forward
  (bf16, or the int8 engine from models/quant.py). TPU/XLA wants one static
  shape compiled once; the engine pads every request slab to ``batch_size``
  and slices the padding back off, so serving never recompiles.
- ``BatchingQueue``: collects concurrent single-volume requests into padded
  slabs (classic dynamic batching with a bounded gather window) and keeps
  latency/fill statistics.
- ``make_http_server`` / ``serve``: a stdlib ThreadingHTTPServer front end —
  ``POST /features`` (SSL features) and ``POST /predict`` (k-fold-ensembled
  class probabilities via ``ClassifierEngine``) with ``.npy`` or NIfTI-1
  bodies, ``GET /healthz``, ``GET /stats`` — exposed as the ``serve`` CLI
  subcommand; drains gracefully on SIGTERM.

Everything is framework code (threads + numpy at the edge, one jitted
callable at the core); there is no model-specific logic here beyond the
checkpoint grafting reused from pipelines/extract_features.py.
"""

from __future__ import annotations

import io
import json
import threading
import time
from collections import deque
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp


class _SlabEngine:
    """Shared fixed-shape slab machinery: per-channel z-score, padding every
    request to the one compiled ``batch_size``, serialized device dispatch.
    Subclasses set ``_step``, ``batch_size``, ``volume_shape``, ``normalize``,
    ``_lock``."""

    resize: bool = False  # subclasses may enable via their constructors

    def _normalize(self, v: np.ndarray) -> np.ndarray:
        if self.normalize == "zscore":
            # per-channel z-score over spatial dims (data/brats.py:26-32 /
            # egd.py:44-47 semantics; identical for C=1)
            mean = v.mean(axis=(-3, -2, -1), keepdims=True)
            std = v.std(axis=(-3, -2, -1), keepdims=True)
            v = (v - mean) / np.maximum(std, 1e-8)
        return v

    def _maybe_resize(self, v: np.ndarray) -> np.ndarray:
        """Trilinear-resample mismatched spatial dims to the model's volume
        size (jax.image.resize — the same resampling family the pos-embed
        interpolation uses, ops/pos_embed.py). Channel count must match."""
        if v.shape[1:] == self.volume_shape or not self.resize:
            return v
        if v.shape[1] != self.volume_shape[0]:
            raise ValueError(
                f"channel mismatch: model expects {self.volume_shape[0]}, "
                f"got {v.shape[1]} (resize only fixes spatial dims)"
            )
        out_shape = (v.shape[0], *self.volume_shape)
        return np.asarray(
            jax.image.resize(jnp.asarray(v), out_shape, method="trilinear"),
            np.float32,
        )

    def prepare_one(self, volume: np.ndarray) -> np.ndarray:
        """Validate (and optionally resize) ONE request volume — used by the
        batcher BEFORE enqueueing so a bad request fails alone instead of
        poisoning its co-batched slab, and so mixed-size requests can be
        co-batched after per-request resizing."""
        v = np.asarray(volume, np.float32)
        v = self._maybe_resize(v[None])[0]
        if v.shape != self.volume_shape:
            raise ValueError(
                f"expected ({', '.join(map(str, self.volume_shape))}), "
                f"got {v.shape}"
            )
        return v

    def warmup(self) -> float:
        """Compile the serving shape; returns compile+run seconds."""
        t0 = time.time()
        slab = np.zeros((self.batch_size, *self.volume_shape), np.float32)
        np.asarray(self._step(jnp.asarray(slab)))
        return time.time() - t0

    def infer(self, volumes: np.ndarray) -> np.ndarray:
        """(N, C, S, S, S) -> (N, out_dim) float32, any N >= 1 (slabs of
        ``batch_size`` padded with repeats — static shapes, no recompiles)."""
        volumes = np.asarray(volumes, np.float32)
        volumes = self._maybe_resize(volumes)
        if volumes.shape[1:] != self.volume_shape:
            raise ValueError(
                f"expected (N, {', '.join(map(str, self.volume_shape))}), "
                f"got {volumes.shape}"
            )
        volumes = self._normalize(volumes)
        outs = []
        b = self.batch_size
        with self._lock:
            # dispatch every slab first — jax dispatch is async, so slab k+1's
            # H2D transfer overlaps slab k's compute — then gather to host
            for i in range(0, volumes.shape[0], b):
                chunk = volumes[i:i + b]
                n = chunk.shape[0]
                if n < b:
                    chunk = np.concatenate([chunk, np.repeat(chunk[:1], b - n, axis=0)])
                outs.append((self._step(jnp.asarray(chunk)), n))
            outs = [np.asarray(out[:n], dtype=np.float32) for out, n in outs]
        return np.concatenate(outs)


class FeatureEngine(_SlabEngine):
    """Checkpoint -> fixed-shape jitted ``forward_features``.

    Mirrors the extraction pipeline's checkpoint surgery (MAE params grafted
    into a plain ViT — reference extract_ssl_features.py:109-135) and the
    fixed-batch padding trick of pipelines/extract_features.py:76-82."""

    def __init__(
        self,
        checkpoint_path: Optional[str],
        model_name: str = "contr_mae_vit_base_patch16",
        volume_size: int = 96,
        in_chans: int = 1,
        patch_size: int = 8,
        batch_size: int = 8,
        compute_dtype: str = "bfloat16",
        quantize: str = "none",
        normalize: str = "none",
        mesh=None,
        mae_params=None,
        resize: bool = False,
    ):
        """`mesh`: an optional ('data', ...) jax.sharding.Mesh — serving slabs
        shard over its 'data' axis (scale-out serving across chips; the axis
        size must divide the slab batch size). `mae_params` bypasses the
        checkpoint load with an in-memory MAE param tree (benchmarks)."""
        from vit_ae_plus_plus_tpu.models import MODEL_ZOO, build_model
        from vit_ae_plus_plus_tpu.pipelines.probe_kfold import _mae_params_template
        from vit_ae_plus_plus_tpu.pipelines.transfer import mae_params_to_vit
        from vit_ae_plus_plus_tpu.train.checkpoint import load_params
        from vit_ae_plus_plus_tpu.train.step import make_feature_step

        if normalize not in ("none", "zscore"):
            raise ValueError(f"normalize must be 'none'|'zscore', got {normalize!r}")
        self.model_name = model_name
        mae_cfg = MODEL_ZOO[model_name](
            volume_size=volume_size, in_chans=in_chans, patch_size=patch_size,
            dtype=compute_dtype,
        )
        # num_classes=2 matches the extraction pipeline's graft (the strict
        # missing-keys check expects a fresh head; forward_features ignores it)
        vit_cfg = mae_cfg.encoder_vit_config(num_classes=2, global_pool=True)
        vit_model = build_model(vit_cfg)
        s = volume_size
        sample = jnp.zeros((1, in_chans, s, s, s), jnp.float32)
        vit_vars = vit_model.init({"params": jax.random.PRNGKey(0)}, sample)
        if mae_params is None:
            if checkpoint_path is None:
                raise ValueError("need checkpoint_path or mae_params")
            mae_params = load_params(checkpoint_path, _mae_params_template(mae_cfg, 0))
        params = mae_params_to_vit(mae_params, dict(vit_vars["params"]), mae_cfg, vit_cfg)

        if mesh is not None:
            n_data = mesh.shape.get("data", 1)
            if batch_size % n_data:
                raise ValueError(
                    f"the mesh's data axis ({n_data}) must divide the "
                    f"serving batch_size ({batch_size})"
                )
        if quantize == "int8":
            from vit_ae_plus_plus_tpu.models.quant import make_quant_feature_step

            qstep = make_quant_feature_step(vit_cfg, params, mesh=mesh)
            self._step = lambda batch: qstep(batch)
            # AOT hooks (serving_aot.py): the jitted two-arg fn + its leading args
            self._jit_fn, self._fn_args = qstep.quant_fn, (qstep.qparams,)
        elif quantize == "none":
            fstep = make_feature_step(vit_model, mesh=mesh)
            if mesh is not None:
                from vit_ae_plus_plus_tpu.parallel.mesh import replicate

                params = replicate(params, mesh)
            variables = {"params": params}
            self._step = lambda batch: fstep(variables, batch)
            self._jit_fn, self._fn_args = fstep, (variables,)
        else:
            raise ValueError(f"quantize must be 'none'|'int8', got {quantize!r}")
        self.mesh = mesh
        self.quantize = quantize

        self.batch_size = int(batch_size)
        self.volume_shape = (in_chans, s, s, s)
        self.normalize = normalize
        self.feature_dim = mae_cfg.embed_dim
        self.resize = resize
        self._lock = threading.Lock()  # jax dispatch: one slab at a time


class ClassifierEngine(_SlabEngine):
    """Fine-tuned classifier serving, optionally a k-fold ENSEMBLE.

    Loads one or more probe/fine-tune best-model checkpoints (flat ViT param
    dumps from pipelines/finetune.py::BestModelTracker) and serves class
    probabilities. ONE jitted step covers every fold — params are a step
    argument, so swapping checkpoints is free (no recompiles). Ensemble
    probabilities are the fold-mean softmax: the production analogue of the
    reference's k-fold protocol, which reports fold-mean metrics
    (evaluation_k_fold_brats.py:74-77)."""

    def __init__(
        self,
        checkpoint_paths,
        model_name: str = "contr_mae_vit_base_patch16",
        volume_size: int = 96,
        in_chans: int = 1,
        patch_size: int = 8,
        batch_size: int = 8,
        num_classes: int = 2,
        compute_dtype: str = "bfloat16",
        quantize: str = "none",
        normalize: str = "none",
        mesh=None,
        vit_params_list=None,
        resize: bool = False,
    ):
        from vit_ae_plus_plus_tpu.models import MODEL_ZOO, build_model
        from vit_ae_plus_plus_tpu.train.checkpoint import load_params

        if normalize not in ("none", "zscore"):
            raise ValueError(f"normalize must be 'none'|'zscore', got {normalize!r}")
        if isinstance(checkpoint_paths, str):
            checkpoint_paths = [checkpoint_paths]
        self.model_name = model_name
        mae_cfg = MODEL_ZOO[model_name](
            volume_size=volume_size, in_chans=in_chans, patch_size=patch_size,
            dtype=compute_dtype,
        )
        vit_cfg = mae_cfg.encoder_vit_config(
            num_classes=num_classes, global_pool=True
        )
        model = build_model(vit_cfg)
        s = volume_size
        sample = jnp.zeros((1, in_chans, s, s, s), jnp.float32)
        template = jax.tree.map(
            lambda sd: np.zeros(sd.shape, sd.dtype),
            jax.eval_shape(
                lambda: model.init({"params": jax.random.PRNGKey(0)}, sample)
            )["params"],
        )
        if vit_params_list is None:
            if not checkpoint_paths:
                raise ValueError("need checkpoint_paths or vit_params_list")
            vit_params_list = [load_params(p, template) for p in checkpoint_paths]
        self._params_list = [{"params": p} for p in vit_params_list]

        if mesh is not None:
            n_data = mesh.shape.get("data", 1)
            if batch_size % n_data:
                raise ValueError(
                    f"the mesh's data axis ({n_data}) must divide the "
                    f"serving batch_size ({batch_size})"
                )
            if quantize == "none":
                # the int8 path rebuilds its trees below — jit's in_shardings
                # place the quantized arrays; replicating the f32 originals
                # first would just burn k full-model HBM copies
                from vit_ae_plus_plus_tpu.parallel.mesh import replicate

                self._params_list = [replicate(v, mesh) for v in self._params_list]

        if quantize == "int8":
            # int8 trunk (models/quant.py double-rate MXU path) + the tiny
            # classifier head and softmax in f32
            from vit_ae_plus_plus_tpu.models.quant import (
                quant_forward_features,
                quantize_params,
            )

            self._params_list = [
                {
                    "q": quantize_params(v["params"]),
                    "head": (
                        np.asarray(v["params"]["head"]["kernel"], np.float32),
                        np.asarray(v["params"]["head"]["bias"], np.float32),
                    ),
                }
                for v in self._params_list
            ]

            def probs_fn(variables, batch):
                feats = quant_forward_features(variables["q"], vit_cfg, batch)
                logits = feats @ variables["head"][0] + variables["head"][1]
                return jax.nn.softmax(logits, axis=-1)
        elif quantize == "none":
            def probs_fn(variables, batch):
                logits = model.apply(variables, batch)
                return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        else:
            raise ValueError(f"quantize must be 'none'|'int8', got {quantize!r}")

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = NamedSharding(mesh, P())
            data = NamedSharding(mesh, P("data"))
            self._probs = jax.jit(probs_fn, in_shardings=(repl, data),
                                  out_shardings=data)
        else:
            self._probs = jax.jit(probs_fn)
        # fold-mean over the ensemble, computed inside the slab step
        self._step = lambda batch: sum(
            self._probs(v, batch) for v in self._params_list
        ) / len(self._params_list)

        self.mesh = mesh
        self.quantize = quantize
        self.batch_size = int(batch_size)
        self.volume_shape = (in_chans, s, s, s)
        self.normalize = normalize
        self.num_classes = num_classes
        self.num_folds = len(self._params_list)
        self.resize = resize
        self._lock = threading.Lock()

    @classmethod
    def from_work_dir(cls, work_dir: str, criterion: str = "ft", **kwargs):
        """Collect a finetune-kfold work dir's per-fold best checkpoints
        (checkpoints/checkpoint-best_{criterion}_model_{fold}) into one
        ensemble engine. `criterion`: 'ft' (roc_auc) | 'spec' | 'sens'."""
        import glob
        import os
        import re

        pattern = os.path.join(
            work_dir, "checkpoints", f"checkpoint-best_{criterion}_model_*"
        )
        # keep only real per-fold checkpoints (…_<fold>): glob also matches
        # e.g. interrupted orbax temp dirs (*.orbax-checkpoint-tmp-*)
        matches = [
            (int(m.group(1)), p)
            for p in glob.glob(pattern)
            if (m := re.search(r"_(\d+)$", p))
        ]
        paths = [p for _, p in sorted(matches)]
        if not paths:
            single = os.path.join(
                work_dir, "checkpoints", f"checkpoint-best_{criterion}_model"
            )
            if os.path.exists(single):
                paths = [single]
        if not paths:
            raise FileNotFoundError(f"no checkpoints matching {pattern}")
        return cls(paths, **kwargs)


class QueueFull(RuntimeError):
    """Raised by BatchingQueue.submit when admission is at max_depth —
    mapped to HTTP 429 by the server front."""


class _BodyTooLarge(RuntimeError):
    """Request body over the server's max_body_mb — mapped to HTTP 413."""


class _Pending:
    __slots__ = ("volume", "event", "result", "error", "t_submit")

    def __init__(self, volume):
        self.volume = volume
        self.event = threading.Event()
        self.result = None
        self.error: Optional[BaseException] = None
        self.t_submit = time.time()


class BatchingQueue:
    """Dynamic batcher: gathers concurrent requests into engine-sized slabs.

    The worker blocks for the first request, then drains up to
    ``batch_size - 1`` more within ``max_wait_ms`` before running one padded
    slab — bounded added latency, maximal MXU occupancy under load."""

    def __init__(self, engine: FeatureEngine, max_wait_ms: float = 5.0,
                 max_history: int = 1024, max_depth: Optional[int] = None):
        """`max_depth`: bounded admission (load shedding) — submit() raises
        QueueFull once this many requests are waiting, so overload turns
        into fast 429s instead of unbounded latency. Default: 32 slabs'
        worth of requests."""
        self.engine = engine
        self.max_wait_s = max_wait_ms / 1e3
        self.max_depth = max_depth if max_depth is not None else 32 * engine.batch_size
        self._queue: deque = deque()
        self._cv = threading.Condition()
        self._closed = False
        self._latencies: deque = deque(maxlen=max_history)
        self._fills: deque = deque(maxlen=max_history)
        # guards the two history deques: the worker appends outside _cv, and
        # stats() iterates them (sorted/mean) — unsynchronized, a concurrent
        # append raises "deque mutated during iteration" mid-request
        self._stats_lock = threading.Lock()
        self._total_requests = 0
        self._total_batches = 0
        self._total_shed = 0
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def submit(self, volume: np.ndarray) -> _Pending:
        return self.submit_many([volume])[0]

    def submit_many(self, volumes) -> list:
        """Atomically admit a whole request's volumes — all or QueueFull.
        Partial admission would compute (then discard) the admitted prefix
        of a 429'd request, amplifying load exactly when shedding it.
        Validation/resizing runs in the CALLER's thread so a malformed
        request raises alone, never failing co-batched requests."""
        pendings = [_Pending(self.engine.prepare_one(v)) for v in volumes]
        with self._cv:
            if self._closed:
                raise RuntimeError("queue is closed")
            if len(self._queue) + len(pendings) > self.max_depth:
                self._total_shed += len(pendings)
                raise QueueFull(
                    f"serving queue at capacity ({len(self._queue)} waiting, "
                    f"request of {len(pendings)} > {self.max_depth} limit)"
                )
            self._queue.extend(pendings)
            self._total_requests += len(pendings)
            self._cv.notify()
        return pendings

    def infer_one(self, volume: np.ndarray, timeout: float = 120.0) -> np.ndarray:
        pending = self.submit(volume)
        if not pending.event.wait(timeout):
            raise TimeoutError("inference timed out")
        if pending.error is not None:
            raise pending.error
        return pending.result

    def _drain(self):
        """One slab's worth of requests (called with the lock held)."""
        batch = [self._queue.popleft()]
        deadline = time.time() + self.max_wait_s
        while len(batch) < self.engine.batch_size:
            remaining = deadline - time.time()
            if self._queue:
                batch.append(self._queue.popleft())
            elif remaining > 0 and not self._closed:
                self._cv.wait(remaining)
            else:
                break
        return batch

    def _run(self):
        while True:
            with self._cv:
                while not self._queue and not self._closed:
                    self._cv.wait()
                if not self._queue and self._closed:
                    return
                batch = self._drain()
            try:
                slab = np.stack([p.volume for p in batch])
                feats = self.engine.infer(slab)
                now = time.time()
                for p, f in zip(batch, feats):
                    p.result = f
                # record the batch's stats BEFORE waking any client: a caller
                # returning from infer_one() and immediately reading stats()
                # must see its own sample (ADVICE r4)
                with self._stats_lock:
                    for p in batch:
                        self._latencies.append(now - p.t_submit)
                    self._fills.append(len(batch) / self.engine.batch_size)
                self._total_batches += 1
                for p in batch:
                    p.event.set()
            except BaseException as e:  # deliver, don't kill the worker
                for p in batch:
                    p.error = e
                    p.event.set()

    def reset_stats(self) -> None:
        """Clear the latency/fill history (counters are kept).

        Lets a benchmark separate phases — e.g. drop unloaded warm-up
        samples before measuring loaded percentiles.
        """
        with self._stats_lock:
            self._latencies.clear()
            self._fills.clear()

    def stats(self) -> dict:
        with self._stats_lock:
            lat = sorted(self._latencies)
            fills = list(self._fills)
        pct = lambda q: lat[min(len(lat) - 1, int(q * len(lat)))] if lat else 0.0  # noqa: E731
        return {
            "total_requests": self._total_requests,
            "total_batches": self._total_batches,
            "total_shed": self._total_shed,
            "queue_depth": len(self._queue),
            "mean_batch_fill": float(np.mean(fills)) if fills else 0.0,
            "latency_p50_ms": round(pct(0.50) * 1e3, 3),
            "latency_p95_ms": round(pct(0.95) * 1e3, 3),
            "batch_size": self.engine.batch_size,
        }

    def close(self):
        with self._cv:
            self._closed = True
            self._cv.notify_all()
        self._worker.join(timeout=10)


def make_http_server(queue: Optional[BatchingQueue] = None,
                     host: str = "127.0.0.1", port: int = 8000,
                     classifier_queue: Optional[BatchingQueue] = None,
                     max_body_mb: int = 1024):
    """ThreadingHTTPServer over BatchingQueue(s).

    POST /features — body: ``.npy`` bytes of one (C,S,S,S) volume or an
    (N,C,S,S,S) stack; response: ``.npy`` bytes of (N,D) float32 features
    (requires `queue` over a FeatureEngine).
    POST /predict — same body; response: JSON {probs, pred, num_folds}
    (requires `classifier_queue` over a ClassifierEngine).
    GET /healthz — liveness; GET /stats — batching statistics JSON.
    Failure codes: 400 malformed request, 413 body over `max_body_mb`,
    429 queue at capacity (retry later), 500 server-side inference error,
    504 inference timeout."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    if max_body_mb < 1:
        # a zero/negative cap would also zero _drain_body's bound and bring
        # back the RST-eats-413 failure the drain exists to prevent
        raise ValueError(f"max_body_mb must be >= 1, got {max_body_mb}")

    class _Server(ThreadingHTTPServer):
        # join handler threads on server_close(): a SIGTERM drain must let
        # already-computed responses finish writing, not kill their threads
        daemon_threads = False
        block_on_close = True

    def _gather(q: BatchingQueue, arr: np.ndarray) -> np.ndarray:
        # admit the whole stack atomically (all-or-429) and only then wait,
        # so it batches as one (or a few) slabs rather than serialising
        pendings = q.submit_many(list(arr))
        out = []
        for p in pendings:
            if not p.event.wait(300):
                raise TimeoutError("inference timed out")
            if p.error is not None:
                raise p.error
            out.append(p.result)
        return np.stack(out)

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet by default; stats has the numbers
            pass

        def _json(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {"status": "ok"})
            elif self.path == "/stats":
                stats = {}
                if queue is not None:
                    stats["features"] = queue.stats()
                if classifier_queue is not None:
                    stats["predict"] = classifier_queue.stats()
                self._json(
                    200,
                    next(iter(stats.values())) if len(stats) == 1 else stats,
                )
            else:
                self._json(404, {"error": f"unknown path {self.path}"})

        def _drain_body(self):
            # Rejection paths that respond WITHOUT reading the body (413
            # over-cap, 404 unknown path): closing a socket
            # with unread request data makes the kernel send RST, and an RST
            # discards the client's receive buffer — destroying the error
            # response before the (still-sending) client can read it
            # (observed as client-side EPIPE under load). Discard the unread
            # remainder — bounded — so the close is graceful and the status
            # code is reliably delivered; an oversend beyond twice the cap
            # still gets the hard close rather than unbounded drain
            # bandwidth. Safe after a full read too: the consumed counter
            # makes the remainder zero, so this never blocks on a socket
            # with no data left.
            try:
                length = int(self.headers.get("Content-Length", 0))
                left = length - getattr(self, "_consumed", 0)
                if length > 2 * max_body_mb * 2**20:
                    return
                while left > 0:
                    chunk = self.rfile.read(min(left, 1 << 20))
                    if not chunk:
                        break
                    left -= len(chunk)
            except (OSError, ValueError):
                pass

        def _read_volumes(self, engine) -> np.ndarray:
            length = int(self.headers.get("Content-Length", 0))
            if length > max_body_mb * 2**20:
                raise _BodyTooLarge(
                    f"body {length} bytes > max_body_mb={max_body_mb}"
                )
            body = self.rfile.read(length)
            self._consumed = len(body)
            if body[:6] == b"\x93NUMPY":
                arr = np.load(io.BytesIO(body), allow_pickle=False)
            else:
                from vit_ae_plus_plus_tpu.utils.nifti import is_nifti, read_nifti

                if not is_nifti(body):
                    raise ValueError("body is neither .npy nor NIfTI-1")
                arr = read_nifti(body)
                if arr.ndim == 3:  # (x, y, z) -> single channel
                    arr = arr[None]
                elif arr.ndim == 4:  # (x, y, z, t) -> channels first
                    arr = arr.transpose(3, 0, 1, 2)
                else:
                    raise ValueError(f"NIfTI volume must be 3-D/4-D, got {arr.ndim}-D")
            if arr.ndim == len(engine.volume_shape):
                arr = arr[None]
            return arr

        def do_POST(self):
            self._consumed = 0
            try:
                if self.path == "/features" and queue is not None:
                    feats = _gather(queue, self._read_volumes(queue.engine))
                    buf = io.BytesIO()
                    np.save(buf, feats.astype(np.float32), allow_pickle=False)
                    body = buf.getvalue()
                    self.send_response(200)
                    self.send_header("Content-Type", "application/octet-stream")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                elif self.path == "/predict" and classifier_queue is not None:
                    eng = classifier_queue.engine
                    probs = _gather(classifier_queue, self._read_volumes(eng))
                    self._json(200, {
                        "probs": probs.tolist(),
                        "pred": probs.argmax(-1).tolist(),
                        "num_folds": eng.num_folds,
                    })
                else:
                    self._drain_body()  # rejected before the body was read
                    self._json(404, {"error": f"unknown path {self.path}"})
            except QueueFull as e:
                self._json(429, {"error": str(e)})  # shed load, retry later
            except _BodyTooLarge as e:
                self._drain_body()
                self._json(413, {"error": str(e)})
            except TimeoutError as e:
                self._json(504, {"error": str(e)})  # server-side: retryable
            except ValueError as e:  # malformed body/shape: client fault
                # no drain here: every body-content ValueError is raised
                # after a full read (nothing left to drain), and the one
                # pre-read case — a non-numeric Content-Length — leaves the
                # body length unknowable, so a bounded drain could block on
                # a still-open connection
                self._json(400, {"error": f"{type(e).__name__}: {e}"})
            except Exception as e:  # device/runtime failure: server fault
                self._json(500, {"error": f"{type(e).__name__}: {e}"})

    return _Server((host, port), Handler)


def build_engine(
    checkpoint_path: str,
    task: str = "features",
    model_name: str = "contr_mae_vit_base_patch16",
    volume_size: int = 96,
    in_chans: int = 1,
    patch_size: int = 8,
    batch_size: int = 8,
    compute_dtype: str = "bfloat16",
    quantize: str = "none",
    normalize: str = "none",
    num_classes: int = 2,
    ensemble_criterion: str = "ft",
    mesh=None,
    resize: bool = False,
):
    """Checkpoint(s) -> engine, dispatching on `task` exactly as `serve`
    does: 'features' builds a FeatureEngine; 'classify' builds a
    ClassifierEngine from comma-separated checkpoints, one checkpoint, or a
    finetune-kfold work dir (per-fold best-`ensemble_criterion` ensemble)."""
    import os

    if checkpoint_path is None:
        raise ValueError("need checkpoint_path (or engine_path)")
    if task == "classify":
        common = dict(
            model_name=model_name, volume_size=volume_size, in_chans=in_chans,
            patch_size=patch_size, batch_size=batch_size, num_classes=num_classes,
            compute_dtype=compute_dtype, quantize=quantize, normalize=normalize,
            mesh=mesh, resize=resize,
        )
        if "," in checkpoint_path:
            return ClassifierEngine(checkpoint_path.split(","), **common)
        if os.path.isdir(os.path.join(checkpoint_path, "checkpoints")):
            return ClassifierEngine.from_work_dir(
                checkpoint_path, criterion=ensemble_criterion, **common
            )
        return ClassifierEngine(checkpoint_path, **common)
    if task == "features":
        return FeatureEngine(
            checkpoint_path, model_name=model_name, volume_size=volume_size,
            in_chans=in_chans, patch_size=patch_size, batch_size=batch_size,
            compute_dtype=compute_dtype, quantize=quantize, normalize=normalize,
            mesh=mesh, resize=resize,
        )
    raise ValueError(f"task must be 'features'|'classify', got {task!r}")


def serve(
    checkpoint_path: Optional[str] = None,
    model_name: str = "contr_mae_vit_base_patch16",
    volume_size: int = 96,
    in_chans: int = 1,
    patch_size: int = 8,
    batch_size: int = 8,
    compute_dtype: str = "bfloat16",
    quantize: str = "none",
    normalize: str = "none",
    max_wait_ms: float = 5.0,
    host: str = "127.0.0.1",
    port: int = 8000,
    mesh=None,
    task: str = "features",
    num_classes: int = 2,
    ensemble_criterion: str = "ft",
    resize: bool = False,
    engine_path: Optional[str] = None,
    max_body_mb: int = 1024,
):
    """Build the engine, warm the serving shape, run the HTTP server.

    `task='features'`: SSL feature extraction from an MAE checkpoint
    (POST /features). `task='classify'`: class probabilities from
    fine-tuned classifier checkpoint(s) (POST /predict) —
    see `build_engine` for how `checkpoint_path` is interpreted.

    `engine_path`: load a precompiled `.vitae` artifact instead
    (serving_aot.py) — no model build, no trace, no compile; every other
    engine argument is ignored (the artifact carries its configuration,
    including the task)."""
    if engine_path is not None:
        from vit_ae_plus_plus_tpu.serving_aot import load_engine

        engine = load_engine(engine_path)
        task = engine.kind
        batch_size = engine.batch_size
        quantize = engine.quantize
    else:
        engine = build_engine(
            checkpoint_path, task=task, model_name=model_name,
            volume_size=volume_size, in_chans=in_chans, patch_size=patch_size,
            batch_size=batch_size, compute_dtype=compute_dtype,
            quantize=quantize, normalize=normalize, num_classes=num_classes,
            ensemble_criterion=ensemble_criterion, mesh=mesh, resize=resize,
        )
    endpoint = "POST /predict" if task == "classify" else "POST /features"
    t = engine.warmup()
    folds = f", {engine.num_folds}-fold ensemble" if task == "classify" else ""
    if engine_path is not None:
        print(f"AOT engine warm in {t:.1f}s — no compile "
              f"(batch {batch_size}, quantize={quantize}{folds})")
    else:
        print(f"serving shape compiled in {t:.1f}s "
              f"(batch {batch_size}, "
              f"{quantize if quantize != 'none' else compute_dtype}{folds})")
    queue = BatchingQueue(engine, max_wait_ms=max_wait_ms)
    kw = {"classifier_queue": queue} if task == "classify" else {"queue": queue}
    server = make_http_server(host=host, port=port, max_body_mb=max_body_mb, **kw)

    import signal

    def _stop(signum, _frame):
        # shutdown() must come from another thread (serve_forever holds this
        # one); queue.close() afterwards drains already-accepted requests
        print(f"signal {signum}: draining and shutting down", flush=True)
        threading.Thread(target=server.shutdown, daemon=True).start()

    # handler goes in BEFORE the readiness line: anyone scripting against
    # "listening on" may SIGTERM immediately after reading it
    prev = signal.signal(signal.SIGTERM, _stop)
    print(f"listening on http://{host}:{server.server_address[1]} "
          f"({endpoint}, GET /healthz, GET /stats)", flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        signal.signal(signal.SIGTERM, prev)
        server.shutdown()
        queue.close()  # drains already-accepted requests
        server.server_close()  # block_on_close: join handler threads so
        # computed responses finish writing before the process exits
        print("server stopped", flush=True)
