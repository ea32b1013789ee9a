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
- ``FeatureServer``: a stdlib ThreadingHTTPServer front end —
  ``POST /features`` with an ``.npy`` body, ``GET /healthz``,
  ``GET /stats`` — exposed as the ``serve`` CLI subcommand.

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


class FeatureEngine:
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
    ):
        """`mesh`: an optional ('data', ...) jax.sharding.Mesh — serving slabs
        shard over its 'data' axis (scale-out serving across chips; the slab
        batch size must divide the axis). `mae_params` bypasses the
        checkpoint load with an in-memory MAE param tree (benchmarks)."""
        from vit_ae_plus_plus_tpu.models import MODEL_ZOO, build_model
        from vit_ae_plus_plus_tpu.pipelines.probe_kfold import _mae_params_template
        from vit_ae_plus_plus_tpu.pipelines.transfer import mae_params_to_vit
        from vit_ae_plus_plus_tpu.train.checkpoint import load_params
        from vit_ae_plus_plus_tpu.train.step import make_feature_step

        if normalize not in ("none", "zscore"):
            raise ValueError(f"normalize must be 'none'|'zscore', got {normalize!r}")
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
                    f"serving batch_size {batch_size} must divide the mesh's "
                    f"data axis ({n_data})"
                )
        if quantize == "int8":
            from vit_ae_plus_plus_tpu.models.quant import make_quant_feature_step

            qstep = make_quant_feature_step(vit_cfg, params, mesh=mesh)
            self._step = lambda batch: qstep(batch)
        elif quantize == "none":
            fstep = make_feature_step(vit_model, mesh=mesh)
            if mesh is not None:
                from vit_ae_plus_plus_tpu.parallel.mesh import replicate

                params = replicate(params, mesh)
            variables = {"params": params}
            self._step = lambda batch: fstep(variables, batch)
        else:
            raise ValueError(f"quantize must be 'none'|'int8', got {quantize!r}")
        self.mesh = mesh

        self.batch_size = int(batch_size)
        self.volume_shape = (in_chans, s, s, s)
        self.normalize = normalize
        self.feature_dim = mae_cfg.embed_dim
        self._lock = threading.Lock()  # jax dispatch: one slab at a time

    def _normalize(self, v: np.ndarray) -> np.ndarray:
        if self.normalize == "zscore":
            # per-channel z-score over spatial dims (data/brats.py:26-32 /
            # egd.py:44-47 semantics; identical for C=1)
            mean = v.mean(axis=(-3, -2, -1), keepdims=True)
            std = v.std(axis=(-3, -2, -1), keepdims=True)
            v = (v - mean) / np.maximum(std, 1e-8)
        return v

    def warmup(self) -> float:
        """Compile the serving shape; returns compile+run seconds."""
        t0 = time.time()
        slab = np.zeros((self.batch_size, *self.volume_shape), np.float32)
        np.asarray(self._step(jnp.asarray(slab)))
        return time.time() - t0

    def infer(self, volumes: np.ndarray) -> np.ndarray:
        """(N, C, S, S, S) -> (N, D) float32 features, any N >= 1 (slabs of
        ``batch_size`` padded with repeats — static shapes, no recompiles)."""
        volumes = np.asarray(volumes, np.float32)
        if volumes.shape[1:] != self.volume_shape:
            raise ValueError(
                f"expected (N, {', '.join(map(str, self.volume_shape))}), "
                f"got {volumes.shape}"
            )
        volumes = self._normalize(volumes)
        outs = []
        b = self.batch_size
        with self._lock:
            for i in range(0, volumes.shape[0], b):
                chunk = volumes[i:i + b]
                n = chunk.shape[0]
                if n < b:
                    chunk = np.concatenate([chunk, np.repeat(chunk[:1], b - n, axis=0)])
                out = self._step(jnp.asarray(chunk))
                outs.append(np.asarray(out[:n], dtype=np.float32))
        return np.concatenate(outs)


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
                 max_history: int = 1024):
        self.engine = engine
        self.max_wait_s = max_wait_ms / 1e3
        self._queue: deque = deque()
        self._cv = threading.Condition()
        self._closed = False
        self._latencies: deque = deque(maxlen=max_history)
        self._fills: deque = deque(maxlen=max_history)
        self._total_requests = 0
        self._total_batches = 0
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def submit(self, volume: np.ndarray) -> _Pending:
        pending = _Pending(np.asarray(volume, np.float32))
        with self._cv:
            if self._closed:
                raise RuntimeError("queue is closed")
            self._queue.append(pending)
            self._total_requests += 1
            self._cv.notify()
        return pending

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
                    self._latencies.append(now - p.t_submit)
                    p.event.set()
                self._fills.append(len(batch) / self.engine.batch_size)
                self._total_batches += 1
            except BaseException as e:  # deliver, don't kill the worker
                for p in batch:
                    p.error = e
                    p.event.set()

    def stats(self) -> dict:
        lat = sorted(self._latencies)
        pct = lambda q: lat[min(len(lat) - 1, int(q * len(lat)))] if lat else 0.0  # noqa: E731
        return {
            "total_requests": self._total_requests,
            "total_batches": self._total_batches,
            "mean_batch_fill": float(np.mean(self._fills)) if self._fills else 0.0,
            "latency_p50_ms": round(pct(0.50) * 1e3, 3),
            "latency_p95_ms": round(pct(0.95) * 1e3, 3),
            "batch_size": self.engine.batch_size,
        }

    def close(self):
        with self._cv:
            self._closed = True
            self._cv.notify_all()
        self._worker.join(timeout=10)


def make_http_server(queue: BatchingQueue, host: str = "127.0.0.1", port: int = 8000):
    """ThreadingHTTPServer over a BatchingQueue.

    POST /features — body: ``.npy`` bytes of one (C,S,S,S) volume or an
    (N,C,S,S,S) stack; response: ``.npy`` bytes of (N,D) float32 features.
    GET /healthz — liveness; GET /stats — batching statistics JSON."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

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
                self._json(200, queue.stats())
            else:
                self._json(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            if self.path != "/features":
                self._json(404, {"error": f"unknown path {self.path}"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                arr = np.load(io.BytesIO(self.rfile.read(length)), allow_pickle=False)
                if arr.ndim == len(queue.engine.volume_shape):
                    arr = arr[None]
                # submit the whole stack before waiting so it batches as one
                # (or a few) slabs rather than serialising volume-by-volume
                pendings = [queue.submit(v) for v in arr]
                for p in pendings:
                    if not p.event.wait(300):
                        raise TimeoutError("inference timed out")
                    if p.error is not None:
                        raise p.error
                feats = np.stack([p.result for p in pendings])
                buf = io.BytesIO()
                np.save(buf, feats.astype(np.float32), allow_pickle=False)
                body = buf.getvalue()
                self.send_response(200)
                self.send_header("Content-Type", "application/octet-stream")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            except Exception as e:
                self._json(400, {"error": f"{type(e).__name__}: {e}"})

    return ThreadingHTTPServer((host, port), Handler)


def serve(
    checkpoint_path: str,
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
):
    """Build the engine, warm the serving shape, run the HTTP server."""
    engine = FeatureEngine(
        checkpoint_path, model_name=model_name, volume_size=volume_size,
        in_chans=in_chans, patch_size=patch_size, batch_size=batch_size,
        compute_dtype=compute_dtype, quantize=quantize, normalize=normalize,
        mesh=mesh,
    )
    t = engine.warmup()
    print(f"serving shape compiled in {t:.1f}s "
          f"(batch {batch_size}, {quantize if quantize != 'none' else compute_dtype})")
    queue = BatchingQueue(engine, max_wait_ms=max_wait_ms)
    server = make_http_server(queue, host=host, port=port)
    print(f"listening on http://{host}:{server.server_address[1]} "
          f"(POST /features, GET /healthz, GET /stats)")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.shutdown()
        queue.close()
