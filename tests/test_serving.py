"""Serving subsystem: fixed-shape engine padding, dynamic batching under
concurrency, and the HTTP front end — all on the tiny model, CPU."""

import io
import threading
import urllib.request

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vit_ae_plus_plus_tpu.models import MODEL_ZOO
from vit_ae_plus_plus_tpu.pipelines.probe_kfold import _mae_params_template
from vit_ae_plus_plus_tpu.serving import BatchingQueue, FeatureEngine, make_http_server
from vit_ae_plus_plus_tpu.train.checkpoint import save_params

VOL = 16
BATCH = 4


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    cfg = MODEL_ZOO["contr_mae_vit_tiny_patch4"](volume_size=VOL, in_chans=1)
    template = _mae_params_template(cfg, 42)
    rng = np.random.default_rng(3)
    params = jax.tree.map(
        lambda x: (rng.standard_normal(x.shape) * 0.05).astype(x.dtype), template
    )
    path = str(tmp_path_factory.mktemp("serve") / "ckpt")
    save_params(path, params)
    return path


@pytest.fixture(scope="module")
def engine(ckpt):
    eng = FeatureEngine(
        ckpt, model_name="contr_mae_vit_tiny_patch4", volume_size=VOL,
        in_chans=1, patch_size=4, batch_size=BATCH, compute_dtype="float32",
    )
    eng.warmup()
    return eng


def _vols(n, seed=0):
    return np.random.default_rng(seed).standard_normal(
        (n, 1, VOL, VOL, VOL)
    ).astype(np.float32)


def test_engine_partial_batch_matches_full(engine):
    """Padding must not leak into results: the first 2 rows of a full slab
    equal a 2-volume (padded) request."""
    vols = _vols(BATCH)
    full = engine.infer(vols)
    part = engine.infer(vols[:2])
    np.testing.assert_allclose(part, full[:2], rtol=1e-5, atol=1e-6)
    assert full.shape == (BATCH, engine.feature_dim)


def test_engine_multi_slab(engine):
    vols = _vols(2 * BATCH + 3, seed=1)
    out = engine.infer(vols)
    assert out.shape == (2 * BATCH + 3, engine.feature_dim)
    np.testing.assert_allclose(
        out[: BATCH], engine.infer(vols[:BATCH]), rtol=1e-5, atol=1e-6
    )


def test_engine_zscore_normalization(ckpt):
    eng = FeatureEngine(
        ckpt, model_name="contr_mae_vit_tiny_patch4", volume_size=VOL,
        in_chans=1, patch_size=4, batch_size=BATCH, compute_dtype="float32",
        normalize="zscore",
    )
    vols = _vols(2, seed=2) * 7.5 + 3.0
    want_in = (vols - vols.mean(axis=(-3, -2, -1), keepdims=True)) / vols.std(
        axis=(-3, -2, -1), keepdims=True
    )
    base = FeatureEngine(
        ckpt, model_name="contr_mae_vit_tiny_patch4", volume_size=VOL,
        in_chans=1, patch_size=4, batch_size=BATCH, compute_dtype="float32",
    )
    np.testing.assert_allclose(
        eng.infer(vols), base.infer(want_in), rtol=1e-5, atol=1e-6
    )


def test_engine_shape_validation(engine):
    with pytest.raises(ValueError, match="expected"):
        engine.infer(np.zeros((1, 2, VOL, VOL, VOL), np.float32))


def test_engine_resize_inputs(ckpt, engine):
    """resize=True trilinear-resamples mismatched spatial dims to the model
    size; the identity case is untouched and channel mismatches still fail."""
    import jax.image

    eng = FeatureEngine(
        ckpt, model_name="contr_mae_vit_tiny_patch4", volume_size=VOL,
        in_chans=1, patch_size=4, batch_size=BATCH, compute_dtype="float32",
        resize=True,
    )
    big = np.random.default_rng(9).standard_normal((2, 1, 24, 24, 24)).astype(np.float32)
    want_in = np.asarray(jax.image.resize(
        jnp.asarray(big), (2, 1, VOL, VOL, VOL), method="trilinear"
    ), np.float32)
    np.testing.assert_allclose(
        eng.infer(big), engine.infer(want_in), rtol=1e-5, atol=1e-6
    )
    same = _vols(2, seed=10)
    np.testing.assert_allclose(eng.infer(same), engine.infer(same),
                               rtol=1e-5, atol=1e-6)
    with pytest.raises(ValueError, match="channel"):
        eng.infer(np.zeros((1, 2, 24, 24, 24), np.float32))


def test_http_accepts_nifti_bodies(engine):
    """A gzipped single-file NIfTI-1 body is decoded (3-D -> one single-
    channel volume) and served identically to the equivalent .npy."""
    from vit_ae_plus_plus_tpu.utils.nifti import write_nifti

    q = BatchingQueue(engine, max_wait_ms=5.0)
    server = make_http_server(queue=q, host="127.0.0.1", port=0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        vol = _vols(1, seed=11)[0, 0]  # (S, S, S)
        import tempfile

        with tempfile.TemporaryDirectory() as d:
            path = f"{d}/v.nii.gz"
            write_nifti(path, vol)
            body = open(path, "rb").read()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/features", data=body, method="POST"
        )
        with urllib.request.urlopen(req) as r:
            feats = np.load(io.BytesIO(r.read()), allow_pickle=False)
        np.testing.assert_allclose(
            feats, engine.infer(vol[None, None]), rtol=1e-4, atol=1e-5
        )
    finally:
        server.shutdown()
        q.close()


def test_batching_queue_concurrent_parity_and_fill(engine):
    vols = _vols(2 * BATCH + 1, seed=4)
    want = engine.infer(vols)
    q = BatchingQueue(engine, max_wait_ms=20.0)
    try:
        results = [None] * len(vols)

        def work(i):
            results[i] = q.infer_one(vols[i])

        threads = [threading.Thread(target=work, args=(i,)) for i in range(len(vols))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        for i in range(len(vols)):
            np.testing.assert_allclose(results[i], want[i], rtol=1e-5, atol=1e-6,
                                       err_msg=str(i))
        stats = q.stats()
        assert stats["total_requests"] == len(vols)
        # concurrency must have produced multi-request slabs
        assert stats["total_batches"] < len(vols)
        assert 0 < stats["mean_batch_fill"] <= 1.0
        assert stats["latency_p95_ms"] >= stats["latency_p50_ms"] > 0
    finally:
        q.close()


def test_batching_queue_delivers_errors(engine):
    q = BatchingQueue(engine, max_wait_ms=1.0)
    try:
        with pytest.raises(ValueError):
            q.infer_one(np.zeros((2, VOL, VOL, VOL), np.float32))  # wrong C
        # the worker must survive an erroring slab
        out = q.infer_one(_vols(1)[0])
        assert out.shape == (engine.feature_dim,)
    finally:
        q.close()


def test_bad_request_cannot_poison_a_cobatched_slab(ckpt, engine):
    """submit() validates in the caller's thread: a malformed request raises
    alone while a concurrent valid request still succeeds, and with
    resize=True two DIFFERENT-sized valid requests co-batch correctly."""
    eng = FeatureEngine(
        ckpt, model_name="contr_mae_vit_tiny_patch4", volume_size=VOL,
        in_chans=1, patch_size=4, batch_size=BATCH, compute_dtype="float32",
        resize=True,
    )
    q = BatchingQueue(eng, max_wait_ms=50.0)
    try:
        results, errors = {}, {}

        def good(i, vol):
            try:
                results[i] = q.infer_one(vol)
            except BaseException as e:  # pragma: no cover
                errors[i] = e

        def bad():
            try:
                q.infer_one(np.zeros((2, VOL, VOL, VOL), np.float32))
            except ValueError as e:
                errors["bad"] = e

        v_native = _vols(1, seed=20)[0]
        v_small = np.random.default_rng(21).standard_normal(
            (1, 10, 10, 10)
        ).astype(np.float32)
        threads = [
            threading.Thread(target=good, args=(0, v_native)),
            threading.Thread(target=bad),
            threading.Thread(target=good, args=(1, v_small)),
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert "bad" in errors and isinstance(errors["bad"], ValueError)
        assert 0 in results and 1 in results  # valid requests unharmed
        np.testing.assert_allclose(
            results[1], eng.infer(v_small[None])[0], rtol=1e-5, atol=1e-6
        )
    finally:
        q.close()


def test_queue_sheds_load_at_max_depth(engine):
    """Bounded admission: past max_depth submit() raises QueueFull (HTTP
    429), the queue still drains everything it accepted, and stats count
    the shed requests."""
    import time as _time

    from vit_ae_plus_plus_tpu.serving import QueueFull

    q = BatchingQueue(engine, max_wait_ms=1.0, max_depth=3)
    try:
        vols = _vols(6, seed=13)
        q.infer_one(vols[5])  # worker warm and idle
        with engine._lock:  # stall the device: the worker blocks in infer
            first = q.submit(vols[0])
            _time.sleep(0.3)  # worker pops it into a slab, hits the lock
            accepted = [q.submit(vols[i]) for i in (1, 2, 3)]  # queue -> 3
            with pytest.raises(QueueFull, match="capacity"):
                q.submit(vols[4])
        for p in [first, *accepted]:  # accepted work still completes
            assert p.event.wait(120) and p.error is None
        stats = q.stats()
        assert stats["total_shed"] == 1 and stats["total_requests"] == 5
        # capacity frees up as the queue drains
        out = q.infer_one(vols[4])
        assert out.shape == (engine.feature_dim,)
    finally:
        q.close()


def test_submit_many_is_atomic(engine):
    """A multi-volume request over remaining capacity sheds WHOLE (no
    admitted prefix to compute-then-discard)."""
    from vit_ae_plus_plus_tpu.serving import QueueFull

    q = BatchingQueue(engine, max_wait_ms=1.0, max_depth=2)
    try:
        q.infer_one(_vols(1)[0])  # worker warm and idle
        with engine._lock:
            stalled = q.submit(_vols(1, seed=30)[0])
            import time as _time

            _time.sleep(0.3)  # worker holds it, blocked on the engine
            with pytest.raises(QueueFull):
                q.submit_many(list(_vols(3, seed=31)))  # 3 > depth 2: all shed
            assert q.stats()["queue_depth"] == 0  # nothing admitted
            ok = q.submit_many(list(_vols(2, seed=32)))  # exactly fits
        assert stalled.event.wait(120) and stalled.error is None
        for p in ok:
            assert p.event.wait(120) and p.error is None
        assert q.stats()["total_shed"] == 3
    finally:
        q.close()


def test_http_body_size_cap(engine):
    q = BatchingQueue(engine, max_wait_ms=1.0)
    server = make_http_server(queue=q, host="127.0.0.1", port=0, max_body_mb=1)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        big = np.zeros((80, 1, VOL, VOL, VOL), np.float32)  # ~1.3 MB body
        buf = io.BytesIO()
        np.save(buf, big, allow_pickle=False)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/features", data=buf.getvalue(), method="POST"
        )
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req)
        assert exc.value.code == 413
        # under the cap still serves
        small = _vols(1, seed=33)
        buf = io.BytesIO()
        np.save(buf, small, allow_pickle=False)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/features", data=buf.getvalue(), method="POST"
        )
        with urllib.request.urlopen(req) as r:
            assert r.status == 200
    finally:
        server.shutdown()
        server.server_close()
        q.close()


def test_http_body_cap_delivered_while_client_still_sending(engine):
    """413 must reach a client that is still mid-send. The body here exceeds
    what loopback socket buffers can absorb, so without the server-side
    bounded drain (serving.py Handler._drain_body) the close-with-unread-data
    RSTs the connection and the client sees EPIPE/ECONNRESET instead of the
    status code (this happened nondeterministically under CPU load with
    buffer-sized bodies)."""
    q = BatchingQueue(engine, max_wait_ms=1.0)
    server = make_http_server(queue=q, host="127.0.0.1", port=0, max_body_mb=16)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        body = b"\x00" * (24 * 2**20)  # 1.5x the cap, inside the 2x drain bound
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/features", data=body, method="POST"
        )
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req)
        assert exc.value.code == 413
        # the 404 path also rejects before reading: same RST hazard, same drain
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/nosuchpath",
            data=b"\x00" * (8 * 2**20), method="POST"
        )
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req)
        assert exc.value.code == 404
    finally:
        server.shutdown()
        server.server_close()
        q.close()


def test_http_server_rejects_nonpositive_body_cap(engine):
    q = BatchingQueue(engine, max_wait_ms=1.0)
    try:
        with pytest.raises(ValueError, match="max_body_mb"):
            make_http_server(queue=q, host="127.0.0.1", port=0, max_body_mb=0)
    finally:
        q.close()


def test_stats_endpoint_with_no_queues_returns_empty():
    import json

    server = make_http_server(host="127.0.0.1", port=0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/stats") as r:
            assert json.loads(r.read()) == {}
    finally:
        server.shutdown()


def test_from_work_dir_skips_orbax_temp_dirs(ft_work_dir):
    import os

    from vit_ae_plus_plus_tpu.serving import ClassifierEngine

    work, _ = ft_work_dir
    tmp = os.path.join(
        work, "checkpoints", "checkpoint-best_ft_model_0.orbax-checkpoint-tmp-123"
    )
    os.makedirs(tmp, exist_ok=True)
    try:
        eng = ClassifierEngine.from_work_dir(
            work, model_name="contr_mae_vit_tiny_patch4", volume_size=VOL,
            in_chans=1, patch_size=4, batch_size=BATCH, compute_dtype="float32",
        )
        assert eng.num_folds == 2  # the temp dir did not crash or count
    finally:
        os.rmdir(tmp)


def test_engine_on_data_mesh_matches_single_device(ckpt, engine):
    """Scale-out serving: slabs shard over the mesh 'data' axis and match
    the single-device engine exactly."""
    from vit_ae_plus_plus_tpu.parallel import make_mesh

    mesh = make_mesh(data=8)
    eng = FeatureEngine(
        ckpt, model_name="contr_mae_vit_tiny_patch4", volume_size=VOL,
        in_chans=1, patch_size=4, batch_size=8, compute_dtype="float32",
        mesh=mesh,
    )
    vols = _vols(11, seed=6)  # one full + one padded slab
    np.testing.assert_allclose(
        eng.infer(vols), engine.infer(vols), rtol=1e-5, atol=1e-6
    )
    with pytest.raises(ValueError, match="divide"):
        FeatureEngine(
            ckpt, model_name="contr_mae_vit_tiny_patch4", volume_size=VOL,
            in_chans=1, patch_size=4, batch_size=6, compute_dtype="float32",
            mesh=mesh,
        )


@pytest.fixture(scope="module")
def ft_work_dir(tmp_path_factory):
    """A finetune-kfold-shaped work dir: 2 per-fold best classifier ckpts."""
    cfg = MODEL_ZOO["contr_mae_vit_tiny_patch4"](volume_size=VOL, in_chans=1)
    vit_cfg = cfg.encoder_vit_config(num_classes=2, global_pool=True)
    from vit_ae_plus_plus_tpu.models import build_model

    model = build_model(vit_cfg)
    v = jnp.zeros((1, 1, VOL, VOL, VOL))
    work = tmp_path_factory.mktemp("ftwork")
    (work / "checkpoints").mkdir()
    params_list = []
    for fold in range(2):
        params = model.init({"params": jax.random.PRNGKey(fold)}, v)["params"]
        params = jax.tree.map(
            lambda x, f=fold: x + 0.01 * (f + 1) * np.sign(
                np.random.default_rng(f).standard_normal(x.shape)
            ).astype(x.dtype),
            params,
        )
        save_params(str(work / "checkpoints" / f"checkpoint-best_ft_model_{fold}"),
                    jax.device_get(params))
        params_list.append(jax.device_get(params))
    return str(work), params_list


def test_classifier_ensemble_is_fold_mean_softmax(ft_work_dir):
    from vit_ae_plus_plus_tpu.serving import ClassifierEngine

    work, params_list = ft_work_dir
    common = dict(model_name="contr_mae_vit_tiny_patch4", volume_size=VOL,
                  in_chans=1, patch_size=4, batch_size=BATCH,
                  compute_dtype="float32")
    ens = ClassifierEngine.from_work_dir(work, **common)
    assert ens.num_folds == 2
    vols = _vols(3, seed=7)
    probs = ens.infer(vols)
    assert probs.shape == (3, 2)
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-5)
    # ensemble == mean of the single-fold engines
    singles = [
        ClassifierEngine(None, vit_params_list=[p], **common).infer(vols)
        for p in params_list
    ]
    np.testing.assert_allclose(
        probs, np.mean(singles, axis=0), rtol=1e-5, atol=1e-6
    )


def test_classifier_int8_tracks_f32(ft_work_dir):
    """quantize='int8' classify: int8 trunk + f32 head; fold-mean probs must
    track the f32 engine closely (same bar as the int8 extraction engine)."""
    from vit_ae_plus_plus_tpu.serving import ClassifierEngine

    work, _ = ft_work_dir
    common = dict(model_name="contr_mae_vit_tiny_patch4", volume_size=VOL,
                  in_chans=1, patch_size=4, batch_size=BATCH,
                  compute_dtype="float32")
    f32 = ClassifierEngine.from_work_dir(work, **common)
    q = ClassifierEngine.from_work_dir(work, quantize="int8", **common)
    vols = _vols(4, seed=12)
    p_f32, p_q = f32.infer(vols), q.infer(vols)
    assert p_q.shape == p_f32.shape
    np.testing.assert_allclose(p_q.sum(-1), 1.0, rtol=1e-4)
    # int8 quantization noise must not flip the fold-mean probabilities far
    assert np.max(np.abs(p_q - p_f32)) < 0.05
    assert (p_q.argmax(-1) == p_f32.argmax(-1)).all()


def test_classifier_http_predict(ft_work_dir):
    import json

    from vit_ae_plus_plus_tpu.serving import ClassifierEngine

    work, _ = ft_work_dir
    eng = ClassifierEngine.from_work_dir(
        work, model_name="contr_mae_vit_tiny_patch4", volume_size=VOL,
        in_chans=1, patch_size=4, batch_size=BATCH, compute_dtype="float32",
    )
    q = BatchingQueue(eng, max_wait_ms=5.0)
    server = make_http_server(classifier_queue=q, host="127.0.0.1", port=0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        vols = _vols(2, seed=8)
        buf = io.BytesIO()
        np.save(buf, vols, allow_pickle=False)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=buf.getvalue(), method="POST"
        )
        with urllib.request.urlopen(req) as r:
            out = json.loads(r.read())
        assert out["num_folds"] == 2
        np.testing.assert_allclose(
            np.asarray(out["probs"]), eng.infer(vols), rtol=1e-5, atol=1e-6
        )
        assert out["pred"] == list(np.asarray(out["probs"]).argmax(-1))
        # /features is not served on a classifier-only server
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/features", data=buf.getvalue(), method="POST"
        )
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req)
        assert exc.value.code == 404
    finally:
        server.shutdown()
        q.close()


def test_serve_cli_drains_on_sigterm(ckpt):
    """The serve CLI must exit cleanly (code 0, 'server stopped') on SIGTERM
    — the production kill path."""
    import os
    import signal
    import subprocess
    import sys
    import time as _time

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.Popen(
        [sys.executable, "-m", "vit_ae_plus_plus_tpu.cli", "serve",
         "--checkpoint", ckpt, "--model", "contr_mae_vit_tiny_patch4",
         "--volume-size", str(VOL), "--patch-size", "4", "--in-channels", "1",
         "--batch-size", "2", "--compute-dtype", "float32", "--port", "0"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True,
    )
    try:
        deadline = _time.time() + 240
        lines = []
        while _time.time() < deadline:
            line = proc.stdout.readline()
            lines.append(line)
            if "listening on" in line:
                break
        else:
            pytest.fail("server never came up: " + "".join(lines[-5:]))
        proc.send_signal(signal.SIGTERM)
        out, _ = proc.communicate(timeout=60)
        assert proc.returncode == 0, out
        assert "server stopped" in out
    finally:
        if proc.poll() is None:
            proc.kill()


def test_http_server_end_to_end(engine):
    q = BatchingQueue(engine, max_wait_ms=5.0)
    server = make_http_server(q, host="127.0.0.1", port=0)
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz") as r:
            assert b"ok" in r.read()

        vols = _vols(3, seed=5)
        buf = io.BytesIO()
        np.save(buf, vols, allow_pickle=False)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/features", data=buf.getvalue(), method="POST"
        )
        with urllib.request.urlopen(req) as r:
            feats = np.load(io.BytesIO(r.read()), allow_pickle=False)
        np.testing.assert_allclose(feats, engine.infer(vols), rtol=1e-5, atol=1e-6)

        # single unbatched volume body also accepted
        buf = io.BytesIO()
        np.save(buf, vols[0], allow_pickle=False)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/features", data=buf.getvalue(), method="POST"
        )
        with urllib.request.urlopen(req) as r:
            one = np.load(io.BytesIO(r.read()), allow_pickle=False)
        assert one.shape == (1, engine.feature_dim)

        with urllib.request.urlopen(f"http://127.0.0.1:{port}/stats") as r:
            import json

            stats = json.loads(r.read())
        assert stats["total_requests"] >= 4

        # malformed body -> 400, not a dead server
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/features", data=b"not-an-npy", method="POST"
        )
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req)
        assert exc.value.code == 400
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz") as r:
            assert b"ok" in r.read()
    finally:
        server.shutdown()
        q.close()
