"""AOT engine artifacts (serving_aot.py): save/load roundtrip parity for the
feature, int8 and classifier-ensemble engines, the platform-fingerprint
guard, and the CLI + HTTP path — all on the tiny model, CPU."""

import io
import json
import threading
import urllib.request
import zipfile

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vit_ae_plus_plus_tpu.models import MODEL_ZOO, build_model
from vit_ae_plus_plus_tpu.pipelines.probe_kfold import _mae_params_template
from vit_ae_plus_plus_tpu.serving import ClassifierEngine, FeatureEngine
from vit_ae_plus_plus_tpu.serving_aot import load_engine, save_engine
from vit_ae_plus_plus_tpu.train.checkpoint import save_params

VOL = 16
BATCH = 4
COMMON = dict(
    model_name="contr_mae_vit_tiny_patch4", volume_size=VOL, in_chans=1,
    patch_size=4, batch_size=BATCH, compute_dtype="float32",
)


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    cfg = MODEL_ZOO["contr_mae_vit_tiny_patch4"](volume_size=VOL, in_chans=1)
    template = _mae_params_template(cfg, 42)
    rng = np.random.default_rng(3)
    params = jax.tree.map(
        lambda x: (rng.standard_normal(x.shape) * 0.05).astype(x.dtype), template
    )
    path = str(tmp_path_factory.mktemp("aot") / "ckpt")
    save_params(path, params)
    return path


def _vols(n, seed=0):
    return np.random.default_rng(seed).standard_normal(
        (n, 1, VOL, VOL, VOL)
    ).astype(np.float32)


def test_feature_engine_roundtrip(ckpt, tmp_path):
    eng = FeatureEngine(ckpt, **COMMON)
    path = str(tmp_path / "eng.vitae")
    meta = save_engine(eng, path)
    assert meta["kind"] == "features" and meta["batch_size"] == BATCH

    loaded = load_engine(path)
    assert loaded.feature_dim == eng.feature_dim
    assert loaded.volume_shape == eng.volume_shape
    vols = _vols(BATCH + 2, seed=1)  # one full + one padded slab
    np.testing.assert_allclose(
        loaded.infer(vols), eng.infer(vols), rtol=1e-5, atol=1e-6
    )
    # warmup on a loaded engine is a plain run, and fast
    assert loaded.warmup() >= 0.0


def test_feature_engine_int8_roundtrip(ckpt, tmp_path):
    eng = FeatureEngine(ckpt, quantize="int8", **COMMON)
    path = str(tmp_path / "eng8.vitae")
    meta = save_engine(eng, path)
    assert meta["quantize"] == "int8"
    loaded = load_engine(path)
    vols = _vols(3, seed=2)
    np.testing.assert_allclose(
        loaded.infer(vols), eng.infer(vols), rtol=1e-5, atol=1e-6
    )


@pytest.fixture(scope="module")
def fold_params():
    cfg = MODEL_ZOO["contr_mae_vit_tiny_patch4"](volume_size=VOL, in_chans=1)
    vit_cfg = cfg.encoder_vit_config(num_classes=2, global_pool=True)
    model = build_model(vit_cfg)
    v = jnp.zeros((1, 1, VOL, VOL, VOL))
    out = []
    for fold in range(2):
        params = model.init({"params": jax.random.PRNGKey(fold)}, v)["params"]
        out.append(jax.device_get(params))
    return out


def test_classifier_ensemble_roundtrip(fold_params, tmp_path):
    eng = ClassifierEngine(None, vit_params_list=fold_params, **COMMON)
    path = str(tmp_path / "clf.vitae")
    meta = save_engine(eng, path)
    assert meta["kind"] == "classify" and meta["num_folds"] == 2
    loaded = load_engine(path)
    assert loaded.num_folds == 2 and loaded.num_classes == 2
    vols = _vols(BATCH + 1, seed=3)
    want = eng.infer(vols)
    got = loaded.infer(vols)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(got.sum(-1), 1.0, rtol=1e-5)


def test_fingerprint_mismatch_rejected(ckpt, tmp_path):
    eng = FeatureEngine(ckpt, **COMMON)
    path = str(tmp_path / "eng.vitae")
    save_engine(eng, path)
    # tamper the platform fingerprint: a TPU-built artifact must not load here
    with zipfile.ZipFile(path) as zf:
        meta = json.loads(zf.read("meta.json"))
        items = {n: zf.read(n) for n in zf.namelist() if n != "meta.json"}
    meta["device_kind"] = "TPU v5e"
    meta["platform"] = "tpu"
    bad = str(tmp_path / "bad.vitae")
    with zipfile.ZipFile(bad, "w") as zf:
        zf.writestr("meta.json", json.dumps(meta))
        for n, b in items.items():
            zf.writestr(n, b)
    with pytest.raises(RuntimeError, match="compiled for"):
        load_engine(bad)


def test_legacy_pickled_format_rejected(ckpt, tmp_path):
    """Format-1 artifacts carried a pickled state blob; the loader must
    refuse them (and any artifact containing state.pkl) rather than
    unpickle attacker-controllable weight payloads."""
    eng = FeatureEngine(ckpt, **COMMON)
    path = str(tmp_path / "eng.vitae")
    save_engine(eng, path)
    with zipfile.ZipFile(path) as zf:
        meta = json.loads(zf.read("meta.json"))
        items = {n: zf.read(n) for n in zf.namelist() if n != "meta.json"}
    # (a) a version-1 header is refused
    meta_v1 = dict(meta, format_version=1)
    legacy = str(tmp_path / "legacy.vitae")
    with zipfile.ZipFile(legacy, "w") as zf:
        zf.writestr("meta.json", json.dumps(meta_v1))
        for n, b in items.items():
            zf.writestr(n, b)
    with pytest.raises(RuntimeError, match="version-1 artifacts"):
        load_engine(legacy)
    # (b) a pickled-state member is refused even under a v2 header
    smuggle = str(tmp_path / "smuggle.vitae")
    with zipfile.ZipFile(smuggle, "w") as zf:
        zf.writestr("meta.json", json.dumps(meta))
        zf.writestr("state.pkl", b"\x80\x04.")
        for n, b in items.items():
            zf.writestr(n, b)
    with pytest.raises(RuntimeError, match="pickled"):
        load_engine(smuggle)


def test_artifact_weights_are_not_pickled(ckpt, tmp_path):
    """The v2 container stores weights/metadata/trees in non-executable
    segments: JSON + npz (loadable with allow_pickle=False) + pytree
    protos. Only executable.bin remains a (documented) trust boundary."""
    eng = FeatureEngine(ckpt, **COMMON)
    path = str(tmp_path / "eng.vitae")
    save_engine(eng, path)
    with zipfile.ZipFile(path) as zf:
        names = set(zf.namelist())
        assert names == {
            "meta.json", "executable.bin", "weights.npz",
            "args_tree.pb", "in_tree.pb", "out_tree.pb",
        }
        # every weight array must load under allow_pickle=False
        with np.load(io.BytesIO(zf.read("weights.npz")), allow_pickle=False) as z:
            assert len(z.files) > 0
            for k in z.files:
                assert z[k].dtype.hasobject is False
        # a corrupted (short) weight payload fails loudly, not silently
        meta = json.loads(zf.read("meta.json"))
        assert meta["format_version"] == 2
        assert len(meta["weight_dtypes"]) == len(z.files)


def test_mesh_engine_refused(ckpt, tmp_path):
    from vit_ae_plus_plus_tpu.parallel import make_mesh

    eng = FeatureEngine(ckpt, mesh=make_mesh(data=8), **{**COMMON, "batch_size": 8})
    with pytest.raises(NotImplementedError, match="single-device"):
        save_engine(eng, str(tmp_path / "mesh.vitae"))


def test_cli_compile_engine_then_serve_http(ckpt, tmp_path):
    """compile-engine writes the artifact; an HTTP server over the loaded
    engine answers /features identically to the directly-built engine."""
    from vit_ae_plus_plus_tpu.cli import main
    from vit_ae_plus_plus_tpu.serving import BatchingQueue, make_http_server

    out = str(tmp_path / "cli.vitae")
    rc = main([
        "compile-engine", "--checkpoint", ckpt, "--out", out,
        "--model", "contr_mae_vit_tiny_patch4", "--volume-size", str(VOL),
        "--patch-size", "4", "--batch-size", str(BATCH),
        "--compute-dtype", "float32",
    ])
    assert rc == 0

    loaded = load_engine(out)
    q = BatchingQueue(loaded, max_wait_ms=5.0)
    server = make_http_server(queue=q, host="127.0.0.1", port=0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        vols = _vols(2, seed=5)
        buf = io.BytesIO()
        np.save(buf, vols, allow_pickle=False)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/features", data=buf.getvalue(),
            method="POST",
        )
        with urllib.request.urlopen(req) as r:
            feats = np.load(io.BytesIO(r.read()), allow_pickle=False)
        ref = FeatureEngine(ckpt, **COMMON).infer(vols)
        np.testing.assert_allclose(feats, ref, rtol=1e-5, atol=1e-6)
    finally:
        server.shutdown()
        q.close()
