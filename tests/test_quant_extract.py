"""int8 extraction engine (models/quant.py): exact wiring parity in f32 mode,
feature quality in int8 mode, and the jitted step."""

import numpy as np
import jax
import jax.numpy as jnp

from vit_ae_plus_plus_tpu.configs import ViTConfig
from vit_ae_plus_plus_tpu.models.quant import (
    make_quant_feature_step,
    quant_forward_features,
    quantize_dense,
    quantize_params,
)
from vit_ae_plus_plus_tpu.models.vit import VisionTransformer3D

CFG = ViTConfig(
    volume_size=16, patch_size=4, in_chans=1, embed_dim=32, depth=2, num_heads=4,
    num_classes=0, global_pool=True, attn_impl="xla", dtype="float32",
)


def _setup():
    model = VisionTransformer3D(CFG)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 1, 16, 16, 16))
    params = model.init({"params": jax.random.PRNGKey(1)}, x)["params"]
    return model, params, x


def test_quantize_dense_roundtrip():
    k = jax.random.normal(jax.random.PRNGKey(2), (64, 32))
    w8, scale = quantize_dense(k)
    assert w8.dtype == jnp.int8 and scale.shape == (32,)
    deq = w8.astype(jnp.float32) * scale
    # symmetric absmax per channel: max error is half a quantization step
    assert float(jnp.max(jnp.abs(deq - k))) <= float(jnp.max(scale)) * 0.5 + 1e-6


def test_unquantized_engine_matches_module_exactly():
    model, params, x = _setup()
    want = model.apply({"params": params}, x, method=model.forward_features)
    got = quant_forward_features(params, CFG, x, quantized=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_int8_features_track_f32():
    model, params, x = _setup()
    want = np.asarray(
        model.apply({"params": params}, x, method=model.forward_features)
    )
    qp = quantize_params(params)
    got = np.asarray(quant_forward_features(qp, CFG, x, quantized=True))
    # per-sample cosine similarity of the feature vectors
    cos = np.sum(got * want, -1) / (
        np.linalg.norm(got, axis=-1) * np.linalg.norm(want, axis=-1)
    )
    assert cos.min() > 0.99, f"int8 features diverged: cos={cos}"
    # and the downstream contract holds: nearest-neighbour structure survives
    d_f32 = np.linalg.norm(want[:, None] - want[None], axis=-1)
    d_int8 = np.linalg.norm(got[:, None] - got[None], axis=-1)
    assert (np.argsort(d_f32, -1)[:, 1] == np.argsort(d_int8, -1)[:, 1]).all()


def test_quant_feature_step_on_data_mesh():
    """int8 extraction shards over 'data' like the f32 feature step."""
    from vit_ae_plus_plus_tpu.parallel import make_mesh, shard_batch

    _, params, x = _setup()
    mesh = make_mesh(data=4)
    step = make_quant_feature_step(CFG, params, mesh=mesh)
    feats = step(shard_batch(x, mesh))
    want = np.asarray(make_quant_feature_step(CFG, params)(x))
    np.testing.assert_allclose(np.asarray(feats), want, atol=1e-5)
    assert not feats.sharding.is_fully_replicated


def test_quant_feature_step_jitted():
    _, params, x = _setup()
    step = make_quant_feature_step(CFG, params)
    feats = step(x)
    assert feats.shape == (4, 32) and np.isfinite(np.asarray(feats)).all()
    # only int8 kernels live in the closure: the quantized tree holds no f32
    # copies of the block kernels (the memory claim)
    qp = quantize_params(params)
    assert qp["blocks_0"]["attn"]["qkv"]["kernel"]["w8"].dtype == jnp.int8
