"""Train step: loss decreases, metric contract, LR schedule parity, and the
multi-device data-parallel path on the 8-device virtual CPU mesh."""

import math

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vit_ae_plus_plus_tpu.configs import MAEConfig
from vit_ae_plus_plus_tpu.models import MaskedAutoencoderViT3D
from vit_ae_plus_plus_tpu.parallel import make_mesh, shard_batch, replicate
from vit_ae_plus_plus_tpu.train import (
    create_train_state,
    make_adamw,
    make_train_step,
    warmup_cosine_schedule,
)

TINY = MAEConfig(
    volume_size=16, patch_size=4, in_chans=1, embed_dim=24, depth=1, num_heads=3,
    decoder_embed_dim=12, decoder_depth=1, decoder_num_heads=2,
)
TINY_CONTR = MAEConfig(**{**TINY.__dict__, "contrastive": True})


def _state(model, batch, contrastive, lr=1e-3):
    tx = make_adamw(lr, weight_decay=0.05)
    rngs = {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)}
    args = (batch, batch) if contrastive else (batch,)
    return create_train_state(model, args, tx, rngs)


def test_loss_decreases_and_metric_contract():
    model = MaskedAutoencoderViT3D(TINY_CONTR)
    batch = jax.random.normal(jax.random.PRNGKey(2), (4, 1, 16, 16, 16))
    state = _state(model, batch, contrastive=True)
    step = make_train_step(
        model, TINY.patch_size, mask_ratio=0.75, contr_weight=0.001, donate=False
    )
    rng = jax.random.PRNGKey(3)
    first = None
    for i in range(30):
        state, metrics = step(state, batch, batch, rng, jnp.float32(0.01))
        if first is None:
            first = float(metrics["loss"])
    last = float(metrics["loss"])
    # full reference metric contract (train_one_epoch.py:58-64)
    for k in ("loss", "edge_map_loss", "reconstruction_loss", "perceptual_loss",
              "contr_loss", "grad_norm"):
        assert k in metrics
    assert math.isfinite(last)
    assert last < first, f"loss did not decrease: {first} -> {last}"
    assert int(state.step) == 30


def test_total_loss_composition():
    """loss == edge_w * edge + recon + percep + contr (vit_autoenc.py:231 +
    train_one_epoch.py:59)."""
    model = MaskedAutoencoderViT3D(TINY_CONTR)
    batch = jax.random.normal(jax.random.PRNGKey(2), (2, 1, 16, 16, 16))
    state = _state(model, batch, contrastive=True)
    step = make_train_step(model, 4, mask_ratio=0.75, contr_weight=0.001, donate=False)
    w = 0.037
    _, m = step(state, batch, batch, jax.random.PRNGKey(0), jnp.float32(w))
    want = w * float(m["edge_map_loss"]) + float(m["reconstruction_loss"]) + float(
        m["perceptual_loss"]) + float(m["contr_loss"])
    assert np.isclose(float(m["loss"]), want, rtol=1e-5)


def test_warmup_cosine_matches_reference_formula():
    sched = warmup_cosine_schedule(
        base_lr=1e-3, min_lr=1e-5, warmup_epochs=40, total_epochs=50, steps_per_epoch=10
    )

    def ref(epoch):  # reference lr_sched.py:9-21
        if epoch < 40:
            return 1e-3 * epoch / 40
        return 1e-5 + (1e-3 - 1e-5) * 0.5 * (1 + math.cos(math.pi * (epoch - 40) / 10))

    for step_i in [0, 1, 5, 100, 399, 400, 401, 450, 499]:
        got = float(sched(step_i))
        want = ref(step_i / 10)
        assert np.isclose(got, want, rtol=1e-6), (step_i, got, want)


def test_data_parallel_step_on_virtual_mesh():
    """8 virtual CPU devices: batch sharded over 'data', params replicated,
    GSPMD inserts the gradient all-reduce (SURVEY.md §4 implication)."""
    mesh = make_mesh(data=8)
    model = MaskedAutoencoderViT3D(TINY)
    batch = jax.random.normal(jax.random.PRNGKey(2), (8, 1, 16, 16, 16))
    state = _state(model, batch, contrastive=False)
    step = make_train_step(model, 4, mask_ratio=0.75, mesh=mesh, donate=False)
    state = replicate(state, mesh)
    sharded = shard_batch(batch, mesh)
    state2, metrics = step(state, sharded, sharded, jax.random.PRNGKey(0), jnp.float32(0.01))
    assert math.isfinite(float(metrics["loss"]))

    # parity: the sharded step must equal the single-device step
    step1 = make_train_step(model, 4, mask_ratio=0.75, donate=False)
    state1 = _state(model, batch, contrastive=False)
    state1b, metrics1 = step1(state1, batch, batch, jax.random.PRNGKey(0), jnp.float32(0.01))
    np.testing.assert_allclose(float(metrics["loss"]), float(metrics1["loss"]), rtol=1e-5)
    diffs = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), state2.params, state1b.params
    )
    # f32 cross-device reduction order perturbs grads ~1e-8; Adam's 1/sqrt(v)
    # rescaling amplifies that for near-zero-gradient entries, so compare the
    # post-update params at 1e-3 (update magnitude is lr=1e-3)
    assert max(jax.tree.leaves(diffs)) < 1e-3


def test_feature_and_eval_steps_on_mesh():
    """make_feature_step / make_eval_step under the 8-device data mesh."""
    from vit_ae_plus_plus_tpu.train.step import make_eval_step, make_feature_step
    from vit_ae_plus_plus_tpu.configs import ViTConfig
    from vit_ae_plus_plus_tpu.models import build_model, MaskedAutoencoderViT3D

    mesh = make_mesh(data=8)
    vit_cfg = ViTConfig(volume_size=16, patch_size=4, in_chans=1, embed_dim=24,
                        depth=1, num_heads=3, num_classes=0, global_pool=True)
    vit = build_model(vit_cfg)
    batch = jax.random.normal(jax.random.PRNGKey(0), (8, 1, 16, 16, 16))
    variables = vit.init({"params": jax.random.PRNGKey(1)}, batch)
    from vit_ae_plus_plus_tpu.parallel import replicate, shard_batch

    feat_step = make_feature_step(vit, mesh=mesh)
    feats = feat_step(replicate(variables, mesh), shard_batch(batch, mesh))
    assert feats.shape == (8, 24)
    # parity vs single-device
    feats1 = make_feature_step(vit)(variables, batch)
    np.testing.assert_allclose(np.asarray(feats), np.asarray(feats1), rtol=1e-5,
                               atol=1e-6)

    mae = MaskedAutoencoderViT3D(TINY)
    mv = mae.init({"params": jax.random.PRNGKey(2), "mask": jax.random.PRNGKey(3)}, batch)
    eval_step = make_eval_step(mae, 4, mesh=mesh)
    metrics = eval_step(replicate(mv, mesh), shard_batch(batch, mesh),
                        jax.random.PRNGKey(4))
    assert math.isfinite(float(metrics["reconstruction_loss"]))


def test_grad_accumulation_matches_big_batch():
    """accum_iter=2 over two half-batches == one full-batch update
    (reference accum semantics, train_one_epoch.py:70-74). Adam normalises by
    grad moments, so compare against averaging the two half-batch grads: use
    the same data for both micro-batches, which must equal one full step on
    that data."""
    model = MaskedAutoencoderViT3D(TINY)
    batch = jax.random.normal(jax.random.PRNGKey(2), (4, 1, 16, 16, 16))

    tx_acc = make_adamw(1e-3, weight_decay=0.05, accum_iter=2)
    rngs = {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)}
    state_acc = create_train_state(model, (batch,), tx_acc, rngs)
    step = make_train_step(model, 4, mask_ratio=0.75, donate=False)
    rng = jax.random.PRNGKey(3)
    w = jnp.float32(0.01)
    # two micro-steps with identical data; fold_in uses state.step so pin it
    state_acc = state_acc.replace(step=jnp.zeros((), jnp.int32))
    s1, _ = step(state_acc, batch, batch, rng, w)
    s1 = s1.replace(step=jnp.zeros((), jnp.int32))  # same rng stream per micro-step
    s2, _ = step(s1, batch, batch, rng, w)

    state_full = create_train_state(model, (batch,), make_adamw(1e-3, weight_decay=0.05),
                                    rngs)
    f1, _ = step(state_full, batch, batch, rng, w)

    diffs = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                         s2.params, f1.params)
    # MultiSteps' incremental micro-grad averaging perturbs grads ~1e-7; Adam's
    # 1/sqrt(v) rescaling amplifies near-zero entries (update scale is lr=1e-3)
    assert max(jax.tree.leaves(diffs)) < 1e-3
