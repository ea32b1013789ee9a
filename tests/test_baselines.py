"""ResNet3D and MoCo-v3 baseline components."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vit_ae_plus_plus_tpu.configs import ViTConfig
from vit_ae_plus_plus_tpu.models.moco import (
    MoCoMLP,
    MoCoViT3D,
    ema_update,
    info_nce,
    moco_loss,
)
from vit_ae_plus_plus_tpu.models.resnet3d import ResNet3D, generate_model


def test_resnet_forward_shapes_and_train_update():
    model = generate_model(10, n_classes=2)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 1, 32, 32, 32))
    variables = model.init({"params": jax.random.PRNGKey(1)}, x)
    logits, mutated = model.apply(variables, x, train=True, mutable=["batch_stats"])
    assert logits.shape == (2, 2)
    # BN stats actually update in train mode
    before = jax.tree.leaves(variables["batch_stats"])[0]
    after = jax.tree.leaves(mutated["batch_stats"])[0]
    assert not np.allclose(np.asarray(before), np.asarray(after))
    feats = model.apply(variables, x, train=False, method=model.forward_features)
    assert feats.shape == (2, 512)  # stage-4 width, BasicBlock expansion 1


def test_resnet_depth_configs():
    with pytest.raises(ValueError):
        generate_model(11)
    m50 = generate_model(50, n_classes=3)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 1, 32, 32, 32))
    variables = m50.init({"params": jax.random.PRNGKey(1)}, x)
    assert m50.apply(variables, x, train=False).shape == (1, 3)


def test_info_nce_matches_torch_semantics():
    import torch

    rng = np.random.default_rng(0)
    q = rng.standard_normal((6, 8)).astype(np.float32)
    k = rng.standard_normal((6, 8)).astype(np.float32)
    got = float(info_nce(jnp.asarray(q), jnp.asarray(k), temperature=1.0))
    tq = torch.nn.functional.normalize(torch.from_numpy(q), dim=1)
    tk = torch.nn.functional.normalize(torch.from_numpy(k), dim=1)
    logits = torch.einsum("nc,mc->nm", tq, tk)
    want = float(torch.nn.CrossEntropyLoss()(logits, torch.arange(6)) * 2.0)
    assert np.isclose(got, want, rtol=1e-5)


def test_ema_update_formula():
    base = {"w": jnp.ones(3)}
    mom = {"w": jnp.zeros(3)}
    out = ema_update(mom, base, 0.9)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.1 * np.ones(3), rtol=1e-6)


def test_moco_vit_loss_and_grads():
    cfg = ViTConfig(volume_size=16, patch_size=4, in_chans=1, embed_dim=24, depth=1,
                    num_heads=3, num_classes=0, global_pool=False)
    model = MoCoViT3D(cfg, dim=16, mlp_dim=32)
    x1 = jax.random.normal(jax.random.PRNGKey(0), (4, 1, 16, 16, 16))
    x2 = jax.random.normal(jax.random.PRNGKey(1), (4, 1, 16, 16, 16))
    variables = model.init({"params": jax.random.PRNGKey(2)}, x1, use_predictor=True)
    mom_vars = jax.tree.map(jnp.copy, variables)

    def loss_fn(params):
        loss, _ = moco_loss(
            model, {"params": params, "batch_stats": variables["batch_stats"]},
            mom_vars, x1, x2, train=True,
        )
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    # gradient flows into the base trunk
    g = jax.tree.leaves(grads["trunk"])
    assert any(float(jnp.max(jnp.abs(x))) > 0 for x in g)


def test_supervised_finetune_full_backbone_updates():
    """fix_backbone=False trains trunk params too (layer-wise-lrd path)."""
    from vit_ae_plus_plus_tpu.pipelines.finetune import make_supervised_steps
    from vit_ae_plus_plus_tpu.train import TrainState
    from vit_ae_plus_plus_tpu.train.optim import make_layerwise_adamw
    from vit_ae_plus_plus_tpu.models import build_model

    cfg = ViTConfig(volume_size=16, patch_size=4, in_chans=1, embed_dim=24, depth=2,
                    num_heads=3, num_classes=2, global_pool=True)
    model = build_model(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 1, 16, 16, 16))
    y = jnp.array([0, 1, 0, 1])
    params = model.init({"params": jax.random.PRNGKey(1)}, x)["params"]
    params_before = jax.device_get(params)  # train_step donates the state
    tx = make_layerwise_adamw(params, cfg.depth, 1e-3, layer_decay=0.5)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params, batch_stats={},
                       opt_state=tx.init(params), tx=tx)
    train_step, _ = make_supervised_steps(model, num_classes=2,
                                          class_weights=np.array([3.0, 1.0]))
    new_state, m = train_step(state, x, y, jax.random.PRNGKey(2))
    assert np.isfinite(float(m["loss"]))
    # earlier layers move less than later ones (layer decay)
    d0 = float(jnp.max(jnp.abs(new_state.params["blocks_0"]["mlp"]["Dense_0"]["kernel"]
                               - params_before["blocks_0"]["mlp"]["Dense_0"]["kernel"])))
    d1 = float(jnp.max(jnp.abs(new_state.params["blocks_1"]["mlp"]["Dense_0"]["kernel"]
                               - params_before["blocks_1"]["mlp"]["Dense_0"]["kernel"])))
    assert d0 < d1  # layer 1 scale 0.5^2 < layer 2 scale 0.5^1


def test_mixup_with_soft_ce():
    from vit_ae_plus_plus_tpu.pipelines.finetune import make_supervised_steps, mixup_3d
    from vit_ae_plus_plus_tpu.train import TrainState
    import optax
    from vit_ae_plus_plus_tpu.models import build_model

    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (4, 2, 8, 8))
    y = jax.nn.one_hot(jnp.array([0, 1, 1, 0]), 2)
    mx, my = mixup_3d(rng, x, y, alpha=0.1)
    assert mx.shape == x.shape and my.shape == y.shape
    # each mixed target row still sums to 1
    np.testing.assert_allclose(np.asarray(my.sum(axis=1)), np.ones(4), rtol=1e-6)


def test_timm_mixup_matches_torch_oracle():
    """timm_mixup's label transform pinned against timm 0.5.4's
    one_hot/mixup_target math (timm/data/mixup.py), reproduced here in torch
    as the oracle (timm itself is not installed; the reference calls
    Mixup(mixup_alpha=0.1, num_classes=2) whose defaults apply
    label_smoothing=0.1 — fine_tune_epoch.py:366-368)."""
    import torch

    from vit_ae_plus_plus_tpu.pipelines.finetune import timm_mixup

    labels = np.array([0, 1, 1, 0])
    num_classes, smoothing = 2, 0.1
    x = np.asarray(jax.random.normal(jax.random.PRNGKey(0), (4, 1, 8, 8, 8)))

    mx, my = timm_mixup(jax.random.PRNGKey(7), jnp.asarray(x), jnp.asarray(labels),
                        num_classes, alpha=0.1)
    # recover the lambda actually drawn (same key, same draw)
    lam = float(jax.random.beta(jax.random.PRNGKey(7), 0.1, 0.1))

    # --- timm oracle: one_hot + mixup_target + _mix_batch (mode='batch') ---
    def timm_one_hot(t, n, on, off):
        t = torch.as_tensor(t).long().view(-1, 1)
        return torch.full((t.size(0), n), off).scatter_(1, t, on)

    off_value = smoothing / num_classes
    on_value = 1.0 - smoothing + off_value
    y1 = timm_one_hot(labels, num_classes, on_value, off_value)
    y2 = timm_one_hot(np.flip(labels).copy(), num_classes, on_value, off_value)
    target_oracle = y1 * lam + y2 * (1.0 - lam)
    xt = torch.as_tensor(x)
    mixed_oracle = xt * lam + xt.flip(0) * (1.0 - lam)

    np.testing.assert_allclose(np.asarray(my), target_oracle.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(mx), mixed_oracle.numpy(), atol=1e-5)
    # smoothed rows: never exactly one-hot
    assert np.all(np.asarray(my) >= off_value * min(lam, 1 - lam) - 1e-9)
    np.testing.assert_allclose(np.asarray(my.sum(axis=1)), np.ones(4), rtol=1e-6)


def test_vit_contrastive_two_view_forward_and_loss():
    """Stage-2 contrastive ViT (reference vit.py:301-337 + legacy 2-view loop
    train_one_epoch.py:117-181)."""
    from vit_ae_plus_plus_tpu.models.vit import VisionTransformer3DContrastive
    from vit_ae_plus_plus_tpu.ops import negative_cosine_loss

    cfg = ViTConfig(volume_size=16, patch_size=4, in_chans=1, embed_dim=24, depth=1,
                    num_heads=3, num_classes=8, global_pool=True)
    model = VisionTransformer3DContrastive(cfg, use_proj=True)
    x1 = jax.random.normal(jax.random.PRNGKey(0), (4, 1, 16, 16, 16))
    x2 = jax.random.normal(jax.random.PRNGKey(1), (4, 1, 16, 16, 16))
    variables = model.init({"params": jax.random.PRNGKey(2)}, x1, x2)

    def loss_fn(params):
        (p1, p2, z1, z2), mut = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x1, x2, train=True, mutable=["batch_stats"],
        )
        return negative_cosine_loss(p1, p2, z1, z2)

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert -1.0 <= float(loss) <= 1.0
    assert any(float(jnp.max(jnp.abs(g))) > 0 for g in jax.tree.leaves(grads["trunk"]))
