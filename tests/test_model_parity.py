"""End-to-end model parity: JAX MAE / ViT vs the independent torch oracle with
identical injected weights and mask noise. This is the masked-recon-MSE parity
check from BASELINE.md (target: within 1e-5)."""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from vit_ae_plus_plus_tpu.configs import MAEConfig, ViTConfig
from vit_ae_plus_plus_tpu.models import MaskedAutoencoderViT3D, VisionTransformer3D
from vit_ae_plus_plus_tpu.ops import masked_mse_loss

import torch_oracle as oracle

TINY_MAE = MAEConfig(
    volume_size=16,
    patch_size=4,
    in_chans=2,
    embed_dim=24,
    depth=2,
    num_heads=3,
    decoder_embed_dim=12,
    decoder_depth=2,
    decoder_num_heads=2,
)


@pytest.fixture(scope="module")
def mae_setup():
    model = MaskedAutoencoderViT3D(TINY_MAE)
    rng = jax.random.PRNGKey(0)
    vol = jax.random.normal(jax.random.PRNGKey(1), (2, 2, 16, 16, 16))
    noise = jax.random.uniform(jax.random.PRNGKey(2), (2, TINY_MAE.num_patches))
    variables = model.init({"params": rng}, vol, mask_ratio=0.75, noise=noise)
    return model, variables, vol, noise


def test_mae_forward_matches_torch_oracle(mae_setup):
    model, variables, vol, noise = mae_setup
    out = model.apply(variables, vol, mask_ratio=0.75, noise=noise)

    params = jax.tree.map(np.asarray, variables["params"])
    bound = model.bind(variables)
    want_pred, want_mask, want_latent = oracle.mae_forward(
        np.asarray(vol), np.asarray(noise), params, TINY_MAE,
        np.asarray(bound.pos_embed), np.asarray(bound.decoder_pos_embed),
    )
    np.testing.assert_allclose(np.asarray(out["mask"]), want_mask.numpy(), atol=0)
    np.testing.assert_allclose(
        np.asarray(out["latent"]), want_latent.numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(out["pred"]), want_pred.numpy(), rtol=1e-4, atol=1e-5)


def test_masked_recon_loss_parity_within_1e5(mae_setup):
    """The BASELINE.md north-star parity criterion at model level."""
    model, variables, vol, noise = mae_setup
    out = model.apply(variables, vol, mask_ratio=0.75, noise=noise)
    from vit_ae_plus_plus_tpu.ops import patchify

    target = patchify(vol, TINY_MAE.patch_size)
    got = float(masked_mse_loss(out["pred"], target, out["mask"]))

    params = jax.tree.map(np.asarray, variables["params"])
    bound = model.bind(variables)
    want_pred, want_mask, _ = oracle.mae_forward(
        np.asarray(vol), np.asarray(noise), params, TINY_MAE,
        np.asarray(bound.pos_embed), np.asarray(bound.decoder_pos_embed),
    )
    tt = torch.from_numpy(np.asarray(target))
    per_patch = ((want_pred - tt) ** 2).mean(dim=-1)
    want = float((per_patch * want_mask).sum() / want_mask.sum())
    assert abs(got - want) < 1e-5, f"{got} vs {want}"


def test_mae_contrastive_output_contract():
    cfg = MAEConfig(
        volume_size=16, patch_size=4, in_chans=1, embed_dim=24, depth=1, num_heads=3,
        decoder_embed_dim=12, decoder_depth=1, decoder_num_heads=2, contrastive=True,
    )
    model = MaskedAutoencoderViT3D(cfg)
    v1 = jax.random.normal(jax.random.PRNGKey(1), (2, 1, 16, 16, 16))
    v2 = jax.random.normal(jax.random.PRNGKey(2), (2, 1, 16, 16, 16))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(3)},
        v1, v2, mask_ratio=0.75,
    )
    out, mutated = model.apply(
        variables, v1, v2, mask_ratio=0.75,
        rngs={"mask": jax.random.PRNGKey(4)}, mutable=["batch_stats"],
    )
    len_keep = int(cfg.num_patches * 0.25)
    flat = 2 * (len_keep + 1)
    # per-token flattened latents including cls (reference vit_autoenc.py:280-281)
    assert out["p1"].shape == (flat, 24)
    assert out["p2"].shape == (flat, 24)
    assert out["z1"].shape == (flat, 24)
    assert "batch_stats" in mutated  # predictor BN updates running stats in train


def test_mae_mask_rng_comes_from_mask_stream():
    model = MaskedAutoencoderViT3D(TINY_MAE)
    vol = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 16, 16, 16))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(3)}, vol
    )
    o1 = model.apply(variables, vol, rngs={"mask": jax.random.PRNGKey(7)})
    o2 = model.apply(variables, vol, rngs={"mask": jax.random.PRNGKey(7)})
    o3 = model.apply(variables, vol, rngs={"mask": jax.random.PRNGKey(8)})
    assert np.array_equal(np.asarray(o1["mask"]), np.asarray(o2["mask"]))
    assert not np.array_equal(np.asarray(o1["mask"]), np.asarray(o3["mask"]))


TINY_VIT = ViTConfig(
    volume_size=16, patch_size=4, in_chans=2, embed_dim=24, depth=2, num_heads=3,
    num_classes=2, global_pool=True,
)


@pytest.mark.parametrize("global_pool", [True, False])
def test_vit_forward_features_matches_oracle(global_pool):
    cfg = ViTConfig(**{**TINY_VIT.__dict__, "global_pool": global_pool})
    model = VisionTransformer3D(cfg)
    vol = jax.random.normal(jax.random.PRNGKey(1), (2, 2, 16, 16, 16))
    variables = model.init({"params": jax.random.PRNGKey(0)}, vol)
    feats = model.apply(variables, vol, method=model.forward_features)
    params = jax.tree.map(np.asarray, variables["params"])
    want = oracle.vit_forward_features(np.asarray(vol), params, cfg, global_pool=global_pool)
    np.testing.assert_allclose(np.asarray(feats), want.numpy(), rtol=1e-4, atol=1e-5)


def test_vit_head_applies_after_pool():
    model = VisionTransformer3D(TINY_VIT)
    vol = jax.random.normal(jax.random.PRNGKey(1), (2, 2, 16, 16, 16))
    variables = model.init({"params": jax.random.PRNGKey(0)}, vol)
    logits = model.apply(variables, vol)
    assert logits.shape == (2, 2)


def test_contrastive_batched_views_equal_sequential_passes():
    """The 2B-batched encoder call must equal two sequential per-view passes
    (the trunk has no batch-coupled ops)."""
    cfg = MAEConfig(
        volume_size=16, patch_size=4, in_chans=1, embed_dim=24, depth=1, num_heads=3,
        decoder_embed_dim=12, decoder_depth=1, decoder_num_heads=2, contrastive=True,
    )
    model = MaskedAutoencoderViT3D(cfg)
    v1 = jax.random.normal(jax.random.PRNGKey(1), (2, 1, 16, 16, 16))
    v2 = jax.random.normal(jax.random.PRNGKey(2), (2, 1, 16, 16, 16))
    noise = jax.random.uniform(jax.random.PRNGKey(3), (4, cfg.num_patches))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(9)}, v1, v2
    )
    out, _ = model.apply(variables, v1, v2, mask_ratio=0.75, noise=noise,
                         mutable=["batch_stats"])
    # sequential per-view encoder calls with the matching noise slices
    lat1, mask1, ids1 = model.apply(
        variables, v1, 0.75, noise[:2], method=model.forward_encoder
    )
    lat2, _, _ = model.apply(
        variables, v2, 0.75, noise[2:], method=model.forward_encoder
    )
    np.testing.assert_allclose(np.asarray(out["latent"]), np.asarray(lat1),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["mask"]), np.asarray(mask1))
    np.testing.assert_allclose(
        np.asarray(out["z2"]).reshape(lat2.shape), np.asarray(lat2), rtol=1e-5, atol=1e-6
    )


def test_unused_projector_params_still_exist():
    """Parity quirk: the reference builds a 3-layer projector it never applies
    (vit_autoenc.py:253-262 vs :270-285); its params must exist here too."""
    cfg = MAEConfig(
        volume_size=16, patch_size=4, in_chans=1, embed_dim=24, depth=1, num_heads=3,
        decoder_embed_dim=12, decoder_depth=1, decoder_num_heads=2,
        contrastive=True, use_proj=True,
    )
    model = MaskedAutoencoderViT3D(cfg)
    v = jax.random.normal(jax.random.PRNGKey(1), (2, 1, 16, 16, 16))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(3)}, v, v
    )
    assert "projector" in variables["params"]["heads"]
    # ...and the forward still does NOT apply it: latents reach the predictor raw
    out, _ = model.apply(variables, v, v, rngs={"mask": jax.random.PRNGKey(4)},
                         mutable=["batch_stats"])
    np.testing.assert_allclose(
        np.asarray(out["z1"]), np.asarray(out["latent"]).reshape(-1, 24), rtol=1e-6
    )
