"""Loss-term parity vs torch oracles."""

import numpy as np
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from vit_ae_plus_plus_tpu.ops import (
    masked_mse_loss,
    edge_map_loss,
    negative_cosine_loss,
    soft_cross_entropy_with_weights,
)


def test_masked_mse_matches_torch():
    rng = np.random.default_rng(6)
    pred = rng.standard_normal((4, 27, 8)).astype(np.float32)
    target = rng.standard_normal((4, 27, 8)).astype(np.float32)
    mask = (rng.random((4, 27)) > 0.25).astype(np.float32)
    got = float(masked_mse_loss(jnp.asarray(pred), jnp.asarray(target), jnp.asarray(mask)))
    tp, tt, tm = map(torch.from_numpy, (pred, target, mask))
    want = (((tp - tt) ** 2).mean(dim=-1) * tm).sum() / tm.sum()  # vit_autoenc.py:226-227
    assert np.isclose(got, float(want), rtol=1e-6)


def test_edge_map_loss_is_plain_mse():
    rng = np.random.default_rng(7)
    a = rng.standard_normal((2, 8, 8, 8)).astype(np.float32)
    b = rng.standard_normal((2, 8, 8, 8)).astype(np.float32)
    got = float(edge_map_loss(jnp.asarray(a), jnp.asarray(b)))
    want = float(F.mse_loss(torch.from_numpy(a), torch.from_numpy(b)))
    assert np.isclose(got, want, rtol=1e-6)


def test_negative_cosine_matches_torch_cosine_similarity():
    rng = np.random.default_rng(8)
    p1, p2, z1, z2 = (rng.standard_normal((10, 16)).astype(np.float32) for _ in range(4))
    got = float(
        negative_cosine_loss(*(jnp.asarray(v) for v in (p1, p2, z1, z2)))
    )
    cos = torch.nn.CosineSimilarity(dim=1)
    tp1, tp2, tz1, tz2 = map(torch.from_numpy, (p1, p2, z1, z2))
    want = float(-(cos(tp1, tz2).mean() + cos(tp2, tz1).mean()) * 0.5)
    assert np.isclose(got, want, rtol=1e-5)


def torch_soft_ce_with_weights(y_hat, y, weights):
    """Oracle mirroring utils/custom_loss.py:12-18."""
    weighted_logits = F.log_softmax(y_hat, dim=-1) * weights
    weighted_sum = torch.sum(-y * weighted_logits, dim=0) / weights.sum()
    return weighted_sum.mean()


def test_soft_ce_matches_reference_semantics():
    rng = np.random.default_rng(9)
    logits = rng.standard_normal((6, 3)).astype(np.float32)
    targets = rng.random((6, 3)).astype(np.float32)
    weights = np.array([3.0, 1.0, 2.0], dtype=np.float32)
    got = float(
        soft_cross_entropy_with_weights(
            jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(weights)
        )
    )
    want = float(
        torch_soft_ce_with_weights(
            torch.from_numpy(logits), torch.from_numpy(targets), torch.from_numpy(weights)
        )
    )
    assert np.isclose(got, want, rtol=1e-4)


def test_volume_space_recon_equals_patch_space():
    """The voxel-space masked MSE used by train/objective.py (norm_pix=False)
    must equal the reference's per-patch-mean formulation exactly, for both
    single- and multi-channel volumes."""
    import jax

    from vit_ae_plus_plus_tpu.ops import patchify, unpatchify
    from vit_ae_plus_plus_tpu.train.objective import mae_loss_terms

    for c in (1, 4):
        p, s, b = 4, 16, 3
        g = s // p
        L = g**3
        key = jax.random.PRNGKey(c)
        view1 = jax.random.normal(key, (b, c, s, s, s))
        pred = jax.random.normal(jax.random.fold_in(key, 1), (b, L, p**3 * c))
        mask = (jax.random.uniform(jax.random.fold_in(key, 2), (b, L)) < 0.75)
        mask = mask.astype(jnp.float32)
        target = patchify(view1, p)
        want = masked_mse_loss(pred, target, mask)
        _, metrics = mae_loss_terms({"pred": pred, "mask": mask}, view1, p)
        # fp summation order differs between the two formulations
        np.testing.assert_allclose(float(metrics["reconstruction_loss"]),
                                   float(want), rtol=1e-5)


def test_bf16_loss_filters_close_to_f32():
    """Opt-in `filters_dtype='bfloat16'` must leave recon/contr terms
    bit-identical (only the edge filters change dtype) and keep the edge term
    within bf16 tolerance of the f32 parity path."""
    import jax
    from vit_ae_plus_plus_tpu.train.objective import mae_loss_terms

    p, s, b = 4, 16, 2
    g = s // p
    L = g**3
    key = jax.random.PRNGKey(1)
    view1 = jax.random.normal(key, (b, 1, s, s, s))
    pred = jax.random.normal(jax.random.fold_in(key, 1), (b, L, p**3))
    mask = (jax.random.uniform(jax.random.fold_in(key, 2), (b, L)) < 0.75)
    mask = mask.astype(jnp.float32)
    outs = {"pred": pred, "mask": mask}
    _, m32 = mae_loss_terms(outs, view1, p, edge_map_weight=0.01)
    _, m16 = mae_loss_terms(outs, view1, p, edge_map_weight=0.01,
                            filters_dtype="bfloat16")
    assert float(m32["reconstruction_loss"]) == float(m16["reconstruction_loss"])
    np.testing.assert_allclose(float(m16["edge_map_loss"]),
                               float(m32["edge_map_loss"]), rtol=2e-2)
    assert m16["edge_map_loss"].dtype == jnp.float32


def test_train_step_accepts_loss_filters_dtype():
    """The flag plumbs through make_train_step and trains finitely."""
    import jax
    from vit_ae_plus_plus_tpu.configs import MAEConfig
    from vit_ae_plus_plus_tpu.models import MaskedAutoencoderViT3D
    from vit_ae_plus_plus_tpu.train import create_train_state, make_adamw, make_train_step

    cfg = MAEConfig(volume_size=8, patch_size=4, in_chans=1, embed_dim=16,
                    depth=1, num_heads=2, decoder_embed_dim=8, decoder_depth=1,
                    decoder_num_heads=2, attn_impl="xla")
    model = MaskedAutoencoderViT3D(cfg)
    batch = jax.random.normal(jax.random.PRNGKey(0), (2, 1, 8, 8, 8))
    state = create_train_state(
        model, (batch, None), make_adamw(1e-3),
        {"params": jax.random.PRNGKey(1), "mask": jax.random.PRNGKey(2)},
    )
    step = make_train_step(model, 4, mask_ratio=0.75, donate=False,
                           loss_filters_dtype="bfloat16")
    _, metrics = step(state, batch, None, jax.random.PRNGKey(3), jnp.float32(0.01))
    assert np.isfinite(float(metrics["loss"]))
