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
