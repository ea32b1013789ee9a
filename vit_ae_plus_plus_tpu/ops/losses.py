"""Loss terms of the ViT-AE++ composite objective, as pure functions.

All reductions are performed in AT LEAST float32 regardless of compute dtype
(TPU bf16-compute / f32-reduce policy — replaces the reference's AMP
GradScaler, which the SSL loop disabled anyway, reference
utils/train_one_epoch.py:50). Wider inputs keep their width: under
jax_enable_x64 a float64 pipeline stays float64, which the torch-oracle
trajectory test (tests/test_train_trajectory.py) relies on to separate
semantic divergence from f32 rounding noise.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def at_least_f32(x: jnp.ndarray) -> jnp.ndarray:
    """Upcast sub-f32 inputs (bf16) to f32; leave f32/f64 untouched."""
    return x.astype(jnp.promote_types(x.dtype, jnp.float32))


def masked_mse_loss(pred: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean MSE over *removed* patches only.

    Parity: reference vit_autoenc.py:226-227 — per-patch mean over the feature
    dim, then masked mean over patches (mask: 1 = removed).
    """
    pred = at_least_f32(pred)
    target = at_least_f32(target)
    mask = at_least_f32(mask)
    per_patch = jnp.mean((pred - target) ** 2, axis=-1)
    return jnp.sum(per_patch * mask) / jnp.sum(mask)


def edge_map_loss(pred_edges: jnp.ndarray, target_edges: jnp.ndarray) -> jnp.ndarray:
    """Plain mean MSE between edge maps (reference vit_autoenc.py:224)."""
    diff = at_least_f32(pred_edges) - at_least_f32(target_edges)
    return jnp.mean(diff * diff)


def negative_cosine_loss(
    p1: jnp.ndarray, p2: jnp.ndarray, z1: jnp.ndarray, z2: jnp.ndarray, eps: float = 1e-8
) -> jnp.ndarray:
    """SimSiam-style symmetric negative cosine similarity.

    Parity: reference utils/train_one_epoch.py:113-114 with
    torch.nn.CosineSimilarity(dim=1) semantics (per-row cosine with eps clamp);
    z1/z2 must already be stop-gradient'd by the caller (z .detach() in the
    reference's ContrastiveMAEViT.forward, vit_autoenc.py:285).
    """

    def _cos(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        a = at_least_f32(a)
        b = at_least_f32(b)
        na = jnp.maximum(jnp.linalg.norm(a, axis=1), eps)
        nb = jnp.maximum(jnp.linalg.norm(b, axis=1), eps)
        return jnp.sum(a * b, axis=1) / (na * nb)

    return -(jnp.mean(_cos(p1, z2)) + jnp.mean(_cos(p2, z1))) * 0.5


def soft_cross_entropy_with_weights(
    logits: jnp.ndarray, soft_targets: jnp.ndarray, weights: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """Class-weighted soft-target cross entropy.

    Parity: reference utils/custom_loss.py:7-18, *exactly*, including its
    unusual reduction: loss = mean_c[ sum_n(-t_nc * w_c * log_softmax(x)_nc) ]
    / sum(w) — i.e. summed (not averaged) over the batch, divided by C*sum(w).
    With unit weights and batch == num_classes this coincides with timm's
    SoftTargetCrossEntropy, which is what the reference self-test checks
    (custom_loss.py:24-30).
    """
    logits = at_least_f32(logits)  # keeps f64 in the x64 trajectory tests
    log_probs = logits - jnp.max(logits, axis=-1, keepdims=True)
    log_probs = log_probs - jnp.log(jnp.sum(jnp.exp(log_probs), axis=-1, keepdims=True))
    if weights is None:
        weights = jnp.ones(logits.shape[-1], dtype=logits.dtype)
    else:
        weights = at_least_f32(weights).astype(logits.dtype)
    num_classes = logits.shape[-1]
    total = jnp.sum(-at_least_f32(soft_targets).astype(logits.dtype)
                    * log_probs * weights[None, :])
    return total / (jnp.sum(weights) * num_classes)
