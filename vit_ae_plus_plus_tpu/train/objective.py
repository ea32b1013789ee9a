"""The ViT-AE++ composite objective, assembled as one pure function.

Parity: reference `get_weighted_loss` + the contrastive term
(/root/reference/model/vit_autoenc.py:205-232, utils/train_one_epoch.py:54,
113-114). The reported metric contract mirrors the reference 4-tuple
[loss, raw_edge_map_loss, reconstruction_loss, perceptual_loss] plus
contr_loss, with 'loss' = edge + recon + percep + contr (train_one_epoch.py:59).

Quirks reproduced deliberately:
- the perceptual term is computed under stop_gradient — the reference wraps it
  in torch.no_grad() (vit_autoenc.py:229-230) so it is logged but contributes
  zero gradient; pass `perceptual_differentiable=True` for the fixed opt-in;
- Sobel is applied to the *blurred* target but the *raw* prediction
  (vit_autoenc.py:222-223);
- recon MSE averages over removed patches only;
- contrastive latents are per-token (B*(len_keep+1), D) including cls.

Everything here fuses into the single jitted train-step XLA graph; unlike the
reference there is no per-step host sync, no empty_cache, and the 2x duplicated
Sobel conv of the reference (:222 computes pred/target maps, :224-225 computes
the MSE twice) is computed once.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from vit_ae_plus_plus_tpu.ops import (
    edge_map_loss,
    gaussian_blur_3d,
    masked_mse_loss,
    negative_cosine_loss,
    patchify,
    sobel_edges_3d,
    unpatchify,
)
from vit_ae_plus_plus_tpu.ops.losses import at_least_f32


def mae_loss_terms(
    outputs: Dict[str, jnp.ndarray],
    view1: jnp.ndarray,
    patch_size: int,
    *,
    edge_map_weight: jnp.ndarray | float = 0.0,
    contr_weight: float = 0.0,
    perceptual_weight: float = 0.0,
    norm_pix_loss: bool = False,
    perceptual_fn: Optional[Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]] = None,
    perceptual_differentiable: bool = False,
    filters_dtype: str = "float32",
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Model outputs + input -> (total_loss, metrics dict)."""
    pred, mask = outputs["pred"], outputs["mask"]

    pred_f32 = at_least_f32(pred)
    pred_vol = unpatchify(pred_f32, patch_size)
    if norm_pix_loss:
        target = at_least_f32(patchify(view1, patch_size))
        mean = target.mean(axis=-1, keepdims=True)
        var = target.var(axis=-1, keepdims=True)
        target = (target - mean) / (var + 1.0e-6) ** 0.5
        target_vol = unpatchify(target, patch_size)
        recon = masked_mse_loss(pred_f32, target, mask)
    else:
        # unpatchify(patchify(v)) == v exactly, and the per-patch-mean masked
        # MSE equals a voxel-space masked sum: sum_patches(mask * mean_p sq) /
        # sum(mask) == sum_vox(sq * mask_vox) / (sum(mask) * p^3). Computing
        # it in volume space deletes patchify(target) entirely — profiler:
        # one ~2 ms 8-D layout copy + ~1.2 ms reshape per step — and shares
        # the single unpatchify(pred) with the edge-loss branch; the mask
        # broadcast fuses into the squared-difference elementwise pipeline.
        target_vol = view1
        b = mask.shape[0]
        g = view1.shape[-1] // patch_size
        s = view1.shape[-1]
        mask_vox = jnp.broadcast_to(
            at_least_f32(mask).reshape(b, 1, g, 1, g, 1, g, 1),
            (b, 1, g, patch_size, g, patch_size, g, patch_size),
        ).reshape(b, 1, s, s, s)
        sq = (pred_vol - at_least_f32(view1)) ** 2
        recon = jnp.sum(sq * mask_vox) / (
            jnp.sum(at_least_f32(mask)) * patch_size**3 * pred_vol.shape[1]
        )

    # Opt-in bf16 edge-loss filters: the Sobel/blur banded einsums run at the
    # MXU's bf16 rate and halve their HBM traffic. Off by default — the parity
    # contract keeps the loss pipeline f32 like the reference; the edge term is
    # an auxiliary regulariser (weight <= 0.01) so bf16 filter precision is
    # ample (equivalence bounded in tests/test_ops_losses.py).
    fdt = jnp.dtype(filters_dtype)
    pred_edges = sobel_edges_3d(pred_vol.astype(fdt))
    target_edges = sobel_edges_3d(gaussian_blur_3d(target_vol.astype(fdt), 2.0))
    raw_edge = edge_map_loss(pred_edges, target_edges)
    edge_loss = edge_map_weight * raw_edge

    if perceptual_fn is not None and perceptual_weight:
        percep = perceptual_weight * perceptual_fn(pred_vol, target_vol)
        if not perceptual_differentiable:
            percep = jax.lax.stop_gradient(percep)
    else:
        percep = jnp.float32(0.0)

    if contr_weight and "p1" in outputs:
        contr = contr_weight * negative_cosine_loss(
            outputs["p1"], outputs["p2"], outputs["z1"], outputs["z2"]
        )
    else:
        contr = jnp.float32(0.0)

    total = edge_loss + recon + percep + contr
    metrics = {
        "loss": total,
        "edge_map_loss": raw_edge,
        "reconstruction_loss": recon,
        "perceptual_loss": percep,
        "contr_loss": contr,
    }
    return total, metrics
