"""Checkpoint surgery: pretrained MAE params -> plain ViT feature extractor.

Parity: the reference re-loads the MAE checkpoint into a fresh
VisionTransformer3D with strict=False after deleting mismatched head keys and
interpolating the pos-embed grid, then asserts the exact missing-key set
(/root/reference/k_fold_training_scripts/k_fold_cross_valid_combined_brats.py:219-245).

Two reference subtleties handled:
- the MAE's pos_embed is a requires_grad=False Parameter in torch, so it IS in
  the checkpoint and the ViT inherits the fixed sincos table; here the MAE
  table is a baked constant, so we materialise the same sincos table (resized
  if the grids differ) into the ViT's learned pos_embed param;
- head / fc_norm stay freshly initialised (the asserted missing keys).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from vit_ae_plus_plus_tpu.configs import MAEConfig, ViTConfig
from vit_ae_plus_plus_tpu.ops import get_3d_sincos_pos_embed, interpolate_pos_embed

def mae_params_to_vit(
    mae_params: Dict, vit_params: Dict, mae_cfg: MAEConfig, vit_cfg: ViTConfig
) -> Dict:
    """Return new ViT params with the MAE encoder grafted in."""
    out = dict(vit_params)
    copied = []
    for key in mae_params:
        if key.startswith("blocks_"):
            out[key] = mae_params[key]
            copied.append(key)
    out["patch_embed"] = mae_params["patch_embed"]
    out["cls_token"] = mae_params["cls_token"]
    copied += ["patch_embed", "cls_token"]
    # encoder-final norm transfers only when the ViT keeps `norm`
    # (global_pool deletes it and adds fresh fc_norm — reference vit.py:219-222)
    if not vit_cfg.global_pool and "norm" in mae_params:
        out["norm"] = mae_params["norm"]
        copied.append("norm")

    # fixed sincos table -> ViT pos_embed param (resize if grids differ)
    mae_grid = round(mae_cfg.num_patches ** (1 / 3))
    table = get_3d_sincos_pos_embed(mae_cfg.embed_dim, mae_grid, cls_token=True)[None]
    table = interpolate_pos_embed(jnp.asarray(table, jnp.float32), vit_cfg.num_patches)
    out["pos_embed"] = table

    # the reference's strict-missing-keys assert, as a structural check
    expected_fresh = {"head", "fc_norm"} if vit_cfg.global_pool else {"head"}
    fresh = set(vit_params) - set(copied) - {"pos_embed"}
    if fresh != expected_fresh:
        raise AssertionError(f"unexpected fresh keys {fresh} (want {expected_fresh})")
    return out
