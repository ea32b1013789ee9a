"""End-to-end torch-checkpoint import: build a reference-layout state_dict,
convert with the shim, load into VisionTransformer3D, and match the torch
oracle's forward exactly. This is the real interop path for users bringing
reference .pth checkpoints."""

import numpy as np
import jax
import jax.numpy as jnp

from vit_ae_plus_plus_tpu.configs import ViTConfig
from vit_ae_plus_plus_tpu.models import VisionTransformer3D
from vit_ae_plus_plus_tpu.train.checkpoint import import_torch_state_dict

import torch_oracle as oracle

CFG = ViTConfig(volume_size=16, patch_size=4, in_chans=2, embed_dim=24, depth=2,
                num_heads=3, num_classes=2, global_pool=True)


def make_reference_state_dict(rng):
    """A state_dict with the reference's tensor names/layouts (torch
    conventions: Linear weight (out, in), Conv3d patch embed, LayerNorm)."""
    d, p, c = CFG.embed_dim, CFG.patch_size, CFG.in_chans
    sd = {
        "patch_embed.proj.weight": rng.standard_normal((d, c, p, p, p)).astype(np.float32) * 0.05,
        "patch_embed.proj.bias": rng.standard_normal(d).astype(np.float32) * 0.01,
        "cls_token": rng.standard_normal((1, 1, d)).astype(np.float32) * 0.02,
        "pos_embed": rng.standard_normal((1, 1 + CFG.num_patches, d)).astype(np.float32) * 0.02,
        "fc_norm.weight": np.ones(d, np.float32),
        "fc_norm.bias": np.zeros(d, np.float32),
        "head.weight": rng.standard_normal((2, d)).astype(np.float32) * 0.05,
        "head.bias": np.zeros(2, np.float32),
    }
    for i in range(CFG.depth):
        pre = f"blocks.{i}"
        sd[f"{pre}.norm1.weight"] = np.ones(d, np.float32)
        sd[f"{pre}.norm1.bias"] = np.zeros(d, np.float32)
        sd[f"{pre}.attn.qkv.weight"] = rng.standard_normal((3 * d, d)).astype(np.float32) * 0.05
        sd[f"{pre}.attn.qkv.bias"] = np.zeros(3 * d, np.float32)
        sd[f"{pre}.attn.proj.weight"] = rng.standard_normal((d, d)).astype(np.float32) * 0.05
        sd[f"{pre}.attn.proj.bias"] = np.zeros(d, np.float32)
        sd[f"{pre}.norm2.weight"] = np.ones(d, np.float32)
        sd[f"{pre}.norm2.bias"] = np.zeros(d, np.float32)
        sd[f"{pre}.mlp.fc1.weight"] = rng.standard_normal((4 * d, d)).astype(np.float32) * 0.05
        sd[f"{pre}.mlp.fc1.bias"] = np.zeros(4 * d, np.float32)
        sd[f"{pre}.mlp.fc2.weight"] = rng.standard_normal((d, 4 * d)).astype(np.float32) * 0.05
        sd[f"{pre}.mlp.fc2.bias"] = np.zeros(d, np.float32)
    return sd


def test_torch_state_dict_roundtrip_forward_parity():
    rng = np.random.default_rng(0)
    sd = make_reference_state_dict(rng)
    imported = import_torch_state_dict(sd, patch_size=CFG.patch_size, in_chans=CFG.in_chans)

    model = VisionTransformer3D(CFG)
    vol = rng.standard_normal((2, CFG.in_chans, 16, 16, 16)).astype(np.float32)
    init_params = model.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(vol))["params"]
    # structural check: imported tree covers exactly the model's params
    flat_init = {jax.tree_util.keystr(k) for k, _ in
                 jax.tree_util.tree_flatten_with_path(init_params)[0]}
    flat_imp = {jax.tree_util.keystr(k) for k, _ in
                jax.tree_util.tree_flatten_with_path(imported)[0]}
    assert flat_init == flat_imp, flat_init ^ flat_imp

    feats = model.apply({"params": imported}, jnp.asarray(vol),
                        method=model.forward_features)
    want = oracle.vit_forward_features(vol, imported, CFG, global_pool=True)
    np.testing.assert_allclose(np.asarray(feats), want.numpy(), rtol=1e-4, atol=1e-5)
