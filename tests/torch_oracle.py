"""Independent torch re-implementation of the ViT-AE++ forward math, used as a
parity oracle for the JAX models. Written from the equations (pre-LN ViT
blocks, MAE encode/decode with argsort masking); weights are injected from the
flax params so both sides compute the same function.

This mirrors the *semantics* of reference model/vit.py + vit_autoenc.py; it is
test fixture code, not part of the framework.
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn.functional as F


def t(x) -> torch.Tensor:
    return torch.from_numpy(np.asarray(x, dtype=np.float32))


def linear(x, kernel, bias=None):
    """flax Dense: y = x @ kernel + bias (kernel is (in, out))."""
    y = x @ t(kernel)
    if bias is not None:
        y = y + t(bias)
    return y


def layer_norm(x, scale, bias, eps=1e-6):
    mu = x.mean(-1, keepdim=True)
    var = x.var(-1, unbiased=False, keepdim=True)
    return (x - mu) / torch.sqrt(var + eps) * t(scale) + t(bias)


def attention(x, p, num_heads):
    b, n, c = x.shape
    qkv = linear(x, p["qkv"]["kernel"], p["qkv"]["bias"]).reshape(b, n, 3, num_heads, c // num_heads)
    qkv = qkv.permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    attn = (q @ k.transpose(-2, -1)) * (c // num_heads) ** -0.5
    attn = attn.softmax(dim=-1)
    out = (attn @ v).transpose(1, 2).reshape(b, n, c)
    return linear(out, p["proj"]["kernel"], p["proj"]["bias"])


def mlp(x, p):
    h = linear(x, p["Dense_0"]["kernel"], p["Dense_0"]["bias"])
    h = F.gelu(h)  # exact erf gelu
    return linear(h, p["Dense_1"]["kernel"], p["Dense_1"]["bias"])


def block(x, p, num_heads):
    y = layer_norm(x, p["norm1"]["scale"], p["norm1"]["bias"])
    x = x + attention(y, p["attn"], num_heads)
    y = layer_norm(x, p["norm2"]["scale"], p["norm2"]["bias"])
    return x + mlp(y, p["mlp"])


def patch_embed_conv3d(vol, dense_kernel, bias, patch_size):
    """Apply the patch embedding as a genuine Conv3d(kernel=stride=p), with the
    conv weight derived from the dense kernel — validating the framework's
    claim that patchify+Dense == strided Conv3d."""
    p = patch_size
    c_in = vol.shape[1]
    d_out = dense_kernel.shape[1]
    # dense kernel rows are (dz, dy, dx, c) flattened, c fastest
    w = t(dense_kernel).reshape(p, p, p, c_in, d_out).permute(4, 3, 0, 1, 2).contiguous()
    out = F.conv3d(vol, w, bias=t(bias), stride=p)
    return out.flatten(2).transpose(1, 2)  # (B, N, D)


def masking_from_noise(x, noise, mask_ratio):
    n, l, d = x.shape
    len_keep = int(l * (1 - mask_ratio))
    ids_shuffle = torch.argsort(noise, dim=1, stable=True)
    ids_restore = torch.argsort(ids_shuffle, dim=1, stable=True)
    ids_keep = ids_shuffle[:, :len_keep]
    x_masked = torch.gather(x, 1, ids_keep.unsqueeze(-1).repeat(1, 1, d))
    mask = torch.ones([n, l])
    mask[:, :len_keep] = 0
    mask = torch.gather(mask, 1, ids_restore)
    return x_masked, mask, ids_restore


def mae_forward(vol, noise, params, cfg, pos_embed, decoder_pos_embed):
    """Full MAE forward from flax params; returns (pred, mask, latent)."""
    p = params
    x = patch_embed_conv3d(
        t(vol), p["patch_embed"]["proj"]["kernel"], p["patch_embed"]["proj"]["bias"],
        cfg.patch_size,
    )
    pe = t(pos_embed)
    x = x + pe[:, 1:, :]
    x, mask, ids_restore = masking_from_noise(x, t(noise), 0.75)
    cls = t(p["cls_token"]) + pe[:, :1, :]
    x = torch.cat([cls.expand(x.shape[0], -1, -1), x], dim=1)
    for i in range(cfg.depth):
        x = block(x, p[f"blocks_{i}"], cfg.num_heads)
    latent = layer_norm(x, p["norm"]["scale"], p["norm"]["bias"])

    # decoder
    x = linear(latent, p["decoder_embed"]["kernel"], p["decoder_embed"]["bias"])
    b, _, dd = x.shape
    l = ids_restore.shape[1]
    mask_tokens = t(p["mask_token"]).expand(b, l + 1 - x.shape[1], dd)
    x_ = torch.cat([x[:, 1:, :], mask_tokens], dim=1)
    x_ = torch.gather(x_, 1, ids_restore.unsqueeze(-1).repeat(1, 1, dd))
    x = torch.cat([x[:, :1, :], x_], dim=1)
    x = x + t(decoder_pos_embed)
    for i in range(cfg.decoder_depth):
        x = block(x, p[f"decoder_blocks_{i}"], cfg.decoder_num_heads)
    x = layer_norm(x, p["decoder_norm"]["scale"], p["decoder_norm"]["bias"])
    x = linear(x, p["decoder_pred"]["kernel"], p["decoder_pred"]["bias"])
    return x[:, 1:, :], mask, latent


def vit_forward_features(vol, params, cfg, global_pool=True):
    """Classifier ViT forward_features from flax params (reference vit.py:265-284)."""
    p = params
    x = patch_embed_conv3d(
        t(vol), p["patch_embed"]["proj"]["kernel"], p["patch_embed"]["proj"]["bias"],
        cfg.patch_size,
    )
    cls = t(p["cls_token"]).expand(x.shape[0], -1, -1)
    x = torch.cat([cls, x], dim=1)
    x = x + t(p["pos_embed"])
    for i in range(cfg.depth):
        x = block(x, p[f"blocks_{i}"], cfg.num_heads)
    if global_pool:
        pooled = x[:, 1:, :].mean(dim=1)
        return layer_norm(pooled, p["fc_norm"]["scale"], p["fc_norm"]["bias"])
    x = layer_norm(x, p["norm"]["scale"], p["norm"]["bias"])
    return x[:, 0]
