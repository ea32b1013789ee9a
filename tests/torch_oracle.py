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
    if isinstance(x, torch.Tensor):
        return x  # pass-through so trees of torch Parameters can be injected
    # follow torch's default dtype so the trajectory test can run the whole
    # oracle in float64 (torch.set_default_dtype) while parity tests stay f32
    np_dtype = np.float64 if torch.get_default_dtype() == torch.float64 else np.float32
    return torch.from_numpy(np.asarray(x, dtype=np_dtype))


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


def mae_encode(vol, noise, params, cfg, pos_embed, mask_ratio=0.75):
    """MAE encoder from flax params; returns (latent, mask, ids_restore)."""
    p = params
    x = patch_embed_conv3d(
        t(vol), p["patch_embed"]["proj"]["kernel"], p["patch_embed"]["proj"]["bias"],
        cfg.patch_size,
    )
    pe = t(pos_embed)
    x = x + pe[:, 1:, :]
    x, mask, ids_restore = masking_from_noise(x, t(noise), mask_ratio)
    cls = t(p["cls_token"]) + pe[:, :1, :]
    x = torch.cat([cls.expand(x.shape[0], -1, -1), x], dim=1)
    for i in range(cfg.depth):
        x = block(x, p[f"blocks_{i}"], cfg.num_heads)
    latent = layer_norm(x, p["norm"]["scale"], p["norm"]["bias"])
    return latent, mask, ids_restore


def mae_forward(vol, noise, params, cfg, pos_embed, decoder_pos_embed):
    """Full MAE forward from flax params; returns (pred, mask, latent)."""
    p = params
    latent, mask, ids_restore = mae_encode(vol, noise, params, cfg, pos_embed)

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


# ---------------------------------------------------------------------------
# Trajectory-oracle pieces: differentiable loss components + the reference's
# optimizer/schedule semantics, for the composed training-update parity test
# (tests/test_train_trajectory.py). Mirrors:
#   unpatchify            reference vit_autoenc.py:115-128
#   sobel/gaussian        reference sobel_filter.py:37-45, gaussian_filter.py:5-26
#   predictor (BN MLP)    reference vit_autoenc.py:263-268
#   add_weight_decay      timm 0.5.4 optim_factory (no-decay iff ndim == 1,
#                         i.e. biases/norm scales; cls/mask tokens DECAY),
#                         as called in k_fold_cross_valid_combined_brats.py:168
#   adjust_learning_rate  reference utils/lr_sched.py:9-21
# ---------------------------------------------------------------------------

_SOBEL3 = None


def _sobel_bank():
    global _SOBEL3
    if _SOBEL3 is None:
        gx = torch.tensor(
            [[[1, 0, -1], [2, 0, -2], [1, 0, -1]],
             [[2, 0, -2], [4, 0, -4], [2, 0, -2]],
             [[1, 0, -1], [2, 0, -2], [1, 0, -1]]], dtype=torch.float32)
        gy = torch.tensor(
            [[[-1, -2, -1], [0, 0, 0], [1, 2, 1]],
             [[-2, -4, -2], [0, 0, 0], [2, 4, 2]],
             [[-1, -2, -1], [0, 0, 0], [1, 2, 1]]], dtype=torch.float32)
        gz = torch.tensor(
            [[[-1, -2, -1], [-2, -4, -2], [-1, -2, -1]],
             [[0, 0, 0], [0, 0, 0], [0, 0, 0]],
             [[1, 2, 1], [2, 4, 2], [1, 2, 1]]], dtype=torch.float32)
        _SOBEL3 = torch.stack([gx, gy, gz]).unsqueeze(1)
    return _SOBEL3


def sobel_edges_t(x: torch.Tensor) -> torch.Tensor:
    """(B, C, S, S, S) -> (B, S, S, S), differentiable."""
    out = 0
    bank = _sobel_bank().to(x.dtype)  # integer taps: exact in any float dtype
    for idx in range(x.shape[1]):
        g = F.conv3d(x[:, idx: idx + 1], bank, padding=1)
        out = out + torch.sqrt(g[:, 0] ** 2 + g[:, 1] ** 2 + g[:, 2] ** 2)
    return out


def gaussian_blur_t(x: torch.Tensor, sigma: float) -> torch.Tensor:
    """Dense k (x) k (x) k 3D blur with the reference's non-integer linspace
    taps (gaussian_filter.py:5-26), differentiable. Taps are computed in
    float32 then widened, matching ops/filters.py:138 (np.float32 taps) so
    the f64 trajectory oracle sees bit-identical tap values."""
    ks = int(sigma * 5)
    if ks % 2 == 0:
        ks += 1
    ts = torch.linspace(-ks // 2, ks // 2 + 1, ks, dtype=torch.float32)
    gauss = torch.exp(-((ts / sigma) ** 2) / 2)
    k = gauss / gauss.sum()
    k3d = torch.einsum("i,j,k->ijk", k, k, k)
    k3d = (k3d / k3d.sum()).reshape(1, 1, ks, ks, ks).to(x.dtype)
    outs = [
        F.conv3d(x[:, i: i + 1], k3d, padding=ks // 2) for i in range(x.shape[1])
    ]
    return torch.cat(outs, dim=1)


def unpatchify_t(x: torch.Tensor, patch_size: int) -> torch.Tensor:
    """(N, L, p^3*C) -> (N, C, S, S, S), inverse of ops.patchify layout
    ((z,y,x) raster, (dz, dy, dx, c) within a patch, c fastest)."""
    n, l, d = x.shape
    p = patch_size
    g = round(l ** (1 / 3))
    c = d // (p ** 3)
    x = x.reshape(n, g, g, g, p, p, p, c)
    x = x.permute(0, 7, 1, 4, 2, 5, 3, 6)
    return x.reshape(n, c, g * p, g * p, g * p)


def predictor_forward(x, p, bn_stats, train=True):
    """The contrastive predictor: Linear(no bias) -> BatchNorm1d -> ReLU ->
    Linear, from flax param naming (heads/predictor/...). `bn_stats` holds
    the running mean/var buffers (mutated in train mode, torch semantics:
    running_var updated with the UNBIASED batch var — flax uses the biased
    one, which only affects eval-mode stats, never the training trajectory)."""
    x = x @ t(p["Dense_0"]["kernel"])
    x = F.batch_norm(
        x, bn_stats["mean"], bn_stats["var"],
        t(p["BatchNorm_0"]["scale"]), t(p["BatchNorm_0"]["bias"]),
        training=train, momentum=0.1, eps=1e-5,
    )
    x = F.relu(x)
    return x @ t(p["Dense_1"]["kernel"]) + t(p["Dense_1"]["bias"])


def add_weight_decay_groups(named_leaves, weight_decay):
    """timm 0.5.4 optim_factory.add_weight_decay over a flat list of
    (name, torch.nn.Parameter): no-decay iff ndim == 1 (flax biases and norm
    scales are 1-D, exactly the tensors torch's `len(param.shape) == 1 or
    name.endswith('.bias')` rule exempts); cls_token/mask_token/pos-embed
    style (1, 1, D) leaves DECAY, as in the reference (no skip list passed)."""
    decay, no_decay = [], []
    for _name, param in named_leaves:
        (no_decay if param.ndim == 1 else decay).append(param)
    return [
        {"params": no_decay, "weight_decay": 0.0},
        {"params": decay, "weight_decay": weight_decay},
    ]


def adjust_learning_rate(optimizer, epoch, lr, min_lr, warmup_epochs, total_epochs):
    """reference utils/lr_sched.py:9-21 (fractional `epoch`, per iteration).

    Groups carrying an `lr_scale` entry (the layer-wise-decay groups built by
    `param_groups_lrd` below) get `lr * lr_scale`, exactly as lr_sched.py:17-20.
    """
    if epoch < warmup_epochs:
        cur = lr * epoch / warmup_epochs
    else:
        cur = min_lr + (lr - min_lr) * 0.5 * (
            1.0 + math.cos(math.pi * (epoch - warmup_epochs) / (total_epochs - warmup_epochs))
        )
    for group in optimizer.param_groups:
        group["lr"] = cur * group.get("lr_scale", 1.0)
    return cur


def param_groups_lrd(named_leaves, weight_decay, depth, layer_decay=0.75,
                     no_decay_names=("pos_embed", "cls_token", "dist_token")):
    """reference utils/lr_decay.py::param_groups_lrd over a flat list of
    (flax_path_name, torch.nn.Parameter):

    - no decay iff ndim == 1 OR top-level name in model.no_weight_decay()
      ({pos_embed, cls_token, dist_token}, reference vit.py:251);
    - layer id per get_layer_id_for_vit (lr_decay.py:63-75): cls/pos/patch
      embed -> 0, blocks_i -> i+1, everything else (fc_norm/norm/head) ->
      num_layers = depth + 1;
    - per-group lr_scale = layer_decay ** (num_layers - layer_id),
      consumed by adjust_learning_rate above.
    """
    num_layers = depth + 1
    scales = [layer_decay ** (num_layers - i) for i in range(num_layers + 1)]
    groups = {}
    for name, param in named_leaves:
        top = name.split("/")[0]
        if param.ndim == 1 or top in no_decay_names:
            this_decay = 0.0
        else:
            this_decay = weight_decay
        if top in ("cls_token", "pos_embed") or top.startswith("patch_embed"):
            lid = 0
        elif top.startswith("blocks_"):
            lid = int(top.split("_")[1]) + 1
        else:
            lid = num_layers
        key = (lid, this_decay)
        if key not in groups:
            groups[key] = {"params": [], "weight_decay": this_decay,
                           "lr_scale": scales[lid]}
        groups[key]["params"].append(param)
    return list(groups.values())


# ---------------------------------------------------------------------------
# MoCo-v3 trajectory-oracle pieces (tests/test_moco_trajectory.py). Mirrors:
#   _build_mlp            reference other_baselines/mocov3/moco/builder.py:36-52
#   contrastive_loss      builder.py:63-75 (CE over arange labels, * 2T)
#   _update_momentum_...  builder.py:57-61 (parameters only, buffers excluded)
#   LARS                  moco/optimizer.py:10-43 (trust ratio + wd for >1-D
#                         params only, momentum SGD)
#   adjust_moco_momentum  main_3d_moco_k_fold.py:539-542
# ---------------------------------------------------------------------------


def moco_mlp_forward(x, p, num_layers, last_bn, train=True):
    """The reference's _build_mlp from flax param naming: [Linear(no bias) ->
    BatchNorm1d -> ReLU] x (n-1) -> Linear(no bias) [-> affine-free BN].
    Running buffers are irrelevant to the training trajectory (train-mode BN
    normalises with batch statistics), so none are threaded here."""
    for layer in range(num_layers):
        x = x @ t(p[f"Dense_{layer}"]["kernel"])
        if layer < num_layers - 1:
            bn = p[f"BatchNorm_{layer}"]
            x = F.batch_norm(x, None, None, t(bn["scale"]), t(bn["bias"]),
                             training=train, momentum=0.1, eps=1e-5)
            x = F.relu(x)
        elif last_bn:
            x = F.batch_norm(x, None, None, None, None,
                             training=train, momentum=0.1, eps=1e-5)
    return x


def moco_vit_encode(vol, p, cfg, use_predictor, predictor_layers=2):
    """MoCoViT3D forward from flax params: cls-token trunk feature (the
    reference builds its ViT with global_pool=False, vit_3d.py:226) ->
    3-layer projector [-> 2-layer predictor, base encoder only]."""
    feats = vit_forward_features(vol, p["trunk"], cfg, global_pool=False)
    z = moco_mlp_forward(feats, p["projector"], 3, last_bn=True)
    if use_predictor:
        z = moco_mlp_forward(z, p["predictor"], predictor_layers, last_bn=True)
    return z


def moco_contrastive_loss(q, k, temperature):
    """builder.py:63-75: normalise, q @ k.T / T, CE over arange labels, *2T."""
    q = F.normalize(q, dim=1)
    k = F.normalize(k, dim=1)
    logits = q @ k.T / temperature
    labels = torch.arange(logits.shape[0], dtype=torch.long)
    return F.cross_entropy(logits, labels) * (2.0 * temperature)


def moco_momentum_schedule(epoch, epochs, moco_m):
    """main_3d_moco_k_fold.py:539-542 (fractional epoch, per iteration)."""
    return 1.0 - 0.5 * (1.0 + math.cos(math.pi * epoch / epochs)) * (1.0 - moco_m)


class RefLARS(torch.optim.Optimizer):
    """The MoCo-v3 LARS semantics (moco/optimizer.py:10-43): for parameters
    with ndim > 1, add weight decay and rescale the update by the layer trust
    ratio tc * ||p|| / ||grad + wd*p|| (1 where either norm is zero); <=1-D
    parameters get neither. Then heavy-ball momentum and an SGD step."""

    def __init__(self, params, lr, weight_decay=0.0, momentum=0.9,
                 trust_coefficient=0.001):
        super().__init__(params, dict(lr=lr, weight_decay=weight_decay,
                                      momentum=momentum,
                                      trust_coefficient=trust_coefficient))

    @torch.no_grad()
    def step(self):
        for group in self.param_groups:
            for p in group["params"]:
                if p.grad is None:
                    continue
                d = p.grad
                if p.ndim > 1:
                    d = d + group["weight_decay"] * p
                    pn, dn = torch.norm(p), torch.norm(d)
                    ratio = torch.where(
                        (pn > 0) & (dn > 0),
                        group["trust_coefficient"] * pn / dn,
                        torch.ones_like(pn),
                    )
                    d = d * ratio
                buf = self.state[p].setdefault("mu", torch.zeros_like(p))
                buf.mul_(group["momentum"]).add_(d)
                p.add_(buf, alpha=-group["lr"])


# ---------------------------------------------------------------------------
# 3D-ResNet oracle pieces (tests/test_resnet_trajectory.py). Written from the
# reference architecture and loop:
#   trunk            k_fold_training_scripts/resnet_3d.py:30-59 (BasicBlock),
#                    100-214 (conv1 (7,7,7)/(1,2,2) pad 3, maxpool 3/2/1,
#                    4 stages, shortcut 'B' = 1x1x1 conv + BN, avgpool, fc)
#   training loop    k_fold_training_scripts/train_3d_resnet.py:29-74 (per-
#                    iteration adjust_learning_rate), 262-267 (Adam lr=1e-4,
#                    CrossEntropyLoss(weight=[3, 1]))
# Weights come from the flax param tree (same layout rules as the rest of the
# oracle); BN running buffers live in a side dict and are updated in place by
# F.batch_norm (torch semantics: unbiased batch var into the running buffer).
# ---------------------------------------------------------------------------


def _conv_kernel(k):
    """flax Conv kernel (kD, kH, kW, in, out) -> torch Conv3d weight."""
    return t(k).permute(4, 3, 0, 1, 2)


def _bn3d(x, p, bufs, name, train):
    c = x.shape[1]
    buf = bufs.setdefault(name, {"mean": torch.zeros(c), "var": torch.ones(c)})
    # reduction count per channel, for the biased/unbiased running-var
    # correction applied by the test
    buf["n"] = x.numel() // c
    weight = t(p["scale"]) if p is not None else None
    bias = t(p["bias"]) if p is not None else None
    return F.batch_norm(x, buf["mean"], buf["var"], weight, bias,
                        training=train, momentum=0.1, eps=1e-5)


def _resnet_basic_block(x, p, bufs, prefix, stride, train):
    """resnet_3d.py:30-59 with shortcut type 'B' (conv1x1x1 + BN downsample,
    resnet_3d.py:180-183) from the flax naming (Conv_2/BatchNorm_2 exist only
    when the block downsamples)."""
    out = F.conv3d(x, _conv_kernel(p["Conv_0"]["kernel"]), stride=stride, padding=1)
    out = _bn3d(out, p["BatchNorm_0"], bufs, f"{prefix}/BatchNorm_0", train)
    out = F.relu(out)
    out = F.conv3d(out, _conv_kernel(p["Conv_1"]["kernel"]), padding=1)
    out = _bn3d(out, p["BatchNorm_1"], bufs, f"{prefix}/BatchNorm_1", train)
    if "Conv_2" in p:
        residual = F.conv3d(x, _conv_kernel(p["Conv_2"]["kernel"]), stride=stride)
        residual = _bn3d(residual, p["BatchNorm_2"], bufs,
                         f"{prefix}/BatchNorm_2", train)
    else:
        residual = x
    return F.relu(out + residual)


def resnet3d_forward(x, p, bufs, layers=(1, 1, 1, 1), train=True):
    """ResNet-3D forward (BasicBlock depths: 10/18/34), NCDHW in, logits out
    (resnet_3d.py:198-214)."""
    x = F.conv3d(x, _conv_kernel(p["Conv_0"]["kernel"]), stride=(1, 2, 2),
                 padding=(3, 3, 3))
    x = _bn3d(x, p["BatchNorm_0"], bufs, "BatchNorm_0", train)
    x = F.relu(x)
    x = F.max_pool3d(x, kernel_size=3, stride=2, padding=1)
    i = 0
    for stage, n_blocks in enumerate(layers):
        for b in range(n_blocks):
            stride = 2 if (stage > 0 and b == 0) else 1
            x = _resnet_basic_block(x, p[f"BasicBlock3D_{i}"], bufs,
                                    f"BasicBlock3D_{i}", stride, train)
            i += 1
    x = x.mean(dim=(2, 3, 4))  # AdaptiveAvgPool3d((1,1,1)) + flatten
    return linear(x, p["Dense_0"]["kernel"], p["Dense_0"]["bias"])


def soft_ce_with_weights(logits, soft_targets, weights):
    """reference utils/custom_loss.py::SoftCrossEntropyWithWeightsLoss:
    sum over the BATCH dim of -y * (log_softmax(logits) * w), normalised by
    w.sum(), then mean over classes (the dim=0 choice its comment insists
    on)."""
    weighted_logits = torch.nn.functional.log_softmax(logits, dim=-1) * weights
    return (torch.sum(-soft_targets * weighted_logits, dim=0) / weights.sum()).mean()
