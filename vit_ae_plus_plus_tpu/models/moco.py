"""MoCo-v3 comparison baseline (3D).

Parity: reference /root/reference/other_baselines/mocov3/moco/builder.py:11-124
— base + momentum encoder (ViT-3D with learned pos-embed, or ResNet-3D),
projector grafted in place of the classifier head (3-layer for ViT, 2-layer
for ResNet, SimCLR-style last affine-free BN), 2-layer predictor, EMA momentum
update, and the symmetric InfoNCE loss with temperature T and single-device
arange labels (builder.py:63-75 — the all-gather is commented out there too).

TPU-native design: the momentum encoder is not a second stateful module —
it's a second PARAMETER TREE updated by `ema_update` (pure tree math) inside
the jitted step; both encoders share one flax module definition. Multi-device
InfoNCE negatives would use `jax.lax.all_gather` over the 'data' axis; like
the reference we keep per-device negatives.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn
import optax

from vit_ae_plus_plus_tpu.configs import ViTConfig
from vit_ae_plus_plus_tpu.models.vit import VisionTransformer3D, _dt, torch_linear_init


class MoCoMLP(nn.Module):
    """_build_mlp equivalent (builder.py:36-52): [Dense(no bias) -> BN -> ReLU]
    x (n-1) -> Dense(no bias) [-> affine-free BN if last_bn]."""

    num_layers: int
    mlp_dim: int
    out_dim: int
    last_bn: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        # BN statistics at least at f32 (the bf16 policy everywhere else in the
        # package, ops/losses.py::at_least_f32); widens to f64 under the
        # trajectory-oracle tests so the heads don't silently round to f32
        bn_dtype = jnp.promote_types(jnp.float32, self.dtype)
        for layer in range(self.num_layers):
            dim2 = self.out_dim if layer == self.num_layers - 1 else self.mlp_dim
            x = nn.Dense(dim2, use_bias=False, kernel_init=torch_linear_init,
                         dtype=self.dtype)(x)
            if layer < self.num_layers - 1:
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, dtype=bn_dtype)(x)
                x = nn.relu(x)
            elif self.last_bn:
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                                 use_bias=False, use_scale=False, dtype=bn_dtype)(x)
        return x


class MoCoViT3D(nn.Module):
    """Encoder trunk + grafted projector; `use_predictor` applies the 2-layer
    predictor head (base encoder only, builder.py:88-89)."""

    cfg: ViTConfig
    dim: int = 256
    mlp_dim: int = 4096

    def setup(self):
        # trunk with no classifier head (head deleted, builder.py:116-117)
        trunk_cfg = ViTConfig(**{**self.cfg.__dict__, "num_classes": 0})
        self.trunk = VisionTransformer3D(trunk_cfg)
        dt = _dt(self.cfg.dtype)  # heads follow the trunk's compute dtype
        self.projector = MoCoMLP(3, self.mlp_dim, self.dim, last_bn=True, dtype=dt)
        self.predictor = MoCoMLP(2, self.mlp_dim, self.dim, last_bn=True, dtype=dt)

    def __call__(self, x, train: bool = True, use_predictor: bool = False):
        feats = self.trunk(x, train=train)
        z = self.projector(feats, train=train)
        if use_predictor:
            z = self.predictor(z, train=train)
        return z

    def trunk_features(self, x, train: bool = False):
        """Projector-free trunk features — what the reference extracts after
        stripping the 'base_encoder.' prefix and the head
        (main_extract_ssl_features.py:184-195)."""
        return self.trunk(x, train=train)


class MoCoResNet3D(nn.Module):
    """ResNet-3D trunk variant (MoCo_ResNet, reference builder.py:101-111):
    2-layer projector grafted in place of `fc`, and — unlike the ViT variant —
    a 2-layer predictor WITHOUT the trailing BN (builder.py:111 passes
    last_bn=False only for ResNet). Trunk: moco/resent3d_base.py:1-242, shared
    here with the supervised baseline (models/resnet3d.py)."""

    depth: int = 10
    dim: int = 256
    mlp_dim: int = 4096
    dtype: Any = jnp.float32

    def setup(self):
        from vit_ae_plus_plus_tpu.models.resnet3d import ResNet3D

        # n_classes is irrelevant: the fc head is never called (deleted in the
        # reference, builder.py:104) — return_features bypasses it
        self.trunk = ResNet3D(depth=self.depth, n_classes=0)
        self.projector = MoCoMLP(2, self.mlp_dim, self.dim, last_bn=True,
                                 dtype=self.dtype)
        self.predictor = MoCoMLP(2, self.mlp_dim, self.dim, last_bn=False,
                                 dtype=self.dtype)

    def __call__(self, x, train: bool = True, use_predictor: bool = False):
        feats = self.trunk(x, train=train, return_features=True)
        z = self.projector(feats, train=train)
        if use_predictor:
            z = self.predictor(z, train=train)
        return z

    def trunk_features(self, x, train: bool = False):
        return self.trunk(x, train=train, return_features=True)


def ema_update(momentum_params, base_params, m: float):
    """param_m = m * param_m + (1 - m) * param_b (builder.py:57-61)."""
    return jax.tree.map(lambda pm, pb: pm * m + pb * (1.0 - m), momentum_params, base_params)


def info_nce(q: jnp.ndarray, k: jnp.ndarray, temperature: float = 1.0) -> jnp.ndarray:
    """InfoNCE with arange labels (builder.py:63-75): loss * 2T."""
    q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
    k = k / jnp.linalg.norm(k, axis=1, keepdims=True)
    logits = (q @ k.T) / temperature
    n = logits.shape[0]
    labels = jnp.arange(n)
    loss = optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
    return loss * (2.0 * temperature)


def moco_loss(model, base_variables, momentum_variables, x1, x2, temperature=1.0,
              train=True) -> Tuple[jnp.ndarray, Any]:
    """Symmetric MoCo-v3 objective (builder.py:77-98). Returns (loss, mutated
    batch_stats of the base encoder)."""
    if train:
        q1, mut1 = model.apply(base_variables, x1, train=True, use_predictor=True,
                               mutable=["batch_stats"])
        base_variables = {"params": base_variables["params"],
                          "batch_stats": mut1["batch_stats"]}
        q2, mut2 = model.apply(base_variables, x2, train=True, use_predictor=True,
                               mutable=["batch_stats"])
        new_bs = mut2["batch_stats"]
    else:
        q1 = model.apply(base_variables, x1, train=False, use_predictor=True)
        q2 = model.apply(base_variables, x2, train=False, use_predictor=True)
        new_bs = base_variables.get("batch_stats", {})

    # momentum targets, no gradient. The reference momentum encoder runs in
    # train mode (builder.py:94-96 under model.train()), i.e. its BN uses the
    # CURRENT BATCH statistics — so keys here are computed with train=True and
    # the incidental running-stat updates are discarded (torch's buffers are
    # likewise never EMA'd: _update_momentum_encoder iterates parameters only).
    k1, _ = model.apply(momentum_variables, x1, train=True, use_predictor=False,
                        mutable=["batch_stats"])
    k2, _ = model.apply(momentum_variables, x2, train=True, use_predictor=False,
                        mutable=["batch_stats"])
    k1, k2 = jax.lax.stop_gradient(k1), jax.lax.stop_gradient(k2)
    return info_nce(q1, k2, temperature) + info_nce(q2, k1, temperature), new_bs
