"""Optimizers and schedules.

Parity targets:
- warmup + half-cosine per-*iteration* LR in fractional epochs
  (/root/reference/utils/lr_sched.py:9-21);
- timm-style decay/no-decay grouping: weight decay only for params with
  ndim > 1 (what `optim_factory.add_weight_decay` does for a model without a
  no_weight_decay attr, as the MAE is — k_fold_…_brats.py:168);
- BEiT layer-wise LR decay (utils/lr_decay.py:15-75) as an optax mask tree;
- LARS (other_baselines/mocov3/moco/optimizer.py:10-43) for the MoCo baseline.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax


def warmup_cosine_schedule(
    base_lr: float,
    min_lr: float,
    warmup_epochs: float,
    total_epochs: float,
    steps_per_epoch: int,
) -> optax.Schedule:
    """Per-step LR: linear warmup in fractional epochs, then half-cosine.

    Exactly reference lr_sched.py:9-21 with epoch = step / steps_per_epoch.
    """

    def schedule(count):
        # optax's step counter is int32, and int32 / python-int promotes to
        # FLOAT32 even under jax_enable_x64 — which silently rounded the lr
        # to f32 (a uniform ~1.5e-8 relative shift on every update, caught by
        # tests/test_moco_trajectory.py). Cast to the default float first.
        epoch = jnp.asarray(count, jnp.result_type(float)) / steps_per_epoch
        warm = base_lr * epoch / jnp.maximum(warmup_epochs, 1e-8)
        denom = max(total_epochs - warmup_epochs, 1e-8)
        cos = min_lr + (base_lr - min_lr) * 0.5 * (
            1.0 + jnp.cos(math.pi * (epoch - warmup_epochs) / denom)
        )
        return jnp.where(epoch < warmup_epochs, warm, cos)

    return schedule


def weight_decay_mask(params) -> Any:
    """True (decay) for weight matrices — biases/norm scales exempt.

    Leaves under the pipeline's stacked block trees ('enc_stack'/'dec_stack',
    parallel/pp.py to_pp_params) carry an extra leading (L,) layer dim, so
    the matrix test there is ndim > 2: a stacked bias is (L, D) and must stay
    exempt exactly like its per-layer (D,) form."""

    def mask(path, p):
        stacked = any(
            str(getattr(k, "key", getattr(k, "name", ""))) in ("enc_stack", "dec_stack")
            for k in path
        )
        return p.ndim > (2 if stacked else 1)

    return jax.tree_util.tree_map_with_path(mask, params)


def finetune_weight_decay_mask(params) -> Any:
    """Fine-tune decay mask: ndim > 1 AND not in the model's no_weight_decay
    set {pos_embed, cls_token} (reference lr_decay.py:32 +
    vit.py no_weight_decay():251)."""
    exempt = {"pos_embed", "cls_token", "dist_token", "mask_token"}

    def mask(path, p):
        name = str(getattr(path[0], "key", path[0])) if path else ""
        return p.ndim > 1 and name not in exempt

    return jax.tree_util.tree_map_with_path(mask, params)


def make_adamw(
    learning_rate: optax.Schedule | float,
    weight_decay: float = 0.05,
    b1: float = 0.9,
    b2: float = 0.95,
    clip_grad: Optional[float] = None,
    accum_iter: int = 1,
) -> optax.GradientTransformation:
    """AdamW(0.9, 0.95) with masked decay, matching the reference SSL optimiser
    (k_fold_cross_valid_combined_brats.py:168-169), plus optional global-norm
    clipping and gradient accumulation (`accum_iter`, train_one_epoch.py:70-74)."""
    tx = optax.adamw(
        learning_rate, b1=b1, b2=b2, weight_decay=weight_decay, mask=weight_decay_mask
    )
    if clip_grad is not None:
        tx = optax.chain(optax.clip_by_global_norm(clip_grad), tx)
    if accum_iter > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum_iter)
    return tx


def _vit_layer_id(path: tuple, num_layers: int) -> int:
    """Layer id for a flax param path, following reference lr_decay.py:64-75."""
    name = path[0] if path else ""
    if name in ("cls_token", "pos_embed") or name.startswith("patch_embed"):
        return 0
    if name.startswith("blocks_"):
        return int(name.split("_")[1]) + 1
    return num_layers


def layerwise_lr_decay_mask(params, depth: int, layer_decay: float = 0.75) -> Any:
    """Per-leaf LR scale tree: layer_decay^(num_layers - layer_id).

    num_layers = depth + 1 (reference lr_decay.py:23-25). Multiply gradients by
    this tree via `scale_by_layer` below, which composes with any optimiser.
    """
    num_layers = depth + 1

    def scale_for(path):
        keys = tuple(getattr(k, "key", getattr(k, "idx", None)) for k in path)
        lid = _vit_layer_id([str(k) for k in keys], num_layers)
        return layer_decay ** (num_layers - lid)

    return jax.tree_util.tree_map_with_path(lambda path, p: scale_for(path), params)


def scale_by_trees(scales) -> optax.GradientTransformation:
    """Multiply updates leaf-wise by a static tree of scalars (the optax
    equivalent of per-param-group lr_scale, reference lr_sched.py:16-20)."""

    def init(params):
        return optax.EmptyState()

    def update(updates, state, params=None):
        return jax.tree.map(lambda u, s: u * s, updates, scales), state

    return optax.GradientTransformation(init, update)


def make_layerwise_adamw(
    params,
    depth: int,
    learning_rate: optax.Schedule | float,
    weight_decay: float = 0.05,
    layer_decay: float = 0.75,
) -> optax.GradientTransformation:
    """AdamW with BEiT layer-wise LR decay (fine-tune path,
    post_training_utils/fine_tune_epoch.py:358-363)."""
    scales = layerwise_lr_decay_mask(params, depth, layer_decay)
    return optax.chain(
        optax.adamw(learning_rate, b1=0.9, b2=0.999, weight_decay=weight_decay,
                    mask=finetune_weight_decay_mask),
        scale_by_trees(scales),
    )


def make_lars(
    learning_rate: optax.Schedule | float,
    weight_decay: float = 1e-6,
    momentum: float = 0.9,
    trust_coefficient: float = 0.001,
) -> optax.GradientTransformation:
    """LARS: layer-wise trust-ratio SGD, skipping <=1-D params, matching the
    MoCo-v3 optimiser (moco/optimizer.py:10-43).

    NOT optax.lars: optax chains scale_by_learning_rate BEFORE trace, so its
    momentum buffer accumulates lr-scaled steps (mu += lr_i * dp_i). The
    reference accumulates RAW updates and applies the current lr to the whole
    buffer (mu = momentum*mu + dp; p -= lr_i * mu) — identical under a
    constant lr, different under MoCo's per-iteration cosine schedule (each
    iteration rescales the accumulated history). Pinned by
    tests/test_moco_trajectory.py, which caught the optax ordering."""
    return optax.chain(
        optax.add_decayed_weights(weight_decay, mask=weight_decay_mask),
        optax.masked(
            optax.scale_by_trust_ratio(trust_coefficient=trust_coefficient),
            weight_decay_mask,
        ),
        optax.trace(decay=momentum),
        optax.scale_by_learning_rate(learning_rate),
    )


def make_sgd(learning_rate, momentum: float = 0.9) -> optax.GradientTransformation:
    """Plain SGD+momentum for the linear probe
    (k_fold_cross_valid_linear_projection.py:270-272)."""
    return optax.sgd(learning_rate, momentum=momentum)
