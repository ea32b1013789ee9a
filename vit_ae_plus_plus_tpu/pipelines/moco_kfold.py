"""MoCo-v3 k-fold pretraining + feature extraction baseline.

Parity: reference /root/reference/other_baselines/mocov3/main_3d_moco_k_fold.py
:130-546 — 3 folds, two independently-augmented views, LARS (default,
lr = 0.6 * batch/256, wd 1e-6) or AdamW, warmup(10)+cosine LR, optional cosine
MoCo momentum 0.99 -> 1 (adjust_moco_momentum :539-542), min-loss checkpoint,
then feature extraction from the base encoder trunk (:279-354; 'base_encoder.'
prefix stripping in main_extract_ssl_features.py:306-315 has no analogue here
because the trunk params are addressed directly).

TPU-native: base params, momentum params, and the EMA update live in one
jitted step; there is no mp.spawn/DDP layer (GSPMD handles a 'data' mesh when
given).
"""

from __future__ import annotations

import math
import os
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp
import flax.struct
import optax

from vit_ae_plus_plus_tpu.configs import DataConfig, TrainConfig, ViTConfig
from vit_ae_plus_plus_tpu.data import Loader, get_dataset, default_ssl_transforms
from vit_ae_plus_plus_tpu.data.loader import all_labels
from vit_ae_plus_plus_tpu.data.splits import kfold_indices
from vit_ae_plus_plus_tpu.models.moco import MoCoViT3D, ema_update, moco_loss
from vit_ae_plus_plus_tpu.train import warmup_cosine_schedule
from vit_ae_plus_plus_tpu.train.checkpoint import save_params
from vit_ae_plus_plus_tpu.train.metrics import JsonlLogger
from vit_ae_plus_plus_tpu.train.optim import make_lars


@flax.struct.dataclass
class MoCoState:
    step: jax.Array
    params: any
    batch_stats: any
    momentum_params: any
    momentum_batch_stats: any
    opt_state: any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)


def adjust_moco_momentum(epoch_frac: float, moco_m: float, epochs: int) -> float:
    """Cosine momentum schedule (main_3d_moco_k_fold.py:539-542)."""
    return 1.0 - 0.5 * (1.0 + math.cos(math.pi * epoch_frac / epochs)) * (1.0 - moco_m)


class TwoCropsDataset:
    """Two independently-augmented views of each item (the reference's
    TwoCropsTransform, moco/loader.py:13-21): __getitem__ -> (view1, view2,
    label), exploiting that the underlying dataset re-draws augmentation
    parameters on every access."""

    def __init__(self, dataset):
        self.dataset = dataset

    def __len__(self):
        return len(self.dataset)

    def __getitem__(self, item):
        v1, _, label = self.dataset[item]
        v2, _, _ = self.dataset[item]
        return v1, v2, label


def make_moco_train_step(model, temperature: float = 1.0):
    def step(state: MoCoState, x1, x2, m):
        def loss_fn(params):
            loss, new_bs = moco_loss(
                model,
                {"params": params, "batch_stats": state.batch_stats},
                {"params": state.momentum_params,
                 "batch_stats": state.momentum_batch_stats},
                x1, x2, temperature=temperature, train=True,
            )
            return loss, new_bs

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        # EMA update of the momentum encoder (builder.py:57-61, before key calc
        # in the reference forward — same value since it's pre-update params...
        # the reference updates EMA with the CURRENT base params before the key
        # pass; we use the pre-step params for the loss (keys computed before
        # update there too) and EMA with the new params for the next step.
        new_mom = ema_update(state.momentum_params, new_params, m)
        new_mom_bs = ema_update(state.momentum_batch_stats, new_bs, m)
        return (
            MoCoState(step=state.step + 1, params=new_params, batch_stats=new_bs,
                      momentum_params=new_mom, momentum_batch_stats=new_mom_bs,
                      opt_state=new_opt, tx=state.tx),
            {"loss": loss},
        )

    return jax.jit(step, donate_argnums=(0,))


def moco_kfold(
    data_cfg: DataConfig,
    train_cfg: TrainConfig,
    work_dir: str,
    n_splits: int = 3,
    lr: float = 0.6,
    weight_decay: float = 1e-6,
    moco_m: float = 0.99,
    moco_m_cos: bool = True,
    moco_dim: int = 256,
    moco_mlp_dim: int = 4096,
    temperature: float = 1.0,
    warmup_epochs: int = 10,
    epochs: Optional[int] = None,
    folds=None,
    vit_overrides: Optional[Dict] = None,
) -> Dict:
    epochs = epochs if epochs is not None else train_cfg.epochs
    transforms = default_ssl_transforms()
    # two independently-augmented views: one dataset instance per view
    dataset_v1 = get_dataset(data_cfg.name, "whole", data_cfg, transforms=transforms,
                             use_z_score=data_cfg.use_z_score)
    dataset_no_aug = get_dataset(data_cfg.name, "whole", data_cfg, transforms=None,
                                 use_z_score=data_cfg.use_z_score)
    labels = all_labels(dataset_v1)
    fold_list = folds if folds is not None else kfold_indices(
        labels, n_splits, index_dir=os.path.join(work_dir, "k_fold", "indices_file")
    )
    jsonl = JsonlLogger(work_dir)

    vit_cfg = ViTConfig(
        volume_size=data_cfg.volume_size, in_chans=data_cfg.in_channels,
        num_classes=0, global_pool=False, dtype=train_cfg.compute_dtype,
        **(vit_overrides or {}),
    )
    model = MoCoViT3D(vit_cfg, dim=moco_dim, mlp_dim=moco_mlp_dim)

    two_crops = TwoCropsDataset(dataset_v1)
    results = {}
    for fold_idx, (train_ids, _test_ids) in enumerate(fold_list):
        loader = Loader(two_crops, train_cfg.batch_size, indices=train_ids,
                        shuffle=True, drop_last=True, seed=train_cfg.seed)
        actual_lr = lr * train_cfg.batch_size / 256
        sched = warmup_cosine_schedule(actual_lr, 0.0, warmup_epochs, epochs, len(loader))
        tx = make_lars(sched, weight_decay=weight_decay)

        s = data_cfg.volume_size
        sample = jnp.zeros((train_cfg.batch_size, data_cfg.in_channels, s, s, s))
        variables = model.init({"params": jax.random.PRNGKey(train_cfg.seed)}, sample,
                               use_predictor=True)
        state = MoCoState(
            step=jnp.zeros((), jnp.int32),
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            momentum_params=jax.tree.map(jnp.copy, variables["params"]),
            momentum_batch_stats=jax.tree.map(jnp.copy, variables.get("batch_stats", {})),
            opt_state=tx.init(variables["params"]),
            tx=tx,
        )
        train_step = make_moco_train_step(model, temperature)

        min_loss, best = float("inf"), None
        for epoch in range(epochs):
            epoch_losses = []
            for i, (v1, v2, _lab) in enumerate(loader):
                m = (
                    adjust_moco_momentum(epoch + i / len(loader), moco_m, epochs)
                    if moco_m_cos else moco_m
                )
                # m as a traced scalar so the momentum schedule never recompiles
                state, metrics = train_step(state, v1, v2, jnp.float32(m))
                epoch_losses.append(metrics["loss"])
            mean_loss = float(np.mean([float(l) for l in epoch_losses]))
            if mean_loss < min_loss:
                min_loss = mean_loss
                best = jax.device_get(state.params)
                save_params(
                    os.path.join(work_dir, "checkpoints", f"fold_{fold_idx}",
                                 "checkpoint-min_loss"),
                    best,
                )
            jsonl.write({"train_loss": mean_loss, "epoch": epoch, "fold": fold_idx})
        results[fold_idx] = {"min_loss": min_loss}

        # feature extraction from the MIN-LOSS trunk, as the reference reloads
        # min_loss.pth.tar before extracting (main_3d_moco_k_fold.py:295-322)
        extract_params = best if best is not None else jax.device_get(state.params)
        feat_model = MoCoViT3D(vit_cfg, dim=moco_dim, mlp_dim=moco_mlp_dim)
        feat_dir = os.path.join(work_dir, "ssl_features_dir")
        os.makedirs(feat_dir, exist_ok=True)
        for tag, ids in (("train", train_ids), ("test", _test_ids)):
            fl = Loader(dataset_no_aug, train_cfg.batch_size, indices=np.sort(ids),
                        shuffle=False, drop_last=False)
            feats, labs = [], []
            trunk_apply = jax.jit(
                lambda p, b: feat_model.apply(p, b, train=False, use_predictor=False,
                                              method=_trunk_features)
            )
            for aug, _orig, lab in fl:
                n = aug.shape[0]
                if n < train_cfg.batch_size:
                    pad = train_cfg.batch_size - n
                    aug = np.concatenate([aug, np.repeat(aug[:1], pad, axis=0)])
                out = trunk_apply(
                    {"params": extract_params,
                     "batch_stats": jax.device_get(state.batch_stats)}, aug
                )
                feats.append(np.asarray(out[:n], dtype=np.float32))
                labs.append(lab)
            np.save(os.path.join(feat_dir, f"{tag}_contrast_ssl_features_split_{fold_idx}.npy"),
                    np.concatenate(feats))
            np.save(os.path.join(feat_dir, f"{tag}_contrast_ssl_labels_split_{fold_idx}.npy"),
                    np.concatenate(labs))
    return results


def _trunk_features(module: MoCoViT3D, x, train: bool = False, use_predictor: bool = False):
    """Features from the trunk only (cls token), as the reference extracts from
    base_encoder without the projector head."""
    return module.trunk(x, train=train)
