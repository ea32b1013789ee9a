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
from vit_ae_plus_plus_tpu.data.loader import all_labels, device_prefetch
from vit_ae_plus_plus_tpu.data.splits import kfold_indices
from vit_ae_plus_plus_tpu.models.moco import (
    MoCoResNet3D,
    MoCoViT3D,
    ema_update,
    moco_loss,
)
from vit_ae_plus_plus_tpu.train import warmup_cosine_schedule
from vit_ae_plus_plus_tpu.train.checkpoint import load_params, save_params
from vit_ae_plus_plus_tpu.train.metrics import JsonlLogger
from vit_ae_plus_plus_tpu.train.optim import make_lars
from vit_ae_plus_plus_tpu.utils.locking import locked_workdir


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


def make_moco_train_step(model, temperature: float = 1.0, mesh=None,
                         state_shardings=None):
    def step(state: MoCoState, x1, x2, m):
        # EMA update of the momentum encoder with the CURRENT (pre-step) base
        # params, BEFORE the key forward — the reference order (builder.py:
        # 90-96: _update_momentum_encoder(m) runs inside forward(), ahead of
        # the key passes and of optimizer.step()). Keys at iteration i are
        # therefore computed from m(i)*M_i + (1-m(i))*theta_i; updating after
        # the optimizer step instead would apply the cosine m-schedule one
        # iteration late (pinned by tests/test_moco_trajectory.py).
        new_mom = ema_update(state.momentum_params, state.params, m)

        def loss_fn(params):
            loss, new_bs = moco_loss(
                model,
                {"params": params, "batch_stats": state.batch_stats},
                {"params": new_mom,
                 "batch_stats": state.momentum_batch_stats},
                x1, x2, temperature=temperature, train=True,
            )
            return loss, new_bs

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        # torch never EMAs BN buffers (_update_momentum_encoder iterates
        # parameters only) and key passes run on batch stats, so these buffers
        # never influence training; EMA is this framework's choice of proxy
        new_mom_bs = ema_update(state.momentum_batch_stats, new_bs, m)
        return (
            MoCoState(step=state.step + 1, params=new_params, batch_stats=new_bs,
                      momentum_params=new_mom, momentum_batch_stats=new_mom_bs,
                      opt_state=new_opt, tx=state.tx),
            {"loss": loss},
        )

    if mesh is not None:
        # data-parallel over the mesh, exactly as pretrain_kfold's step: the
        # reference's MoCo is its MOST distributed path (mp.spawn + DDP,
        # main_3d_moco_k_fold.py:153-188) — here the batch shards over 'data'
        # and GSPMD emits the gradient/BN reductions. With `state_shardings`
        # (parallel/fsdp.py shard_moco_state_fsdp) both encoder copies and
        # the LARS moments stay 1/data-sharded through the step.
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        st = state_shardings if state_shardings is not None else repl
        return jax.jit(step, in_shardings=(st, data, data, repl),
                       out_shardings=(st, repl), donate_argnums=(0,))
    return jax.jit(step, donate_argnums=(0,))


def build_moco_model(
    data_cfg: DataConfig,
    compute_dtype: str = "float32",
    arch: str = "vit",
    resnet_depth: int = 10,
    moco_dim: int = 256,
    moco_mlp_dim: int = 4096,
    vit_overrides: Optional[Dict] = None,
):
    """MoCo model for either trunk (reference builder.py:101-124)."""
    if arch == "resnet":
        from vit_ae_plus_plus_tpu.models.vit import _dt

        return MoCoResNet3D(depth=resnet_depth, dim=moco_dim,
                            mlp_dim=moco_mlp_dim, dtype=_dt(compute_dtype))
    vit_cfg = ViTConfig(
        volume_size=data_cfg.volume_size, in_chans=data_cfg.in_channels,
        num_classes=0, global_pool=False, dtype=compute_dtype,
        **(vit_overrides or {}),
    )
    return MoCoViT3D(vit_cfg, dim=moco_dim, mlp_dim=moco_mlp_dim)


@locked_workdir  # refuse a second live writer (utils/locking.py)
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
    arch: str = "vit",
    resnet_depth: int = 10,
    mesh=None,
    fsdp: bool = False,
    fsdp_min_size: Optional[int] = None,  # leaf-size sharding floor override
    # (parallel/fsdp.py _MIN_SHARD_ELEMENTS; tests use tiny trunks)
) -> Dict:
    epochs = epochs if epochs is not None else train_cfg.epochs
    if fsdp:
        if mesh is None or mesh.shape.get("data", 1) <= 1:
            raise ValueError("--fsdp needs a data mesh (--n-devices > 1)")
        if train_cfg.batch_size % mesh.shape["data"]:
            raise ValueError(
                f"--batch-size {train_cfg.batch_size} must divide by the data "
                f"mesh ({mesh.shape['data']} devices) under --fsdp"
            )
        if arch != "vit":
            raise ValueError("--fsdp is implemented for the ViT MoCo trunk; "
                             "the ResNet trunk is small enough to replicate")
        # pin the trunk's residual stream P('data') so the partitioner
        # gathers the sharded weights, not activations (models/vit.py
        # constrain_batch — resolved through the ambient mesh)
        vit_overrides = {**(vit_overrides or {}), "batch_shard_activations": True}
        jax.set_mesh(mesh)
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

    model = build_moco_model(
        data_cfg, train_cfg.compute_dtype, arch, resnet_depth,
        moco_dim, moco_mlp_dim, vit_overrides,
    )

    two_crops = TwoCropsDataset(dataset_v1)
    batch_sharding = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        batch_sharding = NamedSharding(mesh, P("data"))
    results = {}
    for fold_idx, (train_ids, _test_ids) in enumerate(fold_list):
        loader = Loader(two_crops, train_cfg.batch_size, indices=train_ids,
                        shuffle=True, drop_last=True, seed=train_cfg.seed,
                        shard_across_processes=mesh is not None)
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
        state_shardings = None
        if fsdp:
            from vit_ae_plus_plus_tpu.parallel.fsdp import (
                _MIN_SHARD_ELEMENTS, shard_moco_state_fsdp,
            )

            state, state_shardings = shard_moco_state_fsdp(
                state, mesh, fsdp_min_size or _MIN_SHARD_ELEMENTS)
            print(f"Fold {fold_idx}: MoCo FSDP over data={mesh.shape['data']} "
                  f"(both encoders + LARS moments 1/{mesh.shape['data']}-sharded)")
        elif mesh is not None:
            from vit_ae_plus_plus_tpu.parallel import replicate

            state = replicate(state, mesh)
        train_step = make_moco_train_step(model, temperature, mesh=mesh,
                                          state_shardings=state_shardings)

        ckpt_path = os.path.join(work_dir, "checkpoints", f"fold_{fold_idx}",
                                 "checkpoint-min_loss")
        min_loss = float("inf")
        start_epoch = 0
        # --ckpt-every N: same disk-write cadence as pretrain_kfold — the
        # resume state flushes every N epochs and the interim min-loss best
        # lives as a device-side copy until the next flush (ADVICE r4)
        ck_every = max(1, getattr(train_cfg, "ckpt_every", 1))
        best_dev, best_dirty = None, False
        # preemption-safe resume (matches pretrain_kfold's semantics): the
        # full MoCo state — BOTH encoder copies, their BN stats, and the
        # LARS moments — is checkpointed on the --ckpt-every cadence and
        # restored with the best loss so a resumed run cannot overwrite the
        # min-loss ckpt with worse weights
        resume_path = os.path.join(work_dir, "checkpoints", f"fold_{fold_idx}",
                                   "resume-state")
        if train_cfg.resume and os.path.exists(resume_path):
            host_state = jax.device_get(state)
            template = {
                "params": host_state.params,
                "batch_stats": host_state.batch_stats,
                "momentum_params": host_state.momentum_params,
                "momentum_batch_stats": host_state.momentum_batch_stats,
                "opt_state": host_state.opt_state,
                "step": np.asarray(0, np.int32),
                "epoch": np.asarray(0),
                "min_loss": np.asarray(0.0, np.float64),
            }
            payload = load_params(resume_path, template)
            state = state.replace(
                params=payload["params"], batch_stats=payload["batch_stats"],
                momentum_params=payload["momentum_params"],
                momentum_batch_stats=payload["momentum_batch_stats"],
                opt_state=payload["opt_state"],
                step=jnp.asarray(payload["step"]),
            )
            start_epoch = int(payload["epoch"]) + 1
            min_loss = float(payload["min_loss"])
            # restore the fold's device placement (FSDP shards / replication)
            if state_shardings is not None:
                state = jax.device_put(state, state_shardings)
            elif mesh is not None:
                from vit_ae_plus_plus_tpu.parallel import replicate

                state = replicate(state, mesh)
            loader.set_epoch(start_epoch)  # resume the shuffle schedule too
            print(f"Fold {fold_idx}: resumed at epoch {start_epoch} "
                  f"(min loss so far {min_loss:.4f})")
        for epoch in range(start_epoch, epochs):
            epoch_losses = []
            batches = (device_prefetch(loader, size=2, sharding=batch_sharding)
                       if mesh is not None else loader)
            for i, (v1, v2, _lab) in enumerate(batches):
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
                # params AND the matching batch_stats: the reference saves and
                # reloads the full state_dict incl. BN buffers
                # (main_3d_moco_k_fold.py:261-268, 295-322)
                if ck_every == 1:
                    save_params(ckpt_path, {
                        "params": jax.device_get(state.params),
                        "batch_stats": jax.device_get(state.batch_stats),
                    })
                else:
                    # device-side (HBM->HBM) copy: the jitted step may donate
                    # its state buffers, so state.params itself can't be held
                    best_dev = {
                        "params": jax.tree.map(jnp.copy, state.params),
                        "batch_stats": jax.tree.map(jnp.copy, state.batch_stats),
                    }
                    best_dirty = True
            jsonl.write({"train_loss": mean_loss, "epoch": epoch, "fold": fold_idx})
            if epoch % ck_every == ck_every - 1 or epoch == epochs - 1:
                if best_dirty:
                    save_params(ckpt_path, jax.device_get(best_dev))
                    best_dirty = False
                host_state = jax.device_get(state)
                save_params(resume_path, {
                    "params": host_state.params,
                    "batch_stats": host_state.batch_stats,
                    "momentum_params": host_state.momentum_params,
                    "momentum_batch_stats": host_state.momentum_batch_stats,
                    "opt_state": host_state.opt_state,
                    "step": np.asarray(host_state.step, np.int32),
                    "epoch": np.asarray(epoch),
                    "min_loss": np.asarray(min_loss, np.float64),
                })
        results[fold_idx] = {"min_loss": min_loss}

        # feature extraction FROM THE SAVED min-loss checkpoint, as the
        # reference reloads min_loss.pth.tar before extracting
        # (main_3d_moco_k_fold.py:295-322)
        feat_dir = os.path.join(work_dir, "ssl_features_dir")
        for tag, ids in (("train", train_ids), ("test", _test_ids)):
            extract_moco_features(
                model, ckpt_path, dataset_no_aug, np.sort(ids),
                train_cfg.batch_size, feat_dir, tag, fold_idx,
            )
    return results


def extract_moco_features(
    model,
    checkpoint_path: str,
    dataset,
    ids,
    batch_size: int,
    out_dir: str,
    tag: str,
    fold_idx: int,
) -> str:
    """Trunk-only features from any saved MoCo checkpoint (the standalone
    extractor — reference main_extract_ssl_features.py:100-284; the
    'base_encoder.' prefix stripping there has no analogue because the trunk
    params are addressed directly in the variables tree)."""
    s_dims = dataset[0][0].shape  # (C, D, H, W)
    sample = jnp.zeros((1, *s_dims), jnp.float32)
    template = jax.tree.map(
        np.zeros_like,
        jax.device_get(model.init({"params": jax.random.PRNGKey(0)}, sample,
                                  use_predictor=True)),
    )
    restored = load_params(checkpoint_path, {
        "params": template["params"],
        "batch_stats": template.get("batch_stats", {}),
    })
    trunk_apply = jax.jit(
        lambda v, b: model.apply(v, b, train=False, method=model.trunk_features)
    )
    loader = Loader(dataset, batch_size, indices=ids, shuffle=False, drop_last=False)
    feats, labs = [], []
    for aug, _orig, lab in loader:
        n = aug.shape[0]
        if n < batch_size:  # pad final partial batch for static shapes
            aug = np.concatenate([aug, np.repeat(aug[:1], batch_size - n, axis=0)])
        out = trunk_apply(restored, aug)
        feats.append(np.asarray(out[:n], dtype=np.float32))
        labs.append(lab)
    os.makedirs(out_dir, exist_ok=True)
    feat_path = os.path.join(out_dir, f"{tag}_contrast_ssl_features_split_{fold_idx}.npy")
    np.save(feat_path, np.concatenate(feats))
    np.save(os.path.join(out_dir, f"{tag}_contrast_ssl_labels_split_{fold_idx}.npy"),
            np.concatenate(labs))
    return feat_path


def moco_extract(
    data_cfg: DataConfig,
    checkpoint: str,
    work_dir: str,
    batch_size: int = 4,
    arch: str = "vit",
    resnet_depth: int = 10,
    moco_dim: int = 256,
    moco_mlp_dim: int = 4096,
    n_splits: int = 3,
    fold_idx: Optional[int] = None,
    compute_dtype: str = "float32",
    vit_overrides: Optional[Dict] = None,
) -> Dict:
    """Standalone CLI entry: re-extract features from existing MoCo
    checkpoint(s) without retraining (reference
    main_extract_ssl_features.py:100-284). When `checkpoint` is a work dir
    produced by moco_kfold, every fold's min-loss checkpoint is processed
    (restricted to `fold_idx` if given); a direct checkpoint path extracts
    the 'whole' dataset once."""
    model = build_moco_model(data_cfg, compute_dtype, arch, resnet_depth,
                             moco_dim, moco_mlp_dim, vit_overrides)
    dataset = get_dataset(data_cfg.name, "whole", data_cfg, transforms=None,
                          use_z_score=data_cfg.use_z_score)
    out_dir = os.path.join(work_dir, "ssl_features_dir")
    kfold_root = os.path.join(checkpoint, "checkpoints")
    results = {}
    if os.path.isdir(kfold_root):
        labels = all_labels(dataset)
        fold_list = kfold_indices(
            labels, n_splits,
            index_dir=os.path.join(checkpoint, "k_fold", "indices_file"),
        )
        for idx, (train_ids, test_ids) in enumerate(fold_list):
            if fold_idx is not None and idx != fold_idx:
                continue
            ckpt = os.path.join(kfold_root, f"fold_{idx}", "checkpoint-min_loss")
            for tag, ids in (("train", train_ids), ("test", test_ids)):
                results[f"fold{idx}_{tag}"] = extract_moco_features(
                    model, ckpt, dataset, np.sort(ids), batch_size, out_dir, tag, idx,
                )
    else:
        results["whole"] = extract_moco_features(
            model, checkpoint, dataset, np.arange(len(dataset)), batch_size,
            out_dir, "whole", fold_idx or 0,
        )
    return results
