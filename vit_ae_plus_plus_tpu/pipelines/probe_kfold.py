"""K-fold linear probe / fine-tune driver.

Parity: reference /root/reference/k_fold_training_scripts/
k_fold_cross_valid_linear_projection.py:105-388 (probe, 3 folds) and
post_training_utils/fine_tune_epoch.py:216-443 (single-run fine-tune):
per fold -> 80/20 train/val split (random_state 42, disjointness assert),
load that fold's pretrained MAE encoder into a classifier ViT, re-init head
with trunc_normal(2e-5), freeze backbone (probe) or layer-wise-lrd AdamW
(fine-tune), train with (soft-)weighted CE, select best models by 3 criteria
on val, final test evaluation of each best model.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp
from sklearn.model_selection import train_test_split

from vit_ae_plus_plus_tpu.configs import DataConfig, TrainConfig
from vit_ae_plus_plus_tpu.data import Loader, get_dataset, default_ssl_transforms
from vit_ae_plus_plus_tpu.data.loader import all_labels
from vit_ae_plus_plus_tpu.data.splits import kfold_indices, sanity_check_disjoint
from vit_ae_plus_plus_tpu.models import MODEL_ZOO, build_model
from vit_ae_plus_plus_tpu.pipelines.finetune import (
    BestModelTracker,
    evaluate,
    freeze_backbone_tx,
    head_init_2e5,
    make_supervised_steps,
)
from vit_ae_plus_plus_tpu.pipelines.transfer import mae_params_to_vit
from vit_ae_plus_plus_tpu.train import TrainState, warmup_cosine_schedule
from vit_ae_plus_plus_tpu.train.checkpoint import load_params, save_params
from vit_ae_plus_plus_tpu.train.metrics import JsonlLogger
from vit_ae_plus_plus_tpu.train.optim import make_layerwise_adamw, make_sgd
from vit_ae_plus_plus_tpu.utils.locking import locked_workdir


@locked_workdir  # refuse a second live writer (utils/locking.py)
def probe_kfold(
    data_cfg: DataConfig,
    train_cfg: TrainConfig,
    work_dir: str,
    pretrain_dir: str,
    model_name: str = "contr_mae_vit_base_patch16",
    n_splits: int = 3,
    fix_backbone: bool = True,
    use_mixup: bool = False,
    class_weights: Optional[np.ndarray] = None,
    blr: float = 1e-3,  # reference linear_projection.py:63 default
    layer_decay: float = 0.75,
    folds=None,
    epochs: Optional[int] = None,
    eval_only: bool = False,
    mesh=None,
) -> Dict:
    """Returns per-fold test stats for each best-model criterion.

    eval_only skips training and evaluates the saved best checkpoints
    (reference linear_projection.py:197-207 / fine_tune_epoch.py:304-311).
    """
    epochs = epochs if epochs is not None else train_cfg.epochs
    dataset_aug = get_dataset(data_cfg.name, "whole", data_cfg,
                              transforms=default_ssl_transforms(),
                              use_z_score=data_cfg.use_z_score)
    dataset_no_aug = get_dataset(data_cfg.name, "whole", data_cfg, transforms=None,
                                 use_z_score=data_cfg.use_z_score)
    labels = all_labels(dataset_aug)
    fold_list = folds if folds is not None else kfold_indices(
        labels, n_splits, index_dir=os.path.join(work_dir, "k_fold", "indices_file")
    )
    jsonl = JsonlLogger(work_dir)

    mae_cfg = MODEL_ZOO[model_name](
        volume_size=data_cfg.volume_size, in_chans=data_cfg.in_channels,
        dtype=train_cfg.compute_dtype,
    )
    vit_cfg = mae_cfg.encoder_vit_config(num_classes=data_cfg.num_classes, global_pool=True)
    model = build_model(vit_cfg)

    results = {}
    for fold_idx, (train_ids, test_ids) in enumerate(fold_list):
        # 80/20 val split with disjointness assert (linear_projection.py:156-160)
        train_ids, val_ids = train_test_split(
            train_ids, test_size=0.20, random_state=42, stratify=None
        )
        assert sanity_check_disjoint(train_ids, val_ids, test_ids)

        # init ViT, graft the fold's pretrained encoder, re-init head
        s = vit_cfg.volume_size
        sample = jnp.zeros((1, vit_cfg.in_chans, s, s, s), jnp.float32)
        vit_vars = model.init({"params": jax.random.PRNGKey(train_cfg.seed)}, sample)
        mae_params_template = _mae_params_template(mae_cfg, train_cfg.seed)
        ckpt = os.path.join(
            pretrain_dir, "checkpoints", f"fold_{fold_idx}", "checkpoint-min_loss"
        )
        mae_params = load_params(ckpt, mae_params_template)
        params = mae_params_to_vit(mae_params, dict(vit_vars["params"]), mae_cfg, vit_cfg)
        params = head_init_2e5(params, jax.random.PRNGKey(train_cfg.seed + 7))

        # optimiser
        loader = Loader(dataset_aug, train_cfg.batch_size, indices=train_ids,
                        shuffle=True, drop_last=True, seed=train_cfg.seed)
        eff_batch = train_cfg.batch_size * train_cfg.accum_iter
        lr = train_cfg.lr if train_cfg.lr is not None else blr * eff_batch / 256
        sched = warmup_cosine_schedule(lr, train_cfg.min_lr, train_cfg.warmup_epochs,
                                       epochs, max(len(loader), 1))
        if fix_backbone:
            tx = freeze_backbone_tx(params, make_sgd(sched, momentum=0.9))
        else:
            tx = make_layerwise_adamw(params, vit_cfg.depth, sched,
                                      weight_decay=train_cfg.weight_decay,
                                      layer_decay=layer_decay)
        state = TrainState(step=jnp.zeros((), jnp.int32), params=params, batch_stats={},
                           opt_state=tx.init(params), tx=tx)
        if mesh is not None:
            from vit_ae_plus_plus_tpu.parallel import replicate

            if train_cfg.batch_size % mesh.shape["data"]:
                raise ValueError(
                    f"--batch-size {train_cfg.batch_size} must divide by the "
                    f"data mesh ({mesh.shape['data']} devices): eval batches "
                    "are padded to batch_size and sharded over 'data'"
                )
            state = replicate(state, mesh)
        # the linear-projection reference uses its own MixUp3D here, not the
        # timm Mixup of the fine-tune script (linear_projection.py:31-45)
        train_step, eval_step = make_supervised_steps(
            model, num_classes=data_cfg.num_classes, class_weights=class_weights,
            use_mixup=use_mixup, mixup_impl="reference", mesh=mesh,
        )

        tracker = BestModelTracker(os.path.join(work_dir, "checkpoints"))
        rng = jax.random.PRNGKey(train_cfg.seed + fold_idx)
        # preemption-safe resume (pretrain/moco semantics): params +
        # optimizer + the tracker's best-so-far metrics checkpointed every
        # epoch; restoring the bests keeps a resumed run from overwriting a
        # better best-model checkpoint with worse weights
        start_epoch = 0
        resume_on = getattr(train_cfg, "resume", False) and not eval_only
        resume_path = os.path.join(work_dir, "checkpoints",
                                   f"resume_fold_{fold_idx}")

        def _resume_payload(epoch):
            host = jax.device_get(state)
            return {
                "params": host.params, "opt_state": host.opt_state,
                "step": np.asarray(host.step, np.int32),
                "epoch": np.asarray(epoch),
                "bests": {c: np.asarray(tracker.best[c], np.float64)
                          for c in tracker.criteria},
            }

        if resume_on and os.path.exists(resume_path):
            payload = load_params(resume_path, _resume_payload(0))
            state = state.replace(
                params=payload["params"], opt_state=payload["opt_state"],
                step=jnp.asarray(payload["step"]),
            )
            if mesh is not None:
                from vit_ae_plus_plus_tpu.parallel import replicate

                state = replicate(state, mesh)
            start_epoch = int(payload["epoch"]) + 1
            tracker.best = {c: float(payload["bests"][c])
                            for c in tracker.criteria}
            loader.set_epoch(start_epoch)
            print(f"Probe fold {fold_idx}: resumed at epoch {start_epoch} "
                  f"(bests {tracker.best})")
        val_loader = Loader(dataset_no_aug, train_cfg.batch_size, indices=val_ids,
                            shuffle=False, drop_last=False)
        # the probe reference logs the same train_ft/val_ft TensorBoard
        # channels as fine-tune AND evaluates the train split per epoch
        # (linear_projection.py:212-213,302-303,321-324)
        from vit_ae_plus_plus_tpu.train.metrics import TBWriter

        tb_train = TBWriter(os.path.join(work_dir, "logs", f"fold_{fold_idx}", "train_ft"))
        tb_val = TBWriter(os.path.join(work_dir, "logs", f"fold_{fold_idx}", "val_ft"))
        train_eval_loader = Loader(dataset_no_aug, train_cfg.batch_size,
                                   indices=train_ids, shuffle=False, drop_last=False)
        from vit_ae_plus_plus_tpu.train.metrics import MetricLogger

        n_iter = max(len(loader), 1)
        for epoch in range(start_epoch, 0 if eval_only else epochs):
            logger = MetricLogger()
            for it, (aug, _orig, lab) in enumerate(
                logger.log_every(loader, header=f"Probe fold {fold_idx} Epoch [{epoch}]")
            ):
                state, m = train_step(state, aug, lab, rng)
                logger.update(loss=float(m["loss"]))
                tb_train.scalars(
                    {"loss": float(m["loss"]),
                     "lr": float(sched(epoch * n_iter + it))},
                    epoch + it / n_iter,
                )
            train_stats = evaluate(eval_step, state.params, train_eval_loader,
                                   train_cfg.batch_size)
            val_stats = evaluate(eval_step, state.params, val_loader, train_cfg.batch_size)
            tracker.update(val_stats, jax.device_get(state.params), fold=fold_idx)
            tb_val.scalars_at({"ft/roc_auc_score": val_stats["roc_auc_score"],
                               "ft/loss": val_stats["loss"]}, epoch)
            tb_train.scalars_at({"ft/roc_auc_score": train_stats["roc_auc_score"],
                                 "ft/loss": train_stats["loss"]}, epoch)
            jsonl.write({**{f"train_val_{k}": v for k, v in train_stats.items()},
                         **{f"val_{k}": v for k, v in val_stats.items()},
                         "epoch": epoch, "fold": fold_idx})
            if resume_on:
                save_params(resume_path, _resume_payload(epoch))

        # final test evaluation of the three best checkpoints
        test_loader = Loader(dataset_no_aug, train_cfg.batch_size, indices=test_ids,
                             shuffle=False, drop_last=False)
        fold_result = {}
        for name in tracker.names:
            path = os.path.join(work_dir, "checkpoints", f"checkpoint-{name}_{fold_idx}")
            if os.path.exists(path):
                best = load_params(path, state.params)
                fold_result[name] = evaluate(eval_step, best, test_loader, train_cfg.batch_size)
        results[fold_idx] = fold_result
    return results


def _mae_params_template(mae_cfg, seed: int):
    """Shape template for restoring MAE params."""
    from vit_ae_plus_plus_tpu.models import MaskedAutoencoderViT3D

    model = MaskedAutoencoderViT3D(mae_cfg)
    s = mae_cfg.volume_size
    sample = jnp.zeros((1, mae_cfg.in_chans, s, s, s), jnp.float32)
    shapes = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(seed), "mask": jax.random.PRNGKey(1)},
            sample, sample if mae_cfg.contrastive else None,
        )
    )
    return jax.tree.map(lambda sd: np.zeros(sd.shape, sd.dtype), shapes["params"])
