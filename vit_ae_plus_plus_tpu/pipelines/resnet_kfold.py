"""Supervised 3D-ResNet k-fold baseline.

Parity: reference /root/reference/k_fold_training_scripts/train_3d_resnet.py
:216-330 — 3-fold stratified training of ResNet-10 3D, Adam lr=1e-4 under the
per-ITERATION warmup-cosine schedule (train_3d_resnet.py:47-48 calls
lr_sched.adjust_learning_rate at fractional epochs with the argparse defaults
min_lr=1e-6, warmup_epochs=5), class weights [3, 1] for BraTS, best model by
test ROC per fold, eval-only mode. The whole composition is pinned against a
torch replica of that loop in tests/test_resnet_trajectory.py.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax

from vit_ae_plus_plus_tpu.configs import DataConfig, TrainConfig
from vit_ae_plus_plus_tpu.data import Loader, get_dataset, default_ssl_transforms
from vit_ae_plus_plus_tpu.data.loader import all_labels
from vit_ae_plus_plus_tpu.data.splits import kfold_indices
from vit_ae_plus_plus_tpu.models.resnet3d import generate_model
from vit_ae_plus_plus_tpu.pipelines.finetune import evaluate, weighted_ce
from vit_ae_plus_plus_tpu.train import TrainState
from vit_ae_plus_plus_tpu.train.checkpoint import save_params
from vit_ae_plus_plus_tpu.train.metrics import JsonlLogger
from vit_ae_plus_plus_tpu.utils.locking import locked_workdir
from vit_ae_plus_plus_tpu.train.optim import warmup_cosine_schedule


def make_resnet_tx(lr: float, epochs: int, steps_per_epoch: int,
                   min_lr: float = 1e-6, warmup_epochs: int = 5):
    """Adam (torch defaults: betas 0.9/0.999, eps 1e-8, no weight decay) under
    the reference's per-iteration warmup-cosine lr (train_3d_resnet.py:262,
    47-48 + utils/lr_sched.py:9-21 with the argparse defaults)."""
    return optax.adam(
        warmup_cosine_schedule(lr, min_lr, warmup_epochs, epochs, steps_per_epoch)
    )


def make_resnet_steps(model, class_weights: np.ndarray):
    cw = jnp.asarray(class_weights, jnp.float32)

    def train_step(state: TrainState, batch, labels, rng):
        def loss_fn(params):
            logits, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch, train=True, mutable=["batch_stats"],
            )
            return weighted_ce(logits, labels, cw), mutated["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads).replace(batch_stats=new_bs)
        return state, {"loss": loss}

    def eval_step(variables, batch, labels):
        logits = model.apply(variables, batch, train=False)
        return logits, weighted_ce(logits, labels, cw)

    return jax.jit(train_step, donate_argnums=(0,)), jax.jit(eval_step)


@locked_workdir  # refuse a second live writer (utils/locking.py)
def resnet_kfold(
    data_cfg: DataConfig,
    train_cfg: TrainConfig,
    work_dir: str,
    depth: int = 10,
    n_splits: int = 3,
    lr: float = 1e-4,
    class_weights=(3.0, 1.0),
    folds=None,
    epochs: Optional[int] = None,
    eval_only: bool = False,
) -> Dict:
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
    model = generate_model(depth, n_classes=data_cfg.num_classes,
                           dtype=jnp.bfloat16 if train_cfg.compute_dtype == "bfloat16"
                           else jnp.float32)

    results = {}
    for fold_idx, (train_ids, test_ids) in enumerate(fold_list):
        s = data_cfg.volume_size
        sample = jnp.zeros((train_cfg.batch_size, data_cfg.in_channels, s, s, s))
        variables = model.init({"params": jax.random.PRNGKey(train_cfg.seed)}, sample)
        loader = Loader(dataset_aug, train_cfg.batch_size, indices=train_ids,
                        shuffle=True, drop_last=False, seed=train_cfg.seed)
        # per-iteration schedule at fractional epoch = step / len(loader),
        # exactly the reference's data_iter_step / len(data_loader) + epoch
        tx = make_resnet_tx(lr, epochs, max(len(loader), 1))
        state = TrainState(
            step=jnp.zeros((), jnp.int32), params=variables["params"],
            batch_stats=variables["batch_stats"], opt_state=tx.init(variables["params"]),
            tx=tx,
        )
        train_step, eval_step = make_resnet_steps(model, np.asarray(class_weights))

        test_loader = Loader(dataset_no_aug, train_cfg.batch_size, indices=test_ids,
                             shuffle=False, drop_last=False)
        rng = jax.random.PRNGKey(train_cfg.seed)
        best_roc = 0.0
        if eval_only:
            # reference test-only mode (train_3d_resnet.py:314-351): evaluate
            # the saved per-fold best model on the fold's test split
            from vit_ae_plus_plus_tpu.train.checkpoint import load_params

            ckpt = os.path.join(work_dir, "checkpoints", f"best_ft_model_split{fold_idx}")
            best = load_params(ckpt, jax.device_get(
                {"params": state.params, "batch_stats": state.batch_stats}))
            test_stats = evaluate(
                lambda p, b, l: eval_step({"params": p,
                                           "batch_stats": best["batch_stats"]}, b, l),
                best["params"], test_loader, train_cfg.batch_size,
            )
            results[fold_idx] = test_stats
            continue
        for epoch in range(epochs):
            for aug, _orig, lab in loader:
                # the final partial batch trains at its true size (one extra
                # compiled shape, same gradients as the reference's
                # drop_last=False loader)
                state, m = train_step(state, aug, lab, rng)
            test_stats = evaluate(
                lambda p, b, l: eval_step({"params": p, "batch_stats": state.batch_stats}, b, l),
                state.params, test_loader, train_cfg.batch_size,
            )
            if test_stats["roc_auc_score"] > best_roc:
                best_roc = test_stats["roc_auc_score"]
                save_params(
                    os.path.join(work_dir, "checkpoints", f"best_ft_model_split{fold_idx}"),
                    jax.device_get({"params": state.params, "batch_stats": state.batch_stats}),
                )
            jsonl.write({**{f"test_{k}": v for k, v in test_stats.items()},
                         "epoch": epoch, "fold": fold_idx})
        results[fold_idx] = {"best_roc": best_roc}
    return results
