"""Supervised downstream training: full fine-tune and linear probe.

Parity targets:
- fine-tune: reference /root/reference/post_training_utils/fine_tune_epoch.py
  :34-469 — class-weighted CE (hard, or soft+mixup), AdamW with BEiT
  layer-wise LR decay, per-iteration warmup-cosine, evaluate() collecting all
  logits then roc_auc/spec/sens, best-model checkpoints by THREE criteria
  (roc_auc / specificity / sensitivity), final test eval of each;
- linear probe: reference k_fold_training_scripts/
  k_fold_cross_valid_linear_projection.py:31-388 — same loop with the
  backbone frozen (exactly 2 trainable tensors asserted), SGD(momentum 0.9),
  custom MixUp3D (beta-lambda convex combination of inputs AND one-hot
  targets, :31-45), 80/20 train/val split with disjointness assert;
- head init trunc_normal(std=2e-5) after loading the pretrained trunk
  (fine_tune_epoch.py:334, linear_projection.py:233).

TPU-native: freezing is optax.multi_transform(set_to_zero) — the jit-friendly
equivalent of requires_grad=False; the whole epoch is one compiled step
iterated, and evaluation logits accumulate on device.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

from vit_ae_plus_plus_tpu.ops import soft_cross_entropy_with_weights
from vit_ae_plus_plus_tpu.train import TrainState
from vit_ae_plus_plus_tpu.utils.locking import locked_workdir
from vit_ae_plus_plus_tpu.utils.metrics import roc_auc


def mixup_3d(rng, inputs, one_hot_targets, alpha: float = 0.1):
    """MixUp3D (linear_projection.py:31-45): ONE beta lambda per batch for the
    permuted convex combination of inputs and targets.

    Note the reference samples two independent lambdas (one per partial_mixup
    call); we keep a single lambda for inputs and another for targets to match
    that behaviour exactly. Used by the linear-probe path, whose reference
    uses this custom class — the FINE-TUNE reference uses timm's Mixup
    instead (`timm_mixup` below).
    """
    rng_perm, rng_lam1, rng_lam2 = jax.random.split(rng, 3)
    idx = jax.random.permutation(rng_perm, inputs.shape[0])
    lam_x = jax.random.beta(rng_lam1, alpha, alpha)
    lam_y = jax.random.beta(rng_lam2, alpha, alpha)
    mixed_x = inputs * lam_x + inputs[idx] * (1 - lam_x)
    mixed_y = one_hot_targets * lam_y + one_hot_targets[idx] * (1 - lam_y)
    return mixed_x, mixed_y


def timm_mixup(rng, inputs, int_labels, num_classes: int, alpha: float = 0.1,
               smoothing: float = 0.1):
    """timm 0.5.4 `Mixup(mixup_alpha=0.1, num_classes=2)` exact semantics,
    as the reference fine-tune uses it (fine_tune_epoch.py:366-368; the
    comment there says "smoothing is handled with mixup label transform"):

    - defaults: mode='batch', prob=1.0, cutmix_alpha=0 -> pure mixup with
      ONE Beta(alpha, alpha) lambda per batch shared by inputs AND targets
      (timm/data/mixup.py `_params_per_batch`);
    - the mixing partner is the FLIPPED batch `x.flip(0)`, not a random
      permutation (`_mix_batch`);
    - label_smoothing=0.1 (the timm default) applied INSIDE the label
      transform: off = smoothing/C, on = 1 - smoothing + off, then
      y = y1*lam + y2_flipped*(1-lam) (`mixup_target`/`one_hot`).

    Returns (mixed_inputs, soft_targets).
    """
    lam = jax.random.beta(rng, alpha, alpha).astype(inputs.dtype)
    mixed_x = inputs * lam + jnp.flip(inputs, 0) * (1 - lam)
    off = smoothing / num_classes
    on = 1.0 - smoothing + off
    y1 = jax.nn.one_hot(int_labels, num_classes, dtype=jnp.float32) * (on - off) + off
    y2 = jnp.flip(y1, 0)
    lam32 = lam.astype(jnp.float32)
    return mixed_x, y1 * lam32 + y2 * (1 - lam32)


def weighted_ce(logits, labels, class_weights):
    """torch CrossEntropyLoss(weight=w) semantics: per-sample weighted NLL,
    normalised by the sum of sample weights."""
    # at-least-f32 (not a hard f32 cast): bf16 logits widen, f64 logits stay
    # f64 so the trajectory-oracle tests keep their precision
    logits = logits.astype(jnp.promote_types(logits.dtype, jnp.float32))
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(log_probs, labels[:, None], axis=1)[:, 0]
    w = class_weights[labels]
    return jnp.sum(nll * w) / jnp.sum(w)


def freeze_backbone_tx(params, inner: optax.GradientTransformation):
    """Train only head.kernel/head.bias (linear_projection.py:235-240,267-268)."""
    labels = jax.tree_util.tree_map_with_path(
        lambda path, _: "train" if str(path[0].key) == "head" else "freeze", params
    )
    n_train = sum(
        1 for leaf in jax.tree.leaves(
            jax.tree.map(lambda l: l == "train", labels, is_leaf=lambda x: isinstance(x, str))
        ) if leaf
    )
    assert n_train == 2, f"expected exactly 2 trainable tensors, got {n_train}"
    return optax.multi_transform({"train": inner, "freeze": optax.set_to_zero()}, labels)


def head_init_2e5(params, rng):
    """Re-init head kernel with trunc_normal(2e-5), zero bias
    (fine_tune_epoch.py:334)."""
    params = dict(params)
    head = dict(params["head"])
    head["kernel"] = 2e-5 * jax.random.truncated_normal(
        rng, -2.0, 2.0, params["head"]["kernel"].shape
    )
    head["bias"] = jnp.zeros_like(params["head"]["bias"])
    params["head"] = head
    return params


def make_supervised_steps(
    model,
    *,
    num_classes: int,
    class_weights: Optional[np.ndarray] = None,
    use_mixup: bool = False,
    mixup_alpha: float = 0.1,
    mixup_impl: str = "timm",
    mesh=None,
):
    """(train_step, eval_step) for a classifier ViT.

    mixup_impl: 'timm' = the fine-tune reference's timm Mixup (flip-partner,
    shared lambda, label_smoothing=0.1 — fine_tune_epoch.py:366-368);
    'reference' = the probe reference's own MixUp3D (linear_projection.py:31-45).

    `mesh`: data-parallel execution — batches/labels shard over 'data', state
    replicated, gradient all-reduce by GSPMD. This is the TPU equivalent of
    the DDP wrap the reference applies to exactly these two paths
    (fine_tune_epoch.py:354-356, linear_projection.py:261-263); mixup's
    flip/permutation partners cross shard boundaries inside the same compiled
    program (a collective-permute, no host involvement).
    """
    cw = jnp.asarray(
        class_weights if class_weights is not None else np.ones(num_classes), jnp.float32
    )

    def train_step(state: TrainState, batch, labels, rng):
        rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            if use_mixup:
                if mixup_impl == "timm":
                    x, y = timm_mixup(rng, batch, labels, num_classes, mixup_alpha)
                else:
                    one_hot = jax.nn.one_hot(labels, num_classes)
                    x, y = mixup_3d(rng, batch, one_hot, mixup_alpha)
                logits = model.apply({"params": params}, x, train=True)
                loss = soft_cross_entropy_with_weights(logits, y, cw)
            else:
                logits = model.apply({"params": params}, batch, train=True)
                loss = weighted_ce(logits, labels, cw)
            return loss, logits

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads)
        return state, {"loss": loss}

    def eval_step(params, batch, labels):
        logits = model.apply({"params": params}, batch, train=False)
        loss = weighted_ce(logits, labels, cw)
        return logits, loss

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        return (
            jax.jit(train_step, in_shardings=(repl, data, data, repl),
                    out_shardings=(repl, repl), donate_argnums=(0,)),
            jax.jit(eval_step, in_shardings=(repl, data, data),
                    out_shardings=(data, repl)),
        )
    return jax.jit(train_step, donate_argnums=(0,)), jax.jit(eval_step)


def evaluate(eval_step, params, loader, pad_batch: int) -> Dict[str, float]:
    """Collect logits over a loader and compute roc_auc / spec / sens / loss
    (fine_tune_epoch.py:104-145)."""
    all_logits, all_labels, losses = [], [], []
    for aug, _orig, labels in loader:
        n = aug.shape[0]
        if n < pad_batch:
            pad = pad_batch - n
            aug = np.concatenate([aug, np.repeat(aug[:1], pad, axis=0)])
            labels_p = np.concatenate([labels, np.repeat(labels[:1], pad)])
            logits, loss = eval_step(params, aug, labels_p)
            logits = np.asarray(logits[:n], dtype=np.float32)
        else:
            logits, loss = eval_step(params, aug, labels)
            logits = np.asarray(logits, dtype=np.float32)
        all_logits.append(logits)
        all_labels.append(labels)
        losses.append(float(loss))
    logits = np.concatenate(all_logits)
    labels = np.concatenate(all_labels)
    auc, spec, sens = roc_auc(logits, labels)
    return {
        "roc_auc_score": auc,
        "specificity": spec,
        "sensitivity": sens,
        "loss": float(np.mean(losses)),
    }


@dataclasses.dataclass
class BestModelTracker:
    """3-criteria best-model selection (fine_tune_epoch.py:436-463)."""

    out_dir: str
    criteria: Tuple[str, ...] = ("roc_auc_score", "specificity", "sensitivity")
    names: Tuple[str, ...] = ("best_ft_model", "best_spec_model", "best_sens_model")

    def __post_init__(self):
        self.best = {c: 0.0 for c in self.criteria}
        os.makedirs(self.out_dir, exist_ok=True)

    def update(self, val_stats: Dict[str, float], params, fold: Optional[int] = None):
        from vit_ae_plus_plus_tpu.train.checkpoint import save_params

        for crit, name in zip(self.criteria, self.names):
            if val_stats[crit] > self.best[crit]:
                self.best[crit] = val_stats[crit]
                tag = f"{name}_{fold}" if fold is not None else name
                save_params(os.path.join(self.out_dir, f"checkpoint-{tag}"), params)


@locked_workdir  # refuse a second live writer (utils/locking.py)
def finetune_single(
    data_cfg,
    train_cfg,
    work_dir: str,
    checkpoint_path: str,
    model_name: str = "contr_mae_vit_base_patch16",
    fix_backbone: bool = False,
    use_mixup: bool = False,
    class_weights=None,
    layer_decay: float = 0.75,
    blr: float = 1e-3,
    eval_only: bool = False,
    mesh=None,
):
    """Single-run fine-tune over the train/val/test splits.

    Parity: reference post_training_utils/fine_tune_epoch.py:216-443 — load a
    pretrained MAE checkpoint, graft into a classifier ViT, head init
    trunc_normal(2e-5), AdamW with layer-wise LR decay (or frozen-backbone
    SGD), per-epoch train + train/val evaluation, best models by 3 criteria,
    final test evaluation of each.
    """
    import jax
    import jax.numpy as jnp

    from vit_ae_plus_plus_tpu.data import Loader, get_dataset, default_ssl_transforms
    from vit_ae_plus_plus_tpu.models import MODEL_ZOO, build_model
    from vit_ae_plus_plus_tpu.pipelines.transfer import mae_params_to_vit
    from vit_ae_plus_plus_tpu.pipelines.probe_kfold import _mae_params_template
    from vit_ae_plus_plus_tpu.train import warmup_cosine_schedule
    from vit_ae_plus_plus_tpu.train.checkpoint import load_params
    from vit_ae_plus_plus_tpu.train.metrics import JsonlLogger
    from vit_ae_plus_plus_tpu.train.optim import make_layerwise_adamw, make_sgd

    ds_train = get_dataset(data_cfg.name, "train", data_cfg,
                           transforms=default_ssl_transforms(),
                           use_z_score=data_cfg.use_z_score)
    ds_val = get_dataset(data_cfg.name, "val", data_cfg, transforms=None,
                         use_z_score=data_cfg.use_z_score)
    ds_test = get_dataset(data_cfg.name, "test", data_cfg, transforms=None,
                          use_z_score=data_cfg.use_z_score)

    mae_cfg = MODEL_ZOO[model_name](
        volume_size=data_cfg.volume_size, in_chans=data_cfg.in_channels,
        patch_size=train_cfg.patch_size, dtype=train_cfg.compute_dtype,
    )
    vit_cfg = mae_cfg.encoder_vit_config(num_classes=data_cfg.num_classes,
                                         global_pool=True)
    model = build_model(vit_cfg)
    s = vit_cfg.volume_size
    sample = jnp.zeros((1, vit_cfg.in_chans, s, s, s), jnp.float32)
    vit_vars = model.init({"params": jax.random.PRNGKey(train_cfg.seed)}, sample)
    mae_params = load_params(checkpoint_path, _mae_params_template(mae_cfg, train_cfg.seed))
    params = mae_params_to_vit(mae_params, dict(vit_vars["params"]), mae_cfg, vit_cfg)
    params = head_init_2e5(params, jax.random.PRNGKey(train_cfg.seed + 7))

    loader = Loader(ds_train, train_cfg.batch_size, shuffle=True, drop_last=True,
                    seed=train_cfg.seed)
    # effective batch incl. grad accumulation (fine_tune_epoch.py:343-346)
    eff_batch = train_cfg.batch_size * train_cfg.accum_iter
    lr = train_cfg.lr if train_cfg.lr is not None else blr * eff_batch / 256
    sched = warmup_cosine_schedule(lr, train_cfg.min_lr, train_cfg.warmup_epochs,
                                   train_cfg.epochs, max(len(loader), 1))
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
                f"--batch-size {train_cfg.batch_size} must divide by the data "
                f"mesh ({mesh.shape['data']} devices): eval batches are padded "
                "to batch_size and sharded over 'data'"
            )
        state = replicate(state, mesh)
    train_step, eval_step = make_supervised_steps(
        model, num_classes=data_cfg.num_classes, class_weights=class_weights,
        use_mixup=use_mixup, mesh=mesh,
    )

    tracker = BestModelTracker(os.path.join(work_dir, "checkpoints"))
    jsonl = JsonlLogger(work_dir)
    # the reference's two TensorBoard channels (fine_tune_epoch.py:271-272):
    # per-iteration loss/lr at epoch_1000x into train_ft, per-epoch ft/*
    # metrics into train_ft + val_ft — through the native event writer
    from vit_ae_plus_plus_tpu.train.metrics import TBWriter

    tb_train = TBWriter(os.path.join(work_dir, "logs", "train_ft"))
    tb_val = TBWriter(os.path.join(work_dir, "logs", "val_ft"))
    rng = jax.random.PRNGKey(train_cfg.seed)
    val_loader = Loader(ds_val, train_cfg.batch_size, shuffle=False, drop_last=False)
    from vit_ae_plus_plus_tpu.train.metrics import MetricLogger

    # trainable-parameter count, requires_grad semantics (fine_tune_epoch.py:340)
    trainable = params["head"] if fix_backbone else params
    n_parameters = int(sum(x.size for x in jax.tree.leaves(trainable)))
    n_iter = max(len(loader), 1)
    for epoch in range(0 if eval_only else train_cfg.epochs):
        logger = MetricLogger()
        for it, (aug, _orig, lab) in enumerate(
            logger.log_every(loader, header=f"FT Epoch [{epoch}]")
        ):
            state, _m = train_step(state, aug, lab, rng)
            logger.update(loss=float(_m["loss"]))
            # reference fine_tune_epoch.py:90-96 ('loss' all-reduce mean +
            # max group lr at the epoch_1000x x-axis)
            tb_train.scalars(
                {"loss": float(_m["loss"]), "lr": float(sched(epoch * n_iter + it))},
                epoch + it / n_iter,
            )
        train_stats = evaluate(eval_step, state.params,
                               Loader(ds_train, train_cfg.batch_size, shuffle=False,
                                      drop_last=False), train_cfg.batch_size)
        val_stats = evaluate(eval_step, state.params, val_loader, train_cfg.batch_size)
        tracker.update(val_stats, jax.device_get(state.params))
        tb_val.scalars_at({"ft/roc_auc_score": val_stats["roc_auc_score"],
                           "ft/loss": val_stats["loss"]}, epoch)
        tb_train.scalars_at({"ft/roc_auc_score": train_stats["roc_auc_score"],
                             "ft/loss": train_stats["loss"]}, epoch)
        jsonl.write({**{f"train_val_{k}": v for k, v in train_stats.items()},
                     **{f"val_{k}": v for k, v in val_stats.items()}, "epoch": epoch,
                     # reference log_stats carries the trainable-param count
                     # (fine_tune_epoch.py:424)
                     "n_parameters": n_parameters})

    # final test evaluation of the three best checkpoints (fine_tune_epoch.py:436-443)
    test_loader = Loader(ds_test, train_cfg.batch_size, shuffle=False, drop_last=False)
    results = {}
    for name in tracker.names:
        path = os.path.join(work_dir, "checkpoints", f"checkpoint-{name}")
        if os.path.exists(path):
            best = load_params(path, state.params)
            results[name] = evaluate(eval_step, best, test_loader, train_cfg.batch_size)
    return results
