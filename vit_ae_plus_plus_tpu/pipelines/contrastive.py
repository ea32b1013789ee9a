"""Stage-2 contrastive ViT training (the reference's dormant 2-view path).

Parity: reference utils/train_one_epoch.py:117-181 (`train_one_epoch`, the
legacy 2-view negative-cosine loop) driving the `'contrastive'` factory branch
(model/model_factory.py:24-27 -> model/vit.py:301-337). No reference entry
point ever calls that loop — verified by grep — so this trainer reproduces the
capability, not a specific script: per-iteration warmup-cosine LR, AdamW,
loss = -(cos(p1, z2).mean() + cos(p2, z1).mean()) * 0.5 with the model called
as model(original, augmented) (train_one_epoch.py:142-144), NaN abort,
min-loss checkpointing, JSON-lines log.

TPU-native: one jitted step (donated state), device-side metric accumulation.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp
import flax.struct
import optax

from vit_ae_plus_plus_tpu.configs import DataConfig, TrainConfig, ViTConfig
from vit_ae_plus_plus_tpu.data import Loader, get_dataset, default_ssl_transforms
from vit_ae_plus_plus_tpu.data.loader import device_prefetch
from vit_ae_plus_plus_tpu.models.vit import VisionTransformer3DContrastive
from vit_ae_plus_plus_tpu.ops import negative_cosine_loss
from vit_ae_plus_plus_tpu.train import warmup_cosine_schedule
from vit_ae_plus_plus_tpu.train.checkpoint import save_params
from vit_ae_plus_plus_tpu.train.metrics import JsonlLogger
from vit_ae_plus_plus_tpu.utils.locking import locked_workdir


@flax.struct.dataclass
class ContrastiveState:
    step: jax.Array
    params: any
    batch_stats: any
    opt_state: any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)


def make_contrastive_step(model, mesh=None):
    """loss = -(cos(p1, z2) + cos(p2, z1))/2 (train_one_epoch.py:144)."""

    def step(state: ContrastiveState, original, augmented):
        def loss_fn(params):
            (p1, p2, z1, z2), mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                original, augmented, train=True, mutable=["batch_stats"],
            )
            # negative_cosine_loss already returns -(cos+cos)/2
            return negative_cosine_loss(p1, p2, z1, z2), mut["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            ContrastiveState(step=state.step + 1, params=new_params,
                             batch_stats=new_bs, opt_state=new_opt, tx=state.tx),
            {"loss": loss},
        )

    if mesh is not None:
        # batch over 'data', state replicated — same shardings as
        # pretrain_kfold's step (train/step.py)
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        return jax.jit(step, in_shardings=(repl, data, data),
                       out_shardings=(repl, repl), donate_argnums=(0,))
    return jax.jit(step, donate_argnums=(0,))


@locked_workdir  # refuse a second live writer (utils/locking.py)
def contrastive_train(
    data_cfg: DataConfig,
    train_cfg: TrainConfig,
    work_dir: str,
    use_proj: bool = False,
    epochs: Optional[int] = None,
    vit_overrides: Optional[Dict] = None,
    mesh=None,
) -> Dict:
    """Train a VisionTransformer3DContrastive on 2-view (original, augmented)
    pairs over the whole SSL pool."""
    epochs = epochs if epochs is not None else train_cfg.epochs
    transforms = default_ssl_transforms()
    dataset = get_dataset(data_cfg.name, "whole", data_cfg, transforms=transforms,
                          use_z_score=data_cfg.use_z_score)

    cfg = ViTConfig(
        volume_size=data_cfg.volume_size, in_chans=data_cfg.in_channels,
        patch_size=train_cfg.patch_size, num_classes=data_cfg.num_classes,
        global_pool=True, dtype=train_cfg.compute_dtype,
        **(vit_overrides or {}),
    )
    model = VisionTransformer3DContrastive(cfg, use_proj=use_proj)

    loader = Loader(dataset, train_cfg.batch_size, shuffle=True, drop_last=True,
                    seed=train_cfg.seed, shard_across_processes=True)
    eff_batch = train_cfg.batch_size * train_cfg.accum_iter
    lr = train_cfg.lr if train_cfg.lr is not None else train_cfg.blr * eff_batch / 256
    sched = warmup_cosine_schedule(lr, train_cfg.min_lr, train_cfg.warmup_epochs,
                                   epochs, len(loader))
    tx = optax.adamw(sched, b1=0.9, b2=0.95, weight_decay=train_cfg.weight_decay)

    s = data_cfg.volume_size
    sample = jnp.zeros((train_cfg.batch_size, data_cfg.in_channels, s, s, s))
    variables = model.init({"params": jax.random.PRNGKey(train_cfg.seed)},
                           sample, sample)
    state = ContrastiveState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        tx=tx,
    )
    batch_sharding = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from vit_ae_plus_plus_tpu.parallel import replicate

        state = replicate(state, mesh)
        batch_sharding = NamedSharding(mesh, P("data"))
    step = make_contrastive_step(model, mesh=mesh)
    jsonl = JsonlLogger(work_dir)
    ckpt_path = os.path.join(work_dir, "checkpoints", "checkpoint-min_loss")

    min_loss = float("inf")
    for epoch in range(epochs):
        losses = []
        batches = (device_prefetch(loader, size=2, sharding=batch_sharding)
                   if mesh is not None else loader)
        for aug, orig, _lab in batches:
            # reference call order: model(original, augmented)
            # (train_one_epoch.py:142)
            state, metrics = step(state, orig, aug)
            losses.append(metrics["loss"])
        mean_loss = float(np.mean([float(l) for l in losses]))
        if not np.isfinite(mean_loss):
            raise FloatingPointError(f"Loss is {mean_loss}, stopping training")
        if mean_loss < min_loss:
            min_loss = mean_loss
            save_params(ckpt_path, {
                "params": jax.device_get(state.params),
                "batch_stats": jax.device_get(state.batch_stats),
            })
        jsonl.write({"train_loss": mean_loss, "epoch": epoch})
    return {"min_loss": min_loss, "checkpoint": ckpt_path}
