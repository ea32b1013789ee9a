"""Combined k-fold SSL pretraining + per-fold feature extraction.

The primary entry point — parity with reference
/root/reference/k_fold_training_scripts/k_fold_cross_valid_combined_brats.py:77-281
(and the EGD variant :79-293):

- stratified k folds (5 BraTS / 3 EGD) with persisted fold indices;
- per fold: contrastive MAE pretraining with the per-epoch edge-weight
  schedule 0.01*(1 - epoch/epochs), AdamW(0.9, 0.95) with
  lr = blr * eff_batch/256, per-iteration warmup-cosine;
- min-train-loss checkpointing, JSON-lines epoch log;
- then: graft the encoder into a plain ViT and dump train/test SSL features.

TPU-native execution: one jitted train step (donated state) per fold; host
metrics are accumulated ON DEVICE and fetched once per epoch — no per-step
sync (the reference synchronised and emptied the CUDA cache every iteration,
train_one_epoch.py:76,105).
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from vit_ae_plus_plus_tpu.configs import DataConfig, TrainConfig
from vit_ae_plus_plus_tpu.data import Loader, get_dataset, default_ssl_transforms
from vit_ae_plus_plus_tpu.data.loader import all_labels, device_prefetch
from vit_ae_plus_plus_tpu.data.splits import kfold_indices
from vit_ae_plus_plus_tpu.models import MODEL_ZOO, build_model
from vit_ae_plus_plus_tpu.parallel import make_mesh, replicate
from vit_ae_plus_plus_tpu.pipelines.transfer import mae_params_to_vit
from vit_ae_plus_plus_tpu.train import (
    create_train_state,
    make_adamw,
    make_train_step,
    warmup_cosine_schedule,
)
from vit_ae_plus_plus_tpu.train.checkpoint import CheckpointManager, save_params
from vit_ae_plus_plus_tpu.train.metrics import JsonlLogger, MetricLogger, TBWriter
from vit_ae_plus_plus_tpu.train.step import make_feature_step
from vit_ae_plus_plus_tpu.utils.locking import locked_workdir


def pretrain_one_fold(
    fold_idx,
    train_ids,
    dataset_aug,
    train_cfg: TrainConfig,
    model_name: str,
    data_cfg: DataConfig,
    work_dir: str,
    mesh=None,
    tb: Optional[TBWriter] = None,
):
    """Train the MAE on one fold; returns (mae_cfg, best_params, stats)."""
    mae_cfg = MODEL_ZOO[model_name](
        volume_size=data_cfg.volume_size,
        in_chans=data_cfg.in_channels,
        patch_size=getattr(train_cfg, "patch_size", 8),
        norm_pix_loss=train_cfg.norm_pix_loss,
        dtype=train_cfg.compute_dtype,
        ln_dtype=getattr(train_cfg, "ln_dtype", "float32"),
    )
    model = build_model(mae_cfg)

    device_aug = None
    if train_cfg.device_augment:
        # host loader just reads raw volumes; the (augment + normalise)
        # pipeline runs on-device (ops/augment.py) right before the step
        from vit_ae_plus_plus_tpu.ops.augment import device_augment_batch

        aug_fn = lambda key, raw: device_augment_batch(
            key, raw, data_cfg.use_z_score, per_channel=(data_cfg.name == "egd")
        )
        if mesh is not None:
            # keep both produced views in the step's P('data') batch layout
            from jax.sharding import NamedSharding, PartitionSpec as P

            data_sh = NamedSharding(mesh, P("data"))
            device_aug = jax.jit(aug_fn, out_shardings=(data_sh, data_sh))
        else:
            device_aug = jax.jit(aug_fn)

    if getattr(train_cfg, "device_data", False):
        if device_aug is None:
            raise ValueError("device_data requires device_augment (the raw "
                             "volumes are normalised on device)")
        from vit_ae_plus_plus_tpu.data.loader import DeviceResidentBatches

        # whole raw fold staged in HBM once: zero per-step host->device
        # traffic; per-step input cost is one on-device gather
        store_sharding = take_sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            store_sharding = NamedSharding(mesh, P())  # replicated store
            take_sharding = NamedSharding(mesh, P("data"))  # step's batch layout
        loader = DeviceResidentBatches(
            dataset_aug, train_cfg.batch_size, indices=train_ids,
            seed=train_cfg.seed, sharding=store_sharding,
            batch_sharding=take_sharding,
        )
        print(f"Fold {fold_idx}: dataset device-resident "
              f"({loader.nbytes() / 1e9:.2f} GB in HBM)")
    else:
        loader = Loader(
            dataset_aug, train_cfg.batch_size, indices=train_ids,
            shuffle=True, drop_last=True, seed=train_cfg.seed,
            # multi-host: global per-epoch reshuffle (identical seed on all
            # hosts) then round-robin shard with wrap padding —
            # DistributedSampler semantics, no silently dropped remainder
            # (data/loader.py:epoch_shard)
            shard_across_processes=True,
        )
    steps_per_epoch = len(loader)
    n_data = mesh.shape["data"] if mesh is not None else 1
    eff_batch = train_cfg.batch_size * train_cfg.accum_iter * n_data
    lr = train_cfg.lr if train_cfg.lr is not None else train_cfg.blr * eff_batch / 256
    schedule = warmup_cosine_schedule(
        lr, train_cfg.min_lr, train_cfg.warmup_epochs, train_cfg.epochs, steps_per_epoch
    )
    tx = make_adamw(
        schedule, train_cfg.weight_decay, clip_grad=train_cfg.clip_grad,
        accum_iter=train_cfg.accum_iter,
    )

    s = data_cfg.volume_size
    sample = jnp.zeros((train_cfg.batch_size, data_cfg.in_channels, s, s, s), jnp.float32)
    pipe = mesh.shape.get("pipe", 1) if mesh is not None else 1
    state = create_train_state(
        model, (sample, sample), tx,
        {"params": jax.random.PRNGKey(train_cfg.seed), "mask": jax.random.PRNGKey(1)},
        # pipe path converts params to the stacked layout first, then inits
        # the optimizer moments once, directly in that layout
        init_opt=(pipe == 1),
    )
    perceptual_fn = None
    if train_cfg.perceptual_weight:
        # gradient-free VGG metric term (reference vit_autoenc.py:229-230);
        # weights from train_cfg.vgg_ckpt (torch format) or random He-init
        from vit_ae_plus_plus_tpu.models.vgg import build_perceptual

        _, _, perceptual_fn = build_perceptual(train_cfg.vgg_ckpt)
    if pipe > 1:
        # GPipe pipeline over the 'pipe' axis (parallel/pp.py): both block
        # stacks stage-sharded, stacked params + AdamW moments committed to
        # their 1/S placement; checkpoints stay in standard per-layer form
        # (converted at save, see `_host_params` below)
        from vit_ae_plus_plus_tpu.parallel.pp import (
            auto_microbatches, make_pp_train_step, pp_state_shardings,
            to_pp_params,
        )

        n_mb = train_cfg.pp_microbatches or auto_microbatches(
            train_cfg.batch_size, pipe, data=mesh.shape["data"]
        )
        sp = to_pp_params(state.params, mae_cfg.depth, mae_cfg.decoder_depth)
        state = state.replace(params=sp, opt_state=tx.init(sp))
        # --fsdp composes: stacked leaves also shard a weight dim over
        # 'data' (1/(pipe*data) params+moments per device; the data-axis
        # placement is ordinary GSPMD outside the pipe-manual shard_map).
        # The residual stream pins P('data') per block (constrain_batch,
        # honoured inside the shard_map stages) so weight shards move, not
        # activations — resolved through the ambient mesh, hence set_mesh.
        pp_data_axis = "data" if getattr(train_cfg, "fsdp", False) else None
        if pp_data_axis is not None:
            import dataclasses as _dc

            mae_cfg = _dc.replace(mae_cfg, batch_shard_activations=True)
            model = build_model(mae_cfg)
            jax.set_mesh(mesh)
        shardings = pp_state_shardings(state, mesh, data_axis=pp_data_axis)
        state = jax.tree.map(jax.device_put, state, shardings)
        step = make_pp_train_step(
            model, mae_cfg.patch_size, mesh,
            n_microbatches=n_mb,
            mask_ratio=train_cfg.mask_ratio,
            contr_weight=train_cfg.contr_weight if mae_cfg.contrastive else 0.0,
            perceptual_weight=train_cfg.perceptual_weight,
            norm_pix_loss=train_cfg.norm_pix_loss,
            perceptual_fn=perceptual_fn,
            loss_filters_dtype=train_cfg.loss_filters_dtype,
            donate=train_cfg.donate_state,
            stacked_state=True,
            state_shardings=shardings,
        )
        print(f"Fold {fold_idx}: GPipe pipeline pipe={pipe} "
              f"data={mesh.shape['data']} microbatches={n_mb}")
    else:
        state_shardings = None
        if getattr(train_cfg, "fsdp", False) and mesh is not None:
            # ZeRO/FSDP: params + AdamW moments committed 1/data-sharded
            # (parallel/fsdp.py); GSPMD all-gathers leaves at their use sites
            # and reduce-scatters grads — checkpoints unaffected (device_get
            # in _host_params reassembles full leaves). The residual stream
            # is pinned P('data') at every block entry (constrain_batch) so
            # the partitioner moves weights, not activations; that constraint
            # resolves the axis through the ambient mesh, hence set_mesh.
            import dataclasses as _dc

            from vit_ae_plus_plus_tpu.parallel.fsdp import shard_train_state_fsdp

            mae_cfg = _dc.replace(mae_cfg, batch_shard_activations=True)
            model = build_model(mae_cfg)
            jax.set_mesh(mesh)
            state, state_shardings = shard_train_state_fsdp(state, mesh)
            print(f"Fold {fold_idx}: FSDP over data={mesh.shape['data']} "
                  f"(params+moments 1/{mesh.shape['data']}-sharded)")
        step = make_train_step(
            model, mae_cfg.patch_size,
            mask_ratio=train_cfg.mask_ratio,
            contr_weight=train_cfg.contr_weight if mae_cfg.contrastive else 0.0,
            perceptual_weight=train_cfg.perceptual_weight,
            norm_pix_loss=train_cfg.norm_pix_loss,
            perceptual_fn=perceptual_fn,
            loss_filters_dtype=train_cfg.loss_filters_dtype,
            mesh=mesh,
            donate=train_cfg.donate_state,
            state_shardings=state_shardings,
        )
        if mesh is not None and state_shardings is None:
            state = replicate(state, mesh)

    def _host_params(params):
        """device_get + convert stacked pipeline params back to the standard
        per-layer tree so on-disk checkpoints are layout-independent."""
        params = jax.device_get(params)
        if pipe > 1:
            from vit_ae_plus_plus_tpu.parallel.pp import from_pp_params

            params = from_pp_params(params, mae_cfg.depth, mae_cfg.decoder_depth)
        return params

    ckpt_dir = os.path.join(work_dir, "checkpoints", f"fold_{fold_idx}")
    jsonl = JsonlLogger(os.path.join(work_dir, "checkpoints"))
    rng = jax.random.PRNGKey(train_cfg.seed + 100 + fold_idx)
    min_loss, best_params = float("inf"), None
    # --ckpt-every N: disk writes (min-loss flush + resume checkpoint) happen
    # on an N-epoch cadence instead of every epoch; the interim best lives as
    # a device-side copy (config.py::TrainConfig.ckpt_every)
    ck_every = max(1, getattr(train_cfg, "ckpt_every", 1))
    best_dev, best_dirty = None, False
    t_start = time.time()

    # full-state resume (reference --resume, utils/misc.py:315-329): restores
    # params + optimiser + step from the newest periodic checkpoint
    start_epoch = train_cfg.start_epoch
    resume_mgr = None
    if getattr(train_cfg, "resume", False):
        import json as _json

        resume_dir = os.path.join(ckpt_dir, "resume")
        # Periodic (resume) checkpoints carry the TRAINING layout — stacked
        # enc_stack/dec_stack trees under --pipe-devices — unlike the
        # layout-independent min-loss export. Guard against restoring with a
        # different layout (orbax would fail with an opaque tree mismatch).
        layout_file = os.path.join(resume_dir, "layout.json")
        if os.path.exists(layout_file):
            have = _json.load(open(layout_file)).get("pipe", 1)
            if have != pipe:
                raise ValueError(
                    f"resume checkpoints in {resume_dir} were written with "
                    f"--pipe-devices {have}; this run uses --pipe-devices "
                    f"{pipe}. Resume with the same --pipe-devices, or start "
                    f"from the layout-independent min-loss checkpoint in a "
                    f"fresh work dir."
                )
        else:
            os.makedirs(resume_dir, exist_ok=True)
            with open(layout_file, "w") as f:
                _json.dump({"pipe": pipe}, f)
        resume_mgr = CheckpointManager(resume_dir, max_to_keep=1)
        state, restored_epoch, restored_min = resume_mgr.restore(state)
        if restored_epoch is not None:
            start_epoch = restored_epoch + 1
            min_loss = restored_min  # keep the pre-crash best
            if hasattr(loader, "set_epoch"):  # device-resident path has none
                loader.set_epoch(start_epoch)  # resume the shuffle schedule
            print(f"Resumed fold {fold_idx} at epoch {start_epoch} "
                  f"(min loss so far {min_loss:.4f})")

    # optional profiler trace of the steady-state steps (SURVEY.md §5.1)
    profile_dir = getattr(train_cfg, "profile_dir", None)

    for epoch in range(start_epoch, train_cfg.epochs):
        edge_w = (
            0.01 * (1 - epoch / train_cfg.epochs) if train_cfg.use_edge_map else 0.0
        )
        edge_w = jnp.float32(edge_w)
        logger = MetricLogger()
        sums = None
        count = 0
        if profile_dir and epoch == start_epoch + 1:
            jax.profiler.start_trace(profile_dir)
        epoch_t0 = time.time()
        # async double-buffered H2D: the next batch's device_put overlaps the
        # current step's compute (data/loader.py:device_prefetch); with a mesh
        # the batch lands directly in its P('data') sharded layout
        batch_sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            batch_sharding = NamedSharding(mesh, P("data"))
        if getattr(train_cfg, "device_data", False):
            batches = loader  # already device-resident: nothing to transfer
        else:
            batches = device_prefetch(
                loader, size=2, sharding=batch_sharding,
                # device-augment derives both views on-device from the raw
                # batch: shipping `orig` too would double H2D traffic
                put_orig=device_aug is None,
            )
        for aug, orig, _ in logger.log_every(
            batches, header=f"Fold {fold_idx} Epoch [{epoch}]", length=len(loader)
        ):
            if device_aug is not None:
                aug_key = jax.random.fold_in(jax.random.fold_in(rng, epoch), count)
                aug, orig = device_aug(aug_key, jnp.asarray(aug))
            state, metrics = step(state, aug, orig, rng, edge_w)
            sums = metrics if sums is None else jax.tree.map(jnp.add, sums, metrics)
            count += 1
            k = getattr(train_cfg, "nan_check_every", 0)
            if k and count % k == 0:
                # bounded-waste NaN abort (reference checks per step,
                # train_one_epoch.py:66-68); this is the only host sync
                # inside the epoch and runs once per k steps
                step_loss = float(metrics["loss"])
                if not np.isfinite(step_loss):
                    raise FloatingPointError(
                        f"Loss is {step_loss} at fold {fold_idx} epoch {epoch} "
                        f"step {count}, stopping training"
                    )
        stats = {k: float(v) / count for k, v in jax.device_get(sums).items()}
        epoch_time = time.time() - epoch_t0  # device_get above synced the stream
        stats["volumes_per_sec"] = count * train_cfg.batch_size * (
            mesh.shape["data"] if mesh is not None else 1
        ) / epoch_time
        if profile_dir and epoch == start_epoch + 1:
            jax.profiler.stop_trace()
        stats["lr"] = float(schedule((epoch + 1) * steps_per_epoch - 1))
        logger.update(**stats)
        if tb is not None:
            tb.scalars(
                {
                    "train_loss": stats["loss"],
                    "lr": stats["lr"],
                    "reconstruction_loss": stats["reconstruction_loss"],
                    "sobel_loss": stats["edge_map_loss"],
                    "perceptual_loss": stats["perceptual_loss"],
                    "contr_loss": stats["contr_loss"],
                },
                epoch + 1,
            )
        if not np.isfinite(stats["loss"]):
            raise FloatingPointError(f"Loss is {stats['loss']}, stopping training")
        if stats["loss"] < min_loss:
            min_loss = stats["loss"]
            if ck_every == 1:
                best_params = _host_params(state.params)
                save_params(os.path.join(ckpt_dir, "checkpoint-min_loss"),
                            best_params)
            else:
                # device-side copy (HBM->HBM): holding state.params itself is
                # unsafe — the jitted step donates its state buffers
                best_dev = jax.tree.map(jnp.copy, state.params)
                best_dirty = True
        jsonl.write({**{f"train_{k}": v for k, v in stats.items()}, "epoch": epoch,
                     "fold": fold_idx})
        if epoch % ck_every == ck_every - 1 or epoch == train_cfg.epochs - 1:
            if best_dirty:
                best_params = _host_params(best_dev)
                save_params(os.path.join(ckpt_dir, "checkpoint-min_loss"),
                            best_params)
                best_dirty = False
            if resume_mgr is not None:
                resume_mgr.save(epoch, state, epoch=epoch, min_loss=min_loss)

    if best_params is None:
        # resumed at (or past) the final epoch: reload the saved min-loss
        # checkpoint so feature extraction still has the best weights
        from vit_ae_plus_plus_tpu.train.checkpoint import load_params

        ckpt = os.path.join(ckpt_dir, "checkpoint-min_loss")
        if not os.path.exists(ckpt):
            raise FileNotFoundError(
                f"no epochs ran for fold {fold_idx} and no min-loss checkpoint "
                f"exists at {ckpt} (start_epoch >= epochs on a fresh work dir?)"
            )
        best_params = load_params(ckpt, _host_params(state.params))
    print(f"Fold {fold_idx}: trained epochs [{start_epoch}, {train_cfg.epochs}) in "
          f"{time.time() - t_start:.0f}s, min loss {min_loss:.4f}")
    return mae_cfg, best_params, {"min_loss": min_loss}


def extract_fold_features(
    mae_cfg,
    mae_params,
    dataset_no_aug,
    ids,
    batch_size: int,
    out_dir: str,
    tag: str,
    fold_idx: int,
    mesh=None,
    num_classes: int = 2,
):
    """Graft encoder -> ViT, run batched forward_features, save npy
    (reference k_fold_…_brats.py:256-281 + utils/feature_extraction.py:9-45)."""
    vit_cfg = mae_cfg.encoder_vit_config(num_classes=num_classes, global_pool=True)
    vit_model = build_model(vit_cfg)
    s = vit_cfg.volume_size
    sample = jnp.zeros((1, vit_cfg.in_chans, s, s, s), jnp.float32)
    vit_vars = vit_model.init({"params": jax.random.PRNGKey(0)}, sample)
    params = mae_params_to_vit(mae_params, dict(vit_vars["params"]), mae_cfg, vit_cfg)
    feat_step = make_feature_step(vit_model)

    loader = Loader(
        dataset_no_aug, batch_size, indices=ids, shuffle=False, drop_last=False,
        num_workers=8,
    )
    feats, labels = [], []
    for aug, _orig, lab in loader:
        if aug.shape[0] < batch_size:  # pad final partial batch for static shapes
            pad = batch_size - aug.shape[0]
            filler = np.repeat(aug[:1], pad, axis=0)  # correct even when pad > n
            out = feat_step({"params": params}, np.concatenate([aug, filler], axis=0))
            # float32 on disk regardless of compute dtype: bf16 npy files are
            # unreadable by the sklearn downstream (numpy has no bfloat16)
            feats.append(np.asarray(out[: aug.shape[0]], dtype=np.float32))
        else:
            feats.append(np.asarray(feat_step({"params": params}, aug), dtype=np.float32))
        labels.append(lab)
    os.makedirs(out_dir, exist_ok=True)
    np.save(os.path.join(out_dir, f"{tag}_contrast_ssl_features_split_{fold_idx}.npy"),
            np.concatenate(feats))
    np.save(os.path.join(out_dir, f"{tag}_contrast_ssl_labels_split_{fold_idx}.npy"),
            np.concatenate(labels))


@locked_workdir  # refuse a second live writer (utils/locking.py)
def pretrain_kfold(
    data_cfg: DataConfig,
    train_cfg: TrainConfig,
    work_dir: str,
    model_name: str = "contr_mae_vit_base_patch16",
    n_splits: int = 5,
    n_devices: Optional[int] = None,
    folds=None,
) -> Dict:
    """Full combined pipeline over all folds."""
    transforms = default_ssl_transforms()
    if data_cfg.name == "egd":
        # EGD combined semantics (reference k_fold_…_egd.py:103-137): k-fold
        # over the LABELED pool; pretraining sees labeled-train + the whole
        # unlabeled SSL pool concatenated with offset ids; features come from
        # the labeled pool only.
        import os as _os

        if train_cfg.device_augment:
            from vit_ae_plus_plus_tpu.data import EGDDataset

            split_dir = _os.path.join(data_cfg.base_path, "splits")
            labeled_aug = EGDDataset(data_cfg.base_path, split_dir, mode="test",
                                     split=data_cfg.split, raw=True)
        else:
            labeled_aug = get_dataset("egd", "test", data_cfg, transforms=transforms,
                                      use_z_score=data_cfg.use_z_score)
        labeled_no_aug = get_dataset("egd", "test", data_cfg, transforms=None,
                                     use_z_score=data_cfg.use_z_score)
        if train_cfg.device_augment:
            ssl_aug = EGDDataset(data_cfg.base_path, split_dir, mode="ssl",
                                 split=data_cfg.split, raw=True)
        else:
            ssl_aug = get_dataset("egd", "ssl", data_cfg, transforms=transforms,
                                  use_z_score=data_cfg.use_z_score)
        from vit_ae_plus_plus_tpu.data.loader import ConcatDataset

        dataset_aug = ConcatDataset([labeled_aug, ssl_aug])
        dataset_no_aug = labeled_no_aug
        labels = all_labels(labeled_no_aug)
        ssl_offset_ids = np.arange(len(ssl_aug)) + len(labeled_aug)
    else:
        if train_cfg.device_augment:
            # host loader streams RAW volumes; augmentation+normalisation run
            # on-device (ops/augment.py)
            from vit_ae_plus_plus_tpu.data import BraTSDataset

            dataset_aug = BraTSDataset(data_cfg.base_path, "whole", raw=True)
        else:
            dataset_aug = get_dataset(data_cfg.name, "whole", data_cfg,
                                      transforms=transforms,
                                      use_z_score=data_cfg.use_z_score)
        dataset_no_aug = get_dataset(data_cfg.name, "whole", data_cfg, transforms=None,
                                     use_z_score=data_cfg.use_z_score)
        labels = all_labels(dataset_no_aug)
        ssl_offset_ids = None
    fold_list = folds if folds is not None else kfold_indices(
        labels, n_splits, index_dir=os.path.join(work_dir, "k_fold", "indices_file")
    )

    mesh = None
    pipe = getattr(train_cfg, "pipe_devices", 1) or 1
    if getattr(train_cfg, "fsdp", False):
        # composes with --pipe-devices: the pipeline keeps stacks 1/S over
        # 'pipe'; --fsdp additionally shards their weight dims over 'data'
        # for 1/(S*data) params+moments per device (pp_state_shardings)
        if n_devices is None or n_devices <= 1:
            raise ValueError("--fsdp needs a data mesh (--n-devices > 1)")
        if pipe > 1 and (n_devices // pipe) <= 1:
            raise ValueError(
                "--fsdp with --pipe-devices needs a data axis > 1 "
                f"(got n_devices={n_devices}, pipe={pipe})"
            )
    if pipe > 1:
        from vit_ae_plus_plus_tpu.parallel.pp import make_pipeline_mesh

        total = n_devices if n_devices is not None else pipe
        if total % pipe:
            raise ValueError(
                f"--n-devices {total} not divisible by --pipe-devices {pipe}"
            )
        mesh = make_pipeline_mesh(pipe, data=total // pipe,
                                  devices=jax.devices()[:total])
    elif n_devices is not None and n_devices > 1:
        mesh = make_mesh(data=n_devices)
    tb = TBWriter(os.path.join(work_dir, "logs"))

    results = {}
    feat_dir = os.path.join(work_dir, "ssl_features_dir")
    for fold_idx, (train_ids, test_ids) in enumerate(fold_list):
        if getattr(train_cfg, "resume", False):
            # cross-fold restart safety: a fold whose features are already on
            # disk is complete (features are written strictly after training
            # + min-loss checkpointing) — skip straight to the next fold
            done = all(
                os.path.exists(os.path.join(
                    feat_dir, f"{tag}_contrast_ssl_features_split_{fold_idx}.npy"
                ))
                for tag in ("train", "test")
            )
            if done:
                print(f"Fold {fold_idx}: features already extracted, skipping")
                results[fold_idx] = {"skipped": True}
                continue
        pretrain_ids = (
            np.concatenate([train_ids, ssl_offset_ids])
            if ssl_offset_ids is not None else train_ids
        )
        mae_cfg, best_params, stats = pretrain_one_fold(
            fold_idx, pretrain_ids, dataset_aug, train_cfg, model_name, data_cfg, work_dir,
            mesh=mesh, tb=tb,
        )
        extract_fold_features(
            mae_cfg, best_params, dataset_no_aug, np.sort(train_ids),
            train_cfg.batch_size, feat_dir, "train", fold_idx, mesh=mesh,
            num_classes=data_cfg.num_classes,
        )
        extract_fold_features(
            mae_cfg, best_params, dataset_no_aug, np.sort(test_ids),
            train_cfg.batch_size, feat_dir, "test", fold_idx, mesh=mesh,
            num_classes=data_cfg.num_classes,
        )
        results[fold_idx] = stats
    return results
