"""Typed configuration tree.

Replaces the reference's two-tier argparse + config.ini system
(/root/reference/read_configs.py:25-63) with frozen dataclasses. Key names
mirror the INI keys so a reference user can map their config 1:1; the INI
bridge in configs/ini.py loads actual config.ini files on top of these.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    """Encoder-only 3D ViT (classifier / feature extractor).

    Parity: reference model/vit.py:147-297 constructor args.
    """

    volume_size: int = 96
    patch_size: int = 8
    in_chans: int = 1
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    num_classes: int = 2
    global_pool: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    dtype: str = "float32"  # compute dtype; params stay float32
    attn_impl: str = "auto"
    ln_fusion: str = "auto"  # fused LN+Dense Pallas kernel ('auto'/'on'/'off')
    ln_dtype: str = "float32"  # opt-in "bfloat16": block-LN statistics in
    # bf16 (flax pins LN stats to >= f32); non-parity precision lever like
    # loss_filters_dtype — measured in BASELINE.md
    remat_blocks: bool = False  # jax.checkpoint each block (memory for FLOPs)
    batch_shard_activations: bool = False  # pin the residual stream P('data')
    # at every block entry (models/vit.py constrain_batch) — the FSDP path
    # needs it so GSPMD gathers 1/data-sharded WEIGHTS at their use sites
    # instead of resharding activations; requires an ambient jax.set_mesh

    @property
    def grid_size(self) -> int:
        return self.volume_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid_size**3


@dataclasses.dataclass(frozen=True)
class MAEConfig:
    """3D Masked Autoencoder (+ optional contrastive heads).

    Parity: reference model/vit_autoenc.py:14-285 constructor args; the zoo in
    models/zoo.py provides the named presets (vit_autoenc.py:288-315).
    """

    volume_size: int = 96
    patch_size: int = 8
    in_chans: int = 1
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    decoder_embed_dim: int = 512
    decoder_depth: int = 8
    decoder_num_heads: int = 16
    mlp_ratio: float = 4.0
    norm_pix_loss: bool = False
    contrastive: bool = False  # ContrastiveMAEViT variant (predictor head)
    use_proj: bool = False  # 3-layer projector: built but unused in forward (parity:
    # reference vit_autoenc.py:253-262 builds it, :270-285 never applies it)
    dtype: str = "float32"
    attn_impl: str = "auto"
    ln_fusion: str = "auto"  # fused LN+Dense Pallas kernel ('auto'/'on'/'off')
    ln_dtype: str = "float32"  # opt-in "bfloat16": block-LN statistics in
    # bf16 (flax pins LN stats to >= f32); non-parity precision lever like
    # loss_filters_dtype — measured in BASELINE.md
    remat_blocks: bool = False  # jax.checkpoint each block (memory for FLOPs)
    batch_shard_activations: bool = False  # pin the residual stream P('data')
    # at every block entry (models/vit.py constrain_batch) — the FSDP path
    # needs it so GSPMD gathers 1/data-sharded WEIGHTS at their use sites
    # instead of resharding activations; requires an ambient jax.set_mesh

    @property
    def grid_size(self) -> int:
        return self.volume_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid_size**3

    @property
    def patch_dim(self) -> int:
        return self.patch_size**3 * self.in_chans

    def encoder_vit_config(self, num_classes: int = 2, global_pool: bool = True) -> ViTConfig:
        """The plain ViT that shares this MAE's encoder trunk (used when a
        pretrained checkpoint is re-loaded for feature extraction, reference
        k_fold_cross_valid_combined_brats.py:219-245)."""
        return ViTConfig(
            volume_size=self.volume_size,
            patch_size=self.patch_size,
            in_chans=self.in_chans,
            embed_dim=self.embed_dim,
            depth=self.depth,
            num_heads=self.num_heads,
            mlp_ratio=self.mlp_ratio,
            num_classes=num_classes,
            global_pool=global_pool,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            ln_fusion=self.ln_fusion,
            ln_dtype=self.ln_dtype,
        )


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """SSL pretraining hyperparameters.

    Defaults mirror reference config.ini [K_FOLD] + the argparse defaults in
    k_fold_cross_valid_combined_brats.py:31-74.
    """

    epochs: int = 50
    batch_size: int = 4
    accum_iter: int = 1
    blr: float = 1e-3  # absolute_lr = blr * eff_batch / 256
    lr: Optional[float] = None
    min_lr: float = 0.0
    warmup_epochs: float = 40.0
    weight_decay: float = 0.05
    mask_ratio: float = 0.75
    patch_size: int = 8
    clip_grad: Optional[float] = None
    seed: int = 42
    # loss weights
    use_edge_map: bool = True  # edge weight schedule 0.01 * (1 - epoch/epochs)
    perceptual_weight: float = 0.0
    vgg_ckpt: Optional[str] = None  # torch VGG16 weights for the perceptual term
    # (reference model/ckp-399.pth or torchvision imagenet); random init if None
    contr_weight: float = 0.001
    norm_pix_loss: bool = False
    # tpu execution
    compute_dtype: str = "float32"  # "bfloat16" for max throughput
    ln_dtype: str = "float32"  # opt-in "bfloat16": block-LN stats precision
    loss_filters_dtype: str = "float32"  # opt-in "bfloat16": run the edge-loss
    # Sobel/blur banded einsums in bf16 (non-parity precision; the parity
    # default keeps the whole loss pipeline f32 like the reference)
    device_augment: bool = False  # run affine/noise/gamma on-device (ops/augment.py)
    device_data: bool = False  # stage the whole raw fold in HBM (zero per-step
    # H2D; requires device_augment and a dataset that fits — data/loader.py
    # DeviceResidentBatches)
    # instead of in host loader threads (removes the input-bound stage)
    donate_state: bool = True
    mesh_shape: Tuple[int, ...] = (1,)  # (data,) mesh; >1 shards the batch
    pipe_devices: int = 1  # >1: GPipe pipeline over a 'pipe' mesh axis —
    # both MAE block stacks run stage-sharded with 1/S weight+optimizer
    # memory per device (parallel/pp.py); requires depth % pipe == 0
    pp_microbatches: Optional[int] = None  # GPipe microbatches per batch
    # (None: largest divisor of batch_size <= 4*pipe_devices)
    fsdp: bool = False  # ZeRO/FSDP: shard params + AdamW moments 1/data over
    # the 'data' axis (parallel/fsdp.py); composes with tensor parallelism,
    # mutually exclusive with the pipeline (which has its own 1/S layout)
    start_epoch: int = 0
    resume: bool = False  # restore params+optimiser+epoch from the fold's
    # periodic checkpoint (reference --resume, misc.py:315-329)
    ckpt_every: int = 1  # write the resume checkpoint AND flush the min-loss
    # params to disk every N epochs (parity default 1 = every epoch like the
    # reference, misc.py:295-329). At N>1 the best params are kept as a
    # device-side copy (an HBM->HBM tree copy on each improving epoch, ~1 ms
    # for ViT-B) and only cross the host link on cadence/at fold end — for
    # slow-storage or remote-device setups where per-epoch D2H dominates the
    # epoch. Crash window: up to N-1 epochs of progress.
    nan_check_every: int = 50  # pull the loss scalar to host every k steps and
    # abort on non-finite (reference aborts per step, train_one_epoch.py:66-68;
    # per-k keeps the no-per-step-sync pipeline while bounding wasted work to
    # k steps). 0 disables; the per-epoch check always runs.
    profile_dir: Optional[str] = None  # jax.profiler trace of one steady epoch
    output_dir: str = "output_dir/k_fold"
    log_dir: str = "output_dir/k_fold"


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Dataset selection, mirroring config.ini [DATASET]."""

    name: str = "brats"  # 'brats' | 'egd'
    mode: str = "whole"
    split: str = "idh"  # egd only: 'idh' | '1p19q'
    use_z_score: bool = True
    in_channels: int = 1
    volume_size: int = 96
    num_classes: int = 2
    base_path: str = ""  # root of the prepared split arrays
