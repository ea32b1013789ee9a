"""Model zoo + factory.

Parity: the named constructors in reference model/vit_autoenc.py:288-315 and
the dispatch table in model/model_factory.py:9-29. Presets are config
dataclasses rather than closures; `get_models(model_name, args-like)` keeps
the reference's factory signature for drop-in familiarity.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import flax.linen as nn

from vit_ae_plus_plus_tpu.configs import MAEConfig, ViTConfig
from vit_ae_plus_plus_tpu.models.mae import MaskedAutoencoderViT3D
from vit_ae_plus_plus_tpu.models.vit import VisionTransformer3D


def mae_vit_base_patch16(**kw) -> MAEConfig:
    """ViT-B encoder, 512d/8L/16H decoder (vit_autoenc.py:296-301)."""
    return MAEConfig(
        embed_dim=768, depth=12, num_heads=12,
        decoder_embed_dim=512, decoder_depth=8, decoder_num_heads=16, **kw
    )


def mae_vit_large_patch16(**kw) -> MAEConfig:
    """ViT-L encoder (vit_autoenc.py:288-293)."""
    return MAEConfig(
        embed_dim=1024, depth=24, num_heads=16,
        decoder_embed_dim=512, decoder_depth=8, decoder_num_heads=16, **kw
    )


def contr_mae_vit_base_patch16(**kw) -> MAEConfig:
    """Contrastive ViT-B MAE — the default pretraining arch
    (vit_autoenc.py:304-309; k_fold_cross_valid_combined_brats.py:37)."""
    return mae_vit_base_patch16(contrastive=True, **kw)


def contr_mae_vit_base_patch16_fastdec(**kw) -> MAEConfig:
    """OPT-IN, NON-PARITY: the contrastive ViT-B MAE with an 8-head (d=64)
    decoder instead of the reference's 16-head (d=32) one.

    Same parameter count, width, depth and FLOPs — only the head split
    changes. Rationale: per-head attention matmuls pad their contraction /
    output lane dim to the 128-wide MXU, so decoder attention cost scales
    with the head COUNT, not head_dim: measured 8L decoder fwd+bwd at B16 is
    101 ms (H8/d64) vs 153 ms (H16/d32) — a free ~1.5x on the step's
    dominant component if exact reference-architecture parity is not needed.
    Downstream quality (measured, BASELINE.md "Fast presets downstream"):
    SVM AUROC 0.639±0.063 vs parity 0.670±0.038 at a 60-epoch/2-fold budget —
    delta inside fold noise, i.e. no detectable regression, not equivalence.
    """
    return MAEConfig(
        embed_dim=768, depth=12, num_heads=12,
        decoder_embed_dim=512, decoder_depth=8, decoder_num_heads=8,
        contrastive=True, **kw
    )


def contr_mae_vit_base_patch16_fast(**kw) -> MAEConfig:
    """OPT-IN, NON-PARITY: widest-head variant — 6-head (d=128) encoder and
    4-head (d=128) decoder at the same widths/depths/parameter shapes.

    Head count is not a parameter shape: the qkv projection is (C, 3C)
    however the lanes are split, so parity checkpoints load into this preset
    unchanged. Per the measured MXU tile model (BASELINE.md), per-head
    attention cost is head_dim-independent up to d=128 and scales with head
    COUNT — d128 heads are the floor-optimal split on this hardware.
    Attention math DIFFERS from the reference's 12/16-head split (different
    subspace partition), which is why this is opt-in like `_fastdec`.
    Measured (TPU v5e, B16 bf16 flagship step): **93.1 vol/s/chip** vs 76.0
    for `_fastdec` and 62.3 for the parity architecture. Downstream quality
    (BASELINE.md "Fast presets downstream"): SVM AUROC 0.649±0.045 vs parity
    0.670±0.038 at a 60-epoch/2-fold budget — delta inside fold noise.
    """
    return MAEConfig(
        embed_dim=768, depth=12, num_heads=6,
        decoder_embed_dim=512, decoder_depth=8, decoder_num_heads=4,
        contrastive=True, **kw
    )


def mae_vit_tiny_patch4(**kw) -> MAEConfig:
    """Tiny debug/test preset (not in the reference zoo)."""
    for k, v in dict(
        patch_size=4, embed_dim=24, depth=2, num_heads=3,
        decoder_embed_dim=12, decoder_depth=1, decoder_num_heads=2,
    ).items():
        kw.setdefault(k, v)
    return MAEConfig(**kw)


def contr_mae_vit_tiny_patch4(**kw) -> MAEConfig:
    return mae_vit_tiny_patch4(contrastive=True, **kw)


def contr_mae_vit_tiny_pp_patch4(**kw) -> MAEConfig:
    """Tiny preset with BOTH stack depths divisible by 2 pipeline stages
    (depth=2, decoder_depth=2) — for --pipe-devices tests/demos."""
    kw.setdefault("decoder_depth", 2)
    return contr_mae_vit_tiny_patch4(**kw)


def vit_base_3d(**kw) -> ViTConfig:
    return ViTConfig(embed_dim=768, depth=12, num_heads=12, **kw)


def vit_large_3d(**kw) -> ViTConfig:
    return ViTConfig(embed_dim=1024, depth=24, num_heads=16, **kw)


MODEL_ZOO: Dict[str, Callable[..., Any]] = {
    "mae_vit_base_patch16": mae_vit_base_patch16,
    "mae_vit_large_patch16": mae_vit_large_patch16,
    "contr_mae_vit_base_patch16": contr_mae_vit_base_patch16,
    "contr_mae_vit_base_patch16_fastdec": contr_mae_vit_base_patch16_fastdec,
    "contr_mae_vit_base_patch16_fast": contr_mae_vit_base_patch16_fast,
    "mae_vit_tiny_patch4": mae_vit_tiny_patch4,
    "contr_mae_vit_tiny_patch4": contr_mae_vit_tiny_patch4,
    "contr_mae_vit_tiny_pp_patch4": contr_mae_vit_tiny_pp_patch4,
    "vit_base_3d": vit_base_3d,
    "vit_large_3d": vit_large_3d,
}


def build_model(cfg) -> nn.Module:
    """Config -> flax module."""
    if isinstance(cfg, MAEConfig):
        return MaskedAutoencoderViT3D(cfg)
    if isinstance(cfg, ViTConfig):
        return VisionTransformer3D(cfg)
    raise TypeError(f"unknown config type {type(cfg)}")


def get_models(model_name: str, args) -> Tuple[nn.Module, Any]:
    """Reference-compatible factory (model/model_factory.py:9-29).

    model_name: 'autoenc' | 'autoenc_contr' | 'vit' | 'contrastive'.
    `args` needs: model (zoo name, for autoenc), volume_size, in_channels,
    patch_size, and for 'vit': nb_classes, global_pool.
    Returns (module, config).
    """
    common = dict(
        volume_size=getattr(args, "volume_size", 96),
        in_chans=getattr(args, "in_channels", 1),
        patch_size=getattr(args, "patch_size", 8),
        dtype=getattr(args, "compute_dtype", "float32"),
    )
    if model_name in ("autoenc", "autoenc_contr"):
        zoo_name = getattr(args, "model", "contr_mae_vit_base_patch16")
        cfg = MODEL_ZOO[zoo_name](
            norm_pix_loss=getattr(args, "norm_pix_loss", False),
            use_proj=getattr(args, "use_proj", False),
            **common,
        )
        return build_model(cfg), cfg
    if model_name == "vit":
        # args.drop_path feeds the reference's drop_path_rate, which is INERT
        # there (DropPath is commented out, reference model/vit.py:133-141) —
        # so it is deliberately ignored here; no dropout of any kind is enabled.
        cfg = vit_base_3d(
            num_classes=getattr(args, "nb_classes", 2),
            global_pool=getattr(args, "global_pool", True),
            **common,
        )
        return build_model(cfg), cfg
    if model_name == "contrastive":
        # reference returns the contrastive variant with SimSiam heads
        # (model/model_factory.py:24-27 -> model/vit.py:301-337)
        from vit_ae_plus_plus_tpu.models.vit import VisionTransformer3DContrastive

        cfg = vit_base_3d(
            num_classes=getattr(args, "nb_classes", 2),
            global_pool=getattr(args, "global_pool", True),
            **common,
        )
        return (
            VisionTransformer3DContrastive(cfg, use_proj=getattr(args, "use_proj", False)),
            cfg,
        )
    raise ValueError(f"unknown model_name {model_name!r}")
