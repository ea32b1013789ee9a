"""Standalone SSL feature extraction from a chosen checkpoint.

Parity: reference /root/reference/post_training_utils/extract_ssl_features.py
:20-154 — load a pretrained MAE checkpoint, graft into a plain ViT
(head-strip + pos-embed resize + missing-key assert handled by
pipelines.transfer), dump features/labels npy for the requested split(s);
`only_test_split` switch (:77-86).
"""

from __future__ import annotations

import os
import numpy as np
import jax
import jax.numpy as jnp

from vit_ae_plus_plus_tpu.configs import DataConfig
from vit_ae_plus_plus_tpu.data import Loader, get_dataset
from vit_ae_plus_plus_tpu.models import MODEL_ZOO, build_model
from vit_ae_plus_plus_tpu.pipelines.transfer import mae_params_to_vit
from vit_ae_plus_plus_tpu.train.checkpoint import load_params
from vit_ae_plus_plus_tpu.train.step import make_feature_step


def extract_ssl_features(
    data_cfg: DataConfig,
    checkpoint_path: str,
    out_dir: str,
    model_name: str = "contr_mae_vit_base_patch16",
    batch_size: int = 16,
    only_test_split: bool = False,
    patch_size: int = 8,
    compute_dtype: str = "float32",
    quantize: str = "none",
) -> None:
    """`quantize='int8'` routes inference through the int8 engine
    (models/quant.py): per-channel int8 weights x per-token int8 activations
    on the MXU's double-rate int8 path — the serving fast path."""
    mae_cfg = MODEL_ZOO[model_name](
        volume_size=data_cfg.volume_size, in_chans=data_cfg.in_channels,
        patch_size=patch_size, dtype=compute_dtype,
    )
    vit_cfg = mae_cfg.encoder_vit_config(num_classes=data_cfg.num_classes, global_pool=True)
    vit_model = build_model(vit_cfg)
    s = vit_cfg.volume_size
    sample = jnp.zeros((1, vit_cfg.in_chans, s, s, s), jnp.float32)
    vit_vars = vit_model.init({"params": jax.random.PRNGKey(0)}, sample)

    from vit_ae_plus_plus_tpu.pipelines.probe_kfold import _mae_params_template

    mae_params = load_params(checkpoint_path, _mae_params_template(mae_cfg, 0))
    params = mae_params_to_vit(mae_params, dict(vit_vars["params"]), mae_cfg, vit_cfg)
    if quantize == "int8":
        from vit_ae_plus_plus_tpu.models.quant import make_quant_feature_step

        qstep = make_quant_feature_step(vit_cfg, params)
        feat_step = lambda variables, batch: qstep(batch)  # noqa: E731
    elif quantize == "none":
        feat_step = make_feature_step(vit_model)
    else:
        raise ValueError(f"quantize must be 'none'|'int8', got {quantize!r}")

    if data_cfg.name == "egd" and not only_test_split:
        raise ValueError(
            "EGD has no 'train' feature split — the labelled pool is mode='test' "
            "(reference egd.py:19-39); pass only_test_split=True / --only-test-split"
        )
    splits = ["test"] if only_test_split else ["train", "test"]
    os.makedirs(out_dir, exist_ok=True)
    for split in splits:
        dataset = get_dataset(data_cfg.name, split if data_cfg.name == "brats" else "test",
                              data_cfg, transforms=None, use_z_score=data_cfg.use_z_score)
        loader = Loader(dataset, batch_size, shuffle=False, drop_last=False)
        feats, labels = [], []
        for aug, _orig, lab in loader:
            n = aug.shape[0]
            if n < batch_size:
                pad = batch_size - n
                aug = np.concatenate([aug, np.repeat(aug[:1], pad, axis=0)])
            out = feat_step({"params": params}, aug)
            # float32 on disk: bf16 npy is unreadable by the sklearn downstream
            feats.append(np.asarray(out[:n], dtype=np.float32))
            labels.append(lab)
        np.save(os.path.join(out_dir, f"{split}_features.npy"), np.concatenate(feats))
        np.save(os.path.join(out_dir, f"{split}_gt_labels.npy"), np.concatenate(labels))
        print(f"Saved {split} features: {sum(f.shape[0] for f in feats)} items")
