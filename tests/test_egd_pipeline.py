"""EGD dataset + combined pretraining semantics on synthetic per-scan data."""

import os
import pickle

import numpy as np
import pytest

from vit_ae_plus_plus_tpu.configs import DataConfig, TrainConfig
from vit_ae_plus_plus_tpu.data import EGDDataset


@pytest.fixture(scope="module")
def synthetic_egd(tmp_path_factory):
    root = tmp_path_factory.mktemp("egd")
    rng = np.random.default_rng(0)
    split_dir = root / "splits"
    os.makedirs(split_dir)
    labeled, ssl = [], []
    for i in range(10):
        scan = f"MR_{i:03d}"
        os.makedirs(root / scan)
        for m in ("flair", "t1ce", "t1", "t2"):
            np.save(root / scan / f"{m}.npy",
                    rng.standard_normal((16, 16, 16)).astype(np.float32))
        if i < 6:
            labeled.append((scan, i % 2))
        else:
            ssl.append(scan)
    with open(split_dir / "who_idh_mutation_status_annotated_mit_labels.pkl", "wb") as f:
        pickle.dump(labeled, f)
    with open(split_dir / "who_idh_mutation_status_ssl.pkl", "wb") as f:
        pickle.dump(ssl, f)
    with open(split_dir / "who_idh_mutation_status_all.pkl", "wb") as f:
        pickle.dump([s for s, _ in labeled] + ssl, f)
    return str(root)


def test_egd_dataset_contract(synthetic_egd):
    ds = EGDDataset(synthetic_egd, os.path.join(synthetic_egd, "splits"),
                    mode="test", use_z_score=True)
    aug, orig, label = ds[0]
    assert aug.shape == (4, 16, 16, 16)  # [flair, t1ce, t1, t2] stacked
    assert label in (0, 1)
    # per-channel z-score: each channel ~zero-mean unit-var
    assert np.allclose(orig.mean(axis=(1, 2, 3)), 0, atol=1e-5)
    assert np.allclose(orig.var(axis=(1, 2, 3)), 1, atol=1e-4)

    ssl_ds = EGDDataset(synthetic_egd, os.path.join(synthetic_egd, "splits"),
                        mode="ssl", use_z_score=True)
    assert len(ssl_ds) == 4
    assert ssl_ds[0][2] == -100  # sentinel label (reference egd.py:71)


def test_egd_combined_pretraining(synthetic_egd, tmp_path):
    from vit_ae_plus_plus_tpu.pipelines.pretrain_kfold import pretrain_kfold

    data_cfg = DataConfig(name="egd", base_path=synthetic_egd, volume_size=16,
                          in_channels=4, use_z_score=True)
    train_cfg = TrainConfig(epochs=1, batch_size=4, patch_size=4, warmup_epochs=1,
                            compute_dtype="float32")
    results = pretrain_kfold(data_cfg, train_cfg, str(tmp_path / "w"),
                             model_name="mae_vit_tiny_patch4", n_splits=3)
    assert set(results) == {0, 1, 2}
    # features extracted from the LABELED pool only: train+test per fold == 6
    for fold in results:
        tr = np.load(tmp_path / "w" / "ssl_features_dir"
                     / f"train_contrast_ssl_features_split_{fold}.npy")
        te = np.load(tmp_path / "w" / "ssl_features_dir"
                     / f"test_contrast_ssl_features_split_{fold}.npy")
        assert tr.shape[0] + te.shape[0] == 6


def test_egd_device_augment_pretraining(synthetic_egd, tmp_path):
    """Device-side augmentation for EGD: raw 4-modality streaming + on-device
    per-channel z-score."""
    from vit_ae_plus_plus_tpu.pipelines.pretrain_kfold import pretrain_kfold

    data_cfg = DataConfig(name="egd", base_path=synthetic_egd, volume_size=16,
                          in_channels=4, use_z_score=True)
    train_cfg = TrainConfig(epochs=1, batch_size=4, patch_size=4, warmup_epochs=1,
                            compute_dtype="float32", device_augment=True)
    results = pretrain_kfold(data_cfg, train_cfg, str(tmp_path / "w"),
                             model_name="mae_vit_tiny_patch4", n_splits=3)
    assert all(np.isfinite(r["min_loss"]) for r in results.values())
