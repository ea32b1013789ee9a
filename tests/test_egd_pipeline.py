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


def test_split_artifacts_are_json_with_pickle_fallback(tmp_path):
    """De-pickled split persistence (VERDICT r4 #5): new bootstraps write
    JSON sidecars only; reference-made pickles still load; JSON wins when
    both exist; refine_1p19q reads either and writes JSON."""
    import json

    from vit_ae_plus_plus_tpu.data.egd import load_split_list
    from vit_ae_plus_plus_tpu.data.splits import (
        prepare_egd_splits, refine_1p19q_scans,
    )

    rng = np.random.default_rng(3)
    root = tmp_path / "scans"
    for i in range(4):
        d = root / f"MR_{i:03d}"
        d.mkdir(parents=True)
        for m in ("flair", "t1ce", "t1", "t2"):
            np.save(d / f"{m}.npy", rng.standard_normal((4, 4, 4)).astype(np.float32))
    with open(tmp_path / "rad.csv", "w") as f:
        f.write("idx,Subject,who_idh_mutation_status\n")
        for i in range(4):
            f.write(f"{i},{i:03d},{i % 2 if i < 3 else -1}\n")
    out = tmp_path / "out"
    prepare_egd_splits(str(tmp_path / "rad.csv"), str(root), str(out))

    # the bootstrap wrote NO pickles, and the dataset loads the JSON
    assert not list(out.glob("*.pkl"))
    assert sorted(p.name for p in out.glob("*.json")) == [
        "who_idh_mutation_status_all.json",
        "who_idh_mutation_status_annotated_mit_labels.json",
        "who_idh_mutation_status_ssl.json",
    ]
    ds = EGDDataset(str(root), str(out), mode="test")
    assert len(ds) == 3
    _, _, label = ds[1]
    assert label == 1

    # JSON sidecar preferred over a coexisting pickle of the same stem
    with open(out / "who_idh_mutation_status_ssl.pkl", "wb") as f:
        pickle.dump(["MR_999_stale_pickle"], f)
    assert load_split_list(str(out / "who_idh_mutation_status_ssl.pkl")) == ["MR_003"]

    # refine_1p19q: labelled list only exists as a reference-style pickle
    # (fallback path); the refined artifact must come out as JSON
    with open(out / "who_1p19q_codeletion_annotated_mit_labels.pkl", "wb") as f:
        pickle.dump([("MR_001", 0), ("MR_003", 1)], f)
    refine_1p19q_scans(str(out))
    corrected = out / "correct_who_1p19q_codeletion_annotated_mit_labels.json"
    with open(corrected) as f:
        assert json.load(f) == [["MR_001", 0]]  # MR_003 is in the SSL pool
    ds_1p19q = EGDDataset(str(root), str(out), mode="test", split="1p19q")
    assert len(ds_1p19q) == 1 and ds_1p19q[0][2] == 0


def test_kfold_indices_persist_as_npy_and_resume_legacy_pickle(tmp_path):
    """Fold indices persist as .npy (allow_pickle=False); a directory holding
    the reference's extensionless pickled indices still resumes from them."""
    from vit_ae_plus_plus_tpu.data.splits import kfold_indices

    labels = np.array([0, 1] * 6)
    idx_dir = tmp_path / "idx"
    folds = kfold_indices(labels, n_splits=2, index_dir=str(idx_dir))
    names = sorted(p.name for p in idx_dir.iterdir())
    assert names == ["test_0.npy", "test_1.npy", "train_0.npy", "train_1.npy"]
    reread = kfold_indices(labels, n_splits=2, index_dir=str(idx_dir))
    for (a, b), (c, d) in zip(folds, reread):
        np.testing.assert_array_equal(a, c)
        np.testing.assert_array_equal(b, d)

    # legacy layout: extensionless pickles only -> resumed verbatim
    legacy = tmp_path / "legacy"
    legacy.mkdir()
    want_tr, want_te = np.array([5, 6, 7]), np.array([1, 2])
    for fold in range(2):
        with open(legacy / f"train_{fold}", "wb") as f:
            pickle.dump(want_tr, f)
        with open(legacy / f"test_{fold}", "wb") as f:
            pickle.dump(want_te, f)
    resumed = kfold_indices(labels, n_splits=2, index_dir=str(legacy))
    for tr, te in resumed:
        np.testing.assert_array_equal(tr, want_tr)
        np.testing.assert_array_equal(te, want_te)
    assert not list(legacy.glob("*.npy"))  # resume does not rewrite
