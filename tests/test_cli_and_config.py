"""CLI argument surface + config.ini bridge."""

import os
import textwrap

import numpy as np
import pytest

from vit_ae_plus_plus_tpu import cli
from vit_ae_plus_plus_tpu.configs.ini import bootstrap


def test_cli_help_lists_all_subcommands(capsys):
    with pytest.raises(SystemExit):
        cli.main(["--help"])
    out = capsys.readouterr().out
    for cmd in ("pretrain-kfold", "probe-kfold", "finetune-kfold", "resnet-kfold",
                "moco-kfold", "extract-features", "eval-classical", "sanity-viz",
                "prepare-data"):
        assert cmd in out


def test_cli_fsdp_flag_reaches_trainconfig():
    """--fsdp parses on pretrain-kfold and lands in TrainConfig; the pipeline
    rejects it without a data mesh (parallel/fsdp.py needs --n-devices > 1)."""
    args_ns = None

    class _Stop(Exception):
        pass

    import vit_ae_plus_plus_tpu.cli as climod

    real_configs = climod._configs

    def spy(args):
        nonlocal args_ns
        args_ns = real_configs(args)
        raise _Stop

    climod._configs = spy
    try:
        with pytest.raises(_Stop):
            climod.main([
                "pretrain-kfold", "--data-path", "/nonexistent", "--fsdp",
                "--n-devices", "2",
            ])
    finally:
        climod._configs = real_configs
    _, train_cfg = args_ns
    assert train_cfg.fsdp is True
    assert train_cfg.pipe_devices == 1


def test_cli_prepare_data_and_pretrain_smoke(tmp_path):
    rng = np.random.default_rng(0)
    vols = tmp_path / "flair_all.npy"
    labs = tmp_path / "label_all.npy"
    # >= 20 samples: the stratified 90/10 then 90/10 splits need >= 2 per class
    np.save(vols, rng.standard_normal((20, 16, 16, 16, 1)).astype(np.float32))
    np.save(labs, np.array([0, 1] * 10))
    out = tmp_path / "splits"
    assert cli.main(["prepare-data", "brats", "--volumes", str(vols),
                     "--labels", str(labs), "--out-dir", str(out)]) == 0
    assert (out / "x_whole_ssl.npy").exists()
    work = tmp_path / "run"
    assert cli.main([
        "pretrain-kfold", "--data-path", str(out), "--work-dir", str(work),
        "--model", "mae_vit_tiny_patch4", "--volume-size", "16", "--patch-size", "4",
        "--epochs", "1", "--n-splits", "2", "--batch-size", "4",
        "--compute-dtype", "float32",
    ]) == 0
    assert (work / "ssl_features_dir" / "train_contrast_ssl_features_split_0.npy").exists()


def test_ini_bootstrap_matches_reference_sections(tmp_path):
    ini = tmp_path / "config.ini"
    ini.write_text(textwrap.dedent("""
        [DATASET]
        name = egd
        use_z_score = True
        mode = whole
        split = idh
        num_classes = 2
        in_channels = 4
        volume_size = 96

        [K_FOLD]
        name = egd
        epochs = 50
        batch_size = 4
        weight_decay = 0.05
        start_epoch = 0
        mask_ratio = 0.75
        patch_size = 8
        perceptual_weight = 0
        use_proj = no
        use_edge_map = yes
        contr_weight = 0.001
        output_dir = output_dir/k_fold_egd
    """))
    data_cfg, train_cfg, extras = bootstrap(str(ini), "K_FOLD")
    assert data_cfg.name == "egd" and data_cfg.in_channels == 4
    assert data_cfg.volume_size == 96 and data_cfg.use_z_score
    assert train_cfg.epochs == 50 and train_cfg.batch_size == 4
    assert train_cfg.mask_ratio == 0.75 and train_cfg.contr_weight == 0.001
    assert train_cfg.use_edge_map is True and train_cfg.perceptual_weight == 0
    assert extras["patch_size"] == 8 and extras["use_proj"] is False


def test_cli_extract_and_eval_classical(tmp_path):
    """extract-features from a pretrained checkpoint + classical eval on the
    pretrain pipeline's per-fold features."""
    rng = np.random.default_rng(1)
    vols = tmp_path / "flair_all.npy"
    labs = tmp_path / "label_all.npy"
    np.save(vols, rng.standard_normal((24, 16, 16, 16, 1)).astype(np.float32))
    np.save(labs, np.array([0, 1] * 12))
    out = tmp_path / "splits"
    cli.main(["prepare-data", "brats", "--volumes", str(vols), "--labels", str(labs),
              "--out-dir", str(out)])
    work = tmp_path / "run"
    cli.main([
        "pretrain-kfold", "--data-path", str(out), "--work-dir", str(work),
        "--model", "contr_mae_vit_tiny_patch4", "--volume-size", "16",
        "--patch-size", "4", "--epochs", "1", "--n-splits", "2", "--batch-size", "4",
        "--compute-dtype", "float32",
    ])
    # standalone extraction from the fold-0 checkpoint
    feat = tmp_path / "feats"
    assert cli.main([
        "extract-features", "--data-path", str(out), "--work-dir", str(feat),
        "--checkpoint", str(work / "checkpoints" / "fold_0" / "checkpoint-min_loss"),
        "--model", "contr_mae_vit_tiny_patch4", "--volume-size", "16",
        "--patch-size", "4", "--batch-size", "4", "--compute-dtype", "float32",
    ]) == 0
    assert (feat / "test_features.npy").exists()
    assert (feat / "train_features.npy").exists()
    # int8-quantized extraction (models/quant.py) from the same checkpoint:
    # same shapes, features track the f32 ones closely
    qfeat = tmp_path / "feats_int8"
    assert cli.main([
        "extract-features", "--data-path", str(out), "--work-dir", str(qfeat),
        "--checkpoint", str(work / "checkpoints" / "fold_0" / "checkpoint-min_loss"),
        "--model", "contr_mae_vit_tiny_patch4", "--volume-size", "16",
        "--patch-size", "4", "--batch-size", "4", "--compute-dtype", "float32",
        "--quantize", "int8",
    ]) == 0
    f32 = np.load(feat / "test_features.npy")
    i8 = np.load(qfeat / "test_features.npy")
    assert f32.shape == i8.shape
    cos = (f32 * i8).sum(-1) / (
        np.linalg.norm(f32, axis=-1) * np.linalg.norm(i8, axis=-1) + 1e-12
    )
    assert cos.min() > 0.99, f"int8 extraction diverged: {cos.min()}"
    # classical SVM eval over the pretrain pipeline's fold features
    assert cli.main([
        "eval-classical", "--feature-dir", str(work / "ssl_features_dir"),
        "--n-splits", "2",
    ]) == 0


def test_cli_pretrain_with_config_ini(tmp_path):
    """INI-overrides-CLI end to end: the reference's primary config style."""
    import textwrap as tw

    rng = np.random.default_rng(2)
    np.save(tmp_path / "flair_all.npy",
            rng.standard_normal((20, 16, 16, 16, 1)).astype(np.float32))
    np.save(tmp_path / "label_all.npy", np.array([0, 1] * 10))
    out = tmp_path / "splits"
    cli.main(["prepare-data", "brats", "--volumes", str(tmp_path / "flair_all.npy"),
              "--labels", str(tmp_path / "label_all.npy"), "--out-dir", str(out)])
    ini = tmp_path / "config.ini"
    ini.write_text(tw.dedent("""
        [DATASET]
        name = brats
        use_z_score = True
        in_channels = 1
        volume_size = 16
        num_classes = 2

        [K_FOLD]
        epochs = 1
        batch_size = 4
        weight_decay = 0.05
        mask_ratio = 0.75
        patch_size = 4
        contr_weight = 0.001
        use_edge_map = yes
    """))
    work = tmp_path / "run"
    assert cli.main([
        "pretrain-kfold", "--config", str(ini), "--data-path", str(out),
        "--work-dir", str(work), "--model", "contr_mae_vit_tiny_patch4",
        "--n-splits", "2", "--compute-dtype", "float32",
    ]) == 0
    import json as _json
    lines = [_json.loads(x) for x in open(work / "checkpoints" / "log.txt")]
    # INI hyperparameters took effect: 1 epoch per fold, contrastive term active
    assert max(l["epoch"] for l in lines) == 0
    assert any(l["train_contr_loss"] != 0.0 for l in lines)


def test_serve_labels_fast_presets_as_non_parity(tmp_path, monkeypatch, capsys):
    """`serve`/`compile-engine` must label the opt-in `_fast`/`_fastdec`
    presets as non-parity (they serve only checkpoints trained under the
    same attention partition) — VERDICT r3 #7. Covers both the --model path
    and the --engine artifact-header peek."""
    import json
    import zipfile

    import vit_ae_plus_plus_tpu.serving as serving
    from vit_ae_plus_plus_tpu.cli import main as cli_main

    monkeypatch.setattr(serving, "serve", lambda *a, **kw: None)
    monkeypatch.setattr(
        "vit_ae_plus_plus_tpu.train.checkpoint.resolve_checkpoint_path",
        lambda c: c,
    )
    rc = cli_main([
        "serve", "--checkpoint", "dummy",
        "--model", "contr_mae_vit_base_patch16_fast",
    ])
    assert rc == 0
    assert "non-parity preset" in capsys.readouterr().err

    # parity model: no label
    rc = cli_main(["serve", "--checkpoint", "dummy",
                   "--model", "contr_mae_vit_base_patch16"])
    assert rc == 0
    assert "non-parity" not in capsys.readouterr().err

    # --engine path: the label comes from the artifact header
    eng = tmp_path / "fast.vitae"
    with zipfile.ZipFile(eng, "w") as zf:
        zf.writestr("meta.json",
                    json.dumps({"model_name": "contr_mae_vit_base_patch16_fastdec"}))
    rc = cli_main(["serve", "--engine", str(eng)])
    assert rc == 0
    assert "non-parity preset" in capsys.readouterr().err
