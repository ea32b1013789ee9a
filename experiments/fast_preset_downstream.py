"""Fast-preset downstream-quality experiment (VERDICT r3 #6).

The opt-in `_fastdec` / `_fast` presets change the decoder / encoder
attention-subspace partition (models/zoo.py) for throughput; this script
measures whether that costs downstream feature quality. Protocol: identical
pretraining budget (60 epochs, 2 folds, seed 42, bf16, device-resident) on
structured synthetic *labeled* volumes for the parity architecture and both
presets, evaluated through the standard user journey the reference prescribes
(README.MD:4-33): pretrain-kfold -> per-fold SSL feature extraction ->
classical SVM AUROC (pipelines/eval_classical.py, threshold/CM conventions of
/root/reference/bootstrap/evaluate_on_classical_models.py).

The synthetic task is designed so MAE-style features matter: every volume is
a smooth random field plus a bright ellipsoid "lesion"; class 1 lesions carry
high-frequency internal texture — exactly the local detail a masked
autoencoder must encode to reconstruct.

Resume-aware: models whose per-fold features already exist are skipped, and
pretrain-kfold runs with --resume so an interrupted run continues from its
per-fold checkpoint (the dev box's TPU tunnel drops for hours at a time).

Multi-seed protocol (VERDICT r4 #2): the dataset and fold split are fixed
(synth seed 0 / prepare-data), while `train_seed` varies init/shuffle/mask
RNG — so per-seed passes are PAIRED comparisons across identical folds. Each
pass writes `results.json` in its own out_dir AND merges into the canonical
seed-keyed artifact `experiments/fast_preset_results.json` ({"seeds":
{"<seed>": {arm: {...}}}}); use a fresh out_dir per seed.

Run on the real TPU:  python experiments/fast_preset_downstream.py [out_dir] [train_seed]
Results land in BASELINE.md ("Fast presets downstream" section).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np

N = 48          # volumes (24 per class)
S = 96          # volume side (flagship shape)
N_SPLITS = 2
MODELS = (
    "contr_mae_vit_base_patch16",
    "contr_mae_vit_base_patch16_fastdec",
    "contr_mae_vit_base_patch16_fast",
)


def synth_dataset(seed=0):
    """Label-correlated structure: smooth background + ellipsoid lesion;
    class 1 lesions carry high-frequency internal texture."""
    rng = np.random.default_rng(seed)
    vols = np.empty((N, S, S, S, 1), np.float32)
    labels = np.array([0, 1] * (N // 2))
    zz, yy, xx = np.meshgrid(*([np.arange(S)] * 3), indexing="ij")
    for i in range(N):
        v = np.zeros((S, S, S), np.float32)
        for _ in range(4):
            k = rng.uniform(1, 3, 3) * 2 * np.pi / S
            ph = rng.uniform(0, 2 * np.pi, 3)
            v += rng.uniform(0.3, 0.7) * (
                np.cos(k[0] * zz + ph[0])
                * np.cos(k[1] * yy + ph[1])
                * np.cos(k[2] * xx + ph[2])
            ).astype(np.float32)
        c = rng.uniform(28, 68, 3)
        r = rng.uniform(10, 16)
        d2 = (zz - c[0]) ** 2 + (yy - c[1]) ** 2 + (xx - c[2]) ** 2
        lesion = np.exp(-d2 / (2 * r * r)).astype(np.float32)
        v += 1.5 * lesion
        if labels[i] == 1:
            kf = rng.uniform(10, 14) * 2 * np.pi / S
            tex = (np.sin(kf * zz) * np.sin(kf * yy) * np.sin(kf * xx)).astype(np.float32)
            v += 0.8 * lesion * tex
        v += rng.normal(0, 0.05, v.shape).astype(np.float32)
        vols[i, ..., 0] = v
    return vols, labels


def features_complete(work):
    d = os.path.join(work, "ssl_features_dir")
    need = [
        f"{split}_contrast_ssl_{kind}_split_{i}.npy"
        for split in ("train", "test")
        for kind in ("features", "labels")
        for i in range(N_SPLITS)
    ]
    return all(os.path.exists(os.path.join(d, n)) for n in need)


def main(out_dir, train_seed=42):
    """train_seed varies init/shuffle/mask RNG only; the dataset and fold
    split stay fixed (seed 0 / prepare-data), so multi-seed passes are a
    PAIRED comparison across identical folds."""
    from vit_ae_plus_plus_tpu.cli import main as cli_main
    from vit_ae_plus_plus_tpu.pipelines.eval_classical import evaluate_features

    os.makedirs(out_dir, exist_ok=True)
    splits = os.path.join(out_dir, "splits")
    if not os.path.exists(splits):
        vols, labels = synth_dataset()
        np.save(os.path.join(out_dir, "flair_all.npy"), vols)
        np.save(os.path.join(out_dir, "label_all.npy"), labels)
        cli_main(["prepare-data", "brats",
                  "--volumes", os.path.join(out_dir, "flair_all.npy"),
                  "--labels", os.path.join(out_dir, "label_all.npy"),
                  "--out-dir", splits])

    results = {}
    for model in MODELS:
        work = os.path.join(out_dir, f"run_{model.split('patch16')[-1] or '_parity'}")
        t0 = time.time()
        if not features_complete(work):
            rc = cli_main([
                "pretrain-kfold", "--data-path", splits, "--work-dir", work,
                "--model", model, "--volume-size", str(S), "--patch-size", "8",
                "--epochs", "60", "--n-splits", str(N_SPLITS), "--batch-size", "8",
                "--compute-dtype", "bfloat16", "--device-data",
                "--seed", str(train_seed), "--resume",
                # the dev box reaches its TPU through a slow tunnel: flushing
                # checkpoints every epoch D2Hs ~0.5 GB/epoch and dominates the
                # run; cadence-20 keeps the best params device-resident
                "--ckpt-every", "20",
            ])
            assert rc in (0, None), model
        summary = evaluate_features(os.path.join(work, "ssl_features_dir"),
                                    n_splits=N_SPLITS)
        results[model] = {
            "auroc_mean": summary["auroc_mean"],
            "auroc_std": summary["auroc_std"],
            "per_fold_auroc": summary["per_fold"]["auroc"],
            "wall_s_this_run": round(time.time() - t0, 1),
        }
        print(model, "->", json.dumps(results[model]), flush=True)

    with open(os.path.join(out_dir, "results.json"), "w") as f:
        json.dump(results, f, indent=2)
    merge_into_canonical(train_seed, results)
    print(json.dumps(results, indent=2))


def merge_into_canonical(train_seed, results,
                         path=os.path.join(os.path.dirname(__file__),
                                           "fast_preset_results.json")):
    """Fold this pass into the seed-keyed committed artifact. Legacy flat
    layout (arm -> stats, the original single-seed-42 run) is lifted into
    seeds["42"] on first contact."""
    combined = {}
    if os.path.exists(path):
        with open(path) as f:
            combined = json.load(f)
    if combined and "seeds" not in combined:   # legacy flat = the seed-42 run
        combined = {"seeds": {"42": combined}}
    combined.setdefault("protocol", {
        "n_volumes": N, "volume_size": S, "n_splits": N_SPLITS,
        "epochs": 60, "batch_size": 8, "dataset_seed": 0,
        "note": "paired across seeds: identical data + folds, train_seed "
                "varies init/shuffle/mask RNG only",
    })
    combined.setdefault("seeds", {})[str(train_seed)] = results
    with open(path, "w") as f:
        json.dump(combined, f, indent=2)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/fast_preset_expt",
         train_seed=int(sys.argv[2]) if len(sys.argv) > 2 else 42)
