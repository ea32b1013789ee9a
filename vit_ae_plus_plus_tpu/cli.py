"""Command-line interface: one entry point with subcommands replacing the
reference's per-script argparse mains (SURVEY.md §7 layering).

    python -m vit_ae_plus_plus_tpu.cli pretrain-kfold --config config.ini ...
    python -m vit_ae_plus_plus_tpu.cli extract-features ...
    python -m vit_ae_plus_plus_tpu.cli probe-kfold / finetune-kfold ...
    python -m vit_ae_plus_plus_tpu.cli eval-classical ...
    python -m vit_ae_plus_plus_tpu.cli resnet-kfold / moco-kfold ...
    python -m vit_ae_plus_plus_tpu.cli prepare-data brats/egd ...
    python -m vit_ae_plus_plus_tpu.cli sanity-viz ...

The reference's INI-overrides-CLI behaviour is kept: pass --config to load a
config.ini section over the defaults (configs/ini.py).
"""

from __future__ import annotations

import argparse
import os
import dataclasses
import json
import sys

from vit_ae_plus_plus_tpu.configs import DataConfig, TrainConfig


def _honor_platform_env() -> None:
    """Make an explicit JAX_PLATFORMS env var actually win.

    Some environments force-register an out-of-tree TPU backend from
    sitecustomize and override the env var through the config API, so
    `JAX_PLATFORMS=cpu python -m ...cli pretrain-kfold --n-devices 8` (the
    documented virtual-mesh recipe, tests/conftest.py) would still try the
    TPU and either fail its mesh-size check or hang on an unreachable
    tunnel. Re-assert the user's explicit choice before any backend use."""
    plats = os.environ.get("JAX_PLATFORMS")
    if not plats:
        return
    try:
        import jax

        jax.config.update("jax_platforms", plats)
    except Exception:
        pass  # backend already initialised: too late, leave it be


def _add_common(p: argparse.ArgumentParser):
    p.add_argument("--config", default=None, help="config.ini path (overrides CLI)")
    p.add_argument("--config-key", default="K_FOLD", help="INI section for this run")
    p.add_argument("--dataset", default="brats", choices=["brats", "egd"])
    p.add_argument("--data-path", default="", help="root of prepared split arrays")
    p.add_argument("--work-dir", default="output_dir/run")
    p.add_argument("--volume-size", type=int, default=96)
    p.add_argument("--in-channels", type=int, default=1)
    p.add_argument("--num-classes", type=int, default=2)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--patch-size", type=int, default=8)
    p.add_argument("--use-z-score", action=argparse.BooleanOptionalAction,
                   default=True, help="--no-use-z-score selects min-max [-1,1]")
    p.add_argument("--compute-dtype", default="bfloat16", choices=["float32", "bfloat16"])
    p.add_argument("--loss-filters-dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="opt-in bfloat16 runs the edge-loss Sobel/blur "
                        "einsums in bf16 (non-parity precision)")
    p.add_argument("--ln-dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="opt-in bf16 block-LN statistics (non-parity "
                        "precision lever, measured in BASELINE.md)")
    p.add_argument("--model", default="contr_mae_vit_base_patch16")
    p.add_argument("--n-splits", type=int, default=5)
    p.add_argument("--n-devices", type=int, default=None)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--device-augment", action="store_true",
                   help="run augmentation on-device (BraTS and EGD)")
    p.add_argument("--device-data", action="store_true",
                   help="stage the whole raw training fold in HBM (zero "
                        "per-step H2D; implies --device-augment semantics)")
    p.add_argument("--resume", action="store_true",
                   help="resume folds from their periodic checkpoints")
    p.add_argument("--ckpt-every", type=int, default=1,
                   help="flush min-loss + resume checkpoints every N epochs "
                        "(interim best kept device-resident; for slow-storage "
                        "setups where per-epoch D2H dominates). Applies to "
                        "the periodic-checkpoint loops (pretrain-kfold, "
                        "moco-kfold); finetune/probe/resnet-kfold write only "
                        "metric-improvement checkpoints, which this flag "
                        "does not gate")
    p.add_argument("--profile-dir", default=None,
                   help="jax.profiler trace dir (one steady epoch)")
    p.add_argument("--perceptual-weight", type=float, default=0.0)
    p.add_argument("--vgg-ckpt", default=None, help="torch VGG16 weights")


def _warn_fast_preset(model_name) -> None:
    """Deployment guard: the `_fast`/`_fastdec` zoo entries are opt-in
    NON-PARITY presets (different attention-subspace partition at identical
    parameter shapes, models/zoo.py). They only serve checkpoints TRAINED
    under the same preset — a reference-trained or parity-trained checkpoint
    loads shape-compatibly but computes a different function."""
    if model_name and model_name.endswith(("_fast", "_fastdec")):
        print(
            f"note: {model_name!r} is an opt-in non-parity preset; serve it "
            "only with checkpoints trained under this same preset "
            "(parity-trained checkpoints are shape-compatible but NOT "
            "function-compatible)",
            file=sys.stderr,
        )


def _configs(args) -> tuple:
    if args.config:
        from vit_ae_plus_plus_tpu.configs.ini import bootstrap

        data_cfg, train_cfg, extras = bootstrap(args.config, args.config_key)
        data_cfg = dataclasses.replace(data_cfg, base_path=args.data_path or data_cfg.base_path)
        # INI overrides training hyperparameters; flags the INI cannot express
        # (execution/runtime options) still come from the CLI
        train_cfg = dataclasses.replace(
            train_cfg,
            compute_dtype=args.compute_dtype,
            patch_size=extras.get("patch_size", args.patch_size),
            seed=args.seed,
            device_augment=getattr(args, "device_augment", False)
            or getattr(args, "device_data", False),
            device_data=getattr(args, "device_data", False),
            resume=getattr(args, "resume", False),
            ckpt_every=getattr(args, "ckpt_every", 1),
            profile_dir=getattr(args, "profile_dir", None),
            vgg_ckpt=getattr(args, "vgg_ckpt", None),
            loss_filters_dtype=getattr(args, "loss_filters_dtype", "float32"),
            ln_dtype=getattr(args, "ln_dtype", "float32"),
            pipe_devices=getattr(args, "pipe_devices", 1),
            pp_microbatches=getattr(args, "pp_microbatches", None),
            fsdp=getattr(args, "fsdp", False),
        )
        return data_cfg, train_cfg
    data_cfg = DataConfig(
        name=args.dataset, base_path=args.data_path, volume_size=args.volume_size,
        in_channels=args.in_channels, num_classes=args.num_classes,
        use_z_score=args.use_z_score,
    )
    train_cfg = TrainConfig(
        epochs=args.epochs, batch_size=args.batch_size, seed=args.seed,
        patch_size=args.patch_size, compute_dtype=args.compute_dtype,
        device_augment=getattr(args, "device_augment", False)
        or getattr(args, "device_data", False),
        device_data=getattr(args, "device_data", False),
        resume=getattr(args, "resume", False),
        ckpt_every=getattr(args, "ckpt_every", 1),
        profile_dir=getattr(args, "profile_dir", None),
        perceptual_weight=getattr(args, "perceptual_weight", 0.0),
        vgg_ckpt=getattr(args, "vgg_ckpt", None),
        loss_filters_dtype=getattr(args, "loss_filters_dtype", "float32"),
        ln_dtype=getattr(args, "ln_dtype", "float32"),
        pipe_devices=getattr(args, "pipe_devices", 1),
        pp_microbatches=getattr(args, "pp_microbatches", None),
        fsdp=getattr(args, "fsdp", False),
    )
    return data_cfg, train_cfg


def main(argv=None):
    _honor_platform_env()
    parser = argparse.ArgumentParser("vit_ae_plus_plus_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)

    for name in ("pretrain-kfold", "probe-kfold", "finetune-kfold", "finetune",
                 "resnet-kfold", "moco-kfold", "moco-extract", "extract-features",
                 "eval-classical", "sanity-viz", "contrastive-train"):
        p = sub.add_parser(name)
        _add_common(p)
        if name == "pretrain-kfold":
            p.add_argument("--pipe-devices", type=int, default=1,
                           help="GPipe pipeline stages over a 'pipe' mesh "
                                "axis (must divide --n-devices and both "
                                "block-stack depths; parallel/pp.py)")
            p.add_argument("--pp-microbatches", type=int, default=None,
                           help="GPipe microbatches (default: auto, "
                                "<= 4*pipe)")
            p.add_argument("--fsdp", action="store_true",
                           help="ZeRO/FSDP: shard params + optimizer moments "
                                "1/data over the 'data' mesh axis "
                                "(parallel/fsdp.py; needs --n-devices > 1)")
        if name in ("probe-kfold", "finetune-kfold"):
            p.add_argument("--pretrain-dir", required=True)
            p.add_argument("--use-mixup", action="store_true")
            p.add_argument("--eval-only", action="store_true")
        if name == "resnet-kfold":
            p.add_argument("--eval-only", action="store_true")
        if name == "finetune":
            p.add_argument("--checkpoint", required=True)
            p.add_argument("--fix-backbone", action="store_true")
            p.add_argument("--use-mixup", action="store_true")
            p.add_argument("--eval-only", action="store_true")
        if name == "extract-features":
            p.add_argument("--checkpoint", required=True)
            p.add_argument("--only-test-split", action="store_true")
            p.add_argument("--quantize", default="none", choices=["none", "int8"],
                           help="int8: serve extraction on the MXU's "
                                "double-rate int8 path (models/quant.py)")
        if name == "moco-kfold":
            p.add_argument("--fsdp", action="store_true",
                           help="shard both MoCo encoders + LARS moments "
                                "1/data over the mesh (parallel/fsdp.py)")
        if name in ("moco-kfold", "moco-extract"):
            p.add_argument("--moco-arch", default="vit", choices=["vit", "resnet"],
                           help="MoCo trunk (reference builder.py:101-124)")
            p.add_argument("--resnet-depth", type=int, default=10)
            p.add_argument("--moco-dim", type=int, default=256)
            p.add_argument("--moco-mlp-dim", type=int, default=4096)
        if name == "moco-extract":
            p.add_argument("--checkpoint", required=True,
                           help="moco_kfold work dir OR a single checkpoint path")
            p.add_argument("--fold", type=int, default=None)
        if name == "eval-classical":
            p.add_argument("--feature-dir", required=True)
            p.add_argument("--method", default="svm", choices=["svm", "rf", "linear"])
        if name == "sanity-viz":
            p.add_argument("--checkpoint", required=True)
            p.add_argument("--num-samples", type=int, default=2)
        if name == "contrastive-train":
            p.add_argument("--use-proj", action="store_true",
                           help="apply the 3-layer projector (reference use_proj)")

    explore = sub.add_parser("explore-data",
                             help="plot one augmented slice (reference "
                                  "dataset/brats_dataset/data_exploration.py)")
    explore.add_argument("--volumes", required=True, help="flair_all.npy path")
    explore.add_argument("--out", default=None, help="PNG output (else show)")
    explore.add_argument("--sample", type=int, default=0)

    prof = sub.add_parser(
        "profile-attrib",
        help="step-time attribution table from a jax.profiler trace "
             "(utils/profile_tools.py; pair with pretrain-kfold --profile-dir)")
    prof.add_argument("--trace-dir", required=True)
    prof.add_argument("--steps", type=int, default=1,
                      help="steps captured in the trace (divides totals)")
    prof.add_argument("--json", action="store_true", help="machine-readable output")

    def _engine_args(p, for_compile: bool):
        p.add_argument("--checkpoint", required=for_compile,
                       help="orbax flat MAE params checkpoint; for "
                            "--task classify: fine-tuned classifier "
                            "checkpoint(s) (comma-separated) or a "
                            "finetune-kfold work dir (fold ensemble)")
        p.add_argument("--task", default="features",
                       choices=["features", "classify"],
                       help="features: SSL features from an MAE ckpt; "
                            "classify: fold-mean softmax ensemble from "
                            "fine-tuned classifier ckpts")
        p.add_argument("--num-classes", type=int, default=2)
        p.add_argument("--ensemble-criterion", default="ft",
                       choices=["ft", "spec", "sens"],
                       help="which per-fold best model to ensemble when "
                            "--checkpoint is a finetune work dir")
        p.add_argument("--model", default="contr_mae_vit_base_patch16")
        p.add_argument("--volume-size", type=int, default=96)
        p.add_argument("--in-channels", type=int, default=1)
        p.add_argument("--patch-size", type=int, default=8)
        p.add_argument("--batch-size", type=int, default=8,
                       help="serving slab size (compiled once; requests are "
                            "dynamic-batched and padded to it)")
        p.add_argument("--compute-dtype", default="bfloat16",
                       choices=["float32", "bfloat16"])
        p.add_argument("--quantize", default="none", choices=["none", "int8"])
        p.add_argument("--normalize", default="none",
                       choices=["none", "zscore"],
                       help="zscore: per-channel z-score each request volume "
                            "(the datasets' semantics)")
        p.add_argument("--resize-inputs", action="store_true",
                       help="trilinear-resample mismatched spatial dims to "
                            "the model's volume size instead of rejecting")

    srv = sub.add_parser(
        "serve",
        help="dynamic-batching HTTP feature-inference server (serving.py): "
             "POST /features with .npy volumes, GET /healthz, GET /stats")
    _engine_args(srv, for_compile=False)
    srv.add_argument("--engine", default=None,
                     help="precompiled .vitae engine artifact "
                          "(compile-engine); skips model build, trace AND "
                          "compile — every other engine flag is ignored")
    srv.add_argument("--max-wait-ms", type=float, default=5.0,
                     help="dynamic-batching gather window")
    srv.add_argument("--max-body-mb", type=int, default=1024,
                     help="reject request bodies over this size with HTTP 413")
    srv.add_argument("--n-devices", type=int, default=None,
                     help="shard serving slabs over a 'data' mesh of this "
                          "many chips (must divide the batch size)")
    srv.add_argument("--host", default="127.0.0.1")
    srv.add_argument("--port", type=int, default=8000)

    ce = sub.add_parser(
        "compile-engine",
        help="AOT-compile a serving engine into a .vitae artifact "
             "(serving_aot.py): serve --engine loads it with no model "
             "build, no trace, no XLA compile — cold-start becomes a file "
             "read. Device-specific: build on the deployment platform.")
    _engine_args(ce, for_compile=True)
    ce.add_argument("--out", required=True, help="output .vitae path")

    exp = sub.add_parser(
        "export-torch",
        help="convert a trained MAE params checkpoint into a reference-layout "
             "torch .pth state_dict (strict-loadable by the reference's "
             "model/vit_autoenc.py) — the inverse of the .pth import shim")
    exp.add_argument("--checkpoint", required=True,
                     help="orbax flat params checkpoint (e.g. "
                          "checkpoints/fold_0/checkpoint-min_loss)")
    exp.add_argument("--out", required=True, help="output .pth path")
    exp.add_argument("--model", default="contr_mae_vit_base_patch16")
    exp.add_argument("--volume-size", type=int, default=96)
    exp.add_argument("--in-channels", type=int, default=1)
    exp.add_argument("--patch-size", type=int, default=None,
                     help="override the zoo preset's patch size (must match "
                          "the trained checkpoint)")
    exp.add_argument("--seed", type=int, default=42)

    sub.add_parser("doctor",
                   help="environment diagnostics: backend/devices, "
                        "compilation cache, native augmenter, virtual-mesh "
                        "flags, versions (utils/doctor.py)")

    prep = sub.add_parser("prepare-data")
    prep.add_argument("kind", choices=["brats", "egd"])
    prep.add_argument("--volumes", help="brats: flair_all.npy")
    prep.add_argument("--labels", help="brats: label_all.npy")
    prep.add_argument("--nifti-dir", help="ingest raw NIfTI instead of npy: "
                      "brats: a directory of .nii/.nii.gz scans (replaces "
                      "--volumes/--labels); egd: per-scan dirs holding "
                      "{flair,t1ce,t1,t2}.nii[.gz] (replaces --scans-root)")
    prep.add_argument("--labels-csv", help="brats with --nifti-dir: "
                      "name,label rows keyed by the scan file stem")
    prep.add_argument("--csv", help="egd: radiologist csv")
    prep.add_argument("--scans-root", help="egd: pre_processed dir")
    prep.add_argument("--out-dir", required=True)
    prep.add_argument("--overwrite", action="store_true")

    args = parser.parse_args(argv)

    if args.cmd == "explore-data":
        from vit_ae_plus_plus_tpu.pipelines.sanity_viz import plot_one_slice

        plot_one_slice(args.volumes, out_path=args.out, sample_idx=args.sample)
        return 0

    if args.cmd == "profile-attrib":
        from vit_ae_plus_plus_tpu.utils.profile_tools import (
            attribute_trace, format_table,
        )

        table = attribute_trace(args.trace_dir, steps=args.steps)
        if args.json:
            import json as _json

            print(_json.dumps(table))
        else:
            print(format_table(table))
        return 0

    if args.cmd == "doctor":
        from vit_ae_plus_plus_tpu.utils.doctor import run_doctor

        return run_doctor()

    if args.cmd == "serve":
        from vit_ae_plus_plus_tpu.serving import serve
        from vit_ae_plus_plus_tpu.train.checkpoint import resolve_checkpoint_path
        from vit_ae_plus_plus_tpu.utils.cache import enable_compilation_cache

        enable_compilation_cache()
        if args.engine is not None:
            import json as _json
            import zipfile as _zipfile

            try:  # cheap peek at the artifact header for the preset label
                with _zipfile.ZipFile(args.engine) as zf:
                    _warn_fast_preset(
                        _json.loads(zf.read("meta.json")).get("model_name")
                    )
            except Exception:
                pass  # load_engine below reports unreadable artifacts properly
            serve(
                engine_path=args.engine, max_wait_ms=args.max_wait_ms,
                host=args.host, port=args.port, max_body_mb=args.max_body_mb,
            )
            return 0
        if args.checkpoint is None:
            parser.error("serve needs --checkpoint or --engine")
        _warn_fast_preset(args.model)
        mesh = None
        if args.n_devices and args.n_devices > 1:
            from vit_ae_plus_plus_tpu.parallel import make_mesh

            mesh = make_mesh(data=args.n_devices)
        # resolve URLs (each element of a comma list individually); local
        # paths pass through untouched
        ckpt = ",".join(
            resolve_checkpoint_path(c) for c in args.checkpoint.split(",")
        )
        serve(
            ckpt, model_name=args.model,
            volume_size=args.volume_size, in_chans=args.in_channels,
            patch_size=args.patch_size, batch_size=args.batch_size,
            compute_dtype=args.compute_dtype, quantize=args.quantize,
            normalize=args.normalize, max_wait_ms=args.max_wait_ms,
            host=args.host, port=args.port, mesh=mesh,
            max_body_mb=args.max_body_mb,
            task=args.task, num_classes=args.num_classes,
            ensemble_criterion=args.ensemble_criterion,
            resize=args.resize_inputs,
        )
        return 0

    if args.cmd == "compile-engine":
        from vit_ae_plus_plus_tpu.serving import build_engine
        from vit_ae_plus_plus_tpu.serving_aot import save_engine
        from vit_ae_plus_plus_tpu.train.checkpoint import resolve_checkpoint_path
        from vit_ae_plus_plus_tpu.utils.cache import enable_compilation_cache

        enable_compilation_cache()
        _warn_fast_preset(args.model)
        ckpt = ",".join(
            resolve_checkpoint_path(c) for c in args.checkpoint.split(",")
        )
        engine = build_engine(
            ckpt, task=args.task, model_name=args.model,
            volume_size=args.volume_size, in_chans=args.in_channels,
            patch_size=args.patch_size, batch_size=args.batch_size,
            compute_dtype=args.compute_dtype, quantize=args.quantize,
            normalize=args.normalize, num_classes=args.num_classes,
            ensemble_criterion=args.ensemble_criterion,
            resize=args.resize_inputs,
        )
        meta = save_engine(engine, args.out)
        import os

        print(f"wrote {args.out} ({os.path.getsize(args.out) / 2**20:.1f} MB): "
              f"{meta['kind']}, batch {meta['batch_size']}, "
              f"volume {tuple(meta['volume_shape'])}, "
              f"quantize={meta['quantize']}, "
              f"{meta['platform']}/{meta['device_kind']}")
        return 0

    if args.cmd == "export-torch":
        import torch

        from vit_ae_plus_plus_tpu.models import MODEL_ZOO
        from vit_ae_plus_plus_tpu.pipelines.probe_kfold import _mae_params_template
        from vit_ae_plus_plus_tpu.train.checkpoint import (
            export_mae_torch_state_dict,
            load_params,
            resolve_checkpoint_path,
        )

        zoo_kw = dict(volume_size=args.volume_size, in_chans=args.in_channels)
        if args.patch_size is not None:
            zoo_kw["patch_size"] = args.patch_size
        mae_cfg = MODEL_ZOO[args.model](**zoo_kw)
        params = load_params(
            resolve_checkpoint_path(args.checkpoint),
            _mae_params_template(mae_cfg, args.seed),
        )
        sd = export_mae_torch_state_dict(params, mae_cfg)
        torch.save({k: torch.from_numpy(v.copy()) for k, v in sd.items()}, args.out)
        print(json.dumps({"out": args.out, "tensors": len(sd)}))
        return 0

    if args.cmd == "prepare-data":
        from vit_ae_plus_plus_tpu.data import splits as S

        if args.kind == "brats":
            volumes, labels = args.volumes, args.labels
            if args.nifti_dir:
                if not args.labels_csv:
                    raise SystemExit("--nifti-dir needs --labels-csv")
                volumes, labels = S.ingest_nifti_volumes(
                    args.nifti_dir, args.labels_csv, args.out_dir,
                    overwrite=args.overwrite,
                )
            S.split_brats_data(volumes, labels, args.out_dir, args.overwrite)
        else:
            if not args.csv:
                raise SystemExit("prepare-data egd needs --csv (radiologist labels)")
            scans_root = args.scans_root
            if args.nifti_dir:
                scans_root = os.path.join(args.out_dir, "scans")
                S.convert_egd_nifti_scans(args.nifti_dir, scans_root)
            S.prepare_egd_splits(args.csv, scans_root, args.out_dir,
                                 "who_idh_mutation_status")
            S.prepare_egd_splits(args.csv, scans_root, args.out_dir,
                                 "who_1p19q_codeletion")
            S.refine_1p19q_scans(args.out_dir)
        return 0

    data_cfg, train_cfg = _configs(args)

    if getattr(args, "checkpoint", None):
        from vit_ae_plus_plus_tpu.train.checkpoint import resolve_checkpoint_path

        args.checkpoint = resolve_checkpoint_path(args.checkpoint)

    if args.cmd not in ("eval-classical",):  # jax-backed subcommands
        from vit_ae_plus_plus_tpu.utils.cache import enable_compilation_cache

        enable_compilation_cache()

    def _data_mesh(n_devices):
        if n_devices is None or n_devices <= 1:
            return None
        from vit_ae_plus_plus_tpu.parallel import make_mesh

        return make_mesh(data=n_devices)

    if args.cmd == "pretrain-kfold":
        from vit_ae_plus_plus_tpu.pipelines.pretrain_kfold import pretrain_kfold

        out = pretrain_kfold(data_cfg, train_cfg, args.work_dir, model_name=args.model,
                             n_splits=args.n_splits, n_devices=args.n_devices)
    elif args.cmd in ("probe-kfold", "finetune-kfold"):
        from vit_ae_plus_plus_tpu.pipelines.probe_kfold import probe_kfold

        out = probe_kfold(
            data_cfg, train_cfg, args.work_dir, args.pretrain_dir, model_name=args.model,
            n_splits=args.n_splits, fix_backbone=(args.cmd == "probe-kfold"),
            use_mixup=args.use_mixup, eval_only=args.eval_only,
            mesh=_data_mesh(args.n_devices),
        )
    elif args.cmd == "finetune":
        from vit_ae_plus_plus_tpu.pipelines.finetune import finetune_single

        out = finetune_single(
            data_cfg, train_cfg, args.work_dir, args.checkpoint,
            model_name=args.model, fix_backbone=args.fix_backbone,
            use_mixup=args.use_mixup, eval_only=args.eval_only,
            mesh=_data_mesh(args.n_devices),
        )
    elif args.cmd == "resnet-kfold":
        from vit_ae_plus_plus_tpu.pipelines.resnet_kfold import resnet_kfold

        out = resnet_kfold(data_cfg, train_cfg, args.work_dir, n_splits=args.n_splits,
                           eval_only=args.eval_only)
    elif args.cmd == "moco-kfold":
        from vit_ae_plus_plus_tpu.pipelines.moco_kfold import moco_kfold

        out = moco_kfold(
            data_cfg, train_cfg, args.work_dir, n_splits=args.n_splits,
            arch=args.moco_arch, resnet_depth=args.resnet_depth,
            moco_dim=args.moco_dim, moco_mlp_dim=args.moco_mlp_dim,
            mesh=_data_mesh(args.n_devices),
            fsdp=getattr(args, "fsdp", False),
        )
    elif args.cmd == "moco-extract":
        from vit_ae_plus_plus_tpu.pipelines.moco_kfold import moco_extract

        out = moco_extract(
            data_cfg, args.checkpoint, args.work_dir, batch_size=args.batch_size,
            arch=args.moco_arch, resnet_depth=args.resnet_depth,
            moco_dim=args.moco_dim, moco_mlp_dim=args.moco_mlp_dim,
            n_splits=args.n_splits, fold_idx=args.fold,
            compute_dtype=args.compute_dtype,
        )
    elif args.cmd == "extract-features":
        from vit_ae_plus_plus_tpu.pipelines.extract_features import extract_ssl_features

        out = extract_ssl_features(
            data_cfg, args.checkpoint, args.work_dir, model_name=args.model,
            batch_size=args.batch_size, only_test_split=args.only_test_split,
            patch_size=args.patch_size, compute_dtype=args.compute_dtype,
            quantize=getattr(args, "quantize", "none"),
        )
    elif args.cmd == "contrastive-train":
        from vit_ae_plus_plus_tpu.pipelines.contrastive import contrastive_train

        out = contrastive_train(data_cfg, train_cfg, args.work_dir,
                                use_proj=args.use_proj,
                                mesh=_data_mesh(args.n_devices))
    elif args.cmd == "eval-classical":
        from vit_ae_plus_plus_tpu.pipelines.eval_classical import evaluate_features

        out = evaluate_features(args.feature_dir, n_splits=args.n_splits, method=args.method)
    elif args.cmd == "sanity-viz":
        from vit_ae_plus_plus_tpu.pipelines.sanity_viz import (
            nonzero_fractions, reconstruct, save_slice_pngs,
        )
        import jax
        from vit_ae_plus_plus_tpu.data import get_dataset
        from vit_ae_plus_plus_tpu.models import MODEL_ZOO, build_model
        from vit_ae_plus_plus_tpu.pipelines.probe_kfold import _mae_params_template
        from vit_ae_plus_plus_tpu.train.checkpoint import load_params

        mae_cfg = MODEL_ZOO[args.model](
            volume_size=data_cfg.volume_size, in_chans=data_cfg.in_channels,
            dtype=args.compute_dtype,
        )
        model = build_model(mae_cfg)
        params = load_params(args.checkpoint, _mae_params_template(mae_cfg, 0))
        dataset = get_dataset(data_cfg.name, "test" if data_cfg.name == "brats" else "test",
                              data_cfg, transforms=None, use_z_score=data_cfg.use_z_score)
        out = {}
        for i in range(min(args.num_samples, len(dataset))):
            _aug, orig, _lab = dataset[i]
            recon = reconstruct(model, {"params": params}, orig[None], seed=i)
            out[i] = nonzero_fractions(recon)
            save_slice_pngs(recon, args.work_dir, sample_idx=0)
    else:
        raise SystemExit(f"unknown command {args.cmd}")

    print(json.dumps(out, default=str) if out is not None else "done")
    return 0


def run():
    """Console entry with friendly error reporting."""
    from vit_ae_plus_plus_tpu.utils.locking import WorkdirLockedError

    try:
        return main()
    except (FileNotFoundError, FileExistsError, KeyError, ValueError,
            WorkdirLockedError) as e:
        print(f"error: {type(e).__name__}: {e}", file=sys.stderr)
        return 2


if __name__ == "__main__":
    sys.exit(run())
