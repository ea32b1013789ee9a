"""Checkpoint I/O via orbax.

Parity: reference utils/misc.py:295-329 — payload {model, optimizer, epoch,
(scaler,) args}; min-loss / best-metric selection happens in the pipelines.
Here the payload is {params, batch_stats, opt_state, step, epoch, metadata},
written asynchronously by process 0 only. A torch `.pth` import shim converts
reference checkpoints for parity testing (transposed Dense kernels, conv
patch-embed weights flattened to the dense layout).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np
import jax
import orbax.checkpoint as ocp

from vit_ae_plus_plus_tpu.parallel.mesh import is_main_process


def _reraise_if_legacy_lars(e: ValueError) -> None:
    """Diagnose the pre-reorder LARS checkpoint layout with a clear error.

    make_lars (train/optim.py) was rebuilt as an explicit chain with
    optax.trace AFTER scale_by_trust_ratio and BEFORE the learning rate —
    the reference's accumulate-raw-updates semantics (the stock optax.lars
    order applies lr before trace, which diverges under MoCo's per-iteration
    cosine schedule; pinned by tests/test_moco_trajectory.py). Checkpoints
    written under the old layout store the momentum buffer at opt_state[3]
    where the new template expects it at opt_state[2]; orbax reports that
    as a generic metadata-tree mismatch. The old buffer holds lr-SCALED
    momentum, so remapping it would restore semantically wrong state —
    the only sound options are the two the message gives."""
    msg = str(e)
    if ("tree structures do not match" in msg
            and "opt_state[2]" in msg and "opt_state[3]" in msg):
        raise ValueError(
            "This checkpoint's optimizer state uses the pre-fix LARS layout "
            "(momentum trace at opt_state[3], lr-scaled — written before the "
            "make_lars reorder that matched the reference's "
            "accumulate-raw-updates semantics). Its momentum buffer is not "
            "convertible to the corrected optimizer. Either restart this "
            "fold's training from epoch 0, or load only the model weights "
            "from it (load_params / the min-loss params file) and discard "
            "the optimizer state."
        ) from e


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: Optional[int] = None):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory, options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep)
        )

    def save(self, step: int, state, epoch: int = 0,
             min_loss: float = float("inf")) -> None:
        if not is_main_process():
            return
        payload = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
            "epoch": np.asarray(epoch),
            "min_loss": np.asarray(min_loss, np.float64),
        }
        self._mgr.save(step, args=ocp.args.StandardSave(payload))

    def restore(self, state, step: Optional[int] = None):
        """Returns (state, epoch, min_loss); epoch is None when no checkpoint
        exists (epoch 0 is a valid resumable checkpoint). min_loss restores
        the best-so-far so a resumed run cannot overwrite the min-loss
        checkpoint with worse weights."""
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return state, None, float("inf")
        template = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
            "epoch": np.asarray(0),
            "min_loss": np.asarray(0.0, np.float64),
        }
        try:
            restored = self._mgr.restore(
                step, args=ocp.args.StandardRestore(template)
            )
        except ValueError as e:
            _reraise_if_legacy_lars(e)
            raise
        state = state.replace(
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
            step=restored["step"],
        )
        return state, int(restored["epoch"]), float(restored["min_loss"])

    def wait(self):
        self._mgr.wait_until_finished()


def resolve_checkpoint_path(path_or_url: str, cache_dir: Optional[str] = None) -> str:
    """Accept a local path OR a URL for any checkpoint argument.

    Parity: the reference resumes straight from an http(s) URL via
    torch.hub.load_state_dict_from_url (utils/misc.py:318-323). Here a URL is
    downloaded once into ~/.cache/vit_ae_plus_plus_tpu/checkpoints (keyed by
    basename, like torch.hub's model dir) and the cached local path is
    returned; local paths pass through untouched."""
    if not (path_or_url.startswith("http://") or path_or_url.startswith("https://")
            or path_or_url.startswith("file://")):
        return path_or_url
    import urllib.parse
    import urllib.request

    cache_dir = cache_dir or os.path.join(
        os.path.expanduser("~"), ".cache", "vit_ae_plus_plus_tpu", "checkpoints"
    )
    os.makedirs(cache_dir, exist_ok=True)
    # key by a hash of the FULL URL (torch.hub-style): two URLs sharing a
    # basename (fold_0/ckpt.pth vs fold_1/ckpt.pth) must not collide
    import hashlib

    name = os.path.basename(urllib.parse.urlparse(path_or_url).path) or "checkpoint"
    digest = hashlib.sha256(path_or_url.encode()).hexdigest()[:12]
    target = os.path.join(cache_dir, f"{digest}_{name}")
    if not os.path.exists(target):
        print(f"Downloading checkpoint {path_or_url} -> {target}")
        # download to a temp name + atomic rename so an interrupted transfer
        # can never be mistaken for a cached checkpoint
        tmp = target + ".part"
        urllib.request.urlretrieve(path_or_url, tmp)
        os.replace(tmp, target)
    return target


def save_params(path: str, params: Any) -> None:
    """Flat single-file param dump (for feature-extraction handoff).
    Overwrites: min-loss checkpoints are re-saved whenever the loss improves
    (reference k_fold_…_brats.py:196-200)."""
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), params, force=True)
        ckptr.wait_until_finished()


def load_params(path: str, template: Any) -> Any:
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(path), template)


# ---------------------------------------------------------------------------
# torch .pth interop (reference-checkpoint compatibility, both directions)
# ---------------------------------------------------------------------------

def _set(tree: Dict, path, value):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


# The reference builds its contrastive heads as nn.Sequential, so torch names
# them by position: predictor = [Linear(no bias), BN, ReLU, Linear] ->
# predictor.{0,1,3}; the 3-layer projector (vit_autoenc.py:255-262) ->
# projection_head.{0,1,3,4,6,7} with an affine-free final BN (running stats
# only). Flax's MLPHead names the same layers Dense_k / BatchNorm_k.
_HEAD_LAYER_TO_SEQ = {
    "predictor": {"Dense_0": 0, "BatchNorm_0": 1, "Dense_1": 3},
    "projector": {
        "Dense_0": 0, "BatchNorm_0": 1, "Dense_1": 3,
        "BatchNorm_1": 4, "Dense_2": 6, "BatchNorm_2": 7,
    },
}
_HEAD_SEQ_TO_LAYER = {
    head: {idx: layer for layer, idx in table.items()}
    for head, table in _HEAD_LAYER_TO_SEQ.items()
}
_HEAD_TORCH_NAME = {"predictor": "predictor", "projector": "projection_head"}
_HEAD_FLAX_NAME = {v: k for k, v in _HEAD_TORCH_NAME.items()}


def import_torch_state_dict(state_dict: Dict[str, "np.ndarray"], patch_size: int,
                            in_chans: int, mae: bool = False) -> Dict:
    """Convert a reference torch state_dict (tensor name -> array) into this
    framework's param tree.

    Mappings: Linear weight (out, in) -> Dense kernel (in, out); the Conv3d
    patch embed (D, C, p, p, p) -> dense kernel (p^3*C, D) in (dz, dy, dx, c)
    row order; LayerNorm weight/bias -> scale/bias; blocks.N.* -> blocks_N.*.
    decoder_pos_embed is always skipped (a fixed constant here); with
    `mae=True` the encoder pos_embed is skipped too (the reference MAE
    freezes both, vit_autoenc.py:30,45) — the classifier ViT's pos_embed is
    learned and stays a param.
    """
    params: Dict = {}
    for name, w in state_dict.items():
        w = np.asarray(w)
        parts = name.split(".")
        if mae and name == "pos_embed":
            continue  # fixed sincos constant in the MAE (vit_autoenc.py:30)
        if name.startswith("patch_embed.proj."):
            if parts[-1] == "weight":
                d_out = w.shape[0]
                # (D, C, pz, py, px) -> rows (dz, dy, dx, c), c fastest
                kernel = w.transpose(2, 3, 4, 1, 0).reshape(patch_size**3 * in_chans, d_out)
                _set(params, ("patch_embed", "proj", "kernel"), kernel)
            else:
                _set(params, ("patch_embed", "proj", "bias"), w)
            continue
        if name in ("cls_token", "mask_token"):
            _set(params, (name,), w)
            continue
        if name == "pos_embed":
            _set(params, ("pos_embed",), w)  # learned table (classifier ViT only)
            continue
        if name == "decoder_pos_embed":
            continue  # fixed constant here
        # contrastive heads: torch Sequential indices -> flax MLPHead names
        # (reference vit_autoenc.py:253-268 / vit.py:312-327)
        if parts[0] in _HEAD_FLAX_NAME:
            if parts[-1] in ("running_mean", "running_var", "num_batches_tracked"):
                continue  # BN running stats -> import_torch_batch_stats
            flax_head = _HEAD_FLAX_NAME[parts[0]]
            layer = _HEAD_SEQ_TO_LAYER[flax_head][int(parts[1])]
            leaf = parts[-1]
            if layer.startswith("Dense"):
                value = w.T if leaf == "weight" else w
                leaf_name = "kernel" if leaf == "weight" else "bias"
            else:  # BatchNorm affine
                value = w
                leaf_name = "scale" if leaf == "weight" else "bias"
            _set(params, ("heads", flax_head, layer, leaf_name), value)
            continue
        # blocks.N.sub... -> blocks_N / decoder_blocks_N
        if parts[0] in ("blocks", "decoder_blocks"):
            parts = [f"{parts[0]}_{parts[1]}"] + parts[2:]
        # torch mlp.fc1/fc2 -> flax Mlp Dense_0/Dense_1
        parts = ["Dense_0" if p == "fc1" else "Dense_1" if p == "fc2" else p for p in parts]
        # torch LayerNorm/Linear leaves
        leaf = parts[-1]
        sub = parts[:-1]
        if leaf == "weight":
            if w.ndim == 1:  # LayerNorm weight
                _set(params, tuple(sub) + ("scale",), w)
            else:  # Linear weight
                _set(params, tuple(sub) + ("kernel",), w.T)
        elif leaf == "bias":
            _set(params, tuple(sub) + ("bias",), w)
        else:
            _set(params, tuple(parts), w)
    return params


def import_torch_batch_stats(state_dict: Dict[str, "np.ndarray"]) -> Dict:
    """Extract the contrastive heads' BatchNorm running statistics from a
    reference state_dict into a flax `batch_stats` collection.

    The reference's predictor/projector BatchNorm1d layers carry
    running_mean/running_var (train-mode batch stats affect the contrastive
    branch — SURVEY.md §7 'hard parts'); flax keeps them in a separate
    `batch_stats` tree rather than among the params."""
    stats: Dict = {}
    for name, w in state_dict.items():
        parts = name.split(".")
        if parts[0] not in _HEAD_FLAX_NAME or parts[-1] not in (
            "running_mean", "running_var",
        ):
            continue
        flax_head = _HEAD_FLAX_NAME[parts[0]]
        layer = _HEAD_SEQ_TO_LAYER[flax_head][int(parts[1])]
        leaf = "mean" if parts[-1] == "running_mean" else "var"
        _set(stats, ("heads", flax_head, layer, leaf), np.asarray(w))
    return stats


def _flatten(tree: Dict, prefix=()):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _flatten(v, prefix + (k,))
        else:
            yield prefix + (k,), v


def export_torch_state_dict(
    params: Dict,
    patch_size: int,
    in_chans: int,
    batch_stats: Optional[Dict] = None,
    fixed_pos_embeds: Optional[Dict[str, "np.ndarray"]] = None,
) -> Dict[str, "np.ndarray"]:
    """Convert this framework's param tree into a reference-layout torch
    state_dict (the exact inverse of `import_torch_state_dict`), so models
    trained here can be handed back to the reference's PyTorch tooling
    (strict `load_state_dict` into model/vit_autoenc.py / model/vit.py).

    `fixed_pos_embeds` supplies tensors the reference stores as frozen
    Parameters but this framework treats as constants (the MAE's sincos
    `pos_embed`/`decoder_pos_embed`, vit_autoenc.py:30,45) — use
    `export_mae_torch_state_dict` to have them synthesised from the config.
    BatchNorm running stats come from `batch_stats`; `num_batches_tracked`
    is emitted as 0 for each exported BN (torch tracks it, flax does not).
    """
    sd: Dict[str, np.ndarray] = {}
    for path, w in _flatten(params):
        w = np.asarray(jax.device_get(w))
        if path[0] == "patch_embed":
            if path[-1] == "kernel":
                d_out = w.shape[-1]
                # rows (dz, dy, dx, c) -> (D, C, pz, py, px)
                sd["patch_embed.proj.weight"] = (
                    w.reshape(patch_size, patch_size, patch_size, in_chans, d_out)
                    .transpose(4, 3, 0, 1, 2)
                )
            else:
                sd["patch_embed.proj.bias"] = w
            continue
        if path[0] in ("cls_token", "mask_token", "pos_embed"):
            sd[path[0]] = w
            continue
        if path[0] == "heads":
            head, layer, leaf = path[1], path[2], path[3]
            idx = _HEAD_LAYER_TO_SEQ[head][layer]
            torch_leaf = "weight" if leaf in ("kernel", "scale") else "bias"
            value = w.T if leaf == "kernel" else w
            sd[f"{_HEAD_TORCH_NAME[head]}.{idx}.{torch_leaf}"] = value
            continue
        parts = list(path)
        # blocks_N / decoder_blocks_N -> blocks.N
        if "_" in parts[0] and parts[0].rsplit("_", 1)[0] in ("blocks", "decoder_blocks"):
            stack, num = parts[0].rsplit("_", 1)
            parts = [stack, num] + parts[1:]
        # flax Mlp Dense_0/Dense_1 -> torch mlp.fc1/fc2
        parts = [
            "fc1" if p == "Dense_0" else "fc2" if p == "Dense_1" else p for p in parts
        ]
        leaf = parts[-1]
        sub = ".".join(parts[:-1])
        if leaf == "scale":
            sd[f"{sub}.weight"] = w
        elif leaf == "kernel":
            sd[f"{sub}.weight"] = w.T
        elif leaf == "bias":
            sd[f"{sub}.bias"] = w
        else:
            sd[".".join(parts)] = w
    if batch_stats:
        for path, w in _flatten(batch_stats):
            if path[0] != "heads":
                continue
            head, layer, leaf = path[1], path[2], path[3]
            idx = _HEAD_LAYER_TO_SEQ[head][layer]
            prefix = f"{_HEAD_TORCH_NAME[head]}.{idx}"
            sd[f"{prefix}.running_{'mean' if leaf == 'mean' else 'var'}"] = (
                np.asarray(jax.device_get(w))
            )
            sd.setdefault(
                f"{prefix}.num_batches_tracked", np.asarray(0, dtype=np.int64)
            )
    if fixed_pos_embeds:
        for name, w in fixed_pos_embeds.items():
            sd[name] = np.asarray(w)
    return sd


def _default_head_batch_stats(cfg) -> Dict:
    """Fresh BN running stats (mean 0 / var 1 — torch's initial values) for
    every BatchNorm the contrastive heads contain. Needed because min-loss
    checkpoints store params only, and the projector's final affine-free BN
    (vit_autoenc.py:262) has NO params at all — strict torch loads still
    expect its running stats."""
    stats: Dict = {}
    d = cfg.embed_dim
    if getattr(cfg, "contrastive", False):
        _set(stats, ("heads", "predictor", "BatchNorm_0", "mean"), np.zeros(d, np.float32))
        _set(stats, ("heads", "predictor", "BatchNorm_0", "var"), np.ones(d, np.float32))
        if getattr(cfg, "use_proj", False):
            for k in range(3):
                _set(stats, ("heads", "projector", f"BatchNorm_{k}", "mean"),
                     np.zeros(d, np.float32))
                _set(stats, ("heads", "projector", f"BatchNorm_{k}", "var"),
                     np.ones(d, np.float32))
    return stats


def _deep_merge(base: Dict, override: Dict) -> Dict:
    out = dict(base)
    for k, v in override.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def export_mae_torch_state_dict(params: Dict, cfg, batch_stats: Optional[Dict] = None
                                ) -> Dict[str, "np.ndarray"]:
    """Reference-layout state_dict for an MAE trained here, with the fixed
    sincos pos-embed tables synthesised exactly as the reference freezes them
    (vit_autoenc.py:67-77) so its strict `load_state_dict` sees every key.
    Missing BN running stats default to fresh torch values (mean 0 / var 1)."""
    from vit_ae_plus_plus_tpu.ops import get_3d_sincos_pos_embed

    grid = round(cfg.num_patches ** (1 / 3))
    fixed = {
        "pos_embed": get_3d_sincos_pos_embed(cfg.embed_dim, grid, cls_token=True)[
            None
        ].astype(np.float32),
        "decoder_pos_embed": get_3d_sincos_pos_embed(
            cfg.decoder_embed_dim, grid, cls_token=True
        )[None].astype(np.float32),
    }
    stats = _deep_merge(_default_head_batch_stats(cfg), batch_stats or {})
    return export_torch_state_dict(
        params, cfg.patch_size, cfg.in_chans,
        batch_stats=stats, fixed_pos_embeds=fixed,
    )
