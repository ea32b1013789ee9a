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
        restored = self._mgr.restore(step, args=ocp.args.StandardRestore(template))
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
# torch .pth import shim (reference-checkpoint compatibility)
# ---------------------------------------------------------------------------

def _set(tree: Dict, path, value):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def import_torch_state_dict(state_dict: Dict[str, "np.ndarray"], patch_size: int,
                            in_chans: int) -> Dict:
    """Convert a reference torch state_dict (tensor name -> array) into this
    framework's param tree.

    Mappings: Linear weight (out, in) -> Dense kernel (in, out); the Conv3d
    patch embed (D, C, p, p, p) -> dense kernel (p^3*C, D) in (dz, dy, dx, c)
    row order; LayerNorm weight/bias -> scale/bias; blocks.N.* -> blocks_N.*.
    pos_embed tensors for the MAE are skipped (fixed constants here);
    classifier ViT pos_embed is kept as a param.
    """
    params: Dict = {}
    for name, w in state_dict.items():
        w = np.asarray(w)
        parts = name.split(".")
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
