"""Reconstruction sanity checks and visualisations.

Parity targets:
- visualization/sanity_checks.py:23-263 — run the MAE on test volumes, report
  pred/gt nonzero fractions, unpatchify the binary mask to voxel space, save
  per-slice PNG stacks (original / masked / reconstruction / paste composite,
  masked regions highlighted);
- visualization/visualizations.py:37-68 — single-sample masked / recon /
  paste-composite volumes exported as NIfTI (gated: nibabel optional here);
- visualization/custom_operation_checks.py:16-57 — patchify/unpatchify
  round-trip and Sobel/blur visual checks (the round-trip is also a unit test
  in tests/).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from vit_ae_plus_plus_tpu.models import MaskedAutoencoderViT3D
from vit_ae_plus_plus_tpu.ops import patchify, unpatchify


def reconstruct(model: MaskedAutoencoderViT3D, variables, volume: np.ndarray,
                mask_ratio: float = 0.75, seed: int = 0) -> Dict[str, np.ndarray]:
    """One MAE pass -> original / masked / reconstruction / paste volumes.

    `masked`: original with removed patches zeroed; `paste`: reconstruction in
    removed patches, original elsewhere (sanity_checks.py:82-108 semantics).
    """
    p = model.cfg.patch_size
    out = model.apply(
        variables, jnp.asarray(volume), None, mask_ratio=mask_ratio,
        rngs={"mask": jax.random.PRNGKey(seed)}, train=False,
    )
    pred_vol = unpatchify(out["pred"].astype(jnp.float32), p)
    mask_vox = unpatchify(
        jnp.repeat(out["mask"][:, :, None], p**3 * model.cfg.in_chans, axis=2), p
    )
    orig = jnp.asarray(volume, jnp.float32)
    masked = orig * (1 - mask_vox)
    paste = pred_vol * mask_vox + orig * (1 - mask_vox)
    return {
        "original": np.asarray(orig),
        "reconstruction": np.asarray(pred_vol),
        "masked": np.asarray(masked),
        "paste": np.asarray(paste),
        "mask": np.asarray(mask_vox),
    }


def nonzero_fractions(recon: Dict[str, np.ndarray], threshold: float = 1e-6) -> Dict[str, float]:
    """Pred/gt nonzero-voxel fractions (sanity_checks.py:110-111)."""
    return {
        "pred_nonzero_frac": float((np.abs(recon["reconstruction"]) > threshold).mean()),
        "gt_nonzero_frac": float((np.abs(recon["original"]) > threshold).mean()),
    }


def save_slice_pngs(recon: Dict[str, np.ndarray], out_dir: str, sample_idx: int = 0,
                    axis: int = 0, stride: int = 8) -> int:
    """Per-slice PNG stack with the masked region tinted blue
    (sanity_checks.py:30-72). Returns number of slices written."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(out_dir, exist_ok=True)
    vol = recon["original"][sample_idx, 0]
    rec = recon["reconstruction"][sample_idx, 0]
    paste = recon["paste"][sample_idx, 0]
    mask = recon["mask"][sample_idx, 0]
    n = 0
    for z in range(0, vol.shape[axis], stride):
        sl = [slice(None)] * 3
        sl[axis] = z
        sl = tuple(sl)
        fig, axes = plt.subplots(1, 4, figsize=(12, 3))
        for ax, (title, img) in zip(
            axes,
            [("original", vol[sl]), ("masked", vol[sl] * (1 - mask[sl])),
             ("reconstruction", rec[sl]), ("paste", paste[sl])],
        ):
            ax.imshow(img, cmap="gray")
            if title == "masked":
                overlay = np.zeros((*mask[sl].shape, 4))
                overlay[..., 2] = 1.0
                overlay[..., 3] = 0.35 * mask[sl]
                ax.imshow(overlay)
            ax.set_title(title)
            ax.axis("off")
        fig.savefig(os.path.join(out_dir, f"sample{sample_idx}_slice{z:03d}.png"),
                    bbox_inches="tight", dpi=80)
        plt.close(fig)
        n += 1
    return n


def save_nifti(recon: Dict[str, np.ndarray], out_dir: str, sample_idx: int = 0) -> bool:
    """Masked / reconstruction / paste composites as .nii.gz
    (visualizations.py:37-68). Uses nibabel when present; otherwise the
    built-in NIfTI-1 writer (utils/nifti.py) — never skipped."""
    os.makedirs(out_dir, exist_ok=True)
    try:
        import nibabel as nib

        for name in ("original", "masked", "reconstruction", "paste"):
            img = nib.Nifti1Image(recon[name][sample_idx, 0], affine=np.eye(4))
            nib.save(img, os.path.join(out_dir, f"{name}_{sample_idx}.nii.gz"))
        return True
    except ImportError:
        from vit_ae_plus_plus_tpu.utils.nifti import write_nifti

        for name in ("original", "masked", "reconstruction", "paste"):
            write_nifti(os.path.join(out_dir, f"{name}_{sample_idx}.nii.gz"),
                        recon[name][sample_idx, 0])
        return True


def check_patchify_roundtrip(volume: np.ndarray, patch_size: int) -> bool:
    """custom_operation_checks.py:16-36 equivalent."""
    x = patchify(jnp.asarray(volume), patch_size)
    back = unpatchify(x, patch_size)
    return bool(jnp.allclose(back, jnp.asarray(volume)))


def op_check_images(volume: np.ndarray, tb_log_dir: str, z: Optional[int] = None) -> None:
    """Sobel / blur visual inspection to TensorBoard
    (custom_operation_checks.py:39-52): write the centre slice of the volume,
    its blur, and its edge map as an image grid."""
    from vit_ae_plus_plus_tpu.ops import gaussian_blur_3d, sobel_edges_3d
    from vit_ae_plus_plus_tpu.train.metrics import TBWriter

    vol = jnp.asarray(volume)[None] if volume.ndim == 4 else jnp.asarray(volume)
    z = z if z is not None else vol.shape[2] // 2
    blur = gaussian_blur_3d(vol, 2.0)
    edges = sobel_edges_3d(vol)[:, None]
    imgs = []
    for img in (vol[:, :1], blur[:, :1], edges):
        sl = np.asarray(img[0, 0, z])
        rng = sl.max() - sl.min()
        imgs.append(((sl - sl.min()) / (rng if rng else 1.0))[None])
    TBWriter(tb_log_dir).images(np.stack(imgs), tag="op_checks")


def plot_one_slice(volumes_path: str, out_path: Optional[str] = None,
                   sample_idx: int = 0, seed: int = 0) -> np.ndarray:
    """BraTS data-exploration demo (reference dataset/brats_dataset/
    data_exploration.py:9-28): load the raw volume store, augment one sample
    with the demo policy (affine + blur + noise(0.5) + gamma), and plot the
    centre slice. Saves a PNG when `out_path` is given (headless-friendly),
    otherwise shows interactively; returns the slice array either way."""
    from vit_ae_plus_plus_tpu.data.transforms import (
        Compose, RandomAffine3D, RandomBlur, RandomGamma, RandomNoise,
    )

    data = np.load(volumes_path, mmap_mode="r")
    print(f"Original shape {data.shape}")
    vol = np.asarray(data[sample_idx]).transpose(3, 0, 1, 2)  # (C, D, H, W)
    policy = Compose([RandomAffine3D(), RandomBlur(), RandomNoise(std=0.5),
                      RandomGamma(log_gamma=(-0.3, 0.3))])
    vol = policy(vol, np.random.default_rng(seed))
    one_slice = vol[0, vol.shape[1] // 2]
    import matplotlib

    if out_path:
        matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    plt.imshow(one_slice)
    if out_path:
        os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
        plt.savefig(out_path)
        plt.close()
    else:
        plt.show()
    return one_slice
