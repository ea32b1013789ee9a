"""Constant-kernel 3D filters used by the edge-map auxiliary loss.

Parity targets:
- Sobel: reference /root/reference/model/model_utils/sobel_filter.py:5-45 —
  hand-written 3x3x3 Sobel kernels per axis, zero bias, per-input-channel
  gradient magnitude sqrt(gx^2+gy^2+gz^2) **summed** over channels.
- Gaussian: reference /root/reference/model/model_utils/gaussian_filter.py:5-26
  — kernel taps at `linspace(-(ks//2+1?), ...)`; concretely
  `torch.linspace(-ks//2, ks//2+1, ks)` which for sigma=2 gives 11 taps spaced
  1.2 apart on [-6, 6] (non-integer spacing — reproduced exactly), normalised.

TPU notes: the reference runs a dense k^3 conv (11^3 = 1331 MACs/voxel for the
blur). Both kernels here are separable (the Gaussian is an outer product; each
Sobel gradient is smooth (x) smooth (x) derivative), so everything reduces to
1-D passes. On TPU a 1-channel `lax.conv` is catastrophically laid out (the
channel dim occupies the 128-lane axis with 1 value), so the 1-D passes are
executed as BANDED-MATRIX einsums on the MXU: out = vol x M_axis with
M[j, i] = taps[j - i + pad] — measured ~15x faster than the conv lowering at
96^3 batch 16. `*_conv` variants keep the lax.conv path for cross-checking.
Both filters are fixed constants: they fold into the jitted loss graph.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp
from jax import lax

# Sobel kernels, axis order (z, y, x) == reference weight[0..2, 0]
_SOBEL_X = np.array(
    [
        [[1, 0, -1], [2, 0, -2], [1, 0, -1]],
        [[2, 0, -2], [4, 0, -4], [2, 0, -2]],
        [[1, 0, -1], [2, 0, -2], [1, 0, -1]],
    ],
    dtype=np.float32,
)
_SOBEL_Y = np.array(
    [
        [[-1, -2, -1], [0, 0, 0], [1, 2, 1]],
        [[-2, -4, -2], [0, 0, 0], [2, 4, 2]],
        [[-1, -2, -1], [0, 0, 0], [1, 2, 1]],
    ],
    dtype=np.float32,
)
_SOBEL_Z = np.array(
    [
        [[-1, -2, -1], [-2, -4, -2], [-1, -2, -1]],
        [[0, 0, 0], [0, 0, 0], [0, 0, 0]],
        [[1, 2, 1], [2, 4, 2], [1, 2, 1]],
    ],
    dtype=np.float32,
)
_SOBEL_KERNEL = np.stack([_SOBEL_X, _SOBEL_Y, _SOBEL_Z])[:, None]  # (3, 1, 3, 3, 3) OIDHW

_CONV_DNUMS = ("NCDHW", "OIDHW", "NCDHW")

# separable Sobel factors: SOBEL_axis = outer(smooth, smooth, deriv) arranged
# so the derivative sits on that axis (verified vs the dense kernels in tests)
_SMOOTH = np.array([1.0, 2.0, 1.0], np.float32)
_DERIV = np.array([1.0, 0.0, -1.0], np.float32)


def _band_matrix(taps: np.ndarray, size: int, dtype) -> jnp.ndarray:
    """M[j, i] = taps[j - i + pad]: right-multiplying applies the 1-D
    cross-correlation with zero ('constant') padding along that axis."""
    pad = len(taps) // 2
    j = np.arange(size)[:, None]
    i = np.arange(size)[None, :]
    k = j - i + pad
    m = np.where((k >= 0) & (k < len(taps)), taps[np.clip(k, 0, len(taps) - 1)], 0.0)
    return jnp.asarray(m, dtype)


_AXIS_EINSUM = {0: "bczyx,zw->bcwyx", 1: "bczyx,yw->bczwx", 2: "bczyx,xw->bczyw"}


def _edge_magnitude(sq_sum: jnp.ndarray) -> jnp.ndarray:
    """sqrt with the true subgradient at 0.

    The reference's `torch.sqrt(gx^2+gy^2+gz^2)` (sobel_filter.py:38-44) has
    gradient gi/mag, which is NaN where the volume is locally constant
    (gx=gy=gz=0 exactly) — a live hazard once the MAE's prediction develops
    flat regions; the gradient then poisons the whole step. Forward value is
    identical; the backward uses the Euclidean norm's subgradient 0 at the
    origin (double-where trick so the 0-branch contributes a hard zero).
    """
    positive = sq_sum > 0
    safe = jnp.where(positive, sq_sum, 1.0)
    return jnp.where(positive, jnp.sqrt(safe), 0.0)


def _apply_1d(vol: jnp.ndarray, taps: np.ndarray, axis: int) -> jnp.ndarray:
    """1-D cross-correlation along spatial `axis` of (N, C, Z, Y, X) as a
    banded-matrix einsum (runs on the MXU)."""
    size = vol.shape[2 + axis]
    m = _band_matrix(taps, size, vol.dtype)
    return jnp.einsum(_AXIS_EINSUM[axis], vol, m)


def sobel_edges_3d(volume: jnp.ndarray) -> jnp.ndarray:
    """(N, C, S, S, S) -> (N, S, S, S) combined edge magnitude.

    Per channel: gx/gy/gz via separable smooth/derivative passes,
    sqrt(gx^2 + gy^2 + gz^2); channels summed (sobel_filter.py:37-45).
    """
    sz = _apply_1d(volume, _SMOOTH, 0)
    sy = _apply_1d(volume, _SMOOTH, 1)
    # gx: derivative along x, smoothing along z and y
    gx = _apply_1d(_apply_1d(sz, _SMOOTH, 1), _DERIV, 2)
    # gy: derivative along y, smoothing along z and x
    gy = _apply_1d(_apply_1d(sz, _DERIV, 1), _SMOOTH, 2)
    # gz: derivative along z, smoothing along y and x
    gz = _apply_1d(_apply_1d(sy, _DERIV, 0), _SMOOTH, 2)
    mag = _edge_magnitude(gx * gx + gy * gy + gz * gz)
    return mag.sum(axis=1)


def sobel_edges_3d_conv(volume: jnp.ndarray) -> jnp.ndarray:
    """lax.conv reference path (slow on TPU; kept for cross-checks)."""
    n, c, *spatial = volume.shape
    kernel = jnp.asarray(_SOBEL_KERNEL, dtype=volume.dtype)
    x = volume.reshape(n * c, 1, *spatial)
    g = lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1, 1), padding="SAME", dimension_numbers=_CONV_DNUMS
    )
    mag = _edge_magnitude(jnp.sum(g * g, axis=1))
    return mag.reshape(n, c, *spatial).sum(axis=1)


def gaussian_kernel_1d(sigma: float) -> np.ndarray:
    """1-D taps exactly as reference gaussian_filter.py:5-13 (note the
    floor-division linspace endpoints producing non-integer spacing)."""
    ks = int(sigma * 5)
    if ks % 2 == 0:
        ks += 1
    ts = np.linspace(-ks // 2, ks // 2 + 1, ks, dtype=np.float32)
    gauss = np.exp(-((ts / sigma) ** 2) / 2.0)
    return gauss / gauss.sum()


def gaussian_blur_3d(volume: jnp.ndarray, sigma: float = 2.0) -> jnp.ndarray:
    """(N, C, S, S, S) -> same shape, per-channel Gaussian blur.

    Mathematically identical to the reference's dense k (x) k (x) k conv
    (gaussian_filter.py:16-26) but run as three separable 1-D banded-matmul
    passes on the MXU.
    """
    k = gaussian_kernel_1d(sigma)
    x = volume
    for axis in range(3):
        x = _apply_1d(x, k, axis)
    return x


def gaussian_blur_3d_conv(volume: jnp.ndarray, sigma: float = 2.0) -> jnp.ndarray:
    """lax.conv reference path (slow on TPU; kept for cross-checks)."""
    k = gaussian_kernel_1d(sigma)
    pad = len(k) // 2
    n, c, *spatial = volume.shape
    x = volume.reshape(n * c, 1, *spatial)
    for axis in range(3):
        shape = [1, 1, 1, 1, 1]
        shape[2 + axis] = len(k)
        kern = jnp.asarray(k.reshape(shape), dtype=volume.dtype)
        padding = [(pad, pad) if i == axis else (0, 0) for i in range(3)]
        x = lax.conv_general_dilated(
            x, kern, window_strides=(1, 1, 1), padding=padding, dimension_numbers=_CONV_DNUMS
        )
    return x.reshape(n, c, *spatial)


def gaussian_blur_3d_dense(volume: jnp.ndarray, sigma: float = 2.0) -> jnp.ndarray:
    """The reference's EXACT algorithm: one dense k^3 conv per channel with the
    outer-product kernel k (x) k (x) k, re-normalised, padding len(k)//2
    (/root/reference/model/model_utils/gaussian_filter.py:16-26) — 1331
    MACs/voxel at sigma=2 vs 33 for the separable path. Used only by the
    reference-faithful benchmark leg (utils/ref_faithful.py); the framework's
    production path is `gaussian_blur_3d`."""
    k = gaussian_kernel_1d(sigma)
    k3d = np.einsum("i,j,k->ijk", k, k, k)
    k3d = k3d / k3d.sum()
    pad = len(k) // 2
    n, c, *spatial = volume.shape
    x = volume.reshape(n * c, 1, *spatial)
    kern = jnp.asarray(k3d[None, None], dtype=volume.dtype)
    x = lax.conv_general_dilated(
        x, kern, window_strides=(1, 1, 1), padding=[(pad, pad)] * 3,
        dimension_numbers=_CONV_DNUMS,
    )
    return x.reshape(n, c, *spatial)
