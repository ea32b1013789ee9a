"""Local-binary-pattern texture histogram (jnp port).

Parity target: reference /root/reference/model/model_utils/lbp_python.py:7-15,
which calls skimage's Cython `_local_binary_pattern(P=8, R=1, method='D')` —
the repo's only brush with native code. Two notes:

- the reference passes a 3D volume to a strictly-2D kernel, so its module
  crashes at import (lbp_python.py:14-15 runs on a 96^3 array); it is imported
  nowhere else (a dead standalone experiment). Here the volume is processed
  per z-slice, which is what a working version of that experiment computes;
- method 'D' (default) is the raw rotation-variant 8-bit code with bilinearly
  interpolated circle neighbours; we reproduce that with jnp.roll shifts and
  bilinear weights, so the whole thing jits and runs on the VPU instead of a
  Cython loop.
"""

from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp


def _neighbor_value(img: jnp.ndarray, dy: float, dx: float) -> jnp.ndarray:
    """Bilinearly interpolated neighbour at (row+dy, col+dx) via rolled copies
    (skimage bilinear_interpolation semantics; edges wrap, which only affects
    the 1-pixel border)."""
    y0, x0 = math.floor(dy), math.floor(dx)
    fy, fx = dy - y0, dx - x0
    if abs(fy) < 1e-9 and abs(fx) < 1e-9:
        return jnp.roll(img, (-y0, -x0), axis=(0, 1))
    v00 = jnp.roll(img, (-y0, -x0), axis=(0, 1))
    v01 = jnp.roll(img, (-y0, -(x0 + 1)), axis=(0, 1))
    v10 = jnp.roll(img, (-(y0 + 1), -x0), axis=(0, 1))
    v11 = jnp.roll(img, (-(y0 + 1), -(x0 + 1)), axis=(0, 1))
    return (
        v00 * (1 - fy) * (1 - fx)
        + v01 * (1 - fy) * fx
        + v10 * fy * (1 - fx)
        + v11 * fy * fx
    )


def local_binary_pattern_2d(image: jnp.ndarray, P: int = 8, R: float = 1.0) -> jnp.ndarray:
    """Rotation-variant ('D') LBP codes for one 2D image."""
    code = jnp.zeros(image.shape, jnp.int32)
    eps = jnp.asarray(1e-12, image.dtype)  # skimage's >= with rounding guard
    for p in range(P):
        angle = 2 * math.pi * p / P
        dy = -R * math.sin(angle)
        dx = R * math.cos(angle)
        neigh = _neighbor_value(image, dy, dx)
        code = code + (2**p) * (neigh >= image - eps).astype(jnp.int32)
    return code


def lbp_histogram(volume: np.ndarray, P: int = 8, R: float = 1.0) -> np.ndarray:
    """Density-normalised 256-bin histogram of per-slice LBP codes
    (lbp_python.py:7-12, fixed to actually work on volumes)."""
    vol = jnp.asarray(volume, jnp.float64 if volume.dtype == np.float64 else jnp.float32)
    if vol.ndim == 2:
        vol = vol[None]
    codes = jnp.stack([local_binary_pattern_2d(vol[z], P, R) for z in range(vol.shape[0])])
    hist, _ = np.histogram(np.asarray(codes), bins=np.arange(2**P + 1), density=True)
    return hist
