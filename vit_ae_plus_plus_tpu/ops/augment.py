"""On-device data augmentation (jit-able, vmapped per sample).

The reference augments on the host CPU through torchio inside DataLoader
workers — the likely input-bound stage at TPU step rates (SURVEY.md §7 "hard
parts"). These are drop-in device equivalents of data/transforms.py with the
same parameter distributions:

- random_affine_3d: per-axis scale U(0.9, 1.1) + rotation U(-10deg, 10deg),
  trilinear resampling, zero padding (torchio RandomAffine defaults);
- random_noise: gaussian, std ~ U(0, 0.1);
- random_gamma: exp(U(-0.3, 0.3)) on min-max-rescaled intensities.

`device_augment_batch` composes all three per sample and can be fused INTO the
jitted train step (no host round-trip, no worker processes). Normalisation
(`znorm_volume`) reproduces the datasets' post-augmentation z-score.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp


def trilinear_sample(vol: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Sample (C, S, S, S) at real-valued coords (3, N); zeros outside."""
    c, sz, sy, sx = vol.shape
    z, y, x = coords
    z0, y0, x0 = jnp.floor(z).astype(jnp.int32), jnp.floor(y).astype(jnp.int32), jnp.floor(
        x
    ).astype(jnp.int32)
    fz, fy, fx = z - z0, y - y0, x - x0

    def gather(zi, yi, xi):
        valid = (
            (zi >= 0) & (zi < sz) & (yi >= 0) & (yi < sy) & (xi >= 0) & (xi < sx)
        )
        zi = jnp.clip(zi, 0, sz - 1)
        yi = jnp.clip(yi, 0, sy - 1)
        xi = jnp.clip(xi, 0, sx - 1)
        vals = vol[:, zi, yi, xi]  # (C, N)
        return jnp.where(valid[None, :], vals, 0.0)

    out = (
        gather(z0, y0, x0) * ((1 - fz) * (1 - fy) * (1 - fx))[None]
        + gather(z0, y0, x0 + 1) * ((1 - fz) * (1 - fy) * fx)[None]
        + gather(z0, y0 + 1, x0) * ((1 - fz) * fy * (1 - fx))[None]
        + gather(z0, y0 + 1, x0 + 1) * ((1 - fz) * fy * fx)[None]
        + gather(z0 + 1, y0, x0) * (fz * (1 - fy) * (1 - fx))[None]
        + gather(z0 + 1, y0, x0 + 1) * (fz * (1 - fy) * fx)[None]
        + gather(z0 + 1, y0 + 1, x0) * (fz * fy * (1 - fx))[None]
        + gather(z0 + 1, y0 + 1, x0 + 1) * (fz * fy * fx)[None]
    )
    # scipy mode='constant' semantics (the host path): a sample point outside
    # the domain is cval, no partial boundary blending
    in_domain = (
        (z >= 0) & (z <= sz - 1) & (y >= 0) & (y <= sy - 1) & (x >= 0) & (x <= sx - 1)
    )
    return jnp.where(in_domain[None, :], out, 0.0)


def _rotation_matrix(angles: jnp.ndarray) -> jnp.ndarray:
    """Rz(a0) @ Ry(a1) @ Rx(a2)-style composition matching
    data/transforms.py RandomAffine3D (axis order 0, 1, 2)."""

    def rot(axis, a):
        c_, s_ = jnp.cos(a), jnp.sin(a)
        if axis == 0:
            return jnp.array([[1, 0, 0], [0, c_, -s_], [0, s_, c_]])
        if axis == 1:
            return jnp.array([[c_, 0, s_], [0, 1, 0], [-s_, 0, c_]])
        return jnp.array([[c_, -s_, 0], [s_, c_, 0], [0, 0, 1]])

    return rot(0, angles[0]) @ rot(1, angles[1]) @ rot(2, angles[2])


# ---------------------------------------------------------------------------
# Shear-decomposed affine resampling: MXU matmuls instead of gathers.
#
# XLA's gather on TPU is element-at-a-time — the direct trilinear sampler
# below (`_affine_gather`) costs ~1.6 s for a (16, 1, 96^3) batch, 5x the
# whole train step. The policy's affine (rotations <= 10 deg, scales
# 0.9-1.1) decomposes exactly into elemental maps that each move ONE
# coordinate by an offset linear in at most one OTHER coordinate:
#   R_plane(theta) = Shear_u(-tan(theta/2)) Shear_v(sin theta)
#                    Shear_u(-tan(theta/2))            (Paeth decomposition)
#   diag(1/s)      = three per-axis uniform rescalings.
# Each such pass is a banded-matrix contraction over one axis — a batched
# matmul that runs on the MXU (~30 GFLOP total for 12 passes at 96^3 B16,
# ~1000x less wall time than the gathers). Each pass linearly interpolates
# once, so the result is augmentation-equivalent but not bit-identical to
# single-shot trilinear sampling: 12 lerps add slight extra smoothing and
# the zero-boundary blends over the final voxel (tested against the exact
# sampler on smooth volumes in tests/test_device_augment.py).
# ---------------------------------------------------------------------------

# einsum for "resample along MOVED axis, band matrix indexed by OTHER axis";
# vol is (C, Z, Y, X); W is (other_size, out_size, src_size), or
# (out_size, src_size) for the uniform (scale) passes keyed (moved, None).
_SHEAR_EINSUM = {
    (0, 1): "yzu,cuyx->czyx",
    (0, 2): "xzu,cuyx->czyx",
    (1, 0): "zyu,czux->czyx",
    (1, 2): "xyu,czux->czyx",
    (2, 0): "zxu,czyu->czyx",
    (2, 1): "yxu,czyu->czyx",
    (0, None): "zu,cuyx->czyx",
    (1, None): "yu,czux->czyx",
    (2, None): "xu,czyu->czyx",
}


def _band_weights(pos: jnp.ndarray, size: int) -> jnp.ndarray:
    """pos (..., out) fractional source positions -> W (..., out, size) with
    the two-tap linear-interpolation band; positions outside [0, size-1]
    contribute 0 (zero padding)."""
    u0 = jnp.floor(pos)
    f = pos - u0
    src = jax.lax.broadcasted_iota(jnp.float32, pos.shape + (size,), pos.ndim)
    u0 = u0[..., None]
    return (src == u0) * (1.0 - f)[..., None] + (src == u0 + 1.0) * f[..., None]


def _apply_shear(vol, moved: int, other, alpha, beta, center):
    """One elemental pass: src_moved = out_moved*alpha' ... concretely
    pos = out + alpha*(other - c_other) for shears (alpha'=1), or
    pos = (out - c)*rate + c for uniform scaling (other is None)."""
    sizes = vol.shape[1:]
    n = sizes[moved]
    out_idx = jnp.arange(n, dtype=jnp.float32)
    if other is None:
        pos = (out_idx - center[moved]) * alpha + center[moved]  # (n,)
        w = _band_weights(pos, n)  # (n, n)
    else:
        o_idx = jnp.arange(sizes[other], dtype=jnp.float32) - center[other]
        pos = out_idx[None, :] + beta * o_idx[:, None]  # (other, n)
        w = _band_weights(pos, n)  # (other, n, n)
    return jnp.einsum(_SHEAR_EINSUM[(moved, other)], w, vol)


def _paeth_passes(axis: int, theta):
    """Elemental passes (moved, other, beta) for the rotation rot(axis)
    used by data/transforms.py: planes [(1,2),(0,2),(0,1)]; axis 1 is the
    transposed convention (see transforms.RandomAffine3D.rot)."""
    i, j = [(1, 2), (0, 2), (0, 1)][axis]
    if axis == 1:
        theta = -theta
    a = -jnp.tan(theta / 2.0)
    s = jnp.sin(theta)
    # R = X(a) Y(s) X(a): apply LEFTMOST factor first (map composition)
    return [(i, j, a), (j, i, s), (i, j, a)]


def _affine_shear(vol: jnp.ndarray, angles: jnp.ndarray, scale: jnp.ndarray):
    shape = vol.shape[1:]
    center = (jnp.asarray(shape, jnp.float32) - 1) / 2.0
    out = vol
    for axis in range(3):
        for moved, other, beta in _paeth_passes(axis, angles[axis]):
            out = _apply_shear(out, moved, other, None, beta, center)
    for axis in range(3):
        out = _apply_shear(out, axis, None, 1.0 / scale[axis], None, center)
    return out


def _affine_gather(vol: jnp.ndarray, angles: jnp.ndarray, scale: jnp.ndarray):
    """Exact single-shot trilinear sampling (scipy-parity reference path)."""
    mat = _rotation_matrix(angles) @ jnp.diag(1.0 / scale)
    shape = vol.shape[1:]
    center = (jnp.asarray(shape, jnp.float32) - 1) / 2.0
    grid = jnp.stack(
        jnp.meshgrid(*[jnp.arange(s, dtype=jnp.float32) for s in shape], indexing="ij"),
        axis=0,
    ).reshape(3, -1)
    src = mat @ (grid - center[:, None]) + center[:, None]
    return trilinear_sample(vol, src).reshape(vol.shape)


def random_affine_3d(
    key: jax.Array, vol: jnp.ndarray, scales: float = 0.1, degrees: float = 10.0,
    method: str = "shear",
) -> jnp.ndarray:
    """(C, S, S, S) -> same shape; output voxel pulls from mat @ (p - c) + c.

    method='shear' (default): MXU banded-matmul passes, ~1000x faster on TPU;
    method='gather': exact trilinear sampling, scipy-parity (slow on TPU).
    Both draw the same parameters from `key`.
    """
    k1, k2 = jax.random.split(key)
    scale = jax.random.uniform(k1, (3,), minval=1 - scales, maxval=1 + scales)
    angles = jax.random.uniform(
        k2, (3,), minval=-degrees, maxval=degrees
    ) * (math.pi / 180.0)
    if method == "shear":
        return _affine_shear(vol, angles, scale)
    return _affine_gather(vol, angles, scale)


def random_noise(key: jax.Array, vol: jnp.ndarray, std: float = 0.1) -> jnp.ndarray:
    k1, k2 = jax.random.split(key)
    sigma = jax.random.uniform(k1, (), minval=0.0, maxval=std)
    return vol + sigma * jax.random.normal(k2, vol.shape, vol.dtype)


def random_gamma(
    key: jax.Array, vol: jnp.ndarray, log_gamma: Tuple[float, float] = (-0.3, 0.3)
) -> jnp.ndarray:
    gamma = jnp.exp(jax.random.uniform(key, (), minval=log_gamma[0], maxval=log_gamma[1]))
    vmin, vmax = jnp.min(vol), jnp.max(vol)
    unit = (vol - vmin) / jnp.maximum(vmax - vmin, 1e-8)
    return unit**gamma * (vmax - vmin) + vmin


def znorm_volume(vol: jnp.ndarray) -> jnp.ndarray:
    """Whole-volume z-score (population variance), matching
    data/brats.py normalize_volume(use_z_score=True)."""
    return (vol - vol.mean()) / jnp.sqrt(vol.var())


def minmax_volume(vol: jnp.ndarray) -> jnp.ndarray:
    """Min-max to [-1, 1], matching normalize_volume(use_z_score=False)."""
    vmin, vmax = jnp.min(vol), jnp.max(vol)
    return 2 * (vol - vmin) / jnp.maximum(vmax - vmin, 1e-8) - 1


def znorm_per_channel(vol: jnp.ndarray) -> jnp.ndarray:
    """Per-channel z-score over spatial dims (EGD semantics, egd.py:44-47)."""
    mean = vol.mean(axis=(1, 2, 3), keepdims=True)
    var = vol.var(axis=(1, 2, 3), keepdims=True)
    return (vol - mean) / jnp.sqrt(var)


def augment_one(key: jax.Array, vol: jnp.ndarray) -> jnp.ndarray:
    """The SSL policy: affine -> noise -> gamma (k_fold_…_brats.py:93-97)."""
    k1, k2, k3 = jax.random.split(key, 3)
    vol = random_affine_3d(k1, vol)
    vol = random_noise(k2, vol)
    vol = random_gamma(k3, vol)
    return vol


def device_augment_batch(key: jax.Array, raw_batch: jnp.ndarray, use_z_score: bool = True,
                         per_channel: bool = False):
    """(B, C, S, S, S) raw volumes -> (augmented_normed, original_normed).

    Fuses the entire (augment, normalise both views) data path into XLA —
    the device-side replacement for the host loader's per-sample CPU work.
    `per_channel` selects EGD's per-channel z-score.
    """
    if per_channel and use_z_score:
        norm = znorm_per_channel
    else:
        norm = znorm_volume if use_z_score else minmax_volume
    keys = jax.random.split(key, raw_batch.shape[0])
    augmented = jax.vmap(augment_one)(keys, raw_batch)
    view1 = jax.vmap(norm)(augmented)
    view2 = jax.vmap(norm)(raw_batch)
    return view1, view2
