"""Patchify/unpatchify parity vs an independent naive loop implementation."""

import numpy as np
import jax.numpy as jnp
import pytest

from vit_ae_plus_plus_tpu.ops import patchify, unpatchify


def naive_patchify(vol: np.ndarray, p: int) -> np.ndarray:
    """Straight-from-the-definition loop version: raster order (gz, gy, gx),
    patch vector layout (dz, dy, dx, c) with c fastest."""
    n, c, s, _, _ = vol.shape
    g = s // p
    out = np.zeros((n, g * g * g, p * p * p * c), dtype=vol.dtype)
    for b in range(n):
        idx = 0
        for gz in range(g):
            for gy in range(g):
                for gx in range(g):
                    patch = vol[b, :, gz * p:(gz + 1) * p, gy * p:(gy + 1) * p, gx * p:(gx + 1) * p]
                    # (c, dz, dy, dx) -> (dz, dy, dx, c)
                    out[b, idx] = patch.transpose(1, 2, 3, 0).reshape(-1)
                    idx += 1
    return out


@pytest.mark.parametrize("c", [1, 4])
def test_patchify_matches_naive(c):
    rng = np.random.default_rng(0)
    vol = rng.standard_normal((2, c, 8, 8, 8)).astype(np.float32)
    got = np.asarray(patchify(jnp.asarray(vol), 4))
    want = naive_patchify(vol, 4)
    np.testing.assert_allclose(got, want, rtol=0, atol=0)


@pytest.mark.parametrize("c", [1, 4])
def test_unpatchify_roundtrip(c):
    rng = np.random.default_rng(1)
    vol = rng.standard_normal((2, c, 16, 16, 16)).astype(np.float32)
    x = patchify(jnp.asarray(vol), 8)
    back = unpatchify(x, 8)
    np.testing.assert_allclose(np.asarray(back), vol, rtol=0, atol=0)


def test_patchify_rejects_bad_shapes():
    vol = jnp.zeros((1, 1, 9, 9, 9))
    with pytest.raises(ValueError):
        patchify(vol, 4)
    with pytest.raises(ValueError):
        unpatchify(jnp.zeros((1, 7, 8)), 2)  # 7 not a cube
