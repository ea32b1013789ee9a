"""Sobel / Gaussian filter parity vs torch.nn.functional.conv3d (the backend
the reference uses). torch runs on CPU here purely as an independent oracle."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from vit_ae_plus_plus_tpu.ops import sobel_edges_3d, gaussian_blur_3d, gaussian_kernel_1d

SOBEL_X = torch.tensor(
    [
        [[1, 0, -1], [2, 0, -2], [1, 0, -1]],
        [[2, 0, -2], [4, 0, -4], [2, 0, -2]],
        [[1, 0, -1], [2, 0, -2], [1, 0, -1]],
    ],
    dtype=torch.float32,
)
SOBEL_Y = torch.tensor(
    [
        [[-1, -2, -1], [0, 0, 0], [1, 2, 1]],
        [[-2, -4, -2], [0, 0, 0], [2, 4, 2]],
        [[-1, -2, -1], [0, 0, 0], [1, 2, 1]],
    ],
    dtype=torch.float32,
)
SOBEL_Z = torch.tensor(
    [
        [[-1, -2, -1], [-2, -4, -2], [-1, -2, -1]],
        [[0, 0, 0], [0, 0, 0], [0, 0, 0]],
        [[1, 2, 1], [2, 4, 2], [1, 2, 1]],
    ],
    dtype=torch.float32,
)


def torch_sobel(x: np.ndarray) -> np.ndarray:
    """Oracle mirroring sobel_filter.py:37-45 semantics with F.conv3d."""
    t = torch.from_numpy(x)
    w = torch.stack([SOBEL_X, SOBEL_Y, SOBEL_Z]).unsqueeze(1)
    out = 0
    for idx in range(t.shape[1]):
        g = F.conv3d(t[:, idx : idx + 1], w, padding=1)
        out = out + torch.sqrt(g[:, 0] ** 2 + g[:, 1] ** 2 + g[:, 2] ** 2)
    return out.numpy()


def torch_gaussian(x: np.ndarray, sigma: float) -> np.ndarray:
    """Oracle mirroring gaussian_filter.py:5-26 (dense k (x) k (x) k conv)."""
    t = torch.from_numpy(x)
    ks = int(sigma * 5)
    if ks % 2 == 0:
        ks += 1
    ts = torch.linspace(-ks // 2, ks // 2 + 1, ks)
    gauss = torch.exp(-((ts / sigma) ** 2) / 2)
    k = gauss / gauss.sum()
    k3d = torch.einsum("i,j,k->ijk", k, k, k)
    k3d = k3d / k3d.sum()
    outs = []
    for idx in range(t.shape[1]):
        outs.append(F.conv3d(t[:, idx : idx + 1], k3d.reshape(1, 1, *k3d.shape), padding=ks // 2))
    return torch.cat(outs, dim=1).numpy()


@pytest.mark.parametrize("c", [1, 4])
def test_sobel_matches_torch(c):
    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, c, 12, 12, 12)).astype(np.float32)
    got = np.asarray(sobel_edges_3d(jnp.asarray(x)))
    want = torch_sobel(x)
    assert got.shape == want.shape == (2, 12, 12, 12)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_gaussian_kernel_taps_match_reference_quirk():
    k = gaussian_kernel_1d(2.0)
    assert len(k) == 11
    # linspace(-6, 6, 11): spacing 1.2, NOT integer taps
    ts = np.linspace(-6, 6, 11)
    want = np.exp(-((ts / 2.0) ** 2) / 2)
    want /= want.sum()
    np.testing.assert_allclose(k, want, rtol=1e-6)


@pytest.mark.parametrize("c", [1, 3])
def test_gaussian_blur_matches_torch_dense(c):
    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, c, 16, 16, 16)).astype(np.float32)
    got = np.asarray(gaussian_blur_3d(jnp.asarray(x), sigma=2.0))
    want = torch_gaussian(x, 2.0)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_matmul_and_conv_paths_agree():
    """The MXU banded-matmul fast path equals the lax.conv reference path."""
    from vit_ae_plus_plus_tpu.ops.filters import (
        gaussian_blur_3d_conv,
        sobel_edges_3d_conv,
    )
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((2, 2, 12, 12, 12)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(sobel_edges_3d(x)), np.asarray(sobel_edges_3d_conv(x)),
        rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(gaussian_blur_3d(x)), np.asarray(gaussian_blur_3d_conv(x)),
        rtol=1e-4, atol=1e-5,
    )


def test_sobel_gradient_finite_on_flat_volume():
    """The Euclidean edge magnitude must use the subgradient 0 at the origin:
    the reference's torch.sqrt (sobel_filter.py:38-44) yields NaN gradients
    wherever the volume is locally constant (gx=gy=gz=0), which poisons the
    whole training step once the MAE's reconstruction develops flat regions.
    Forward parity is untouched (sqrt values identical); only the grad at
    exactly-zero magnitude is defined to 0."""
    import jax

    from vit_ae_plus_plus_tpu.ops.filters import sobel_edges_3d_conv

    zeros = jnp.zeros((1, 1, 8, 8, 8), jnp.float32)  # 0 everywhere incl. padding
    ones = jnp.ones((1, 1, 8, 8, 8), jnp.float32)  # flat core, real border edges

    for fn in (sobel_edges_3d, sobel_edges_3d_conv):
        g0 = jax.grad(lambda v: jnp.sum(fn(v)))(zeros)
        np.testing.assert_array_equal(np.asarray(g0), 0.0, err_msg=fn.__name__)
        g1 = jax.grad(lambda v: jnp.sum(fn(v)))(ones)
        assert np.all(np.isfinite(np.asarray(g1))), fn.__name__
        # interior of the flat volume: zero magnitude -> exactly-zero subgrad
        np.testing.assert_array_equal(np.asarray(g1)[..., 2:-2, 2:-2, 2:-2], 0.0)

    # and a mixed volume (flat core + edges) keeps finite grads that match
    # finite differences away from the singular points
    rng = np.random.default_rng(3)
    x = np.zeros((1, 1, 8, 8, 8), np.float32)
    x[..., :4] = rng.standard_normal((1, 1, 8, 8, 4)).astype(np.float32)
    g = jax.grad(lambda v: jnp.sum(sobel_edges_3d(v)))(jnp.asarray(x))
    assert np.all(np.isfinite(np.asarray(g)))
