"""Host-side augmentation policy: parameter distributions and invariants."""

import numpy as np

from vit_ae_plus_plus_tpu.data.transforms import (
    Compose,
    RandomAffine3D,
    RandomBlur,
    RandomGamma,
    RandomNoise,
    default_ssl_transforms,
)


def test_random_noise_distribution():
    rng = np.random.default_rng(0)
    vol = np.zeros((1, 16, 16, 16), np.float32)
    stds = []
    for _ in range(30):
        out = RandomNoise(std=0.1)(vol, rng)
        stds.append(out.std())
    stds = np.array(stds)
    # std ~ U(0, 0.1): all within bound, spread over the range
    assert (stds <= 0.105).all()
    assert stds.max() > 0.05 and stds.min() < 0.05


def test_random_gamma_monotone_and_range_preserving():
    rng = np.random.default_rng(1)
    vol = np.linspace(-1, 2, 4096, dtype=np.float32).reshape(1, 16, 16, 16)
    out = RandomGamma((-0.3, 0.3))(vol, rng)
    assert np.isclose(out.min(), -1, atol=1e-5) and np.isclose(out.max(), 2, atol=1e-5)
    flat_in, flat_out = vol.ravel(), out.ravel()
    order = np.argsort(flat_in)
    assert np.all(np.diff(flat_out[order]) >= -1e-6)  # monotone intensity map


def test_random_affine_identity_statistics():
    """Small rotations/scales keep most mass; degenerate settings are exact."""
    rng = np.random.default_rng(2)
    vol = np.ones((1, 16, 16, 16), np.float32)
    out = RandomAffine3D()(vol, rng)
    # interior stays ~1 (only boundary voxels affected by resampling/padding)
    assert np.isclose(out[0, 4:-4, 4:-4, 4:-4].mean(), 1.0, atol=0.02)
    # zero-degree, unit-scale affine is the identity
    ident = RandomAffine3D(scales=0.0, degrees=0.0)(vol, rng)
    np.testing.assert_allclose(ident, vol, atol=1e-6)


def test_random_blur_smooths():
    rng = np.random.default_rng(3)
    vol = rng.standard_normal((1, 16, 16, 16)).astype(np.float32)
    out = RandomBlur(std=2.0)(vol, rng)
    assert out.std() <= vol.std() + 1e-6


def test_default_policy_composition():
    policy = default_ssl_transforms()
    assert isinstance(policy, Compose) and len(policy.transforms) == 3
    rng = np.random.default_rng(4)
    vol = np.abs(np.random.default_rng(5).standard_normal((1, 16, 16, 16))).astype(np.float32)
    out = policy(vol, rng)
    assert out.shape == vol.shape and np.isfinite(out).all()
    assert not np.allclose(out, vol)
