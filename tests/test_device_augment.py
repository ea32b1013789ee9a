"""On-device augmentation vs the host (scipy) implementations."""

import numpy as np
import jax
import jax.numpy as jnp

from vit_ae_plus_plus_tpu.ops.augment import (
    augment_one,
    device_augment_batch,
    random_affine_3d,
    random_gamma,
    random_noise,
    trilinear_sample,
    znorm_volume,
)


def test_trilinear_sample_exact_at_grid_points():
    rng = np.random.default_rng(0)
    vol = rng.standard_normal((2, 5, 5, 5)).astype(np.float32)
    coords = np.stack(np.meshgrid(*[np.arange(5.0)] * 3, indexing="ij")).reshape(3, -1)
    out = trilinear_sample(jnp.asarray(vol), jnp.asarray(coords))
    np.testing.assert_allclose(np.asarray(out).reshape(vol.shape), vol, rtol=1e-5)


def test_trilinear_sample_midpoint_and_outside():
    vol = jnp.ones((1, 4, 4, 4))
    mid = trilinear_sample(vol, jnp.array([[1.5], [1.5], [1.5]]))
    np.testing.assert_allclose(np.asarray(mid), [[1.0]], rtol=1e-6)
    outside = trilinear_sample(vol, jnp.array([[-3.0], [0.0], [0.0]]))
    np.testing.assert_allclose(np.asarray(outside), [[0.0]])


def test_device_affine_matches_scipy_for_fixed_params(monkeypatch):
    """Pin the random draws and compare against scipy.ndimage (the host path)."""
    from scipy import ndimage
    import math

    scale = np.array([0.95, 1.05, 1.0])
    angles = np.array([5.0, -3.0, 8.0]) * math.pi / 180.0

    # device version with injected params: reimplement via its internals
    from vit_ae_plus_plus_tpu.ops.augment import _rotation_matrix

    rng = np.random.default_rng(1)
    vol = rng.standard_normal((1, 12, 12, 12)).astype(np.float32)
    mat = np.asarray(_rotation_matrix(jnp.asarray(angles))) @ np.diag(1.0 / scale)
    center = (np.asarray(vol.shape[1:]) - 1) / 2.0
    grid = np.stack(np.meshgrid(*[np.arange(12.0)] * 3, indexing="ij")).reshape(3, -1)
    src = mat @ (grid - center[:, None]) + center[:, None]
    got = np.asarray(trilinear_sample(jnp.asarray(vol), jnp.asarray(src))).reshape(vol.shape)

    offset = center - mat @ center
    want = ndimage.affine_transform(vol[0], mat, offset=offset, order=1,
                                    mode="constant", cval=0.0)
    np.testing.assert_allclose(got[0], want, rtol=1e-4, atol=1e-5)


def test_gamma_preserves_range_and_monotone():
    key = jax.random.PRNGKey(0)
    vol = jnp.linspace(-2.0, 3.0, 64).reshape(1, 4, 4, 4)
    out = random_gamma(key, vol)
    assert np.isclose(float(out.min()), -2.0, atol=1e-5)
    assert np.isclose(float(out.max()), 3.0, atol=1e-5)
    flat_in, flat_out = np.asarray(vol).ravel(), np.asarray(out).ravel()
    assert np.all(np.diff(flat_out[np.argsort(flat_in)]) >= -1e-6)


def test_device_augment_batch_contract():
    key = jax.random.PRNGKey(0)
    raw = jax.random.normal(jax.random.PRNGKey(1), (4, 1, 16, 16, 16)) * 3 + 5
    v1, v2 = jax.jit(device_augment_batch)(key, raw)
    assert v1.shape == v2.shape == raw.shape
    # both views z-scored per volume
    for v in (v1, v2):
        means = np.asarray(v.mean(axis=(1, 2, 3, 4)))
        np.testing.assert_allclose(means, 0, atol=1e-5)
    # view2 is the normalised original (deterministic given raw)
    np.testing.assert_allclose(
        np.asarray(v2[0]), np.asarray(znorm_volume(raw[0])), rtol=1e-5
    )
    # different per-sample keys -> different augmentations
    assert not np.allclose(np.asarray(v1[0]), np.asarray(v1[1]))


def test_per_channel_device_normalisation():
    from vit_ae_plus_plus_tpu.ops.augment import znorm_per_channel, minmax_volume

    raw = jax.random.normal(jax.random.PRNGKey(0), (3, 8, 8, 8)) * jnp.array(
        [1.0, 5.0, 0.2]
    ).reshape(3, 1, 1, 1) + 7
    z = znorm_per_channel(raw)
    np.testing.assert_allclose(np.asarray(z.mean(axis=(1, 2, 3))), 0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(z.var(axis=(1, 2, 3))), 1, atol=1e-4)
    mm = minmax_volume(raw)
    assert np.isclose(float(mm.min()), -1) and np.isclose(float(mm.max()), 1)


def test_shear_affine_identity_is_exact():
    """Zero rotation + unit scale: every shear/scale pass has an identity band
    matrix, so the MXU path must return the input bit-exactly."""
    from vit_ae_plus_plus_tpu.ops.augment import _affine_shear

    rng = np.random.default_rng(2)
    vol = jnp.asarray(rng.standard_normal((2, 10, 10, 10)).astype(np.float32))
    out = _affine_shear(vol, jnp.zeros(3), jnp.ones(3))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(vol))


def test_shear_affine_close_to_exact_gather_on_smooth_volume():
    """The 12-pass shear decomposition applies one lerp per pass instead of a
    single trilinear sample; on smooth data (what MRI volumes are after any
    blur) the two must agree closely in the interior."""
    from vit_ae_plus_plus_tpu.ops.augment import _affine_gather, _affine_shear

    xs = np.linspace(-1, 1, 24)
    g = np.exp(-(xs[:, None, None] ** 2 + xs[None, :, None] ** 2
                 + xs[None, None, :] ** 2) * 3).astype(np.float32)
    vol = jnp.asarray(g[None])
    angles = jnp.asarray(np.array([7.0, -5.0, 9.0]) * np.pi / 180.0)
    scale = jnp.asarray([0.95, 1.05, 1.0])

    exact = np.asarray(_affine_gather(vol, angles, scale))
    shear = np.asarray(_affine_shear(vol, angles, scale))
    # interior comparison (boundary handling differs by design: partial band
    # blending vs whole-sample cval)
    sl = (slice(None), slice(3, -3), slice(3, -3), slice(3, -3))
    err = np.abs(exact[sl] - shear[sl]).max()
    assert err < 0.02, err
    # and globally the transforms are highly correlated
    corr = np.corrcoef(exact.ravel(), shear.ravel())[0, 1]
    assert corr > 0.995, corr


def test_shear_affine_pure_scale_matches_gather():
    """Axis-aligned scaling is separable: the shear path's three scale passes
    compute the same trilinear result as the single-shot sampler (interior)."""
    from vit_ae_plus_plus_tpu.ops.augment import _affine_gather, _affine_shear

    rng = np.random.default_rng(3)
    vol = jnp.asarray(rng.standard_normal((1, 12, 12, 12)).astype(np.float32))
    angles = jnp.zeros(3)
    scale = jnp.asarray([0.92, 1.08, 1.03])
    exact = np.asarray(_affine_gather(vol, angles, scale))
    shear = np.asarray(_affine_shear(vol, angles, scale))
    sl = (slice(None), slice(2, -2), slice(2, -2), slice(2, -2))
    np.testing.assert_allclose(shear[sl], exact[sl], rtol=1e-4, atol=1e-4)
