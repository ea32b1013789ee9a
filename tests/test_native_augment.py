"""Native (C++) augmentation kernels vs the scipy reference path.

The native library must (a) build with the baked-in g++, (b) reproduce
scipy.ndimage.affine_transform(order=1, mode='constant') to float tolerance,
(c) draw the SAME policy-parameter stream as data/transforms.py so the two
paths sample identical augmentation distributions, and (d) actually be faster.
"""

import math
import time

import numpy as np
import pytest
from scipy import ndimage

from vit_ae_plus_plus_tpu.data import native_augment as na
from vit_ae_plus_plus_tpu.data import transforms as T

pytestmark = pytest.mark.skipif(not na.available(), reason="no g++ / build failed")


def _rand_affine(rng):
    mat = np.eye(3) + rng.uniform(-0.15, 0.15, (3, 3))
    center = (np.asarray([24, 20, 28]) - 1) / 2.0
    offset = center - mat @ center + rng.uniform(-2, 2, 3)
    return mat, offset


def test_affine_matches_scipy_order1():
    rng = np.random.default_rng(0)
    vol = rng.standard_normal((24, 20, 28)).astype(np.float32)
    for _ in range(5):
        mat, offset = _rand_affine(rng)
        want = ndimage.affine_transform(vol, mat, offset=offset, order=1,
                                        mode="constant", cval=0.0)
        got = na.affine3d(vol, mat, offset)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_affine_identity_is_exact():
    rng = np.random.default_rng(1)
    vol = rng.standard_normal((8, 9, 10)).astype(np.float32)
    got = na.affine3d(vol, np.eye(3), np.zeros(3))
    np.testing.assert_array_equal(got, vol)


def test_native_affine_transform_matches_scipy_transform():
    """Same rng stream -> identical parameter draws -> identical output."""
    vol = np.random.default_rng(2).standard_normal((1, 24, 24, 24)).astype(np.float32)
    a = T.RandomAffine3D()(vol, np.random.default_rng(7))
    b = na.NativeRandomAffine3D()(vol, np.random.default_rng(7))
    np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-5)


def test_native_noise_distribution():
    vol = np.zeros((1, 16, 16, 16), np.float32)
    outs = []
    rng = np.random.default_rng(3)
    for _ in range(50):
        outs.append(na.NativeRandomNoise(std=0.1)(vol, rng))
    stds = np.asarray([o.std() for o in outs])
    # std ~ U(0, 0.1): realised stds must span the range and average ~0.05
    assert 0.0 <= stds.min() < 0.035
    assert stds.max() > 0.065
    assert abs(stds.mean() - 0.05) < 0.015
    means = np.asarray([o.mean() for o in outs])
    assert np.all(np.abs(means) < 0.01)


def test_native_gamma_matches_numpy():
    rng_v = np.random.default_rng(4)
    vol = (rng_v.random((1, 12, 12, 12)).astype(np.float32) * 3.0 - 0.5)
    a = T.RandomGamma()(vol, np.random.default_rng(9))
    b = na.NativeRandomGamma()(vol, np.random.default_rng(9))
    np.testing.assert_allclose(b, a, rtol=2e-5, atol=2e-5)


def test_native_normalisations():
    rng = np.random.default_rng(5)
    vol = rng.standard_normal((1, 10, 10, 10)).astype(np.float32) * 3 + 1
    z = na.znorm(vol)
    assert abs(float(z.mean())) < 1e-4 and abs(float(z.std()) - 1) < 1e-3
    m = na.minmax(vol)
    assert float(m.min()) == pytest.approx(-1.0, abs=1e-6)
    assert float(m.max()) == pytest.approx(1.0, abs=1e-6)


def test_default_policy_uses_native_and_is_faster():
    policy = T.default_ssl_transforms()  # auto
    assert isinstance(policy.transforms[0], na.NativeRandomAffine3D)
    scipy_policy = T.default_ssl_transforms(native="never")
    assert isinstance(scipy_policy.transforms[0], T.RandomAffine3D)

    vol = np.random.default_rng(6).standard_normal((1, 96, 96, 96)).astype(np.float32)
    rng = np.random.default_rng(0)
    policy(vol, rng); scipy_policy(vol, rng)  # warm
    t0 = time.perf_counter()
    for _ in range(3):
        policy(vol, rng)
    t_native = (time.perf_counter() - t0) / 3
    t0 = time.perf_counter()
    scipy_policy(vol, rng)
    t_scipy = time.perf_counter() - t0
    assert t_native < t_scipy, (t_native, t_scipy)
