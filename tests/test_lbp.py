"""LBP codes vs a naive per-pixel oracle on interior pixels."""

import math

import numpy as np
import jax.numpy as jnp

from vit_ae_plus_plus_tpu.ops.lbp import lbp_histogram, local_binary_pattern_2d


def naive_lbp(img, P=8, R=1.0):
    h, w = img.shape
    out = np.zeros((h, w), np.int32)
    for y in range(h):
        for x in range(w):
            c = img[y, x]
            code = 0
            for p in range(P):
                a = 2 * math.pi * p / P
                yy, xx = y - R * math.sin(a), x + R * math.cos(a)
                y0, x0 = int(math.floor(yy)), int(math.floor(xx))
                fy, fx = yy - y0, xx - x0
                if 0 <= y0 and y0 + 1 < h and 0 <= x0 and x0 + 1 < w:
                    v = (img[y0, x0] * (1 - fy) * (1 - fx)
                         + img[y0, x0 + 1] * (1 - fy) * fx
                         + img[y0 + 1, x0] * fy * (1 - fx)
                         + img[y0 + 1, x0 + 1] * fy * fx)
                else:
                    v = c  # border handled differently; compare interior only
                if v >= c - 1e-12:
                    code += 2**p
            out[y, x] = code
    return out


def test_lbp_codes_match_naive_interior():
    rng = np.random.default_rng(0)
    img = rng.standard_normal((12, 12)).astype(np.float64)
    got = np.asarray(local_binary_pattern_2d(jnp.asarray(img)))
    want = naive_lbp(img)
    np.testing.assert_array_equal(got[2:-2, 2:-2], want[2:-2, 2:-2])


def test_lbp_histogram_density():
    rng = np.random.default_rng(1)
    vol = rng.standard_normal((4, 16, 16))
    hist = lbp_histogram(vol)
    assert hist.shape == (256,)
    assert np.isclose(hist.sum(), 1.0)
