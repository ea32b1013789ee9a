"""Random masking: parity vs a noise-injected torch-style reference and
statistical sanity of the jax-RNG path."""

import numpy as np
import jax
import jax.numpy as jnp

from vit_ae_plus_plus_tpu.ops import random_masking, restore_tokens


def naive_masking(x: np.ndarray, noise: np.ndarray, mask_ratio: float):
    """Independent numpy re-derivation of vit_autoenc.py:130-155 semantics."""
    n, l, d = x.shape
    len_keep = int(l * (1 - mask_ratio))
    ids_shuffle = np.argsort(noise, axis=1, kind="stable")
    ids_restore = np.argsort(ids_shuffle, axis=1, kind="stable")
    ids_keep = ids_shuffle[:, :len_keep]
    x_masked = np.take_along_axis(x, ids_keep[:, :, None], axis=1)
    mask = np.ones((n, l), dtype=x.dtype)
    mask[:, :len_keep] = 0
    mask = np.take_along_axis(mask, ids_restore, axis=1)
    return x_masked, mask, ids_restore


def test_masking_matches_naive_with_injected_noise():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((3, 27, 5)).astype(np.float32)
    noise = rng.random((3, 27)).astype(np.float32)
    got_x, got_mask, got_restore = random_masking(jnp.asarray(x), 0.75, noise=jnp.asarray(noise))
    want_x, want_mask, want_restore = naive_masking(x, noise, 0.75)
    np.testing.assert_allclose(np.asarray(got_x), want_x)
    np.testing.assert_allclose(np.asarray(got_mask), want_mask)
    np.testing.assert_array_equal(np.asarray(got_restore), want_restore)


def test_masking_rng_path_counts_and_consistency():
    key = jax.random.PRNGKey(0)
    x = jnp.arange(2 * 64 * 3, dtype=jnp.float32).reshape(2, 64, 3)
    x_masked, mask, ids_restore = random_masking(x, 0.75, rng=key)
    assert x_masked.shape == (2, 16, 3)
    # exactly 75% removed per sample
    np.testing.assert_array_equal(np.asarray(mask.sum(axis=1)), [48, 48])
    # mask==0 positions must be exactly the kept tokens: token content encodes
    # its original index (x[i, idx, 0] == (i*64 + idx) * 3)
    for i in range(2):
        kept_positions = set(np.flatnonzero(np.asarray(mask[i]) == 0))
        got_ids = {int(v) // 3 - i * 64 for v in np.asarray(x_masked[i])[:, 0]}
        assert got_ids == kept_positions


def test_restore_tokens_inverts_masking():
    key = jax.random.PRNGKey(3)
    n, l, d = 2, 27, 4
    x = jax.random.normal(key, (n, l, d))
    x_masked, mask, ids_restore = random_masking(x, 2 / 3, rng=jax.random.PRNGKey(7))
    mask_token = jnp.zeros((1, 1, d))
    restored = restore_tokens(x_masked, mask_token, ids_restore)
    # kept positions hold original tokens, removed positions hold the mask token
    m = np.asarray(mask)[..., None]
    np.testing.assert_allclose(np.asarray(restored) * (1 - m), np.asarray(x) * (1 - m), rtol=1e-6)
    assert np.all(np.asarray(restored)[np.asarray(mask) == 1] == 0)
