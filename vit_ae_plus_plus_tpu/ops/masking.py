"""Per-sample random token masking for the masked autoencoder.

Parity target: reference `MaskedAutoencoderViT.random_masking`
(/root/reference/model/vit_autoenc.py:130-155): sample uniform noise per token,
argsort ascending, keep the first `len_keep` tokens, and build the binary mask
(0 = keep, 1 = removed) by inverse-permuting a [0...0, 1...1] template.

TPU notes: argsort + take_along_axis lower to efficient XLA sort/gather; the
shapes are static (`mask_ratio` is a trace-time constant) so everything jits.
For cross-framework parity tests the noise tensor can be injected directly.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def random_masking(
    x: jnp.ndarray,
    mask_ratio: float,
    rng: Optional[jax.Array] = None,
    noise: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Mask a token sequence per sample.

    Args:
      x: (N, L, D) token sequence.
      mask_ratio: fraction of tokens to remove (static).
      rng: PRNG key used to draw noise (ignored when `noise` given).
      noise: optional (N, L) noise tensor for deterministic parity tests.

    Returns:
      x_masked: (N, len_keep, D) kept tokens,
      mask: (N, L) float mask, 0 = keep / 1 = removed,
      ids_restore: (N, L) inverse permutation for the decoder.
    """
    n, l, _ = x.shape
    len_keep = int(l * (1 - mask_ratio))
    if noise is None:
        if rng is None:
            raise ValueError("random_masking needs either rng or noise")
        noise = jax.random.uniform(rng, (n, l))

    ids_shuffle = jnp.argsort(noise, axis=1)
    ids_restore = jnp.argsort(ids_shuffle, axis=1)

    ids_keep = ids_shuffle[:, :len_keep]
    x_masked = jnp.take_along_axis(x, ids_keep[:, :, None], axis=1)

    mask = jnp.ones((n, l), dtype=x.dtype).at[:, :len_keep].set(0)
    mask = jnp.take_along_axis(mask, ids_restore, axis=1)
    return x_masked, mask, ids_restore


def restore_tokens(
    x_visible: jnp.ndarray, mask_token: jnp.ndarray, ids_restore: jnp.ndarray
) -> jnp.ndarray:
    """Scatter decoder-embedded visible tokens back to full length.

    `x_visible` excludes the cls token ((N, len_keep, D)); mask tokens fill the
    removed slots and the result is inverse-permuted to raster order
    (reference vit_autoenc.py:184-186).
    """
    n, len_keep, d = x_visible.shape
    l = ids_restore.shape[1]
    mask_tokens = jnp.broadcast_to(mask_token, (n, l - len_keep, d)).astype(x_visible.dtype)
    x_full = jnp.concatenate([x_visible, mask_tokens], axis=1)
    return jnp.take_along_axis(x_full, ids_restore[:, :, None], axis=1)
