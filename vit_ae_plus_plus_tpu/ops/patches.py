"""3D patchification ops.

Parity target: reference `MaskedAutoencoderViT.patchify`/`unpatchify`
(/root/reference/model/vit_autoenc.py:100-128). The patch-vector layout is
(dz, dy, dx, channel) with channel fastest — the torch einsum
`nclrhpwq->nlhwrpqc` — which we reproduce with a transpose (XLA folds it into
the surrounding reshape/matmul, so no materialised copy on TPU).

On TPU the patch embedding is NOT a Conv3d: because kernel == stride, a
strided conv is exactly `patchify` followed by a dense matmul, which maps
straight onto the MXU with no im2col. Models build on these ops.
"""

from __future__ import annotations

import jax.numpy as jnp


def patch_grid_size(volume_size: int, patch_size: int) -> int:
    """Patches per spatial axis; volumes are cubic (reference vit.py:61-62)."""
    if volume_size % patch_size != 0:
        raise ValueError(f"volume_size {volume_size} not divisible by patch_size {patch_size}")
    return volume_size // patch_size


def patchify(volume: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """(N, C, S, S, S) -> (N, L, p^3*C) with L = (S/p)^3.

    Layout matches reference vit_autoenc.py:100-113: patch raster order is
    (z-grid, y-grid, x-grid); within a patch (dz, dy, dx, c), c fastest.
    """
    n, c, s0, s1, s2 = volume.shape
    if not (s0 == s1 == s2):
        raise ValueError(f"expected cubic volume, got {volume.shape}")
    p = patch_size
    g = patch_grid_size(s0, p)
    x = volume.reshape(n, c, g, p, g, p, g, p)
    # n c gz pz gy py gx px -> n gz gy gx pz py px c
    x = x.transpose(0, 2, 4, 6, 3, 5, 7, 1)
    return x.reshape(n, g * g * g, p * p * p * c)


def unpatchify(x: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """(N, L, p^3*C) -> (N, C, S, S, S). Inverse of `patchify`.

    Parity: reference vit_autoenc.py:115-128 (einsum `nlhwrpqc->nclrhpwq`).
    """
    n, l, d = x.shape
    p = patch_size
    g = round(l ** (1 / 3))
    if g * g * g != l:
        raise ValueError(f"sequence length {l} is not a cube")
    c = d // (p * p * p)
    if c * p * p * p != d:
        raise ValueError(f"patch dim {d} not divisible by p^3={p**3}")
    x = x.reshape(n, g, g, g, p, p, p, c)
    # n gz gy gx pz py px c -> n c gz pz gy py gx px
    x = x.transpose(0, 7, 1, 4, 2, 5, 3, 6)
    return x.reshape(n, c, g * p, g * p, g * p)
