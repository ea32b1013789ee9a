"""Fixed 3D sin-cos position embeddings + grid resizing.

Parity target: reference /root/reference/model/model_utils/vit_helpers.py:13-70.
Quirks reproduced exactly:

- `np.meshgrid` with default 'xy' indexing (the reference deliberately differs
  from facebookresearch/mae — vit_helpers.py:22);
- embed_dim split into thirds *rounded up to even*, remainder to the W axis
  (vit_helpers.py:36-42);
- cls row of zeros prepended when requested.

Built host-side in numpy (these are constants baked into the compiled graph).

`interpolate_pos_embed` replaces the reference's checkpoint-surgery
(vit_helpers.py:180-204). The reference calls F.interpolate(mode='bicubic') on
a 5D tensor, which torch rejects — that path only "works" because grid sizes
never actually mismatch in the pipelines. We implement the intended behaviour
with trilinear `jax.image.resize` so mismatched grids genuinely work.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def get_1d_sincos_pos_embed_from_grid(embed_dim: int, pos: np.ndarray) -> np.ndarray:
    """(M,) positions -> (M, embed_dim) [sin | cos] embedding (vit_helpers.py:48-70)."""
    assert embed_dim % 2 == 0
    omega = np.arange(embed_dim // 2, dtype=np.float64)
    omega /= embed_dim / 2.0
    omega = 1.0 / 10000**omega
    pos = pos.reshape(-1)
    out = np.einsum("m,d->md", pos, omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def get_3d_sincos_pos_embed(embed_dim: int, grid_size: int, cls_token: bool = False) -> np.ndarray:
    """3D sincos embedding, (G^3[, +1], embed_dim) (vit_helpers.py:13-45)."""
    assert embed_dim % 2 == 0
    axes = [np.arange(grid_size, dtype=np.float32)] * 3
    grid = np.stack(np.meshgrid(*axes), axis=0)  # default 'xy' indexing, as reference
    grid = grid.reshape([3, 1, grid_size, grid_size, grid_size])

    res = embed_dim // 3
    if res % 2 != 0:
        res += 1
    factor_w = embed_dim - 2 * res
    emb = np.concatenate(
        [
            get_1d_sincos_pos_embed_from_grid(res, grid[0]),
            get_1d_sincos_pos_embed_from_grid(res, grid[1]),
            get_1d_sincos_pos_embed_from_grid(factor_w, grid[2]),
        ],
        axis=1,
    )
    if cls_token:
        emb = np.concatenate([np.zeros([1, embed_dim]), emb], axis=0)
    return emb


def interpolate_pos_embed(
    pos_embed: jnp.ndarray, new_num_patches: int, num_extra_tokens: int = 1
) -> jnp.ndarray:
    """Resize a (1, T, D) pos-embed table to a new cubic patch grid.

    Extra (cls) tokens are kept unchanged; grid tokens are trilinearly resized
    (the working equivalent of reference vit_helpers.py:180-204).
    """
    tokens = pos_embed.shape[-2]
    embed_dim = pos_embed.shape[-1]
    orig_size = round((tokens - num_extra_tokens) ** (1 / 3))
    new_size = round(new_num_patches ** (1 / 3))
    if new_size**3 != new_num_patches:
        raise ValueError(f"new_num_patches {new_num_patches} is not a cube")
    if orig_size == new_size:
        return pos_embed
    extra = pos_embed[:, :num_extra_tokens]
    grid = pos_embed[:, num_extra_tokens:].reshape(1, orig_size, orig_size, orig_size, embed_dim)
    grid = jax.image.resize(
        grid, (1, new_size, new_size, new_size, embed_dim), method="trilinear"
    )
    grid = grid.reshape(1, new_size**3, embed_dim)
    return jnp.concatenate([extra, grid], axis=1)
