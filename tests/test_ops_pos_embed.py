"""3D sincos pos-embed: structural properties + torch-free golden check.

The reference builds the same table in numpy (vit_helpers.py:13-70), so exact
agreement with an inline re-derivation (different code path: explicit loops)
is a true parity test.
"""

import numpy as np
import jax.numpy as jnp

from vit_ae_plus_plus_tpu.ops import (
    get_1d_sincos_pos_embed_from_grid,
    get_3d_sincos_pos_embed,
    interpolate_pos_embed,
)


def test_1d_sincos_definition():
    dim, positions = 8, np.array([0.0, 1.0, 3.5])
    got = get_1d_sincos_pos_embed_from_grid(dim, positions)
    for m, pos in enumerate(positions):
        for k in range(dim // 2):
            omega = 1.0 / 10000 ** (k / (dim / 2))
            assert np.isclose(got[m, k], np.sin(pos * omega))
            assert np.isclose(got[m, dim // 2 + k], np.cos(pos * omega))


def test_3d_shape_and_cls_row():
    emb = get_3d_sincos_pos_embed(embed_dim=8, grid_size=12, cls_token=True)
    assert emb.shape == (1 + 12**3, 8)
    assert np.all(emb[0] == 0)


def test_3d_split_thirds_rounded_even():
    # embed_dim=16 -> res=6 (even after round up from 5.33), factor_w=4
    emb = get_3d_sincos_pos_embed(embed_dim=16, grid_size=2)
    grid_axes = [np.arange(2, dtype=np.float32)] * 3
    grid = np.stack(np.meshgrid(*grid_axes), axis=0).reshape(3, -1)
    want = np.concatenate(
        [
            get_1d_sincos_pos_embed_from_grid(6, grid[0]),
            get_1d_sincos_pos_embed_from_grid(6, grid[1]),
            get_1d_sincos_pos_embed_from_grid(4, grid[2]),
        ],
        axis=1,
    )
    np.testing.assert_allclose(emb, want)


def test_3d_meshgrid_is_xy_indexing():
    """The reference keeps numpy's default 'xy' meshgrid (vit_helpers.py:22),
    so the first embedding block varies with the *second* grid axis."""
    g = 3
    emb = get_3d_sincos_pos_embed(embed_dim=12, grid_size=g)
    first_block = emb[:, :4]  # sin part of axis-0 embedding, dim res=4
    table = first_block.reshape(g, g, g, 4)
    # 'xy': grid[0] is constant along axis 0 and varies along axis 1
    assert np.allclose(table[0], table[1])
    assert not np.allclose(table[:, 0], table[:, 1])


def test_interpolate_identity_and_resize():
    emb = jnp.asarray(get_3d_sincos_pos_embed(embed_dim=12, grid_size=4, cls_token=True))[None]
    same = interpolate_pos_embed(emb, 4**3)
    np.testing.assert_array_equal(np.asarray(same), np.asarray(emb))
    bigger = interpolate_pos_embed(emb, 8**3)
    assert bigger.shape == (1, 1 + 8**3, 12)
    # cls row untouched
    np.testing.assert_array_equal(np.asarray(bigger[0, 0]), np.asarray(emb[0, 0]))
