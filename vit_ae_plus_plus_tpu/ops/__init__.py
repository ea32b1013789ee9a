"""Pure-function ops: the numerical core shared by models and losses.

Every op here is a stateless jnp function with exact behavioural parity to the
reference implementation (citations in each docstring), unit-tested against
independent naive implementations in tests/.
"""

from vit_ae_plus_plus_tpu.ops.patches import patchify, unpatchify, patch_grid_size
from vit_ae_plus_plus_tpu.ops.pos_embed import (
    get_1d_sincos_pos_embed_from_grid,
    get_3d_sincos_pos_embed,
    interpolate_pos_embed,
)
from vit_ae_plus_plus_tpu.ops.masking import random_masking, restore_tokens
from vit_ae_plus_plus_tpu.ops.filters import sobel_edges_3d, gaussian_blur_3d, gaussian_kernel_1d
from vit_ae_plus_plus_tpu.ops.losses import (
    masked_mse_loss,
    edge_map_loss,
    negative_cosine_loss,
    soft_cross_entropy_with_weights,
)

__all__ = [
    "patchify",
    "unpatchify",
    "patch_grid_size",
    "get_1d_sincos_pos_embed_from_grid",
    "get_3d_sincos_pos_embed",
    "interpolate_pos_embed",
    "random_masking",
    "restore_tokens",
    "sobel_edges_3d",
    "gaussian_blur_3d",
    "gaussian_kernel_1d",
    "masked_mse_loss",
    "edge_map_loss",
    "negative_cosine_loss",
    "soft_cross_entropy_with_weights",
]
