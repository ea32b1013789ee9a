"""The reference-faithful benchmark leg (utils/ref_faithful.py): the dense
11^3 Gaussian matches the separable production path, and the faithful step
runs, is finite, and preserves the metric contract."""

import math

import numpy as np
import jax
import jax.numpy as jnp

from vit_ae_plus_plus_tpu.configs import MAEConfig
from vit_ae_plus_plus_tpu.models import MaskedAutoencoderViT3D
from vit_ae_plus_plus_tpu.ops.filters import gaussian_blur_3d, gaussian_blur_3d_dense
from vit_ae_plus_plus_tpu.train import create_train_state, make_adamw
from vit_ae_plus_plus_tpu.utils.ref_faithful import make_reference_faithful_step

TINY_CONTR = MAEConfig(
    volume_size=16, patch_size=4, in_chans=1, embed_dim=24, depth=1, num_heads=3,
    decoder_embed_dim=12, decoder_depth=1, decoder_num_heads=2, contrastive=True,
)


def test_dense_gaussian_matches_separable():
    """The reference's dense k (x) k (x) k conv (gaussian_filter.py:16-26)
    equals three zero-padded separable passes, boundaries included."""
    v = jax.random.normal(jax.random.PRNGKey(0), (2, 1, 20, 20, 20))
    dense = gaussian_blur_3d_dense(v, 2.0)
    sep = gaussian_blur_3d(v, 2.0)
    np.testing.assert_allclose(np.asarray(dense), np.asarray(sep), atol=2e-5)


def test_faithful_step_runs_and_metric_contract():
    model = MaskedAutoencoderViT3D(TINY_CONTR)
    batch = jax.random.normal(jax.random.PRNGKey(2), (2, 1, 16, 16, 16))
    tx = make_adamw(1e-3, weight_decay=0.05)
    rngs = {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)}
    state = create_train_state(model, (batch, batch), tx, rngs)
    step = make_reference_faithful_step(
        model, TINY_CONTR.patch_size, contr_weight=0.001, run_vgg=True, donate=False
    )
    rng = jax.random.PRNGKey(3)
    state, metrics = step(state, batch, batch, rng, jnp.float32(0.01))
    for k in ("loss", "edge_map_loss", "reconstruction_loss", "perceptual_loss",
              "contr_loss"):
        assert k in metrics
    assert math.isfinite(float(metrics["loss"]))
    # the VGG forward ran: random-weight taps on distinct volumes are nonzero
    assert float(metrics["perceptual_loss"]) > 0.0
    assert int(state.step) == 1
