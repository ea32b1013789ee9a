"""Fused Pallas LayerNorm vs flax nn.LayerNorm (fwd + grads, sharding)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import flax.linen as nn

from vit_ae_plus_plus_tpu.kernels.fused_ln import fused_layernorm
from vit_ae_plus_plus_tpu.models.vit import FusedLayerNorm


def _ref_ln(x, scale, bias, eps=1e-6):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    return (xf - mu) * jax.lax.rsqrt(var + eps) * scale + bias


@pytest.mark.parametrize("r,c", [(256, 512), (433, 768), (70, 512)])
def test_fused_ln_forward_matches(r, c):
    """Incl. ragged row counts (433, 70) exercising edge-block masking."""
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(k1, (r, c), jnp.float32) * 2 + 1
    scale = jax.random.normal(k2, (c,)) * 0.1 + 1
    bias = jax.random.normal(k3, (c,)) * 0.1
    got = fused_layernorm(x, scale, bias, 1e-6, True)
    want = _ref_ln(x, scale, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("shape", [(4, 100, 512), (3, 70, 768)])
def test_fused_ln_grads_match(shape):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
    c = shape[-1]
    x = jax.random.normal(k1, shape, jnp.float32)
    scale = jax.random.normal(k2, (c,)) * 0.1 + 1
    bias = jax.random.normal(k3, (c,)) * 0.1

    def loss_fused(x, s, b):
        return jnp.sum(jnp.sin(fused_layernorm(x, s, b, 1e-6, True)))

    def loss_ref(x, s, b):
        return jnp.sum(jnp.sin(_ref_ln(x, s, b)))

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_, name in zip(gf, gr, ("dx", "dscale", "dbias")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-5, err_msg=name
        )


def test_fused_ln_sharded_rows():
    """Data-parallel tokens: row-sharded operands flow into the kernel under
    a mesh with no resharding (custom_partitioning row rule)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.asarray(jax.devices()[:4]), ("data",))
    x = jax.random.normal(jax.random.PRNGKey(2), (8, 64, 512), jnp.float32)
    scale = jnp.ones(512)
    bias = jnp.zeros(512)
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))

    def loss(x, s, b):
        return jnp.sum(jnp.sin(fused_layernorm(x, s, b, 1e-6, True)))

    want_l, want_g = jax.jit(jax.value_and_grad(loss))(x, scale, bias)
    got_l, got_g = jax.jit(jax.value_and_grad(loss))(xs, scale, bias)
    np.testing.assert_allclose(float(got_l), float(want_l), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got_g), np.asarray(want_g),
                               rtol=1e-4, atol=1e-5)


def test_module_params_match_flax_layernorm():
    """FusedLayerNorm must be a drop-in for nn.LayerNorm: same param names
    and shapes (checkpoint compatibility) and same output off-TPU."""
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 10, 64), jnp.float32)
    ours = FusedLayerNorm(epsilon=1e-6)
    theirs = nn.LayerNorm(epsilon=1e-6)
    p_ours = ours.init(jax.random.PRNGKey(0), x)
    p_theirs = theirs.init(jax.random.PRNGKey(0), x)
    assert jax.tree.map(jnp.shape, p_ours) == jax.tree.map(jnp.shape, p_theirs)
    np.testing.assert_allclose(
        np.asarray(ours.apply(p_theirs, x)), np.asarray(theirs.apply(p_theirs, x)),
        rtol=2e-5, atol=2e-5,
    )
