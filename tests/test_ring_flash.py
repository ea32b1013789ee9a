"""Ring flash attention (K/V sharded + rotated over the ring) vs the naive
reference — forward and all three gradients on the virtual CPU mesh.

Shapes are chosen to exercise every padding regime the ring introduces:
- token counts indivisible by the shard count (the 1 + G^3 framework shapes);
- a PARTIALLY padded final block (tail inside the last ring block);
- a FULLY padded final block (padding spans a whole ring block, whose partial
  lse must merge to exactly zero weight);
- ragged 128-row query edges inside the per-step kernels.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vit_ae_plus_plus_tpu.kernels.flash_attention import _xla_attention
from vit_ae_plus_plus_tpu.kernels.ring_flash import ring_flash_attention
from vit_ae_plus_plus_tpu.parallel import make_mesh

D = 16


def _qkv(n, b=1, h=1, dtype=jnp.float32):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    return tuple(jax.random.normal(k, (b, h, n, D), dtype) for k in ks)


@pytest.mark.parametrize(
    "mesh_shape,n",
    [
        ((1, 4), 137),   # pn=160, nb=40: ragged q edge + partial last block
        ((1, 4), 65),    # pn=96, nb=24: block 3 is FULLY padding
        ((2, 2), 137),   # dp x ring composition
        ((1, 8), 433),   # the masked-encoder token count over 8 shards
    ],
)
def test_ring_matches_reference(mesh_shape, n):
    dp, rp = mesh_shape
    mesh = make_mesh(data=dp, model=rp, devices=jax.devices()[: dp * rp])
    q, k, v = _qkv(n, b=dp)
    scale = D**-0.5

    def f_ring(q, k, v):
        o = ring_flash_attention(q, k, v, mesh)
        return jnp.sum(o * (1 + 0.01 * jnp.arange(D))), o

    def f_ref(q, k, v):
        o = _xla_attention(q, k, v, scale)
        return jnp.sum(o * (1 + 0.01 * jnp.arange(D))), o

    (_, o), grads = jax.value_and_grad(f_ring, argnums=(0, 1, 2), has_aux=True)(
        q, k, v
    )
    (_, o_ref), g_ref = jax.value_and_grad(f_ref, argnums=(0, 1, 2), has_aux=True)(
        q, k, v
    )
    np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref), atol=2e-5, rtol=2e-5)
    for got, want, name in zip(grads, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=5e-5, rtol=5e-5,
            err_msg=f"d{name} mismatch on mesh {mesh_shape} n={n}",
        )


def test_ring_bf16_forward():
    mesh = make_mesh(data=1, model=4, devices=jax.devices()[:4])
    q, k, v = _qkv(137, dtype=jnp.bfloat16)
    o = ring_flash_attention(q, k, v, mesh)
    ref = _xla_attention(q, k, v, D**-0.5)
    np.testing.assert_allclose(
        np.asarray(o, np.float32), np.asarray(ref, np.float32), atol=3e-2, rtol=3e-2
    )


def test_flash_ring_impl_in_trunk():
    """attn_impl='flash_ring' runs the ViT trunk under the ambient mesh and
    matches the 'xla' trunk."""
    from vit_ae_plus_plus_tpu.configs import ViTConfig
    from vit_ae_plus_plus_tpu.models.vit import VisionTransformer3D

    cfg = ViTConfig(volume_size=16, patch_size=4, in_chans=1, embed_dim=32,
                    depth=2, num_heads=4, num_classes=0, global_pool=True,
                    attn_impl="flash_ring")
    cfg_ref = ViTConfig(**{**cfg.__dict__, "attn_impl": "xla"})
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 1, 16, 16, 16))
    model = VisionTransformer3D(cfg)
    ref = VisionTransformer3D(cfg_ref)
    params = ref.init({"params": jax.random.PRNGKey(1)}, x)["params"]

    mesh = make_mesh(data=2, model=4, devices=jax.devices()[:8])
    with jax.set_mesh(mesh):
        got = jax.jit(lambda p, x: model.apply({"params": p}, x))(params, x)
    want = ref.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_ring_block_ceiling_error():
    """Sequences whose per-shard block would blow the VMEM single-block
    ceiling are rejected with guidance rather than miscompiled."""
    mesh = make_mesh(data=1, model=2, devices=jax.devices()[:2])
    q, k, v = _qkv(8)
    big = jnp.zeros((1, 1, 5000, D))
    with pytest.raises(ValueError, match="more than"):
        ring_flash_attention(big, big, big, mesh)
    with pytest.raises(ValueError, match="self-attention"):
        ring_flash_attention(q, k[:, :, :4], v[:, :, :4], mesh)
