"""GPipe pipeline parallelism (parallel/pp.py): exactness on the virtual
mesh — forward AND gradients must match the sequential trunk bit-for-bit up
to float tolerance, with and without a composed data axis."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vit_ae_plus_plus_tpu.configs import ViTConfig
from vit_ae_plus_plus_tpu.models.vit import VisionTransformer3D
from vit_ae_plus_plus_tpu.parallel.pp import (
    make_block_apply,
    make_pipeline_mesh,
    pipeline_blocks,
    pipelined_forward_features,
    stack_block_params,
    unstack_block_params,
)


def _trunk(depth=4, global_pool=True):
    cfg = ViTConfig(
        volume_size=16, patch_size=4, in_chans=1, embed_dim=32, depth=depth,
        num_heads=2, num_classes=0, global_pool=global_pool, attn_impl="xla",
    )
    model = VisionTransformer3D(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 1, 16, 16, 16))
    variables = model.init({"params": jax.random.PRNGKey(1)}, x)
    return cfg, model, variables, x


@pytest.mark.parametrize("data,pipe,n_mb", [(1, 4, 2), (2, 2, 4), (1, 2, 8)])
def test_pipelined_features_match_sequential(data, pipe, n_mb):
    cfg, model, variables, x = _trunk(depth=4)
    mesh = make_pipeline_mesh(pipe, data=data, devices=jax.devices()[: data * pipe])
    want = jax.jit(lambda v, x: model.apply(v, x))(variables, x)
    got = jax.jit(
        lambda v, x: pipelined_forward_features(
            model, v, x, mesh, n_microbatches=n_mb
        )
    )(variables, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_pipelined_cls_token_path():
    cfg, model, variables, x = _trunk(depth=2, global_pool=False)
    mesh = make_pipeline_mesh(2, devices=jax.devices()[:2])
    want = model.apply(variables, x)
    got = pipelined_forward_features(model, variables, x, mesh, n_microbatches=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_pipelined_grads_match_sequential():
    """The backward pipeline falls out of AD (ppermute transposes to the
    reverse ring) — every parameter's grad, including the pre/post trunk
    parts, must match the sequential model's."""
    cfg, model, variables, x = _trunk(depth=4)
    mesh = make_pipeline_mesh(2, data=2, devices=jax.devices()[:4])

    def loss_seq(v):
        return jnp.sum(model.apply(v, x) ** 2)

    def loss_pp(v):
        return jnp.sum(
            pipelined_forward_features(model, v, x, mesh, n_microbatches=4) ** 2
        )

    g_seq = jax.grad(loss_seq)(variables)["params"]
    g_pp = jax.grad(loss_pp)(variables)["params"]
    flat_seq = jax.tree_util.tree_leaves_with_path(g_seq)
    flat_pp = {jax.tree_util.keystr(k): v for k, v in
               jax.tree_util.tree_leaves_with_path(g_pp)}
    assert set(flat_pp) == {jax.tree_util.keystr(k) for k, _ in flat_seq}
    for key, want in flat_seq:
        got = flat_pp[jax.tree_util.keystr(key)]
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-5,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(key)}",
        )


def test_pipeline_blocks_single_stage_fallback():
    """mesh=None (or pipe=1) degrades to the plain sequential scan."""
    cfg, model, variables, x = _trunk(depth=2)
    p = variables["params"]
    stacked = stack_block_params(p, cfg.depth)
    h = jax.random.normal(jax.random.PRNGKey(3), (4, 9, 32))
    apply = make_block_apply(cfg)
    got = pipeline_blocks(apply, stacked, h, None, n_microbatches=2)
    want = h
    for i in range(cfg.depth):
        want = apply(p[f"blocks_{i}"], want)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
    # stack/unstack round-trip
    rt = unstack_block_params(stacked, cfg.depth)
    for i in range(cfg.depth):
        a = jax.tree.leaves(rt[f"blocks_{i}"])
        b = jax.tree.leaves(p[f"blocks_{i}"])
        assert all(np.allclose(x_, y_) for x_, y_ in zip(a, b))


def test_pipeline_validates_divisibility():
    cfg, model, variables, x = _trunk(depth=4)
    mesh = make_pipeline_mesh(4, devices=jax.devices()[:4])
    stacked = stack_block_params(variables["params"], 4)
    h = jax.random.normal(jax.random.PRNGKey(3), (4, 9, 32))
    apply = make_block_apply(cfg)
    with pytest.raises(ValueError, match="microbatches"):
        pipeline_blocks(apply, stacked, h, mesh, n_microbatches=3)
    stacked3 = jax.tree.map(lambda a: a[:3], stacked)
    with pytest.raises(ValueError, match="divisible"):
        pipeline_blocks(apply, stacked3, h, mesh, n_microbatches=2)


def test_flash_local_matches_naive():
    """The shard_map-safe kernel entry (no custom_partitioning wrapper) is
    numerically the same attention."""
    from vit_ae_plus_plus_tpu.kernels.flash_attention import multihead_attention

    q, k, v = (
        jax.random.normal(jax.random.PRNGKey(i), (2, 2, 65, 32)) for i in range(3)
    )
    want = multihead_attention(q, k, v, impl="xla")
    got = multihead_attention(q, k, v, impl="flash_local")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
    # grads too (the custom_vjp routes through the Pallas backward)
    f = lambda impl: lambda q: jnp.sum(multihead_attention(q, k, v, impl=impl) ** 2)
    gw = jax.grad(f("xla"))(q)
    gg = jax.grad(f("flash_local"))(q)
    np.testing.assert_allclose(np.asarray(gg), np.asarray(gw), atol=2e-4)
