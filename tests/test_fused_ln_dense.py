"""Fused LN+Dense kernel vs the unfused flax pair: forward and all five
gradients, f32 and bf16, plus the data-parallel sharded path on the virtual
mesh (interpret mode on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import flax.linen as nn

from vit_ae_plus_plus_tpu.kernels.fused_ln_dense import fused_ln_dense

R, C, F = 100, 64, 192  # ragged rows on purpose (edge-block path)


def _params(key, dtype=jnp.float32):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return dict(
        gamma=jax.random.normal(k1, (C,)) * 0.1 + 1.0,
        beta=jax.random.normal(k2, (C,)) * 0.1,
        w=jax.random.normal(k3, (C, F)) / np.sqrt(C),
        b=jax.random.normal(k4, (F,)) * 0.1,
    )


def _unfused(x, p, dtype):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    ln = ((xf - mu) * jax.lax.rsqrt(var + 1e-6) * p["gamma"] + p["beta"]).astype(dtype)
    return ln @ p["w"].astype(dtype) + p["b"].astype(dtype)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_fwd_matches_unfused(dtype):
    x = jax.random.normal(jax.random.PRNGKey(0), (2, R // 2, C)).astype(dtype)
    p = _params(jax.random.PRNGKey(1))
    y = fused_ln_dense(x, p["gamma"], p["beta"], p["w"], p["b"], 1e-6, True)
    ref = _unfused(x, p, dtype)
    tol = 1e-5 if dtype == jnp.float32 else 5e-2
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(ref, np.float32), atol=tol, rtol=tol
    )


def test_grads_match_unfused_f32():
    x = jax.random.normal(jax.random.PRNGKey(0), (R, C))
    p = _params(jax.random.PRNGKey(1))
    dy_seed = jax.random.normal(jax.random.PRNGKey(2), (R, F))

    def loss_fused(x, p):
        y = fused_ln_dense(x, p["gamma"], p["beta"], p["w"], p["b"], 1e-6, True)
        return jnp.sum(y * dy_seed)

    def loss_ref(x, p):
        return jnp.sum(_unfused(x, p, jnp.float32) * dy_seed)

    (gx, gp) = jax.grad(loss_fused, argnums=(0, 1))(x, p)
    (rx, rp) = jax.grad(loss_ref, argnums=(0, 1))(x, p)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx), atol=2e-4, rtol=2e-4)
    for k in p:
        np.testing.assert_allclose(
            np.asarray(gp[k]), np.asarray(rp[k]), atol=5e-4, rtol=5e-4,
            err_msg=f"grad mismatch for {k}",
        )


def test_bf16_grads_close():
    x = jax.random.normal(jax.random.PRNGKey(0), (R, C)).astype(jnp.bfloat16)
    p = _params(jax.random.PRNGKey(1))

    def loss_fused(x, p):
        return jnp.sum(
            fused_ln_dense(x, p["gamma"], p["beta"], p["w"], p["b"], 1e-6, True)
            .astype(jnp.float32) ** 2
        )

    def loss_ref(x, p):
        return jnp.sum(_unfused(x, p, jnp.bfloat16).astype(jnp.float32) ** 2)

    gp = jax.grad(loss_fused, argnums=1)(x, p)
    rp = jax.grad(loss_ref, argnums=1)(x, p)
    for k in p:
        a, b = np.asarray(gp[k], np.float32), np.asarray(rp[k], np.float32)
        denom = np.maximum(np.abs(b).max(), 1e-3)
        assert np.abs(a - b).max() / denom < 0.05, f"{k}: {np.abs(a - b).max()}"


def test_fused_block_matches_unfused_and_same_params():
    """Block(ln_fusion='on') == Block(ln_fusion='off') in values AND in
    parameter tree (paths/shapes), so checkpoints are interchangeable."""
    from vit_ae_plus_plus_tpu.models.vit import Block

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 33, C))
    fused = Block(num_heads=4, attn_impl="xla", ln_fusion="on")
    plain = Block(num_heads=4, attn_impl="xla", ln_fusion="off")
    pf = fused.init(jax.random.PRNGKey(1), x)["params"]
    pp = plain.init(jax.random.PRNGKey(1), x)["params"]
    fshapes = jax.tree.map(lambda a: a.shape, pf)
    pshapes = jax.tree.map(lambda a: a.shape, pp)
    assert fshapes == pshapes
    y_fused = fused.apply({"params": pp}, x)  # plain params into fused graph
    y_plain = plain.apply({"params": pp}, x)
    np.testing.assert_allclose(
        np.asarray(y_fused), np.asarray(y_plain), atol=2e-5, rtol=2e-5
    )
    # gradients flow through the fused params identically
    g_fused = jax.grad(lambda p: jnp.sum(fused.apply({"params": p}, x) ** 2))(pp)
    g_plain = jax.grad(lambda p: jnp.sum(plain.apply({"params": p}, x) ** 2))(pp)
    jax.tree_util.tree_map_with_path(
        lambda path, a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-4,
            err_msg=jax.tree_util.keystr(path)),
        g_fused, g_plain,
    )


def test_sharded_matches_single_device():
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = jax.devices()[:4]
    mesh = Mesh(np.array(devs).reshape(4, 1), ("data", "model"))
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 16, C))
    p = _params(jax.random.PRNGKey(1))

    def f(x, p):
        return fused_ln_dense(x, p["gamma"], p["beta"], p["w"], p["b"], 1e-6, True)

    expect = f(x, p)
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    ps = jax.device_put(p, NamedSharding(mesh, P()))
    got = jax.jit(f)(xs, ps)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), atol=1e-5)
