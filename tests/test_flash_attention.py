"""Pallas flash attention vs naive XLA attention: fwd + grads, with the ragged
sequence lengths the framework actually uses (433, 1729 are not tile
multiples). Runs in interpret mode on CPU; real-TPU validation in bench/verify."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vit_ae_plus_plus_tpu.kernels.flash_attention import _xla_attention
from vit_ae_plus_plus_tpu.kernels.pallas_flash import flash_attention


def _make_qkv(key, b, h, n, d, dtype=jnp.float32):
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, h, n, d), dtype)
    k = jax.random.normal(kk, (b, h, n, d), dtype)
    v = jax.random.normal(kv, (b, h, n, d), dtype)
    return q, k, v


@pytest.mark.parametrize("n,d", [(128, 64), (433, 64), (200, 32)])
def test_flash_forward_matches_xla(n, d):
    q, k, v = _make_qkv(jax.random.PRNGKey(0), 2, 3, n, d)
    scale = d**-0.5
    want = _xla_attention(q, k, v, scale)
    got = flash_attention(q, k, v, scale, 128, 128, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_flash_gradients_match_xla():
    n, d = 257, 32  # ragged on purpose
    q, k, v = _make_qkv(jax.random.PRNGKey(1), 1, 2, n, d)
    scale = d**-0.5

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, scale, 128, 128, True)
        return jnp.sum(jnp.sin(o))

    def loss_xla(q, k, v):
        return jnp.sum(jnp.sin(_xla_attention(q, k, v, scale)))

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for gf, gx, name in zip(g_flash, g_xla, "qkv"):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gx), rtol=5e-4, atol=5e-5, err_msg=f"d{name}"
        )


@pytest.mark.parametrize("n,d", [(433, 64), (229, 32)])
def test_flash_gradients_fused_single_block_k(n, d):
    """Default block resolution puts the whole (ragged) KV row in ONE block,
    which routes the backward through the fused dq+dk+dv kernel."""
    q, k, v = _make_qkv(jax.random.PRNGKey(3), 2, 2, n, d)
    scale = d**-0.5

    def loss_flash(q, k, v):
        # block_q=128, block_k=None -> padded-to-256 single K block (fused bwd)
        o = flash_attention(q, k, v, scale, 128, None, True)
        return jnp.sum(jnp.sin(o))

    def loss_xla(q, k, v):
        return jnp.sum(jnp.sin(_xla_attention(q, k, v, scale)))

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for gf, gx, name in zip(g_flash, g_xla, "qkv"):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gx), rtol=5e-4, atol=5e-5, err_msg=f"d{name}"
        )


def test_flash_default_scale_is_rsqrt_head_dim():
    q, k, v = _make_qkv(jax.random.PRNGKey(2), 1, 1, 64, 16)
    got = flash_attention(q, k, v, None, 64, 64, True)
    want = _xla_attention(q, k, v, 16**-0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_flash_self_sharding_under_mesh():
    """custom_partitioning (VERDICT r1 #7): the kernel accepts batch/head
    sharded operands under a ('data','model') mesh with NO jax.set_mesh or
    shard_map at the call site, and matches the unsharded result (fwd+grad)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = np.asarray(jax.devices()[:4]).reshape(2, 2)
    mesh = Mesh(devs, ("data", "model"))
    b, h, n, d = 4, 4, 96, 32
    q, k, v = _make_qkv(jax.random.PRNGKey(5), b, h, n, d)
    scale = d**-0.5

    sh = NamedSharding(mesh, P("data", "model", None, None))
    qs, ks, vs = (jax.device_put(x, sh) for x in (q, k, v))

    def loss(q, k, v):
        o = flash_attention(q, k, v, scale, 64, None, True)
        return jnp.sum(jnp.sin(o)), o

    (want_l, want_o), want_g = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2), has_aux=True))(q, k, v)
    (got_l, got_o), got_g = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2), has_aux=True))(qs, ks, vs)

    np.testing.assert_allclose(float(got_l), float(want_l), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got_o), np.asarray(want_o), rtol=2e-5, atol=2e-5)
    for gw, gg, name in zip(want_g, got_g, "qkv"):
        np.testing.assert_allclose(
            np.asarray(gg), np.asarray(gw), rtol=5e-4, atol=5e-5, err_msg=f"d{name}"
        )


@pytest.mark.parametrize("b,h,n,d", [(2, 6, 433, 64), (2, 4, 96, 32), (1, 3, 512, 64)])
def test_flash_multihead_grouped_path(b, h, n, d):
    """Default blocks + short sequence routes through the grouped multi-head
    kernels (_mh_fwd_kernel/_mh_bwd_kernel): fwd + all grads must match the
    naive reference."""
    q, k, v = _make_qkv(jax.random.PRNGKey(11), b, h, n, d)
    scale = d**-0.5

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, scale, None, None, True)
        return jnp.sum(jnp.sin(o))

    def loss_xla(q, k, v):
        return jnp.sum(jnp.sin(_xla_attention(q, k, v, scale)))

    got = flash_attention(q, k, v, scale, None, None, True)
    want = _xla_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for gf, gx, name in zip(g_flash, g_xla, "qkv"):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gx), rtol=5e-4, atol=5e-5, err_msg=f"d{name}"
        )


def test_flash_long_context_multiblock_path():
    """Long-context capability (SURVEY §5.7): sequences past the single-block
    ceiling run the online-softmax multi-block path (block_k 512) — fwd and
    grads must still match the naive reference. 2744 tokens = a 112^3/8^3
    volume's patch count."""
    n, d = 2744, 64
    q, k, v = _make_qkv(jax.random.PRNGKey(21), 1, 2, n, d)
    scale = d**-0.5

    got = flash_attention(q, k, v, scale, None, None, True)
    want = _xla_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)

    def loss_flash(q, k, v):
        return jnp.sum(jnp.sin(flash_attention(q, k, v, scale, None, None, True)))

    def loss_xla(q, k, v):
        return jnp.sum(jnp.sin(_xla_attention(q, k, v, scale)))

    # all three grads, with the q-chunked dK/dV accumulation FORCED (the
    # 4 MB production budget only chunks past ~8k bf16 tokens; shrinking it
    # makes 2744 tokens -> pq 2816 -> two q-chunks)
    import vit_ae_plus_plus_tpu.kernels.pallas_flash as pf

    budget = pf._DKV_RESIDENT_BUDGET
    pf._DKV_RESIDENT_BUDGET = 1024 * 1024
    try:
        gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    finally:
        pf._DKV_RESIDENT_BUDGET = budget
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for got_g, want_g, name in zip(gf, gx, "qkv"):
        np.testing.assert_allclose(
            np.asarray(got_g), np.asarray(want_g), rtol=5e-4, atol=5e-5,
            err_msg=f"d{name} mismatch on the chunked multi-block path",
        )
    # and the default (single-chunk) path
    gf1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for got_g, want_g, name in zip(gf1, gx, "qkv"):
        np.testing.assert_allclose(
            np.asarray(got_g), np.asarray(want_g), rtol=5e-4, atol=5e-5,
            err_msg=f"d{name} mismatch on the resident multi-block path",
        )


@pytest.mark.parametrize("nq,nkv,d", [(200, 433, 64), (433, 96, 32), (700, 2744, 64)])
def test_flash_cross_attention_shapes(nq, nkv, d):
    """n_q != n_kv (cross-attention): every dispatch path (grouped multi-head,
    single-block ragged, multi-block) must handle asymmetric sequence lengths."""
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(31), 3)
    q = jax.random.normal(kq, (1, 2, nq, d), jnp.float32)
    k = jax.random.normal(kk, (1, 2, nkv, d), jnp.float32)
    v = jax.random.normal(kv, (1, 2, nkv, d), jnp.float32)
    scale = d**-0.5

    got = flash_attention(q, k, v, scale, None, None, True)
    want = _xla_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)

    def loss_flash(q, k, v):
        return jnp.sum(jnp.sin(flash_attention(q, k, v, scale, None, None, True)))

    def loss_xla(q, k, v):
        return jnp.sum(jnp.sin(_xla_attention(q, k, v, scale)))

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gx, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5, err_msg=f"d{name}"
        )


@pytest.mark.parametrize("b,h,n,d", [(2, 4, 229, 32), (1, 4, 433, 64), (2, 8, 128, 32)])
def test_packed_flash_matches_xla(b, h, n, d):
    """Packed-I/O kernel consumes the fused projection's (B, N, 3C) output;
    fwd + grads must match naive attention on the unpacked equivalent."""
    from vit_ae_plus_plus_tpu.kernels.packed_flash import packed_flash_attention

    c = h * d
    qkv = jax.random.normal(jax.random.PRNGKey(41), (b, n, 3 * c), jnp.float32)
    scale = d**-0.5

    def unpack(qkv):
        parts = qkv.reshape(b, n, 3, h, d).transpose(2, 0, 3, 1, 4)
        return parts[0], parts[1], parts[2]  # (B, H, N, D) each

    def loss_packed(qkv):
        return jnp.sum(jnp.sin(packed_flash_attention(qkv, d, scale, True)))

    def loss_ref(qkv):
        q, k, v = unpack(qkv)
        o = _xla_attention(q, k, v, scale).transpose(0, 2, 1, 3).reshape(b, n, c)
        return jnp.sum(jnp.sin(o))

    got = packed_flash_attention(qkv, d, scale, True)
    q, k, v = unpack(qkv)
    want = _xla_attention(q, k, v, scale).transpose(0, 2, 1, 3).reshape(b, n, c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)

    gp = jax.grad(loss_packed)(qkv)
    gr = jax.grad(loss_ref)(qkv)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gr), rtol=5e-4, atol=5e-5)


def test_packed_flash_sharded_batch_and_heads():
    """Self-sharding: batch over 'data' with no call-site mesh plumbing.
    (The packed (B, N, 3C) lane dim is declared replicated: a contiguous
    lane shard would mix the q/k/v sections — TP uses the per-head path.)"""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from vit_ae_plus_plus_tpu.kernels.packed_flash import packed_flash_attention

    b, h, n, d = 4, 8, 96, 32
    c = h * d
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("data",))
    qkv = jax.random.normal(jax.random.PRNGKey(42), (b, n, 3 * c), jnp.float32)
    qs = jax.device_put(qkv, NamedSharding(mesh, P("data", None, None)))

    def loss(qkv):
        return jnp.sum(jnp.sin(packed_flash_attention(qkv, d, None, True)))

    want_l, want_g = jax.jit(jax.value_and_grad(loss))(qkv)
    got_l, got_g = jax.jit(jax.value_and_grad(loss))(qs)
    np.testing.assert_allclose(float(got_l), float(want_l), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got_g), np.asarray(want_g),
                               rtol=5e-4, atol=5e-5)
