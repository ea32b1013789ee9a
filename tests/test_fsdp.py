"""FSDP/ZeRO sharding on the virtual CPU mesh: params + AdamW moments land
1/data-sharded, the step matches single-device, and it composes with TP."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from vit_ae_plus_plus_tpu.configs import MAEConfig
from vit_ae_plus_plus_tpu.models import MaskedAutoencoderViT3D
from vit_ae_plus_plus_tpu.parallel import make_mesh, shard_batch
from vit_ae_plus_plus_tpu.parallel.fsdp import (
    _fsdp_spec,
    fsdp_param_shardings,
    shard_train_state_fsdp,
)
from vit_ae_plus_plus_tpu.train import create_train_state, make_adamw, make_train_step

TINY = MAEConfig(
    volume_size=16, patch_size=4, in_chans=1, embed_dim=32, depth=2, num_heads=4,
    decoder_embed_dim=16, decoder_depth=1, decoder_num_heads=2, attn_impl="xla",
)


def _mk(mesh=None, state_shardings=None, accum_iter=1, constrained=False):
    import dataclasses

    cfg = dataclasses.replace(TINY, batch_shard_activations=True) if constrained else TINY
    model = MaskedAutoencoderViT3D(cfg)
    batch = jax.random.normal(jax.random.PRNGKey(0), (8, 1, 16, 16, 16))
    tx = make_adamw(1e-3, accum_iter=accum_iter)
    state = create_train_state(
        model, (batch,), tx,
        {"params": jax.random.PRNGKey(1), "mask": jax.random.PRNGKey(2)},
    )
    step = make_train_step(model, 4, mask_ratio=0.75, mesh=mesh, donate=False,
                           state_shardings=state_shardings)
    return model, state, step, batch


def test_fsdp_spec_rules():
    # large 2-D kernel: largest divisible dim takes 'data'
    assert _fsdp_spec(P(), (256, 1024), 8, min_size=1) == P(None, "data")
    # dim already taken by TP: fall to the other one
    assert _fsdp_spec(P(None, "model"), (256, 1024), 8, min_size=1) == P("data", "model")
    # nothing divisible: unchanged
    assert _fsdp_spec(P(), (7, 13), 8, min_size=1) == P()
    # below min_size: replicated even if divisible
    assert _fsdp_spec(P(), (32,), 8, min_size=8192) == P()


def test_fsdp_state_and_moments_are_sharded():
    mesh = make_mesh(data=8)
    _, state, _, _ = _mk()
    state, shardings = shard_train_state_fsdp(state, mesh, min_size=256)
    qkv = state.params["blocks_0"]["attn"]["qkv"]["kernel"]
    assert "data" in tuple(qkv.sharding.spec)
    # the addressable shard is 1/8 of the leaf
    assert qkv.addressable_shards[0].data.size == qkv.size // 8
    # AdamW mu/nu mirror the param placement (never materialised replicated)
    opt_leaves = [l for l in jax.tree.leaves(state.opt_state)
                  if getattr(l, "shape", None) == qkv.shape]
    assert len(opt_leaves) >= 2  # mu and nu
    for leaf in opt_leaves:
        assert leaf.addressable_shards[0].data.size == qkv.size // 8
    # small leaves (norm scales) stay replicated
    scale = state.params["blocks_0"]["norm1"]["scale"]
    assert scale.sharding.is_fully_replicated
    # shardings tree matches the committed state exactly
    jax.tree.map(lambda x, s: x.sharding == s or pytest.fail("mismatch"),
                 state, shardings)


def test_fsdp_step_matches_single_device():
    mesh = make_mesh(data=8)
    _, state, _, batch = _mk()
    fstate, shardings = shard_train_state_fsdp(state, mesh, min_size=256)
    # the real FSDP path runs the batch-constrained model under the ambient
    # mesh (pretrain_kfold) — the constraint must not change the numbers
    _, _, step, _ = _mk(mesh=mesh, state_shardings=shardings, constrained=True)
    fbatch = shard_batch(batch, mesh)
    rng = jax.random.PRNGKey(3)
    with jax.set_mesh(mesh):
        new_f, m_f = step(fstate, fbatch, fbatch, rng, jnp.float32(0.01))
    # params come OUT of the step still sharded (ZeRO invariant)
    qkv = new_f.params["blocks_0"]["attn"]["qkv"]["kernel"]
    assert not qkv.sharding.is_fully_replicated

    _, state1, step1, _ = _mk()
    new_1, m_1 = step1(state1, batch, batch, rng, jnp.float32(0.01))
    assert np.isclose(float(m_f["loss"]), float(m_1["loss"]), rtol=1e-5)
    diff = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                        new_f.params, new_1.params)
    assert max(jax.tree.leaves(diff)) < 1e-3  # f32 reduction order + Adam rescale


def test_fsdp_composes_with_tensor_parallel():
    mesh = make_mesh(data=4, model=2)
    sh = fsdp_param_shardings(
        _mk()[1].params, mesh, min_size=256
    )
    qkv = sh["blocks_0"]["attn"]["qkv"]["kernel"].spec
    # TP takes the output dim, FSDP the input dim
    assert tuple(qkv) == ("data", "model")


def test_fsdp_checkpoint_roundtrip(tmp_path):
    """The periodic-resume path under FSDP: a 1/8-sharded state saves through
    orbax and restores INTO a sharded template, stays sharded, and the next
    step runs (pretrain_kfold --fsdp --resume)."""
    from vit_ae_plus_plus_tpu.train.checkpoint import CheckpointManager

    mesh = make_mesh(data=8)
    _, state, _, batch = _mk()
    fstate, shardings = shard_train_state_fsdp(state, mesh, min_size=256)
    _, _, step, _ = _mk(mesh=mesh, state_shardings=shardings, constrained=True)
    fbatch = shard_batch(batch, mesh)
    with jax.set_mesh(mesh):
        s1, _ = step(fstate, fbatch, fbatch, jax.random.PRNGKey(3), jnp.float32(0.01))

    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=1)
    mgr.save(0, s1, epoch=0, min_loss=1.0)
    mgr.wait()

    # fresh sharded template with the same tx (a resumed process rebuilds the
    # state through the same create/shard path, so metadata matches)
    f2 = jax.tree.map(jnp.zeros_like, s1)  # zeros_like keeps the sharding
    restored, epoch, min_loss = mgr.restore(f2)
    assert epoch == 0 and min_loss == 1.0
    qkv = restored.params["blocks_0"]["attn"]["qkv"]["kernel"]
    want = s1.params["blocks_0"]["attn"]["qkv"]["kernel"]
    np.testing.assert_allclose(np.asarray(jax.device_get(qkv)),
                               np.asarray(jax.device_get(want)))
    with jax.set_mesh(mesh):
        s2, m2 = step(restored, fbatch, fbatch, jax.random.PRNGKey(4),
                      jnp.float32(0.01))
    assert np.isfinite(float(m2["loss"]))
    assert int(s2.step) == 2


def test_fsdp_second_step_reuses_donated_layout():
    """Two consecutive steps (the steady-state loop) keep sharded placement
    and finite metrics — catches in/out sharding mismatches."""
    mesh = make_mesh(data=8)
    _, state, _, batch = _mk()
    fstate, shardings = shard_train_state_fsdp(state, mesh, min_size=256)
    _, _, step, _ = _mk(mesh=mesh, state_shardings=shardings, constrained=True)
    fbatch = shard_batch(batch, mesh)
    with jax.set_mesh(mesh):
        s1, _ = step(fstate, fbatch, fbatch, jax.random.PRNGKey(3), jnp.float32(0.01))
        s2, m2 = step(s1, fbatch, fbatch, jax.random.PRNGKey(4), jnp.float32(0.01))
    assert np.isfinite(float(m2["loss"]))
    assert int(s2.step) == 2
