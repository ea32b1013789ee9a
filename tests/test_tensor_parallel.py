"""Tensor parallelism on a (data=2, model=4) virtual CPU mesh: shardings land
where the rules say, the step runs, and results match single-device."""

import numpy as np
import jax
import jax.numpy as jnp

from vit_ae_plus_plus_tpu.configs import MAEConfig
from vit_ae_plus_plus_tpu.models import MaskedAutoencoderViT3D
from vit_ae_plus_plus_tpu.parallel import make_mesh, shard_batch
from vit_ae_plus_plus_tpu.parallel.tp import shard_train_state, tp_param_shardings
from vit_ae_plus_plus_tpu.train import create_train_state, make_adamw, make_train_step

# embed_dim 32 divisible by model=4 shards; heads 4
TINY = MAEConfig(
    volume_size=16, patch_size=4, in_chans=1, embed_dim=32, depth=2, num_heads=4,
    decoder_embed_dim=16, decoder_depth=1, decoder_num_heads=2, attn_impl="xla",
)


def test_auto_attn_rejected_under_model_axis():
    """attn_impl='auto' (-> packed kernel, replicated lane dim) must not be
    allowed to build a step over a model-sharded mesh."""
    import pytest

    cfg = MAEConfig(**{**TINY.__dict__, "attn_impl": "auto"})
    model = MaskedAutoencoderViT3D(cfg)
    mesh = make_mesh(data=2, model=4)
    with pytest.raises(ValueError, match="tensor-parallel"):
        make_train_step(model, 4, mesh=mesh)


def _mk(mesh=None):
    model = MaskedAutoencoderViT3D(TINY)
    batch = jax.random.normal(jax.random.PRNGKey(0), (4, 1, 16, 16, 16))
    tx = make_adamw(1e-3)
    state = create_train_state(
        model, (batch,), tx,
        {"params": jax.random.PRNGKey(1), "mask": jax.random.PRNGKey(2)},
    )
    step = make_train_step(model, 4, mask_ratio=0.75, mesh=mesh, donate=False)
    return model, state, step, batch


def test_tp_rules_shard_the_right_params():
    mesh = make_mesh(data=2, model=4)
    _, state, _, _ = _mk()
    sh = tp_param_shardings(state.params, mesh)
    qkv = sh["blocks_0"]["attn"]["qkv"]["kernel"].spec
    proj = sh["blocks_0"]["attn"]["proj"]["kernel"].spec
    fc1 = sh["blocks_0"]["mlp"]["Dense_0"]["kernel"].spec
    fc2 = sh["blocks_0"]["mlp"]["Dense_1"]["kernel"].spec
    assert tuple(qkv) == (None, "model")
    assert tuple(proj) == ("model", None)
    assert tuple(fc1) == (None, "model")
    assert tuple(fc2) == ("model", None)
    # norms and tokens replicated
    assert tuple(sh["blocks_0"]["norm1"]["scale"].spec) == ()
    assert tuple(sh["cls_token"].spec) == ()


def test_tp_step_matches_single_device():
    mesh = make_mesh(data=2, model=4)
    model, state, step, batch = _mk(mesh=mesh)
    tp_state = shard_train_state(state, mesh)
    tp_batch = shard_batch(batch, mesh)
    rng = jax.random.PRNGKey(3)
    new_tp, m_tp = step(tp_state, tp_batch, tp_batch, rng, jnp.float32(0.01))
    # verify params really are sharded on devices
    qkv = new_tp.params["blocks_0"]["attn"]["qkv"]["kernel"]
    assert not qkv.sharding.is_fully_replicated

    _, state1, step1, _ = _mk()
    new_1, m_1 = step1(state1, batch, batch, rng, jnp.float32(0.01))
    assert np.isclose(float(m_tp["loss"]), float(m_1["loss"]), rtol=1e-5)
    diff = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                        new_tp.params, new_1.params)
    assert max(jax.tree.leaves(diff)) < 1e-3  # f32 reduction-order + Adam rescale


def test_tp_step_with_flash_attention_shard_map():
    """attn_impl='flash_tp': the Pallas kernel runs per-shard under shard_map
    on a (data=4, model=2) mesh; step matches the single-device xla run."""
    mesh = make_mesh(data=4, model=2)
    cfg = MAEConfig(**{**TINY.__dict__, "attn_impl": "flash_tp"})
    model = MaskedAutoencoderViT3D(cfg)
    batch = jax.random.normal(jax.random.PRNGKey(0), (4, 1, 16, 16, 16))
    tx = make_adamw(1e-3)
    with jax.set_mesh(mesh):  # flash_tp needs the ambient mesh from init onward
        state = create_train_state(
            model, (batch,), tx,
            {"params": jax.random.PRNGKey(1), "mask": jax.random.PRNGKey(2)},
        )
        step = make_train_step(model, 4, mask_ratio=0.75, mesh=mesh, donate=False)
        tp_state = shard_train_state(state, mesh)
        tp_batch = shard_batch(batch, mesh)
        new_tp, m_tp = step(tp_state, tp_batch, tp_batch, jax.random.PRNGKey(3),
                            jnp.float32(0.01))
    assert np.isfinite(float(m_tp["loss"]))

    # single-device reference (xla attention; flash interp would be identical)
    model1 = MaskedAutoencoderViT3D(TINY)
    state1 = create_train_state(
        model1, (batch,), tx,
        {"params": jax.random.PRNGKey(1), "mask": jax.random.PRNGKey(2)},
    )
    step1 = make_train_step(model1, 4, mask_ratio=0.75, donate=False)
    _, m_1 = step1(state1, batch, batch, jax.random.PRNGKey(3), jnp.float32(0.01))
    assert np.isclose(float(m_tp["loss"]), float(m_1["loss"]), rtol=1e-4)
