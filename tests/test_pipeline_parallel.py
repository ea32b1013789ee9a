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


def _mae(contrastive=False, depth=2, decoder_depth=2):
    from vit_ae_plus_plus_tpu.configs import MAEConfig
    from vit_ae_plus_plus_tpu.models.mae import MaskedAutoencoderViT3D

    cfg = MAEConfig(
        volume_size=16, patch_size=4, in_chans=1, embed_dim=32, depth=depth,
        num_heads=2, decoder_embed_dim=24, decoder_depth=decoder_depth,
        decoder_num_heads=4, contrastive=contrastive, attn_impl="xla",
    )
    model = MaskedAutoencoderViT3D(cfg)
    v1 = jax.random.normal(jax.random.PRNGKey(0), (4, 1, 16, 16, 16))
    v2 = jax.random.normal(jax.random.PRNGKey(1), (4, 1, 16, 16, 16))
    variables = model.init(
        {"params": jax.random.PRNGKey(2), "mask": jax.random.PRNGKey(3)},
        v1, v2 if contrastive else None,
    )
    return cfg, model, variables, v1, v2


def test_pipelined_mae_matches_sequential():
    """Both MAE block stacks pipelined: pred/mask/latent must equal the
    sequential model under the same mask noise."""
    from vit_ae_plus_plus_tpu.parallel.pp import pipelined_mae_forward

    cfg, model, variables, v1, _ = _mae()
    noise = jax.random.uniform(jax.random.PRNGKey(7), (4, cfg.num_patches))
    mesh = make_pipeline_mesh(2, data=2, devices=jax.devices()[:4])
    want = model.apply(variables, v1, None, mask_ratio=0.75, noise=noise)
    got, bs = jax.jit(
        lambda v, x, n: pipelined_mae_forward(
            model, v, x, mesh=mesh, n_microbatches=2, noise=n
        )
    )(variables, v1, noise)
    assert bs is None
    for key in ("pred", "mask", "ids_restore", "latent"):
        np.testing.assert_allclose(
            np.asarray(got[key]), np.asarray(want[key]), atol=1e-5, err_msg=key
        )


def test_pipelined_mae_contrastive_matches():
    """Contrastive branch: 2B-batched encoder pipeline, predictor heads with
    train-mode BatchNorm — outputs AND mutated batch_stats must match."""
    from vit_ae_plus_plus_tpu.parallel.pp import pipelined_mae_forward

    cfg, model, variables, v1, v2 = _mae(contrastive=True)
    noise = jax.random.uniform(jax.random.PRNGKey(7), (8, cfg.num_patches))
    mesh = make_pipeline_mesh(2, data=2, devices=jax.devices()[:4])
    want, want_mut = model.apply(
        variables, v1, v2, mask_ratio=0.75, noise=noise, train=True,
        mutable=["batch_stats"],
    )
    got, got_bs = pipelined_mae_forward(
        model, variables, v1, v2, mesh=mesh, n_microbatches=2, noise=noise,
        train=True,
    )
    for key in ("pred", "p1", "p2", "z1", "z2", "latent"):
        np.testing.assert_allclose(
            np.asarray(got[key]), np.asarray(want[key]), atol=2e-5, err_msg=key
        )
    for (ka, a), (kb, b) in zip(
        jax.tree_util.tree_leaves_with_path(got_bs),
        jax.tree_util.tree_leaves_with_path(want_mut["batch_stats"]),
        strict=True,
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_pipelined_mae_grads_match():
    from vit_ae_plus_plus_tpu.train.objective import mae_loss_terms
    from vit_ae_plus_plus_tpu.parallel.pp import pipelined_mae_forward

    cfg, model, variables, v1, _ = _mae()
    noise = jax.random.uniform(jax.random.PRNGKey(7), (4, cfg.num_patches))
    mesh = make_pipeline_mesh(2, data=1, devices=jax.devices()[:2])

    def loss_seq(params):
        out = model.apply({"params": params}, v1, None, mask_ratio=0.75, noise=noise)
        return mae_loss_terms(out, v1, cfg.patch_size)[0]

    def loss_pp(params):
        out, _ = pipelined_mae_forward(
            model, {"params": params}, v1, mesh=mesh, n_microbatches=2, noise=noise
        )
        return mae_loss_terms(out, v1, cfg.patch_size)[0]

    g_seq = jax.grad(loss_seq)(variables["params"])
    g_pp = jax.grad(loss_pp)(variables["params"])
    for (ka, a), (kb, b) in zip(
        jax.tree_util.tree_leaves_with_path(g_seq),
        jax.tree_util.tree_leaves_with_path(g_pp),
        strict=True,
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=5e-5,
            err_msg=jax.tree_util.keystr(ka),
        )


def test_pp_train_step_trains():
    """make_pp_train_step: contract-identical to make_train_step; loss drops
    over a few steps on the (data=2, pipe=2) virtual mesh."""
    import optax

    from vit_ae_plus_plus_tpu.parallel.pp import make_pp_train_step
    from vit_ae_plus_plus_tpu.train.state import TrainState

    cfg, model, variables, v1, v2 = _mae(contrastive=True)
    mesh = make_pipeline_mesh(2, data=2, devices=jax.devices()[:4])
    tx = optax.adamw(1e-3)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        tx=tx,
    )
    step = make_pp_train_step(
        model, cfg.patch_size, mesh, n_microbatches=2, contr_weight=0.1,
        donate=False,
    )
    rng = jax.random.PRNGKey(0)
    losses = []
    for _ in range(3):
        state, metrics = step(state, v1, v2, rng, jnp.float32(0.0))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_pp_params_roundtrip():
    from vit_ae_plus_plus_tpu.parallel.pp import from_pp_params, to_pp_params

    cfg, model, variables, v1, _ = _mae()
    p = variables["params"]
    stacked = to_pp_params(p, cfg.depth, cfg.decoder_depth)
    assert "enc_stack" in stacked and "dec_stack" in stacked
    assert not any(k.startswith("blocks_") for k in stacked)
    rt = from_pp_params(stacked, cfg.depth, cfg.decoder_depth)
    for (ka, a), (kb, b) in zip(
        jax.tree_util.tree_leaves_with_path(p),
        jax.tree_util.tree_leaves_with_path(rt),
        strict=True,
    ):
        assert jax.tree_util.keystr(ka) == jax.tree_util.keystr(kb)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_stacked_state_step_matches_replicated():
    """True-1/S storage: with stacked + pipe-sharded params/opt-state the
    training step produces the same parameters as the replicated-storage pp
    step, and each device holds only depth/S layers of every block leaf."""
    import optax
    from jax.sharding import NamedSharding

    from vit_ae_plus_plus_tpu.parallel.pp import (
        from_pp_params, make_pp_train_step, pp_state_shardings,
        shard_pp_state, to_pp_params,
    )
    from vit_ae_plus_plus_tpu.train.state import TrainState

    cfg, model, variables, v1, v2 = _mae(contrastive=True)
    mesh = make_pipeline_mesh(2, data=2, devices=jax.devices()[:4])
    # the production optimizer: its masked weight decay must treat stacked
    # (L, D) biases/norm scales exactly like their per-layer (D,) forms
    from vit_ae_plus_plus_tpu.train.optim import make_adamw

    tx = make_adamw(1e-3, weight_decay=0.05)

    def mk_state(params):
        return TrainState(
            step=jnp.zeros((), jnp.int32), params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(params), tx=tx,
        )

    rng = jax.random.PRNGKey(0)
    ew = jnp.float32(0.0)

    # replicated-storage pp step
    step_repl = make_pp_train_step(
        model, cfg.patch_size, mesh, n_microbatches=2, contr_weight=0.1,
        donate=False,
    )
    s_repl, m_repl = step_repl(mk_state(variables["params"]), v1, v2, rng, ew)

    # stacked, 1/S-sharded storage
    sp = to_pp_params(variables["params"], cfg.depth, cfg.decoder_depth)
    s_stacked = shard_pp_state(mk_state(sp), mesh)
    step_stacked = make_pp_train_step(
        model, cfg.patch_size, mesh, n_microbatches=2, contr_weight=0.1,
        donate=False, stacked_state=True,
        state_shardings=pp_state_shardings(s_stacked, mesh),
    )
    s_stacked, m_stacked = step_stacked(s_stacked, v1, v2, rng, ew)

    np.testing.assert_allclose(
        float(m_stacked["loss"]), float(m_repl["loss"]), atol=1e-5
    )
    # identical updated parameters
    got = from_pp_params(
        jax.device_get(s_stacked.params), cfg.depth, cfg.decoder_depth
    )
    for (ka, a), (kb, b) in zip(
        jax.tree_util.tree_leaves_with_path(jax.device_get(s_repl.params)),
        jax.tree_util.tree_leaves_with_path(got),
        strict=True,
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=2e-5,
            err_msg=jax.tree_util.keystr(ka),
        )
    # 1/S storage for params AND the AdamW moments
    for tree in (s_stacked.params["enc_stack"], s_stacked.params["dec_stack"]):
        for leaf in jax.tree.leaves(tree):
            shard, = {s.data.shape for s in leaf.addressable_shards
                      if s.device in leaf.sharding.device_set} or {None}
            assert shard[0] == cfg.depth // 2, (leaf.shape, shard)
    mu = s_stacked.opt_state[0].mu["enc_stack"]
    for leaf in jax.tree.leaves(mu):
        assert leaf.addressable_shards[0].data.shape[0] == cfg.depth // 2


def test_pp_pretrain_kfold_e2e(tmp_path):
    """pretrain-kfold with --pipe-devices 2: the full pipeline (loader ->
    pipelined stacked-state step -> min-loss checkpoint -> feature
    extraction) runs on a (data=2, pipe=2) mesh and the saved checkpoint is
    in the STANDARD per-layer layout (layout-independent on disk)."""
    import os

    from vit_ae_plus_plus_tpu.configs import DataConfig, TrainConfig
    from vit_ae_plus_plus_tpu.pipelines.pretrain_kfold import pretrain_kfold
    from vit_ae_plus_plus_tpu.train.checkpoint import load_params

    base = tmp_path / "data"
    base.mkdir()
    n = 16
    np.save(base / "x_whole_ssl.npy",
            np.random.default_rng(0).standard_normal((n, 16, 16, 16, 1)).astype(np.float32))
    np.save(base / "y_whole_ssl.npy", np.array([0, 1] * (n // 2)))
    data_cfg = DataConfig(name="brats", base_path=str(base), volume_size=16,
                          in_channels=1, use_z_score=True)
    train_cfg = TrainConfig(epochs=1, batch_size=4, patch_size=4,
                            warmup_epochs=1, compute_dtype="float32",
                            contr_weight=0.001, pipe_devices=2)
    work = str(tmp_path / "work")
    results = pretrain_kfold(data_cfg, train_cfg, work,
                             model_name="contr_mae_vit_tiny_pp_patch4",
                             n_splits=2, n_devices=4)
    assert all(np.isfinite(r["min_loss"]) for r in results.values())
    ckpt = os.path.join(work, "checkpoints", "fold_0", "checkpoint-min_loss")
    params = load_params(ckpt, None)
    assert "blocks_0" in params and "decoder_blocks_1" in params
    assert "enc_stack" not in params

    # --fsdp composes with --pipe-devices: same e2e on (data=2, pipe=2)
    # with stacked leaves ALSO weight-dim-sharded over 'data'
    train_cfg_z = TrainConfig(epochs=1, batch_size=4, patch_size=4,
                              warmup_epochs=1, compute_dtype="float32",
                              contr_weight=0.001, pipe_devices=2, fsdp=True)
    results_z = pretrain_kfold(data_cfg, train_cfg_z, str(tmp_path / "work_z"),
                               model_name="contr_mae_vit_tiny_pp_patch4",
                               n_splits=2, n_devices=4)
    assert all(np.isfinite(r["min_loss"]) for r in results_z.values())


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


def test_pp_fsdp_composition_matches_and_shards_both_axes():
    """ZeRO composed with GPipe (pp_state_shardings data_axis=): stacked
    block leaves shard 'pipe' on the stack dim AND 'data' on a weight dim —
    1/(S*D) params+moments per device — with a step that matches the
    pipe-only stacked step exactly."""
    from vit_ae_plus_plus_tpu.parallel.pp import (
        make_pp_train_step, pp_state_shardings, shard_pp_state, to_pp_params,
    )
    from vit_ae_plus_plus_tpu.train.optim import make_adamw
    from vit_ae_plus_plus_tpu.train.state import TrainState

    cfg, model, variables, v1, v2 = _mae(contrastive=True)
    mesh = make_pipeline_mesh(2, data=2, devices=jax.devices()[:4])
    tx = make_adamw(1e-3, weight_decay=0.05)

    def mk_state(params):
        return TrainState(
            step=jnp.zeros((), jnp.int32), params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(params), tx=tx,
        )

    rng = jax.random.PRNGKey(0)
    ew = jnp.float32(0.0)
    sp = to_pp_params(variables["params"], cfg.depth, cfg.decoder_depth)

    def run(data_axis):
        kw = dict(data_axis=data_axis, min_size=0) if data_axis else {}
        state = shard_pp_state(mk_state(sp), mesh, **kw)
        shardings = pp_state_shardings(state, mesh, **kw)
        step = make_pp_train_step(
            model, cfg.patch_size, mesh, n_microbatches=2, contr_weight=0.1,
            donate=False, stacked_state=True, state_shardings=shardings,
        )
        return step(state, v1, v2, rng, ew)

    s_pipe, m_pipe = run(None)
    s_zero, m_zero = run("data")
    np.testing.assert_allclose(float(m_zero["loss"]), float(m_pipe["loss"]),
                               atol=1e-5)
    for (ka, a), (_kb, b) in zip(
        jax.tree_util.tree_leaves_with_path(jax.device_get(s_pipe.params)),
        jax.tree_util.tree_leaves_with_path(jax.device_get(s_zero.params)),
        strict=True,
    ):
        # 1e-4 (vs the pipe-only test's 2e-5): splitting contraction dims
        # over 'data' reorders the f32 reductions feeding AdamW's rsqrt
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-4,
                                   err_msg=jax.tree_util.keystr(ka))

    # per-device storage: stack dim 1/pipe AND one weight dim 1/data, for
    # params and the AdamW moments alike
    def assert_both_axes(tree):
        found_data_sharded = False
        for leaf in jax.tree.leaves(tree):
            shard = leaf.addressable_shards[0].data.shape
            assert shard[0] == leaf.shape[0] // 2, (leaf.shape, shard)
            if leaf.ndim >= 2 and any(
                shard[d] == leaf.shape[d] // 2 for d in range(1, leaf.ndim)
            ):
                found_data_sharded = True
        assert found_data_sharded

    assert_both_axes(s_zero.params["enc_stack"])
    assert_both_axes(s_zero.params["dec_stack"])
    assert_both_axes(s_zero.opt_state[0].mu["enc_stack"])
