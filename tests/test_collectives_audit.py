"""Compiled-HLO collective audit: instruction-level proof of the sharding
claims (SURVEY.md §2.6) on the virtual 8-device mesh.

Running a sharded step and checking the loss proves correctness, not
placement — GSPMD will happily insert a full-tensor all-gather and still
return the right numbers (exactly the failure mode the round-2 advisor
flagged for attn_impl='auto' under a model axis). These tests compile the
real train step and audit the collectives XLA's SPMD partitioner actually
emitted:

- pure data parallel must reduce gradients and gather NOTHING — every
  all-reduce is at most parameter-shaped, and the only other collectives are
  the partitioner's tiny RNG/sort reshuffles for the (B, L) mask lottery,
  each strictly smaller than a parameter tensor;
- tensor parallel must never materialise the full (B, N, 3C) qkv activation
  (the packed-kernel hazard) nor gather a sharded weight to full size;
- the ring-attention trunk must actually ride `collective-permute` (the ring)
  and the replicated-K/V sequence-parallel kernel must not.
"""

import re
from collections import Counter

import numpy as np
import jax
import jax.numpy as jnp

from vit_ae_plus_plus_tpu.configs import MAEConfig, ViTConfig
from vit_ae_plus_plus_tpu.models import MaskedAutoencoderViT3D
from vit_ae_plus_plus_tpu.models.vit import VisionTransformer3D
from vit_ae_plus_plus_tpu.parallel import make_mesh, replicate, shard_batch
from vit_ae_plus_plus_tpu.parallel.tp import shard_train_state
from vit_ae_plus_plus_tpu.train import create_train_state, make_adamw, make_train_step

_OP = re.compile(
    r"= (.*?) (all-reduce|all-gather|reduce-scatter|collective-permute|all-to-all)"
    r"(?:-start)?\("
)
_SHAPE = re.compile(r"(?:pred|bf16|f16|f32|f64|s8|s32|u8|u32|u64)\[([\d,]*)\]")


def collectives(hlo_text):
    """[(kind, max_elems, output_shapes)] per collective in post-SPMD HLO.

    The captured text is the instruction's OUTPUT type(s) — for all-gather
    that is the gathered (full) tensor."""
    out = []
    for line in hlo_text.splitlines():
        m = _OP.search(line)
        if not m:
            continue
        shapes = [
            tuple(int(d) for d in dims.split(",") if d)
            for dims in _SHAPE.findall(m.group(1))
        ]
        elems = [int(np.prod(s)) if s else 1 for s in shapes]
        out.append((m.group(2), max(elems) if elems else 1, shapes))
    return out


def _tiny_cfg(attn_impl):
    return MAEConfig(
        volume_size=16, patch_size=4, in_chans=1, embed_dim=24, depth=2,
        num_heads=2, decoder_embed_dim=12, decoder_depth=1, decoder_num_heads=2,
        contrastive=True, attn_impl=attn_impl,
    )


def _lowered_step_hlo(attn_impl, mesh, tp):
    model = MaskedAutoencoderViT3D(_tiny_cfg(attn_impl))
    batch = jax.random.normal(jax.random.PRNGKey(0), (16, 1, 16, 16, 16))
    state = create_train_state(
        model, (batch, batch), make_adamw(1e-3),
        {"params": jax.random.PRNGKey(1), "mask": jax.random.PRNGKey(2)},
    )
    step = make_train_step(
        model, 4, mask_ratio=0.75, contr_weight=0.001, mesh=mesh, donate=False
    )
    state = shard_train_state(state, mesh) if tp else replicate(state, mesh)
    v = shard_batch(batch, mesh)
    text = step.lower(
        state, v, v, jax.random.PRNGKey(3), jnp.float32(0.01)
    ).compile().as_text()
    param_shapes = {tuple(p.shape) for p in jax.tree.leaves(state.params)}
    return text, param_shapes


def test_data_parallel_reduces_grads_and_gathers_nothing():
    mesh = make_mesh(data=8, model=1)
    text, param_shapes = _lowered_step_hlo("xla", mesh, tp=False)
    cols = collectives(text)
    kinds = Counter(k for k, _, _ in cols)
    max_param = max(int(np.prod(s)) for s in param_shapes)

    assert kinds["all-reduce"] >= 1, "gradient all-reduce missing from DP step"
    # nothing is replicated mid-step: a single all-gather would mean the
    # partitioner decided to materialise some tensor on every device
    assert kinds["all-gather"] == 0, f"unexpected all-gather in pure DP: {cols}"
    for kind, elems, _shapes in cols:
        # grad/metric all-reduces are at most parameter-shaped; the RNG/sort
        # reshuffles for the (B, L) masking lottery are smaller still — any
        # collective bigger than the largest parameter would be moving
        # activations, i.e. the batch sharding leaked
        assert elems <= max_param, (
            f"{kind} moves {elems} elems > largest param {max_param}: {cols}"
        )


def test_tensor_parallel_never_materialises_full_qkv():
    mesh = make_mesh(data=4, model=2)
    text, param_shapes = _lowered_step_hlo("flash", mesh, tp=True)
    cols = collectives(text)
    kinds = Counter(k for k, _, _ in cols)

    assert kinds["all-reduce"] >= 1, "TP row-parallel/grad all-reduce missing"
    # the packed-kernel hazard (ADVICE r2): a replicated-lane attention under
    # a model axis silently gathers the FULL (B, N, 3C) qkv every layer. The
    # self-sharding flash kernel must keep every gather strictly below that
    # (the half-qkv resharding gather into the kernel's (B, H) layout is fine).
    B, N_enc, C = 16, 1 + 16, 24  # 4^3 patches, 75% masked, +cls
    full_qkv = B * N_enc * 3 * C
    for kind, elems, _shapes in cols:
        if kind == "all-gather":
            assert elems < full_qkv, (
                f"all-gather of {elems} elems >= full qkv activation "
                f"{full_qkv} — tensor parallelism is gathering, not sharding"
            )
    # sharded parameters are updated locally: no all-gather OUTPUT may be a
    # full parameter tensor (that would mean TP re-materialises the weight)
    for kind, _elems, shapes in cols:
        if kind == "all-gather":
            hit = [s for s in shapes if s in param_shapes and len(s) >= 2]
            assert not hit, f"all-gather reconstructs full weight(s) {hit}"


def test_fsdp_gathers_weights_not_activations():
    """FSDP (parallel/fsdp.py): with the residual stream pinned P('data')
    (constrain_batch), the partitioner must gather the 1/data-sharded WEIGHTS
    at their use sites — no collective may move a full activation. Without
    the constraint this exact program compiled to 91 all-gathers up to 131k
    elements (full patchified inputs and (B, N, 3C) qkv activations)."""
    import dataclasses

    from vit_ae_plus_plus_tpu.parallel.fsdp import shard_train_state_fsdp

    mesh = make_mesh(data=8, model=1)
    cfg = dataclasses.replace(_tiny_cfg("xla"), batch_shard_activations=True)
    model = MaskedAutoencoderViT3D(cfg)
    batch = jax.random.normal(jax.random.PRNGKey(0), (16, 1, 16, 16, 16))
    state = create_train_state(
        model, (batch, batch), make_adamw(1e-3),
        {"params": jax.random.PRNGKey(1), "mask": jax.random.PRNGKey(2)},
    )
    state, shardings = shard_train_state_fsdp(state, mesh, min_size=64)
    step = make_train_step(
        model, 4, mask_ratio=0.75, contr_weight=0.001, mesh=mesh, donate=False,
        state_shardings=shardings,
    )
    v = shard_batch(batch, mesh)
    with jax.set_mesh(mesh):
        text = step.lower(
            state, v, v, jax.random.PRNGKey(3), jnp.float32(0.01)
        ).compile().as_text()
    cols = collectives(text)
    kinds = Counter(k for k, _, _ in cols)

    # weights ARE gathered at use sites — that is FSDP working
    assert kinds["all-gather"] >= 1, "no weight all-gather: params replicated?"
    # ... but nothing bigger than one residual-stream tensor may ever move
    # (B=16 x (1+4^3) tokens x C=24; a violation means the partitioner is
    # resharding activations or rematerialising the patchified volume again)
    resid = 16 * (1 + 4**3) * 24
    for kind, elems, _shapes in cols:
        if kind in ("all-gather", "all-to-all"):
            assert elems <= resid, (
                f"{kind} moves {elems} > residual activation {resid}: "
                "FSDP is moving activations, not weights"
            )


def _trunk_fwd_hlo(attn_impl, mesh):
    cfg = ViTConfig(
        volume_size=16, patch_size=4, in_chans=1, embed_dim=32, depth=1,
        num_heads=2, num_classes=0, global_pool=True, attn_impl=attn_impl,
    )
    model = VisionTransformer3D(cfg)
    xs = jax.random.normal(jax.random.PRNGKey(5), (4, 1, 16, 16, 16))
    params = model.init({"params": jax.random.PRNGKey(6)}, xs)["params"]
    with jax.set_mesh(mesh):
        fn = jax.jit(lambda p, x: model.apply({"params": p}, x))
        return fn.lower(params, xs).compile().as_text()


def test_ring_attention_rotates_and_never_gathers():
    mesh = make_mesh(data=1, model=4)
    ring = collectives(_trunk_fwd_hlo("flash_ring", mesh))
    ring_kinds = Counter(k for k, _, _ in ring)
    assert ring_kinds["collective-permute"] >= 1, (
        "flash_ring forward emitted no collective-permute — the K/V ring "
        "rotation (lax.ppermute) is not in the compiled program"
    )
    # the point of the ring is O(N/P) memory: K/V blocks ROTATE, nothing is
    # ever replicated — a single all-gather would void that claim
    assert ring_kinds["all-gather"] == 0, f"flash_ring gathered: {ring}"

    # the replicated-K/V kernel is the opposite trade: it MUST gather the
    # full (B, N, C) K and V once per layer (B=4, N=1+64 pre-padding, C=32)
    seq = collectives(_trunk_fwd_hlo("flash_seq", mesh))
    full_kv = 4 * 65 * 32
    assert any(k == "all-gather" and e >= full_kv for k, e, _ in seq), (
        f"flash_seq shows no full-K/V all-gather (expected >= {full_kv}): {seq}"
    )


def _zero_gpipe_hlo(min_size: int, batch_shard_activations: bool = True) -> str:
    """Compile the composed ZeRO x GPipe stacked-state train step at the
    given FSDP sharding floor and return the post-SPMD HLO text."""
    from vit_ae_plus_plus_tpu.parallel.pp import (
        make_pipeline_mesh, make_pp_train_step, pp_state_shardings,
        shard_pp_state, to_pp_params,
    )
    from vit_ae_plus_plus_tpu.train.state import TrainState

    cfg = MAEConfig(
        volume_size=16, patch_size=4, in_chans=1, embed_dim=32, depth=2,
        num_heads=2, decoder_embed_dim=24, decoder_depth=2,
        decoder_num_heads=4, contrastive=True, attn_impl="xla",
        # the production recipe (pretrain_kfold --fsdp --pipe-devices): pin
        # the residual stream P('data') inside the pipeline stages so the
        # partitioner gathers weight shards, not activations
        batch_shard_activations=batch_shard_activations,
    )
    mae = MaskedAutoencoderViT3D(cfg)
    mesh = make_pipeline_mesh(2, data=4)
    batch = jax.random.normal(jax.random.PRNGKey(0), (8, 1, 16, 16, 16))
    variables = mae.init(
        {"params": jax.random.PRNGKey(1), "mask": jax.random.PRNGKey(2)},
        batch, batch,
    )
    tx = make_adamw(1e-3)
    sp = to_pp_params(variables["params"], cfg.depth, cfg.decoder_depth)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=sp,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(sp), tx=tx,
    )
    state = shard_pp_state(state, mesh, data_axis="data", min_size=min_size)
    shardings = pp_state_shardings(state, mesh, data_axis="data",
                                   min_size=min_size)
    step = make_pp_train_step(
        mae, cfg.patch_size, mesh, n_microbatches=2, contr_weight=0.1,
        donate=False, stacked_state=True, state_shardings=shardings,
    )
    v = shard_batch(batch, mesh)
    with jax.set_mesh(mesh):
        return step.lower(
            state, v, v, jax.random.PRNGKey(3), jnp.float32(0.0)
        ).compile().as_text()


def test_pp_fsdp_gathers_weight_slices_not_activations():
    """ZeRO x GPipe (pp_state_shardings data_axis='data'): the compiled
    stacked-state step must ride the pipeline's collective-permute ring AND
    gather only per-stage weight-shard slices — no all-gather may output
    anything as large as a microbatch residual activation, let alone a
    patchified volume.

    min_size 512: weight matrices shard over 'data'; small biases/norm
    scales stay replicated (the production floor behaviour)."""
    text = _zero_gpipe_hlo(min_size=512)
    cols = collectives(text)
    kinds = Counter(k for k, _, _ in cols)

    assert kinds["collective-permute"] >= 1, "no pipeline ring in the program"
    assert kinds["all-gather"] >= 1, "no weight gathers: ZeRO sharding inert?"
    # largest legitimate gather: ONE stage-layer slice of the biggest stacked
    # leaf (mlp Dense_0 kernel (L, 32, 128) -> (1, 32, 128) = 4096 elems);
    # a microbatch residual is (B/M)(1+N)C = 4*65*32 = 8320 and the
    # patchified volume 8*64*64 = 32768 — both must never be gathered
    max_weight_slice = 32 * 32 * 4
    for kind, elems, shapes in cols:
        if kind in ("all-gather", "all-to-all"):
            assert elems <= max_weight_slice, (
                f"{kind} outputs {elems} elems {shapes} > one weight slice "
                f"({max_weight_slice}): the composition is moving activations"
            )


_REMAT_WARNING = "full rematerialization"


def _fresh_compile(fn):
    """Run `fn` with the persistent compilation cache disabled: a cache hit
    skips the SPMD partitioner entirely, so its warnings never fire and a
    warning-based assertion would vacuously pass. jax memoizes
    cache-enablement at first compile, so the module state is reset around
    the toggle (same dance as serving_aot.save_engine)."""
    from jax._src import compilation_cache as _cc

    was_on = jax.config.jax_enable_compilation_cache
    jax.config.update("jax_enable_compilation_cache", False)
    _cc.reset_cache()
    try:
        return fn()
    finally:
        jax.config.update("jax_enable_compilation_cache", was_on)
        _cc.reset_cache()


def test_pp_fsdp_production_settings_compile_warning_free(capfd):
    """At the production sharding floor the SPMD partitioner must emit ZERO
    'Involuntary full rematerialization' warnings for the composed
    ZeRO x GPipe program (VERDICT r3 #2): such a warning means GSPMD gave up
    resharding a tensor between the manual pipeline region and the GSPMD
    data placement and regenerated it whole — a silent 1/shard-efficiency
    loss the multichip artifact must not ship with.

    capfd captures fd-level stderr, which is where XLA's C++ logging lands.
    The min_size=0 canary below proves the capture actually sees the warning
    when it fires, so the clean assertion here is meaningful."""
    capfd.readouterr()  # drop anything buffered by earlier tests
    _fresh_compile(lambda: _zero_gpipe_hlo(min_size=512))
    err = capfd.readouterr().err
    assert _REMAT_WARNING not in err, (
        "production ZeRO x GPipe compile emitted involuntary-remat "
        f"warnings:\n{err}"
    )


def test_pp_fsdp_min_size_zero_is_a_detectable_stress_case(capfd):
    """Sharding EVERY leaf (min_size=0) WITHOUT the residual-stream pin
    (batch_shard_activations=False) forces the partitioner to reshard
    sub-threshold leaves across the manual/auto boundary — XLA warns about
    involuntary full rematerialization (this exact program put 2 such
    warnings in MULTICHIP_r03's tail). The canary pins (a) that the
    warning-capture mechanism works, and (b) that min_size=0 is a stress
    configuration, not a production recipe (dryrun_multichip runs 512).
    Notably the P('data') activation pin alone already silences the remat
    even at min_size=0 — the pin gives the partitioner a legal reshard
    path — so BOTH production levers are doing real work."""
    capfd.readouterr()
    _fresh_compile(
        lambda: _zero_gpipe_hlo(min_size=0, batch_shard_activations=False)
    )
    err = capfd.readouterr().err
    assert _REMAT_WARNING in err, (
        "expected the min_size=0 stress compile to emit involuntary-remat "
        "warnings; if XLA stopped warning, the clean test above proves "
        "nothing — re-verify how the partitioner reports forced remat"
    )
