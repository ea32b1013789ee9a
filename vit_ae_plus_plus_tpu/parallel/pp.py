"""Pipeline parallelism: GPipe-style microbatch pipelining of the ViT trunk
over a 'pipe' mesh axis.

The reference has no pipeline parallelism (SURVEY.md §2.6 — its largest model
fits one GPU); this is a beyond-reference capability for trunks whose weights
or activations outgrow one chip (ViT-Large+ at 192^3-class volumes combines
with 'flash_ring' sequence sharding for the N^2 side).

TPU-native design — no schedulers, no send/recv threads, no per-stage
processes (the GPU way). The whole pipeline is ONE jitted SPMD program:

- the L transformer blocks' parameters are stacked to (L, ...) leaves and
  resharded to (S, L/S, ...) over the mesh's 'pipe' axis — each device holds
  only its stage's weights (the point of PP: weight memory scales 1/S);
- a `jax.shard_map` manual ONLY over 'pipe' (`axis_names={'pipe'}`) runs the
  classic GPipe schedule as a `lax.scan` over M + S - 1 ticks: every tick,
  each stage applies its L/S blocks (an inner scan over stacked layer
  params) to its current microbatch and hands the activation to the next
  stage via `lax.ppermute` — the ICI neighbour exchange. The batch axis
  stays AUTOMATIC, so the same program composes with data parallelism and
  GSPMD still inserts the gradient all-reduces over 'data'.
- the backward pass is jax.grad of the same program: ppermute transposes to
  the reverse rotation, so the cool-down phase of the backward pipeline
  falls out of AD — nothing is hand-scheduled.

Bubble fraction is the textbook (S-1)/(M+S-1); pick n_microbatches >= ~4*S
to amortise. The finished microbatches accumulate on the last stage and are
rebroadcast with one masked psum — O(B*N*C) ICI traffic once per trunk, the
correctness-first epilogue (a production variant would leave the features
sharded for a sharded head).

Attention inside the pipeline body must be a LOCAL op (custom_partitioning
is not allowed under manual shard_map axes), so `make_block_apply` routes
self-sharding impls to `flash_local` (the same Pallas kernel minus the
partitioning wrapper) on TPU and 'xla' elsewhere.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def make_pipeline_mesh(
    pipe: int, data: int = 1, devices: Optional[Sequence] = None
) -> Mesh:
    """('data', 'pipe') mesh; adjacent pipe stages land on adjacent devices
    so the ppermute hops ride nearest-neighbour ICI links."""
    devices = list(devices if devices is not None else jax.devices())
    if data * pipe != len(devices):
        raise ValueError(f"mesh {data}x{pipe} != {len(devices)} devices")
    return Mesh(np.array(devices).reshape(data, pipe), ("data", "pipe"))


def stack_block_params(params, depth: int, prefix: str = "blocks_"):
    """Per-layer param subtrees params[f'{prefix}{i}'] -> one tree with
    (depth, ...) leaves (differentiable: jnp.stack)."""
    layers = [params[f"{prefix}{i}"] for i in range(depth)]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layers)


def unstack_block_params(stacked, depth: int, prefix: str = "blocks_"):
    """Inverse of stack_block_params (for grads/updates round-trips)."""
    return {
        f"{prefix}{i}": jax.tree.map(lambda a, i=i: a[i], stacked)
        for i in range(depth)
    }


# ---------------------------------------------------------------------------
# Stacked-state storage: true 1/S weight + optimizer memory.
#
# The correctness-first path stores the standard per-layer params and restacks
# them every step (replicated storage). For production PP the state itself
# holds the block stacks as single (L, ...) leaves sharded over 'pipe' dim 0 —
# then params, grads, AND the AdamW moments (whose trees mirror params) all
# live 1/S per device, and the per-step restack disappears.
# ---------------------------------------------------------------------------


def to_pp_params(params, depth: int, decoder_depth: Optional[int] = None):
    """Standard per-layer params tree -> stacked form: blocks_{i} subtrees
    fold into one 'enc_stack' ((depth, ...) leaves), decoder_blocks_{i} into
    'dec_stack'. Checkpoints stay in per-layer form; convert at load."""
    out = {
        k: v
        for k, v in params.items()
        if not (k.startswith("blocks_") or k.startswith("decoder_blocks_"))
    }
    out["enc_stack"] = stack_block_params(params, depth)
    if decoder_depth is not None:
        out["dec_stack"] = stack_block_params(
            params, decoder_depth, prefix="decoder_blocks_"
        )
    return out


def from_pp_params(params, depth: int, decoder_depth: Optional[int] = None):
    """Inverse of to_pp_params (for saving standard checkpoints)."""
    out = {k: v for k, v in params.items() if k not in ("enc_stack", "dec_stack")}
    out.update(unstack_block_params(params["enc_stack"], depth))
    if decoder_depth is not None:
        out.update(
            unstack_block_params(
                params["dec_stack"], decoder_depth, prefix="decoder_blocks_"
            )
        )
    return out


def pp_state_shardings(state, mesh: Mesh, axis: str = "pipe",
                       data_axis: Optional[str] = None,
                       min_size: int = 2**15):
    """NamedSharding tree for a stacked-params TrainState: block-stack leaves
    — any leaf whose tree path passes through 'enc_stack'/'dec_stack', which
    covers params AND the optimizer moments mirroring them — shard dim 0 over
    mesh[axis]; everything else replicates.

    `data_axis`: compose ZeRO/FSDP on top of the pipeline — each stacked
    leaf additionally shards its largest divisible NON-stack dim over
    mesh[data_axis] (weights + moments then cost 1/(S*D) per device). The
    pipeline's shard_map is manual over `axis` only, so the data-axis
    placement stays a regular GSPMD sharding: the partitioner gathers
    weight shards at their use sites exactly like plain FSDP
    (parallel/fsdp.py). Leaves below `min_size` elements per stage stay
    data-replicated (same floor idea as fsdp._MIN_SHARD_ELEMENTS)."""
    from jax.sharding import NamedSharding

    def spec(path, leaf):
        stacked = any(
            getattr(k, "key", getattr(k, "name", None)) in ("enc_stack", "dec_stack")
            for k in path
        )
        ndim = getattr(leaf, "ndim", 0)
        if not stacked or ndim == 0:
            return NamedSharding(mesh, P())
        parts = [axis] + [None] * (ndim - 1)
        if (data_axis is not None and ndim >= 2
                and leaf.size // leaf.shape[0] >= min_size):
            n = mesh.shape[data_axis]
            for d in sorted(range(1, ndim), key=lambda d: -leaf.shape[d]):
                if leaf.shape[d] % n == 0:
                    parts[d] = data_axis
                    break
        return NamedSharding(mesh, P(*parts))

    return jax.tree_util.tree_map_with_path(spec, state)


def shard_pp_state(state, mesh: Mesh, axis: str = "pipe",
                   data_axis: Optional[str] = None,
                   min_size: int = 2**15):
    """Commit a stacked-params TrainState to its 1/S placement (1/(S*D)
    with `data_axis` — see pp_state_shardings)."""
    return jax.tree.map(
        jax.device_put, state,
        pp_state_shardings(state, mesh, axis, data_axis=data_axis,
                           min_size=min_size),
    )


def auto_microbatches(batch: int, n_stages: int, data: int = 1) -> int:
    """Largest divisor of `batch` <= 4 * n_stages — the GPipe guidance
    (bubble fraction (S-1)/(M+S-1)) capped by batch divisibility, preferring
    microbatches whose batch dim still splits evenly over the `data` axis
    (else GSPMD pads/reshards on every pipeline tick)."""
    best_any = None
    for m in range(min(batch, 4 * n_stages), 0, -1):
        if batch % m == 0:
            best_any = best_any or m
            if (batch // m) % data == 0:
                return m
    return best_any or 1


def make_block_apply(cfg, deterministic: bool = True, num_heads: Optional[int] = None):
    """One-transformer-block apply(layer_params, x) built from the model's
    own Block module, with the attention impl forced to a shard_map-safe
    LOCAL op (see module docstring). `num_heads` overrides cfg.num_heads
    (the MAE decoder stack runs a different head count)."""
    from vit_ae_plus_plus_tpu.models.vit import Block, _dt

    impl = cfg.attn_impl
    if impl not in ("xla", "flash_local"):
        # 'auto'/'flash'/'flash_packed'/'flash_seq'/'flash_ring' all resolve
        # to custom_partitioning or mesh-wide kernels — not legal per-stage
        impl = "flash_local" if jax.default_backend() == "tpu" else "xla"
    block_cls = nn.remat(Block) if getattr(cfg, "remat_blocks", False) else Block
    blk = block_cls(
        num_heads if num_heads is not None else cfg.num_heads,
        cfg.mlp_ratio,
        attn_impl=impl,
        dtype=_dt(cfg.dtype),
        ln_fusion=getattr(cfg, "ln_fusion", "auto"),
        # honoured inside the pipe-manual shard_map too ('data' stays an
        # auto axis): pins the residual stream P('data') so a ZeRO-composed
        # run gathers weight shards, not activations (the FSDP lesson,
        # parallel/fsdp.py) — requires an ambient jax.set_mesh
        batch_constraint=getattr(cfg, "batch_shard_activations", False),
    )
    return lambda layer_params, x: blk.apply({"params": layer_params}, x, deterministic)


def pipeline_blocks(
    block_apply,
    stacked_params,
    x: jnp.ndarray,
    mesh: Optional[Mesh],
    *,
    n_microbatches: int,
    axis: str = "pipe",
):
    """Apply `depth` stacked transformer blocks to x (B, N, C), pipelined
    over mesh[axis] stages with GPipe microbatching. Exact: returns the same
    values (and grads, via AD) as the sequential loop."""
    depth = jax.tree.leaves(stacked_params)[0].shape[0]
    if mesh is None or mesh.shape.get(axis, 1) == 1:
        y, _ = jax.lax.scan(
            lambda c, lp: (block_apply(lp, c), None), x, stacked_params
        )
        return y

    S = mesh.shape[axis]
    M = n_microbatches
    B = x.shape[0]
    if depth % S:
        raise ValueError(f"depth {depth} not divisible by {S} pipeline stages")
    if B % M:
        raise ValueError(f"batch {B} not divisible by {M} microbatches")
    mb = B // M
    per_stage = depth // S
    stage_params = jax.tree.map(
        lambda a: a.reshape(S, per_stage, *a.shape[1:]), stacked_params
    )

    def body(sp, xs):
        idx = jax.lax.axis_index(axis)
        n_stage = jax.lax.axis_size(axis)
        sp = jax.tree.map(lambda a: jnp.squeeze(a, 0), sp)  # (L/S, ...)
        mbs = xs.reshape(M, mb, *xs.shape[1:])

        def stage(xi):  # this stage's L/S blocks, scanned over layer params
            y, _ = jax.lax.scan(lambda c, lp: (block_apply(lp, c), None), xi, sp)
            return y

        def tick(carry, t):
            act, out = carry
            # stage 0 ingests microbatch t (clamped past the end: the warm-up
            # garbage it produces never reaches the last stage inside the
            # T = M + S - 1 tick budget, so it is never stored)
            ingest = jax.lax.dynamic_index_in_dim(
                mbs, jnp.clip(t, 0, M - 1), 0, keepdims=False
            )
            y = stage(jnp.where(idx == 0, ingest, act))
            # the last stage finishes microbatch j at tick t = j + (S - 1)
            j = t - (n_stage - 1)
            upd = jax.lax.dynamic_update_index_in_dim(
                out, y, jnp.clip(j, 0, M - 1), 0
            )
            out = jnp.where(j >= 0, upd, out)
            y = jax.lax.ppermute(
                y, axis, [(i, (i + 1) % n_stage) for i in range(n_stage)]
            )
            return (y, out), None

        # the carry becomes device-varying over 'pipe' inside the loop (the
        # ppermute + per-stage writes), so the zero init must be cast varying
        carry0 = jax.tree.map(
            lambda a: jax.lax.pcast(a, (axis,), to="varying"),
            (jnp.zeros_like(mbs[0]), jnp.zeros_like(mbs)),
        )
        (_, out), _ = jax.lax.scan(tick, carry0, jnp.arange(M + S - 1))
        # finished microbatches live on the last stage; masked psum
        # rebroadcasts them to every stage (see module docstring)
        out = jax.lax.psum(
            jnp.where(idx == n_stage - 1, out, jnp.zeros_like(out)), axis
        )
        return out.reshape(B, *xs.shape[1:])

    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P(axis), stage_params), P()),
        out_specs=P(),
        axis_names=frozenset({axis}),
    )
    return fn(stage_params, x)


def pipelined_forward_features(
    model,
    variables,
    x: jnp.ndarray,
    mesh: Optional[Mesh],
    *,
    n_microbatches: int,
    axis: str = "pipe",
    train: bool = False,
):
    """VisionTransformer3D.forward_features with the block stack pipelined.

    Drop-in: takes the model's standard `variables` tree (per-layer
    blocks_{i} params — checkpoints load unchanged) and returns the same
    features as `model.apply(..., method=model.forward_features)`; only the
    block loop runs as a pipeline. Patch embed / cls / pos-embed and the
    final norm+pool replicate the trunk exactly (parity-pinned by
    tests/test_pipeline_parallel.py against the sequential model)."""
    import flax.linen as nn

    from vit_ae_plus_plus_tpu.models.vit import PatchEmbed3D, _dt

    c = model.cfg
    p = variables["params"]
    dtype = _dt(c.dtype)
    x = PatchEmbed3D(c.patch_size, c.embed_dim, dtype=dtype).apply(
        {"params": p["patch_embed"]}, x
    )
    b = x.shape[0]
    cls = jnp.broadcast_to(p["cls_token"].astype(x.dtype), (b, 1, x.shape[-1]))
    x = jnp.concatenate([cls, x], axis=1) + p["pos_embed"].astype(x.dtype)
    stacked = stack_block_params(p, c.depth)
    x = pipeline_blocks(
        make_block_apply(c, deterministic=not train),
        stacked,
        x,
        mesh,
        n_microbatches=n_microbatches,
        axis=axis,
    )
    ln = nn.LayerNorm(epsilon=1e-6, dtype=dtype)
    if c.global_pool:
        pooled = jnp.mean(x[:, 1:, :], axis=1)
        return ln.apply({"params": p["fc_norm"]}, pooled)
    x = ln.apply({"params": p["norm"]}, x)
    return x[:, 0]


def pipelined_mae_forward(
    model,
    variables,
    view1: jnp.ndarray,
    view2: Optional[jnp.ndarray] = None,
    *,
    mesh: Optional[Mesh],
    n_microbatches: int,
    mask_ratio: float = 0.75,
    noise: Optional[jnp.ndarray] = None,
    rng: Optional[jax.Array] = None,
    train: bool = True,
    axis: str = "pipe",
):
    """MaskedAutoencoderViT3D forward with BOTH block stacks (encoder depth D,
    decoder depth D') pipelined over mesh[axis].

    Drop-in vs `model.apply` (models/mae.py __call__, incl. the contrastive
    2B-batched-views branch): takes the standard `variables` tree and returns
    `(outputs_dict, batch_stats)` — the same outputs, and the mutated
    batch_stats when the contrastive predictor's BatchNorm runs in train mode
    (unchanged pass-through otherwise). The two stacks run as two back-to-back
    GPipe pipelines sharing the stage mapping (encoder stage i and decoder
    stage i live on the same devices); everything between them — masking, the
    decoder embed, the mask-token scatter — replicates the sequential model
    exactly (parity-pinned by tests/test_pipeline_parallel.py).

    The mask noise comes from `noise` or a direct `jax.random.uniform(rng, ·)`
    draw — the same distribution as the flax in-module `make_rng('mask')`
    draw but a different stream, so per-example masks differ from
    `model.apply` under the same key (pass `noise` for bit-exact parity).

    MAINTENANCE: this is a hand-unrolled mirror of models/mae.py (flax
    modules can't be sliced into shard_map stages); any change to the MAE
    forward must be replicated here — the parity tests in
    tests/test_pipeline_parallel.py are the drift alarm.
    """
    import flax.linen as nn

    from vit_ae_plus_plus_tpu.models.vit import (
        ContrastiveHeads, PatchEmbed3D, _dt, dense_init,
    )
    from vit_ae_plus_plus_tpu.ops import (
        get_3d_sincos_pos_embed, random_masking, restore_tokens,
    )

    c = model.cfg
    p = variables["params"]
    dtype = _dt(c.dtype)
    grid = round(c.num_patches ** (1 / 3))
    pos = jnp.asarray(
        get_3d_sincos_pos_embed(c.embed_dim, grid, cls_token=True)[None], jnp.float32
    )
    dpos = jnp.asarray(
        get_3d_sincos_pos_embed(c.decoder_embed_dim, grid, cls_token=True)[None],
        jnp.float32,
    )

    contrastive = c.contrastive and view2 is not None
    x_in = jnp.concatenate([view1, view2], axis=0) if contrastive else view1

    # --- encoder pre (replicated) -----------------------------------------
    x = PatchEmbed3D(c.patch_size, c.embed_dim, dtype=dtype).apply(
        {"params": p["patch_embed"]}, x_in
    )
    x = x + pos[:, 1:, :].astype(x.dtype)
    if noise is None and mask_ratio > 0:
        if rng is None:
            raise ValueError("mask_ratio > 0 needs `noise` or `rng`")
        noise = jax.random.uniform(rng, x.shape[:2])
    if mask_ratio > 0:
        x, mask_all, ids_all = random_masking(x, mask_ratio, noise=noise)
    else:
        b_, l_ = x.shape[:2]
        mask_all = jnp.zeros((b_, l_), x.dtype)
        ids_all = jnp.broadcast_to(jnp.arange(l_), (b_, l_))
    cls = p["cls_token"].astype(x.dtype) + pos[:, :1, :].astype(x.dtype)
    x = jnp.concatenate(
        [jnp.broadcast_to(cls, (x.shape[0], 1, x.shape[-1])), x], axis=1
    )

    # --- encoder pipeline -------------------------------------------------
    # stacked-state params ('enc_stack'/'dec_stack' leaves, see to_pp_params)
    # are consumed directly — no per-step restack, storage stays 1/S-sharded
    enc_stacked = (
        p["enc_stack"] if "enc_stack" in p else stack_block_params(p, c.depth)
    )
    x = pipeline_blocks(
        make_block_apply(c, deterministic=not train),
        enc_stacked,
        x,
        mesh,
        n_microbatches=n_microbatches * (2 if contrastive else 1),
        axis=axis,
    )
    x = nn.LayerNorm(epsilon=1e-6, dtype=dtype).apply({"params": p["norm"]}, x)

    if contrastive:
        b = view1.shape[0]
        latent, latent2 = x[:b], x[b:]
        mask, ids_restore = mask_all[:b], ids_all[:b]
    else:
        latent, mask, ids_restore = x, mask_all, ids_all

    # --- decoder pre (replicated) -----------------------------------------
    d = nn.Dense(c.decoder_embed_dim, kernel_init=dense_init, dtype=dtype).apply(
        {"params": p["decoder_embed"]}, latent
    )
    x_ = restore_tokens(d[:, 1:, :], p["mask_token"], ids_restore)
    y = jnp.concatenate([d[:, :1, :], x_], axis=1) + dpos.astype(d.dtype)

    # --- decoder pipeline -------------------------------------------------
    dec_stacked = (
        p["dec_stack"]
        if "dec_stack" in p
        else stack_block_params(p, c.decoder_depth, prefix="decoder_blocks_")
    )
    y = pipeline_blocks(
        make_block_apply(c, deterministic=not train, num_heads=c.decoder_num_heads),
        dec_stacked,
        y,
        mesh,
        n_microbatches=n_microbatches,
        axis=axis,
    )
    y = nn.LayerNorm(epsilon=1e-6, dtype=dtype).apply({"params": p["decoder_norm"]}, y)
    pred = nn.Dense(c.patch_dim, kernel_init=dense_init, dtype=dtype).apply(
        {"params": p["decoder_pred"]}, y
    )[:, 1:, :]

    out = {"pred": pred, "mask": mask, "ids_restore": ids_restore, "latent": latent}
    bs = variables.get("batch_stats")
    if contrastive:
        z1 = latent.reshape(-1, latent.shape[-1])
        z2 = latent2.reshape(-1, latent2.shape[-1])
        # Serialize the heads' BatchNorm data-axis all-reduces against the
        # pipeline's ppermutes. Without this the two are independent
        # dependency branches and XLA:CPU's thunk executor may rendezvous
        # them in a different order per device — observed as a cyclic
        # collective deadlock on the virtual mesh (device 0 in the BN
        # all-reduce while the others wait in the ppermute). The barrier
        # makes heads-fwd depend on the decoder pipeline and, through its
        # transpose, decoder-bwd depend on heads-bwd, giving every device
        # one totally-ordered collective chain. TPU serializes the module
        # anyway, so this costs nothing there.
        z1, z2, pred = jax.lax.optimization_barrier((z1, z2, pred))
        out["pred"] = pred
        heads = ContrastiveHeads(c.embed_dim, use_proj=c.use_proj, dtype=dtype)
        hv = {"params": p["heads"]}
        if bs is not None:
            hv["batch_stats"] = bs["heads"]
        if train:
            (p1, p2, z1, z2), mut = heads.apply(
                hv, z1, z2, train=True, apply_proj=False, mutable=["batch_stats"]
            )
            bs = {"heads": mut["batch_stats"]}
        else:
            p1, p2, z1, z2 = heads.apply(hv, z1, z2, train=False, apply_proj=False)
        out.update(
            p1=p1, p2=p2,
            z1=jax.lax.stop_gradient(z1), z2=jax.lax.stop_gradient(z2),
        )
    return out, bs


def make_pp_train_step(
    model,
    patch_size: int,
    mesh: Mesh,
    *,
    n_microbatches: int,
    mask_ratio: float = 0.75,
    contr_weight: float = 0.0,
    perceptual_weight: float = 0.0,
    norm_pix_loss: bool = False,
    perceptual_fn=None,
    loss_filters_dtype: str = "float32",
    axis: str = "pipe",
    donate: bool = True,
    stacked_state: bool = False,
    state_shardings=None,
):
    """train/step.py::make_train_step with the MAE forward pipelined over
    mesh[axis] — the same `(state, view1, view2, rng, edge_map_weight) ->
    (state, metrics)` contract, composed with the 'data' axis (batches shard
    over 'data', GSPMD still inserts the gradient all-reduce).

    `stacked_state=True`: the state carries stacked block params
    (to_pp_params) committed via shard_pp_state — params, grads and AdamW
    moments stay 1/S-sharded over mesh[axis] end to end; pass
    `state_shardings=pp_state_shardings(state, mesh)` (required — explicit
    placements keep the compiled program fully specified and
    persistent-cache-safe).

    Thin wrapper: injects the pipelined forward into the shared
    train/step.py::make_train_step body (loss assembly, value_and_grad,
    AdamW update, metrics) so the two paths cannot drift."""
    from vit_ae_plus_plus_tpu.train.step import make_train_step

    if stacked_state and state_shardings is None:
        raise ValueError(
            "stacked_state=True requires state_shardings="
            "pp_state_shardings(state, mesh)"
        )
    contrastive = getattr(model.cfg, "contrastive", False)

    def forward_fn(variables, view1, view2, rng1):
        return pipelined_mae_forward(
            model,
            variables,
            view1,
            view2 if contrastive else None,
            mesh=mesh,
            n_microbatches=n_microbatches,
            mask_ratio=mask_ratio,
            rng=rng1,
            train=True,
            axis=axis,
        )

    return make_train_step(
        model,
        patch_size,
        mask_ratio=mask_ratio,
        contr_weight=contr_weight,
        perceptual_weight=perceptual_weight,
        norm_pix_loss=norm_pix_loss,
        perceptual_fn=perceptual_fn,
        loss_filters_dtype=loss_filters_dtype,
        mesh=mesh,
        donate=donate,
        forward_fn=forward_fn,
        state_shardings=state_shardings if stacked_state else None,
    )
