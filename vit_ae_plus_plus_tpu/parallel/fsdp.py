"""FSDP / ZeRO-style parameter + optimizer-state sharding over 'data'.

The reference has no equivalent (SURVEY.md §2.6 — its only parallelism is
dormant DDP scaffolding, /root/reference/utils/misc.py:216-248, which keeps a
full replica of params, grads AND Adam moments on every rank). This is the
TPU-native fully-sharded path: every large parameter leaf — and therefore the
AdamW mu/nu trees that mirror it — lives 1/D-sharded over the 'data' mesh
axis. GSPMD materialises a leaf (all-gather over ICI) only around the ops
that consume it and reduce-scatters the gradients, so peak HBM for
params+moments drops by ~data-axis-size while the step stays a single jitted
SPMD program. No hand-written collectives.

Sharding rule (per leaf):
- skip leaves smaller than `min_size` elements (LayerNorm scales, biases,
  the cls/mask tokens): replicating them costs ~nothing and avoids tiny
  all-gathers;
- skip the patchify-adjacent projections (patch_embed, decoder_pred, and the
  learned pos-embeds): their neighbours are the 8-D patchify/unpatchify
  reshapes, which the SPMD partitioner cannot reshard efficiently — sharding
  these weights makes it replicate the full patchified ACTIVATION instead
  ("involuntary full rematerialization", observed in the compiled HLO). They
  are <1% of flagship params; the win lives in the block stacks;
- otherwise shard the LARGEST dimension divisible by the axis size that is
  not already taken by tensor parallelism — composable with parallel/tp.py
  on a ('data', 'model') mesh, where e.g. a qkv kernel (D, 3D) ends up
  P('data', 'model').

Usage (see pipelines/pretrain_kfold.py):
    state, shardings = shard_train_state_fsdp(state, mesh)
    step = make_train_step(..., mesh=mesh, state_shardings=shardings)
"""

from __future__ import annotations

from typing import Any, Tuple

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vit_ae_plus_plus_tpu.parallel.tp import _spec_for_path

# below this many elements a leaf is replicated (1-D norm params, biases,
# tokens); 8192 ~= one 96^3/p8 pos-embed row block, far below any kernel
_MIN_SHARD_ELEMENTS = 8192

# leaves whose path contains any of these stay replicated: they sit against
# the 8-D patchify/unpatchify reshapes (see module docstring)
_REPLICATED_PATHS = ("patch_embed", "decoder_pred", "pos_embed")


def _fsdp_spec(base: P, shape: Tuple[int, ...], data: int,
               min_size: int = _MIN_SHARD_ELEMENTS) -> P:
    """Extend `base` (the TP spec, possibly P()) with 'data' on the largest
    free divisible dimension; returns `base` unchanged if none qualifies."""
    if int(np.prod(shape)) < min_size:
        return base
    spec = list(base) + [None] * (len(shape) - len(base))
    free = [d for d in range(len(shape)) if spec[d] is None and shape[d] % data == 0
            and shape[d] >= data]
    if not free:
        return base
    d = max(free, key=lambda i: shape[i])
    spec[d] = "data"
    while spec and spec[-1] is None:
        spec.pop()
    return P(*spec)


def fsdp_param_shardings(params: Any, mesh: Mesh,
                         min_size: int = _MIN_SHARD_ELEMENTS) -> Any:
    """NamedSharding tree: TP rules (if the mesh has a model axis > 1) plus
    'data'-axis sharding of every large leaf."""
    data = mesh.shape["data"]
    tp_on = mesh.shape.get("model", 1) > 1

    def one(path, leaf):
        names = [str(getattr(k, "key", k)) for k in path]
        base = _spec_for_path(path) if tp_on else P()
        if any(n in names for n in _REPLICATED_PATHS):
            return NamedSharding(mesh, base)
        return NamedSharding(mesh, _fsdp_spec(base, leaf.shape, data, min_size))

    return jax.tree_util.tree_map_with_path(one, params)


def shard_train_state_fsdp(state, mesh: Mesh,
                           min_size: int = _MIN_SHARD_ELEMENTS):
    """Commit a TrainState to its FSDP placement and return
    (state, state_shardings).

    Params are device_put to their 1/data shards; the optimizer state is
    re-initialised FROM the sharded params so the AdamW moments are created
    directly in the sharded layout (never materialised replicated — the
    whole point for large models). Call right after create_train_state,
    before any step. `state_shardings` pins the jitted step's in/out state
    placement (train/step.py state_shardings path)."""
    param_sh = fsdp_param_shardings(state.params, mesh, min_size)
    repl = NamedSharding(mesh, P())

    params = jax.tree.map(jax.device_put, state.params, param_sh)
    # moments are created FROM the sharded params (zeros_like preserves
    # sharding) so they are never materialised replicated
    opt_state = state.tx.init(params)
    batch_stats = jax.tree.map(lambda x: jax.device_put(x, repl), state.batch_stats)
    step = jax.device_put(state.step, repl)
    state = state.replace(step=step, params=params, batch_stats=batch_stats,
                          opt_state=opt_state)

    def _commit(x):
        # scalar counters (optax count / MultiSteps step) come out of init
        # uncommitted — pin them replicated so the shardings tree is uniform
        if isinstance(getattr(x, "sharding", None), NamedSharding):
            return x
        return jax.device_put(x, repl)

    state = jax.tree.map(_commit, state)
    shardings = jax.tree.map(lambda x: x.sharding, state)
    return state, shardings


def shard_moco_state_fsdp(state, mesh: Mesh,
                          min_size: int = _MIN_SHARD_ELEMENTS):
    """MoCoState variant (pipelines/moco_kfold.py): the base AND momentum
    encoders share the same 1/data placement — MoCo keeps TWO full encoder
    copies plus LARS moments, the largest per-replica state of any trainer
    here (the reference's most distributed path, main_3d_moco_k_fold.py:
    153-188, still replicates all of it per rank). The EMA update is
    elementwise, so the momentum tree stays sharded through the step; BN
    stats are tiny and stay replicated."""
    param_sh = fsdp_param_shardings(state.params, mesh, min_size)
    repl = NamedSharding(mesh, P())
    params = jax.tree.map(jax.device_put, state.params, param_sh)
    momentum = jax.tree.map(jax.device_put, state.momentum_params, param_sh)
    opt_state = state.tx.init(params)
    state = state.replace(
        step=jax.device_put(state.step, repl),
        params=params,
        momentum_params=momentum,
        batch_stats=jax.tree.map(lambda x: jax.device_put(x, repl), state.batch_stats),
        momentum_batch_stats=jax.tree.map(
            lambda x: jax.device_put(x, repl), state.momentum_batch_stats),
        opt_state=opt_state,
    )

    def _commit(x):
        if isinstance(getattr(x, "sharding", None), NamedSharding):
            return x
        return jax.device_put(x, repl)

    state = jax.tree.map(_commit, state)
    shardings = jax.tree.map(lambda x: x.sharding, state)
    return state, shardings
