"""Tensor-parallel sharding rules for the ViT trunks.

The reference has no tensor parallelism (SURVEY.md §2.6 — absent); this is the
TPU-native scaling path for ViT-Large+ on a ('data', 'model') mesh:

- attention qkv kernel (D, 3D): split the OUTPUT dim over 'model' (=> heads
  computed locally per shard);
- attention out-proj kernel (D, D): split the INPUT dim (row-parallel; GSPMD
  inserts the all-reduce after the partial matmuls);
- MLP Dense_0 (D, 4D): column-parallel; Dense_1 (4D, D): row-parallel;
- patch embed / norms / tokens / heads: replicated.

No hand-written collectives: the rules only pin PARAM shardings (via
device_put); jit infers in_shardings from the committed placements and GSPMD
emits the reduce(s) over ICI. Megatron-style, minus the manual comm.

Attention under TP: attn_impl='xla' partitions automatically via GSPMD;
attn_impl='flash' runs the Pallas flash kernel, which SELF-shards over
(batch, heads) via custom_partitioning + SdyShardingRule
(pallas_flash._def_bh_partition) — no ambient mesh or call-site shard_map
needed; head counts must divide by the 'model' axis size. 'flash_tp' is a
legacy alias for the same path (the round-1 shard_map design is gone).
attn_impl='flash_packed' ('auto' on big sequences) is NOT TP-compatible:
its (B, N, 3C) lane dim must stay replicated — shard_train_state rejects
models left on it.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _spec_for_path(path) -> P:
    names = [str(getattr(k, "key", k)) for k in path]
    leaf = names[-1]
    joined = "/".join(names)
    if "attn" in names:
        if "qkv" in names:
            return P(None, "model") if leaf == "kernel" else P("model")
        if "proj" in names:
            return P("model", None) if leaf == "kernel" else P()
    if "mlp" in names:
        if "Dense_0" in names:
            return P(None, "model") if leaf == "kernel" else P("model")
        if "Dense_1" in names:
            return P("model", None) if leaf == "kernel" else P()
    return P()


def tp_param_shardings(params: Any, mesh: Mesh) -> Any:
    """Tree of NamedShardings implementing the rules above."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: NamedSharding(mesh, _spec_for_path(path)), params
    )


def shard_train_state(state, mesh: Mesh):
    """Place a TrainState for (data, model) execution: params/opt-state sharded
    by the TP rules, everything else replicated. Call BEFORE the first step;
    jit then infers shardings from the committed placements."""
    param_sh = tp_param_shardings(state.params, mesh)
    repl = NamedSharding(mesh, P())

    params = jax.tree.map(jax.device_put, state.params, param_sh)
    # opt_state: re-init from the sharded params so the moments inherit the
    # placement (call this right after create_train_state — it resets any
    # accumulated optimiser state)
    opt_state = state.tx.init(params)
    batch_stats = jax.tree.map(lambda x: jax.device_put(x, repl), state.batch_stats)
    step = jax.device_put(state.step, repl)
    return state.replace(step=step, params=params, batch_stats=batch_stats,
                         opt_state=opt_state)
