"""The jitted SSL training step.

Replaces the reference's per-iteration Python loop body
(/root/reference/utils/train_one_epoch.py:40-105): forward, composite loss,
backward, AdamW update, and metric reduction all compile into ONE XLA program.
What the reference does per step on the host — LR adjustment (lr_sched), loss
scaling, `cuda.synchronize()` + `empty_cache()` (train_one_epoch.py:76,105) —
is gone: the LR is an optax schedule inside the optimiser, grads are bf16/f32
so no scaler exists, and XLA owns memory.

Sharding: the step is pjit'ed over an optional `jax.sharding.Mesh`. Batches
shard over the 'data' axis, state is replicated; XLA/GSPMD inserts the
gradient all-reduce over ICI — there is no hand-written communication
(SURVEY.md §2.6, §5.8).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vit_ae_plus_plus_tpu.ops.losses import at_least_f32
from vit_ae_plus_plus_tpu.train.objective import mae_loss_terms
from vit_ae_plus_plus_tpu.train.state import TrainState


def make_train_step(
    model,
    patch_size: int,
    *,
    mask_ratio: float = 0.75,
    contr_weight: float = 0.0,
    perceptual_weight: float = 0.0,
    norm_pix_loss: bool = False,
    perceptual_fn=None,
    loss_filters_dtype: str = "float32",
    mesh: Optional[Mesh] = None,
    donate: bool = True,
    forward_fn: Optional[Callable] = None,
    state_shardings=None,
) -> Callable:
    """Build `train_step(state, view1, view2, rng, edge_map_weight) ->
    (state, metrics)`.

    `edge_map_weight` is a traced f32 scalar so the per-epoch schedule
    (reference k_fold_…_brats.py:183-187) never triggers recompilation.

    `forward_fn(variables, view1, view2, rng) -> (outputs, new_batch_stats)`
    swaps the model forward while keeping the loss/grad/update body shared —
    the GPipe pipeline (parallel/pp.py make_pp_train_step) injects its
    pipelined forward here. `state_shardings` (a NamedSharding tree matching
    the TrainState) pins non-replicated state placements, e.g. the pipeline's
    1/S-sharded stacked params + optimizer moments.
    """
    contrastive = getattr(model.cfg, "contrastive", False)
    if (
        mesh is not None
        and mesh.shape.get("model", 1) > 1
        and getattr(model.cfg, "attn_impl", "auto") in ("auto", "flash_packed")
    ):
        # the packed kernel's (B, N, 3C) lane dim is replicated: under tensor
        # parallelism it would silently all-gather full qkv per layer; TP runs
        # must pick the self-sharding 'flash' kernel (or 'xla') explicitly
        raise ValueError(
            "attn_impl='auto'/'flash_packed' is not tensor-parallel-safe; "
            "build the model with attn_impl='flash' (self-sharding) or 'xla' "
            "for a mesh with a model axis > 1"
        )

    if forward_fn is None:

        def forward_fn(variables, view1, view2, rng1):
            kwargs = {"mutable": ["batch_stats"]} if "batch_stats" in variables else {}
            result = model.apply(
                variables,
                view1,
                view2 if contrastive else None,
                mask_ratio=mask_ratio,
                rngs={"mask": rng1},
                **kwargs,
            )
            outputs, mutated = result if kwargs else (result, {})
            return outputs, mutated.get("batch_stats")

    def step_fn(state: TrainState, view1, view2, rng, edge_map_weight):
        rng1 = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            outputs, new_bs = forward_fn(variables, view1, view2, rng1)
            total, metrics = mae_loss_terms(
                outputs,
                at_least_f32(view1),
                patch_size,
                edge_map_weight=edge_map_weight,
                contr_weight=contr_weight,
                perceptual_weight=perceptual_weight,
                norm_pix_loss=norm_pix_loss,
                perceptual_fn=perceptual_fn,
                filters_dtype=loss_filters_dtype,
            )
            return total, (metrics, new_bs if new_bs else state.batch_stats)

        (_, (metrics, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        metrics["grad_norm"] = optax.global_norm(grads)
        state = state.apply_gradients(grads)
        state = state.replace(batch_stats=new_bs)
        return state, metrics

    if mesh is not None and state_shardings is not None:
        # explicitly-placed state (e.g. the pipeline's 1/S stacked leaves)
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        return jax.jit(
            step_fn,
            in_shardings=(state_shardings, data, data, repl, repl),
            out_shardings=(state_shardings, repl),
            donate_argnums=(0,) if donate else (),
        )
    if mesh is not None and mesh.shape.get("model", 1) == 1:
        # pure data parallel: batch over 'data', state replicated
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        return jax.jit(
            step_fn,
            in_shardings=(repl, data, data, repl, repl),
            out_shardings=(repl, repl),
            donate_argnums=(0,) if donate else (),
        )
    # single device, or tensor parallel: shardings inferred from the committed
    # placements (see parallel/tp.py shard_train_state)
    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_eval_step(
    model,
    patch_size: int,
    *,
    mask_ratio: float = 0.75,
    norm_pix_loss: bool = False,
    mesh: Optional[Mesh] = None,
) -> Callable:
    """Reconstruction-loss evaluation step (no grads, no BN update)."""

    def step_fn(variables, view1, rng):
        outputs = model.apply(
            {"params": variables["params"], **(
                {"batch_stats": variables["batch_stats"]} if "batch_stats" in variables else {}
            )},
            view1,
            None,
            mask_ratio=mask_ratio,
            rngs={"mask": rng},
            train=False,
        )
        _, metrics = mae_loss_terms(
            outputs, at_least_f32(view1), patch_size, norm_pix_loss=norm_pix_loss
        )
        return metrics

    if mesh is not None:
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        return jax.jit(step_fn, in_shardings=(repl, data, repl), out_shardings=repl)
    return jax.jit(step_fn)


def make_feature_step(model, mesh: Optional[Mesh] = None) -> Callable:
    """Batched encoder inference: `forward_features` under jit/pjit
    (replaces reference utils/feature_extraction.py:9-45 hot loop)."""

    def step_fn(variables, batch):
        return model.apply(variables, batch, method=model.forward_features)

    if mesh is not None:
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        return jax.jit(step_fn, in_shardings=(repl, data), out_shardings=data)
    return jax.jit(step_fn)
