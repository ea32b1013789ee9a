"""Train state: one pytree carrying params, BN stats, and optimiser state.

Replaces the reference's (model, optimizer, loss_scaler) triple — no grad
scaler exists here because compute is bf16/f32 (SURVEY.md §2.6 AMP row).
The state is donated into the jitted step, so params update in place in HBM.
"""

from __future__ import annotations

from typing import Any

import jax
import flax.struct
import optax


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    batch_stats: Any  # empty dict for models without BatchNorm
    opt_state: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)

    @property
    def variables(self):
        if self.batch_stats:
            return {"params": self.params, "batch_stats": self.batch_stats}
        return {"params": self.params}

    def apply_gradients(self, grads) -> "TrainState":
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params, opt_state=new_opt_state)


def create_train_state(
    model, sample_args: tuple, tx: optax.GradientTransformation, rng,
    sample_kwargs=None, init_opt: bool = True,
) -> TrainState:
    """Initialise model variables + optimiser state.

    `init_opt=False` leaves opt_state as None for callers that re-layout the
    params before the (possibly large) optimizer moments are allocated —
    e.g. the pipeline's stacked-state conversion (parallel/pp.py)."""
    import jax.numpy as jnp

    sample_kwargs = sample_kwargs or {}
    variables = model.init(rng, *sample_args, **sample_kwargs)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params) if init_opt else None,
        tx=tx,
    )
