"""Device mesh construction and sharding helpers.

The TPU-native replacement for the reference's torch.distributed/NCCL layer
(/root/reference/utils/misc.py:170-248): there is no hand-written
communication at all. A `jax.sharding.Mesh` over the slice + NamedShardings
on the pjit'ed step make GSPMD emit the gradient all-reduces as ICI
collectives; metric means come out of the same compiled graph.

Axes:
- 'data': batch sharding (the only parallelism the reference effectively has);
- 'model': reserved second axis for tensor parallelism of ViT-L+ (attention
  heads / MLP hidden); size 1 unless requested.

Multi-host: call `jax.distributed.initialize()` once per process before
building the mesh (the jax equivalent of init_process_group, misc.py:242-246);
`is_main_process()` mirrors the rank-0 guards (misc.py:195-213).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: Optional[int] = None, model: int = 1, devices: Optional[Sequence] = None
) -> Mesh:
    """Build a ('data', 'model') mesh; data defaults to all devices / model."""
    devices = list(devices if devices is not None else jax.devices())
    if data is None:
        data = len(devices) // model
    if data * model < len(devices):
        import warnings

        # a silent subset can mask a misconfigured run (e.g. a typo'd
        # --n-devices quietly training on half the chips)
        warnings.warn(
            f"mesh {data}x{model} uses only {data * model} of {len(devices)} "
            "available devices; pass `devices` explicitly to silence",
            stacklevel=2,
        )
        devices = devices[: data * model]  # use the first data*model devices
    if data * model != len(devices):
        raise ValueError(f"mesh {data}x{model} != {len(devices)} devices")
    arr = np.array(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def shard_batch(batch, mesh: Mesh):
    """Place a host array batch sharded over the 'data' axis."""
    sharding = NamedSharding(mesh, P("data"))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def is_main_process() -> bool:
    """Rank-0 guard for checkpoint/log writes (reference misc.py:195-213)."""
    return jax.process_index() == 0


def initialize_distributed(**kwargs) -> None:
    """Multi-host init (call once per process, BEFORE any other jax API use —
    the jax equivalent of init_process_group, reference misc.py:242-246).
    Safe to call on a single host: initialize() is a no-op failure there and
    re-initialisation raises, both swallowed."""
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError) as e:
        # single-process environment or already initialised
        print(f"jax.distributed.initialize skipped: {e}")
