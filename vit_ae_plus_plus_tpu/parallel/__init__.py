from vit_ae_plus_plus_tpu.parallel.mesh import make_mesh, shard_batch, replicate
from vit_ae_plus_plus_tpu.parallel.fsdp import (
    fsdp_param_shardings,
    shard_train_state_fsdp,
)
from vit_ae_plus_plus_tpu.parallel.pp import (
    auto_microbatches,
    from_pp_params,
    make_pipeline_mesh,
    make_pp_train_step,
    pipeline_blocks,
    pipelined_forward_features,
    pipelined_mae_forward,
    pp_state_shardings,
    shard_pp_state,
    stack_block_params,
    to_pp_params,
)

__all__ = [
    "make_mesh",
    "fsdp_param_shardings",
    "shard_train_state_fsdp",
    "shard_batch",
    "replicate",
    "auto_microbatches",
    "from_pp_params",
    "make_pipeline_mesh",
    "make_pp_train_step",
    "pipeline_blocks",
    "pipelined_forward_features",
    "pipelined_mae_forward",
    "pp_state_shardings",
    "shard_pp_state",
    "stack_block_params",
    "to_pp_params",
]
