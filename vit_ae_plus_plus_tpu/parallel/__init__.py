from vit_ae_plus_plus_tpu.parallel.mesh import make_mesh, shard_batch, replicate
from vit_ae_plus_plus_tpu.parallel.pp import (
    make_pipeline_mesh,
    make_pp_train_step,
    pipeline_blocks,
    pipelined_forward_features,
    pipelined_mae_forward,
    stack_block_params,
)

__all__ = [
    "make_mesh",
    "shard_batch",
    "replicate",
    "make_pipeline_mesh",
    "make_pp_train_step",
    "pipeline_blocks",
    "pipelined_forward_features",
    "pipelined_mae_forward",
    "stack_block_params",
]
