"""Hardware-kernel tier: Pallas TPU kernels + XLA fallbacks.

The reference has no native/CUDA code of its own (SURVEY.md §2 — it rides stock
cuDNN); here the equivalent tier is hand-written Pallas, tuned for the
framework's hot ops:

- `flash_attention` / `multihead_attention`: non-causal attention over the
  433/1729-token sequences — grouped multi-head, single-block-K fused-bwd,
  and blockwise online-softmax tiers, all self-sharding (pallas_flash.py);
- `seq_sharded_flash_attention`: pad-and-mask SEQUENCE-parallel attention
  (token axis over the mesh 'model' axis) for volumes past one chip — also
  reachable as `attn_impl='flash_seq'` under `jax.set_mesh` (seq_flash.py);
- `ring_flash_attention`: ring-scheduled sequence parallelism — K/V sharded
  too and rotated over the ring via `lax.ppermute`, O(N/P) HBM per shard
  for every operand (`attn_impl='flash_ring'`, ring_flash.py);
- `fused_layernorm` / `fused_ln_dense`: MXU-reduction LayerNorm and the
  fused LN+projection kernel — available as drop-ins, NOT wired into the
  trunks by default (both measured slower in-model on TPU v5e; see their
  docstrings and BASELINE.md for the recorded results).
"""

from vit_ae_plus_plus_tpu.kernels.flash_attention import multihead_attention
from vit_ae_plus_plus_tpu.kernels.fused_ln import fused_layernorm
from vit_ae_plus_plus_tpu.kernels.fused_ln_dense import fused_ln_dense
from vit_ae_plus_plus_tpu.kernels.pallas_flash import flash_attention
from vit_ae_plus_plus_tpu.kernels.ring_flash import ring_flash_attention
from vit_ae_plus_plus_tpu.kernels.seq_flash import seq_sharded_flash_attention

__all__ = [
    "multihead_attention",
    "flash_attention",
    "seq_sharded_flash_attention",
    "ring_flash_attention",
    "fused_layernorm",
    "fused_ln_dense",
]
