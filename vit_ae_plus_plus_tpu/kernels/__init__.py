"""Hardware-kernel tier: Pallas TPU kernels + XLA fallbacks.

The reference has no native/CUDA code of its own (SURVEY.md §2 — it rides stock
cuDNN); here the equivalent tier is hand-written Pallas, tuned for the
framework's hot ops:

- `flash_attention` / `multihead_attention`: non-causal attention over the
  433/1729-token sequences — grouped multi-head, single-block-K fused-bwd,
  and blockwise online-softmax tiers, all self-sharding (pallas_flash.py);
- `fused_layernorm`: MXU-reduction LayerNorm (fused_ln.py) — available as a
  drop-in, NOT wired into the trunks (measured slower in-model; see its
  docstring for the recorded result).
"""

from vit_ae_plus_plus_tpu.kernels.flash_attention import multihead_attention
from vit_ae_plus_plus_tpu.kernels.fused_ln import fused_layernorm
from vit_ae_plus_plus_tpu.kernels.pallas_flash import flash_attention

__all__ = ["multihead_attention", "flash_attention", "fused_layernorm"]
