"""Hardware-kernel tier: Pallas TPU kernels + XLA fallbacks.

The reference has no native/CUDA code of its own (SURVEY.md §2 — it rides stock
cuDNN); here the equivalent tier is hand-written Pallas, tuned for the
framework's hot op (non-causal attention over ~433/1729-token sequences).
"""

from vit_ae_plus_plus_tpu.kernels.flash_attention import multihead_attention

__all__ = ["multihead_attention"]
