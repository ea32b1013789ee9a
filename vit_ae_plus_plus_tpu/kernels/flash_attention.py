"""Multi-head attention dispatch: XLA fused path + Pallas flash kernel.

Replaces the reference's naive O(N^2)-materialising softmax attention
(/root/reference/model/vit.py:112-124). Two interchangeable implementations:

- "xla": einsum attention. XLA fuses scale+softmax into the matmuls but still
  materialises the (B, H, N, N) score tensor in HBM — fine for the 433-token
  masked encoder, wasteful for the 1729-token decoder.
- "flash": blockwise online-softmax Pallas kernel (see pallas_flash.py),
  O(N) memory, scores never leave VMEM.

`impl="auto"` picks flash on TPU for sequences where it pays off, xla
otherwise (CPU tests, tiny sequences).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _xla_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: float) -> jnp.ndarray:
    """Naive-but-fused attention; parity target model/vit.py:117-121."""
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    # stable softmax in AT LEAST f32 (bf16 upcasts; f64 under x64 stays f64 —
    # a downcast here injects f32 rounding into the softmax's row-shift
    # invariance, which Adam amplifies on the gradient-free K bias)
    scores = scores.astype(jnp.promote_types(scores.dtype, jnp.float32))
    weights = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", weights, v)


def multihead_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, impl: str = "auto"
) -> jnp.ndarray:
    """Scaled dot-product attention over (B, H, N, Dh) tensors.

    Scale is 1/sqrt(Dh) (reference model/vit.py:105). Non-causal, no mask:
    the MAE drops masked tokens from the sequence instead of masking scores.
    """
    scale = q.shape[-1] ** -0.5
    if impl == "auto":
        # measured crossovers (BASELINE.md): the blockwise kernel wins
        # decisively at 1729 tokens; at the 433-token masked encoder the
        # GROUPED multi-head kernel (pallas_flash._mh_fwd_kernel, one program
        # per head group) beats XLA's fused-einsum attention in-model
        # (76.9 vs 84.9 ms fwd+bwd for the 12-layer stack) — per-program
        # overhead dominated the per-head grid there. Tiny sequences stay on
        # xla (materialised scores are cheap, kernel dispatch is not).
        on_tpu = jax.devices()[0].platform == "tpu"
        impl = "flash" if (on_tpu and q.shape[-2] >= 384) else "xla"
    if impl == "xla":
        return _xla_attention(q, k, v, scale)
    interpret = jax.default_backend() != "tpu"  # pallas compiles only on TPU
    if impl in ("flash", "flash_tp"):
        # The kernel self-shards over (batch, heads) via custom_partitioning
        # (pallas_flash._def_bh_partition): under a ('data', 'model') mesh the
        # per-shard program runs on local heads with NO ambient jax.set_mesh
        # or call-site shard_map. 'flash_tp' is a legacy alias from the round-1
        # shard_map design.
        from vit_ae_plus_plus_tpu.kernels.pallas_flash import flash_attention

        return flash_attention(q, k, v, scale, interpret=interpret)
    if impl == "flash_local":
        # same kernels, no custom_partitioning wrapper: for callers already
        # inside a manual shard_map axis (e.g. the GPipe pipeline,
        # parallel/pp.py) where partitioned ops are not allowed
        from vit_ae_plus_plus_tpu.kernels.pallas_flash import flash_attention_local

        return flash_attention_local(q, k, v, scale, interpret=interpret)
    if impl in ("flash_seq", "flash_ring"):
        # SEQUENCE-parallel: the token axis shards over the ambient mesh's
        # 'model' axis (long-context volumes past one chip, SURVEY §5.7).
        # Requires running under `jax.set_mesh(mesh)`; batch rides 'data'.
        # 'flash_seq' replicates K/V per shard (seq_flash.py — simplest, fine
        # while N x D stays small); 'flash_ring' shards K/V too and rotates
        # blocks over the ring (ring_flash.py — O(N/P) HBM per shard, the
        # path for volumes whose replicated K/V would no longer fit).
        mesh = jax.sharding.get_abstract_mesh()
        if mesh.shape.get("model", 1) == 1:
            from vit_ae_plus_plus_tpu.kernels.pallas_flash import flash_attention

            return flash_attention(q, k, v, scale, interpret=interpret)
        if impl == "flash_ring":
            from vit_ae_plus_plus_tpu.kernels.ring_flash import ring_flash_attention

            return ring_flash_attention(
                q, k, v, mesh, scale=scale, interpret=interpret
            )
        from vit_ae_plus_plus_tpu.kernels.seq_flash import seq_sharded_flash_attention

        return seq_sharded_flash_attention(
            q, k, v, mesh, scale=scale, interpret=interpret
        )
    raise ValueError(f"unknown attention impl {impl!r}")
