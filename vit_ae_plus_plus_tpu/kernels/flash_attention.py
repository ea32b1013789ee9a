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
    # stable softmax in f32 regardless of compute dtype
    scores = scores.astype(jnp.float32)
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
        on_tpu = jax.devices()[0].platform == "tpu"
        impl = "flash" if (on_tpu and q.shape[-2] >= 1024) else "xla"
    if impl == "xla":
        return _xla_attention(q, k, v, scale)
    interpret = jax.default_backend() != "tpu"  # pallas compiles only on TPU
    if impl == "flash":
        from vit_ae_plus_plus_tpu.kernels.pallas_flash import flash_attention

        return flash_attention(q, k, v, scale, interpret=interpret)
    if impl == "flash_tp":
        # Pallas kernels are single-device programs, so under tensor
        # parallelism the kernel runs per-shard via shard_map: heads split
        # over 'model', batch over 'data'. Requires the caller to execute
        # under `jax.set_mesh(mesh)` (see parallel/tp.py) and head counts
        # divisible by the 'model' axis size.
        from jax.sharding import PartitionSpec as P

        from vit_ae_plus_plus_tpu.kernels.pallas_flash import flash_attention

        mesh = jax.sharding.get_abstract_mesh()
        spec = P("data", "model", None, None)
        sharded = jax.shard_map(
            lambda q, k, v: flash_attention(q, k, v, scale, interpret=interpret),
            mesh=mesh, in_specs=(spec,) * 3, out_specs=spec, check_vma=False,
        )
        return sharded(q, k, v)
    raise ValueError(f"unknown attention impl {impl!r}")
