"""Sequence-sharded pad-and-mask flash attention (SURVEY §5.7 growth path).

For volumes past one chip the token count 1 + G^3 (4,097 at 128^3/p8; 13,825
at 192^3/p8) defeats GSPMD divisibility on every mesh size — the reason
sequence parallelism stayed a design note in rounds 1-2. The resolution here:

- PAD the query axis with zeros to a multiple of 8 * mesh['model'] and shard
  the padded axis over 'model'; dead rows cost <1% FLOPs at these lengths
  and their outputs are sliced off (their cotangents arrive as zeros, so
  they contribute exactly nothing to dk/dv).
- K/V stay REPLICATED per shard (21 MB at 192^3/p8 bf16 — trivial next to
  the O(N^2) score work being split); each shard runs the standard blockwise
  flash kernels (pallas_flash._fwd/_bwd) over its local query rows with the
  full key set, masking the ragged KV tail in-kernel as always.
- dq is row-local; dk/dv are cross-shard SUMS, expressed as an explicit
  `lax.psum` over 'model'. This is why the wrapper is a `jax.shard_map`, not
  the custom_partitioning route used by the (B, H) self-sharding kernel:
  a custom-call partition rule can only describe results assembled by
  concatenation/replication — a summed result needs a collective in the
  per-shard program, which shard_map states in one line. The batch axis
  shards over 'data' in the same specs, so dp x sp runs compose.

Single-chip overhead of the padding: measured on the real chip and recorded
in BASELINE.md (<5% bound required by the round-2 verdict). Parity vs the
single-device kernel at the 128^3/p8 shape: tests/test_seq_flash.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from vit_ae_plus_plus_tpu.kernels.pallas_flash import _bwd, _fwd


@functools.lru_cache(maxsize=None)
def _seq_fn(mesh: Mesh, axis: str, batch_axis, scale, block_q, block_k, interpret):
    qspec = P(batch_axis, None, axis, None)
    lspec = P(batch_axis, None, None, axis)  # lse/delta are lane-oriented
    repl = P(batch_axis, None, None, None)

    def fwd_body(q, k, v):
        o, (lse, o_padded) = _fwd(q, k, v, scale, block_q, block_k, interpret)
        return o, lse, o_padded

    def bwd_body(q, k, v, o_padded, lse, do):
        dq, dk, dv = _bwd(q, k, v, o_padded, lse, do,
                          scale, block_q, block_k, interpret)
        # every shard holds partial dk/dv from its local query rows
        return dq, jax.lax.psum(dk, axis), jax.lax.psum(dv, axis)

    fwd_sm = jax.shard_map(
        fwd_body, mesh=mesh, in_specs=(qspec, repl, repl),
        out_specs=(qspec, lspec, qspec), check_vma=False,
    )
    bwd_sm = jax.shard_map(
        bwd_body, mesh=mesh,
        in_specs=(qspec, repl, repl, qspec, lspec, qspec),
        out_specs=(qspec, repl, repl), check_vma=False,
    )

    @jax.custom_vjp
    def attn(q, k, v):
        o, _, _ = fwd_sm(q, k, v)
        return o

    def attn_fwd(q, k, v):
        o, lse, o_padded = fwd_sm(q, k, v)
        return o, (q, k, v, o_padded, lse)

    def attn_bwd(res, do):
        q, k, v, o_padded, lse = res
        return bwd_sm(q, k, v, o_padded, lse, do)

    attn.defvjp(attn_fwd, attn_bwd)
    return attn


def seq_sharded_flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    axis: str = "model",
    batch_axis: str | None = "data",
    scale: float | None = None,
    block_q: int | None = None,
    block_k: int | None = None,
    interpret: bool | None = None,
):
    """softmax(q k^T * scale) v over (B, H, N, D) with N sharded over
    `mesh[axis]` (and B over `batch_axis` when given). Exact — the pad rows
    are sliced off and contribute nothing to any gradient."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    scale = q.shape[-1] ** -0.5 if scale is None else scale
    s = mesh.shape[axis]
    if batch_axis is not None and mesh.shape.get(batch_axis, 1) == 1:
        batch_axis = None
    n = q.shape[2]
    step = 8 * s
    pn = -(-n // step) * step
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, pn - n), (0, 0)))
    fn = _seq_fn(mesh, axis, batch_axis, scale, block_q, block_k, interpret)
    return fn(qp, k, v)[:, :, :n]
