"""Ring flash attention: K/V sharded over the sequence axis (SURVEY §5.7).

`seq_flash.py` shards the QUERY rows over `mesh['model']` but replicates K/V
per shard — fine at 192^3/p8 (21 MB per layer) yet O(N) per chip: at 512^3/p8
(262,145 tokens) replicated bf16 K/V would cost ~0.8 GB per decoder layer and
the design stops scaling. This module completes the long-context story with
the classic ring schedule (Ring Attention lineage — blockwise parallel
transformers over a device ring):

- q, k, v are all padded to `8 * mesh[axis]` rows and SHARDED over `axis`:
  per-shard HBM is O(N / P) for every operand.
- P ring steps: each shard runs a partial flash kernel of its local query
  rows against the K/V block it currently holds, then `lax.ppermute`s the
  block (plus its validity bias) to the next shard. Partial results merge in
  f32 via the standard log-sum-exp combine:
      lse' = logaddexp(lse, lse_s);  o' = o e^{lse-lse'} + o_s e^{lse_s-lse'}.
  The permute of step s+1 depends only on the block of step s — not on its
  compute — so XLA's latency-hiding scheduler overlaps the ICI transfer with
  the current partial's MXU work; no manual double-buffering is needed.
- backward is its own ring (one jax.custom_vjp around the whole schedule —
  the per-step kernels never need vjp rules): q/do/o/lse stay resident on
  their owner; (k, v, bias) rotate together with the dk/dv ACCUMULATORS, so
  after P hops each block arrives home carrying its full gradient. dq
  accumulates locally. One fused kernel per step emits dq/dk/dv with a
  single S/P rebuild and inline delta, mirroring pallas_flash's fused
  backward.
- validity is DATA, not statics: zero-padding the token axis would corrupt
  softmax rows (a zero key scores 0, not -inf), and SPMD makes "which block
  holds the ragged tail" a per-device fact no static kernel parameter can
  express. So a lane-oriented (1, 1, 1, pn) additive bias (0 valid / -1e30
  pad) travels the ring alongside K/V and lands on the scores inside the
  kernels. Fully-padded blocks degrade gracefully: their partial lse is
  ~-1e30 + log(nb), which the merge weights to exactly zero.

The reference has nothing here (it materialises (N, N) scores in HBM,
/root/reference/model/vit.py:117-121); this is TPU-native capability beyond
parity. Per-shard K/V blocks are kept to <= 2048 rows (the single-block-K
VMEM ceiling) — longer sequences take more ring shards, which is the point.

Wired into the trunks as `attn_impl='flash_ring'` under `jax.set_mesh` (the
same contract as 'flash_seq'); parity tests on the virtual CPU mesh:
tests/test_ring_flash.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import PartitionSpec as P

from vit_ae_plus_plus_tpu.kernels.pallas_flash import _NEG_INF, _pad_len

_BLOCK_Q = 256  # fwd query block; bwd uses 128 like the fused single-pass kernel


def _ring_fwd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref, *, scale):
    """One (b, h, q_block) against the resident K/V ring block.

    The block's shapes are exact per-shard shards (no ragged K/V edges); the
    only padding is the q block's 128-row edge, whose garbage rows produce
    garbage outputs that Pallas discards on write-back. Invalid KEY columns
    are killed by the additive bias (-1e30), and their V rows are true zeros
    (jnp.pad), so no NaN can form in the PV matmul.
    """
    q = q_ref[:].astype(jnp.float32)  # (BQ, D)
    k = k_ref[:].astype(jnp.float32)  # (NB, D)
    v = v_ref[:].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    s = s + bias_ref[:]  # (1, NB) broadcast over rows
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    # all-invalid block: s == -1e30 everywhere -> p == 1, l == NB > 0 (no 0/0)
    # and lse == -1e30 + log(NB), which the jnp-level merge weights to zero.
    acc = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    o_ref[:] = (acc / l).astype(o_ref.dtype)
    lse_ref[:] = (m + jnp.log(l)).T  # lane-oriented (1, BQ)


def _ring_bwd_kernel(
    q_ref, do_ref, o_ref, lse_ref, k_ref, v_ref, bias_ref,
    dq_ref, dk_ref, dv_ref,
    dk_acc, dv_acc,
    *, scale, block_q, q_len,
):
    """Fused per-step backward, one program per (b, h): loops the local query
    rows in blocks against the resident ring block, emitting dq blocks and
    accumulating dk/dv in f32 scratch (single S/P rebuild, inline delta —
    the same shape as pallas_flash._fused_bwd_kernel). The final query block
    is a ragged 128-row edge: its dead rows are zeroed so they contribute
    nothing to dk/dv. Invalid keys get p == 0 via the bias, and ds == 0, so
    dk/dv rows for padding stay exactly zero."""
    k = k_ref[:].astype(jnp.float32)  # (NB, D)
    v = v_ref[:].astype(jnp.float32)
    bias = bias_ref[:]  # (1, NB)
    pq = q_ref.shape[0]
    nq = pq // block_q

    dk_acc[:] = jnp.zeros_like(dk_acc)
    dv_acc[:] = jnp.zeros_like(dv_acc)

    def body(iq, ragged):
        rs = pl.ds(iq * block_q, block_q)
        q = q_ref[rs, :].astype(jnp.float32)
        do = do_ref[rs, :].astype(jnp.float32)
        o = o_ref[rs, :].astype(jnp.float32)
        lse = lse_ref[:, rs].T  # stored (1, PQ) -> (BQ, 1)
        if ragged:
            row = iq * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, 1), 0
            )
            dead = row >= q_len
            q = jnp.where(dead, 0.0, q)
            do = jnp.where(dead, 0.0, do)
            o = jnp.where(dead, 0.0, o)
        delta = jnp.sum(do * o, axis=-1, keepdims=True)  # (BQ, 1)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale + bias
        p = jnp.exp(s - lse)
        if ragged:
            # dead rows' lse is garbage (never merged): select kills inf/NaN
            p = jnp.where(dead, 0.0, p)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta)
        dq = jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dq_ref[rs, :] = (dq * scale).astype(dq_ref.dtype)
        dv_acc[:] += jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dk_acc[:] += jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return 0

    jax.lax.fori_loop(0, nq - 1, lambda iq, _: body(iq, False), 0)
    body(nq - 1, pq > q_len)
    dk_ref[:] = (dk_acc[:] * scale).astype(dk_ref.dtype)
    dv_ref[:] = dv_acc[:].astype(dv_ref.dtype)


def _partial_fwd(q, k, v, bias, scale, interpret):
    """(B, H, NQ, D) x local (B, H, NB, D) ring block -> o, lse(f32)."""
    b, h, nq, d = q.shape
    nb = k.shape[2]
    block_q = min(_BLOCK_Q, _pad_len(nq, 8))
    seq = lambda rows, im: pl.BlockSpec((None, None, rows, d), im)
    return pl.pallas_call(
        functools.partial(_ring_fwd_kernel, scale=scale),
        grid=(b, h, pl.cdiv(nq, block_q)),
        in_specs=[
            seq(block_q, lambda b, h, i: (b, h, i, 0)),
            seq(nb, lambda b, h, i: (b, h, 0, 0)),
            seq(nb, lambda b, h, i: (b, h, 0, 0)),
            pl.BlockSpec((None, None, 1, nb), lambda b, h, i: (0, 0, 0, 0)),
        ],
        out_specs=[
            seq(block_q, lambda b, h, i: (b, h, i, 0)),
            pl.BlockSpec((None, None, 1, block_q), lambda b, h, i: (b, h, 0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, nq, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, 1, nq), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v, bias)


def _partial_bwd(q, do, o, lse, k, v, bias, scale, interpret):
    b, h, nq, d = q.shape
    nb = k.shape[2]
    block_q = min(128, _pad_len(nq, 8))
    pq = _pad_len(nq, block_q)
    seq = lambda rows: pl.BlockSpec((None, None, rows, d), lambda b, h: (b, h, 0, 0))
    return pl.pallas_call(
        functools.partial(
            _ring_bwd_kernel, scale=scale, block_q=block_q, q_len=nq
        ),
        grid=(b, h),
        in_specs=[
            seq(pq),  # q (ragged when pq > nq)
            seq(pq),  # do
            seq(pq),  # o
            pl.BlockSpec((None, None, 1, pq), lambda b, h: (b, h, 0, 0)),  # lse
            seq(nb),  # k (exact shard, never ragged)
            seq(nb),  # v
            pl.BlockSpec((None, None, 1, nb), lambda b, h: (0, 0, 0, 0)),
        ],
        out_specs=[seq(pq), seq(nb), seq(nb)],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, nq, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, nb, d), k.dtype),
            jax.ShapeDtypeStruct((b, h, nb, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((nb, d), jnp.float32),
            pltpu.VMEM((nb, d), jnp.float32),
        ],
        interpret=interpret,
    )(q, do, o, lse, k, v, bias)


def _merge(o, lse, o_s, lse_s):
    """f32 log-sum-exp combine of two normalised partials (lane-oriented lse)."""
    lse_new = jnp.logaddexp(lse, lse_s)
    w = jnp.exp(lse - lse_new).swapaxes(2, 3)      # (B, H, NQ, 1)
    w_s = jnp.exp(lse_s - lse_new).swapaxes(2, 3)
    return o * w + o_s.astype(jnp.float32) * w_s, lse_new


@functools.lru_cache(maxsize=None)
def _ring_fn(mesh, axis: str, batch_axis, scale, interpret):
    n_shards = mesh.shape[axis]
    perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]
    qspec = P(batch_axis, None, axis, None)
    lspec = P(batch_axis, None, None, axis)  # lse is lane-oriented
    bspec = P(None, None, None, axis)

    def rotate(*xs):
        return [jax.lax.ppermute(x, axis, perm) for x in xs]

    def fwd_body(q, k, v, bias):
        o = lse = None
        for s in range(n_shards):
            o_s, lse_s = _partial_fwd(q, k, v, bias, scale, interpret)
            if o is None:
                o, lse = o_s.astype(jnp.float32), lse_s
            else:
                o, lse = _merge(o, lse, o_s, lse_s)
            if s < n_shards - 1:
                k, v, bias = rotate(k, v, bias)
        return o.astype(q.dtype), lse

    def bwd_body(q, do, o, lse, k, v, bias):
        dq = jnp.zeros(q.shape, jnp.float32)
        dk = jnp.zeros(k.shape, jnp.float32)
        dv = jnp.zeros(v.shape, jnp.float32)
        for s in range(n_shards):
            dq_s, dk_s, dv_s = _partial_bwd(
                q, do, o, lse, k, v, bias, scale, interpret
            )
            dq = dq + dq_s.astype(jnp.float32)
            dk = dk + dk_s.astype(jnp.float32)
            dv = dv + dv_s.astype(jnp.float32)
            # the accumulators travel WITH their block; after the final
            # compute one more hop delivers each block's gradient home
            if s < n_shards - 1:
                k, v, bias, dk, dv = rotate(k, v, bias, dk, dv)
            else:
                dk, dv = rotate(dk, dv)
        return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)

    fwd_sm = jax.shard_map(
        fwd_body, mesh=mesh, in_specs=(qspec, qspec, qspec, bspec),
        out_specs=(qspec, lspec), check_vma=False,
    )
    bwd_sm = jax.shard_map(
        bwd_body, mesh=mesh,
        in_specs=(qspec, qspec, qspec, lspec, qspec, qspec, bspec),
        out_specs=(qspec, qspec, qspec), check_vma=False,
    )

    @jax.custom_vjp
    def attn(q, k, v, bias):
        o, _ = fwd_sm(q, k, v, bias)
        return o

    def attn_fwd(q, k, v, bias):
        o, lse = fwd_sm(q, k, v, bias)
        return o, (q, k, v, bias, o, lse)

    def attn_bwd(res, do):
        q, k, v, bias, o, lse = res
        dq, dk, dv = bwd_sm(q, do, o, lse, k, v, bias)
        return dq, dk, dv, jnp.zeros_like(bias)

    attn.defvjp(attn_fwd, attn_bwd)
    return attn


def ring_flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh,
    axis: str = "model",
    batch_axis: str | None = "data",
    scale: float | None = None,
    interpret: bool | None = None,
):
    """Self-attention over (B, H, N, D) with q AND k/v sharded over
    `mesh[axis]` — per-shard HBM O(N / P) for every operand, softmax exact
    (pad rows carry a -1e30 bias and are sliced off; their cotangents arrive
    as zeros, so every gradient is exact)."""
    if q.shape != k.shape or q.shape != v.shape:
        raise ValueError("ring attention is for self-attention: q/k/v shapes "
                         f"must match, got {q.shape} {k.shape} {v.shape}")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    scale = q.shape[-1] ** -0.5 if scale is None else scale
    n_shards = mesh.shape[axis]
    if batch_axis is not None and mesh.shape.get(batch_axis, 1) == 1:
        batch_axis = None
    n = q.shape[2]
    step = 8 * n_shards
    pn = -(-n // step) * step
    nb = pn // n_shards
    if nb > 2048:
        raise ValueError(
            f"per-shard ring block {nb} rows exceeds the 2048-row single-block"
            f" VMEM ceiling; shard the sequence over more than {n_shards} "
            "devices"
        )
    pad = ((0, 0), (0, 0), (0, pn - n), (0, 0))
    qp, kp, vp = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
    bias = jnp.where(
        jnp.arange(pn) < n, 0.0, _NEG_INF
    ).astype(jnp.float32).reshape(1, 1, 1, pn)
    fn = _ring_fn(mesh, axis, batch_axis, scale, interpret)
    return fn(qp, kp, vp, bias)[:, :, :n]
