"""Blockwise flash attention for TPU, written in Pallas.

Non-causal, no attention mask (the MAE drops masked tokens from the sequence
rather than masking scores — reference model/vit_autoenc.py:157-177), which is
exactly the shape of every attention in this framework:

- masked encoder: N = 433 (1 cls + 432 kept tokens), head_dim 64
- MAE decoder:    N = 1729, head_dim 32
- feature ViT:    N = 1729, head_dim 64

Design (FlashAttention-2 lineage, tuned for these shapes — see BASELINE.md):
- three dispatch tiers by sequence length:
  * N <= 512: GROUPED MULTI-HEAD kernels — one program per (batch,
    head-group) with the whole sequence resident; amortises the per-program
    dispatch/DMA overhead that dominates at small per-head workloads
    (_mh_fwd_kernel / _mh_bwd_kernel);
  * N <= 2048 (padded): SINGLE-BLOCK-K — forward grid (B, H, Nq/BQ) with a
    plain stable softmax (no online rescaling), and a FUSED single-pass
    backward (one program per (b, h) computing dq + dk + dv with a single
    S/P rebuild and inline delta = rowsum(dO * O));
  * larger: classic blockwise online-softmax forward + two-kernel backward
    (dQ grid over Q blocks; dK/dV grid over K blocks).
- PAD-FREE at the fast tiers: inputs/outputs use ragged Pallas edge blocks
  at their native lengths; ragged padding is GARBAGE, so k/v tails and dead
  query rows are masked in-kernel ((rows, 1) broadcast masks).
- lse/delta residuals are stored LANE-oriented as (B, H, 1, N): a trailing
  unit dim would tile-pad 128x in HBM.
- self-sharding: custom_partitioning + SdyShardingRule declare (B, H) freely
  shardable and (N, D) replicated, so data/tensor-parallel operands flow in
  with no ambient mesh (see _def_bh_partition).

All matmuls accumulate in f32 (`preferred_element_type`); inputs may be bf16.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tuned on TPU v5e (see BASELINE.md): BQ=256 amortises per-program overhead;
# the key axis uses a SINGLE block whenever the padded sequence fits in VMEM
# (<= 2048 tokens) — that removes the online-softmax rescaling entirely and
# measured fastest at every shape this framework uses (e.g. decoder
# B16 H16 N1729 D32 fwd+bwd: 16.8 ms vs 21.6 ms XLA). Larger sequences fall
# back to 512-token key blocks with the online-softmax loop.
DEFAULT_BLOCK_Q = 256
DEFAULT_BLOCK_K = 512

# resident q+do bytes above which the dK/dV kernel chunks its query axis
# (see _dkv_kernel); tests lower it to force the chunked path at small shapes
_DKV_RESIDENT_BUDGET = 4 * 1024 * 1024


def _default_blocks(n_kv: int, block_q, block_k, dtype):
    """Resolve None block sizes; must be used identically in fwd and bwd.
    The single-block-K fast path needs ~4 score-sized f32 buffers in VMEM, so
    its ceiling depends on the input dtype (f32 K/V double-buffers too)."""
    if block_q is None:
        # short sequences: one q-block per (b, h) program measured fastest at
        # the encoder shape (B32 H12 N433 D64: 24.4 vs 27.2 ms fwd+bwd x12);
        # long sequences prefer 256 (decoder N1729: 7.5 vs 7.8 ms fwd)
        block_q = 512 if n_kv <= 512 else DEFAULT_BLOCK_Q
    if block_k is None:
        single_max = 2048 if dtype == jnp.bfloat16 else 1024
        pk = _pad_len(n_kv, 256)
        block_k = pk if pk <= single_max else DEFAULT_BLOCK_K
    return block_q, block_k
_NEG_INF = -1e30


def _mask_last_block(s, ik, block_k, kv_len):
    """-inf the padded key columns. No-op for statically-clean blocks (the
    fori_loop prefixes only ever see clean blocks; the ragged tail is always
    invoked with a static python index)."""
    if not isinstance(ik, int):
        return s  # traced index -> guaranteed clean prefix block
    first = ik * block_k
    if first + block_k <= kv_len:
        return s
    key_idx = first + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    return jnp.where(key_idx < kv_len, s, _NEG_INF)


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale, block_k, kv_len):
    """One (b, h, q_block): softmax over key blocks (unrolled static loop;
    masking only on the ragged final block; no rescaling when nk == 1)."""
    q = q_ref[:].astype(jnp.float32)  # (BQ, D)
    bq = q.shape[0]
    nk = k_ref.shape[0] // block_k
    d = v_ref.shape[-1]

    def load(ik):
        k = k_ref[pl.ds(ik * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[pl.ds(ik * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (BQ, BK)
        if isinstance(ik, int) and (ik + 1) * block_k > kv_len:
            # ragged tail may be backed by a ragged Pallas edge block whose
            # padding is GARBAGE (not zeros): p for those columns is exactly 0
            # via the -inf score mask, but 0 * garbage-v could still be NaN in
            # the PV matmul — zero the tail v rows explicitly ((BK, 1) mask
            # broadcast over lanes: a full-shape iota would cost ~1 MB VMEM)
            row = ik * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (v.shape[0], 1), 0
            )
            v = jnp.where(row < kv_len, v, 0.0)
        return _mask_last_block(s, ik, block_k, kv_len), v

    if nk == 1:
        # whole row in one block: plain stable softmax, no online rescaling
        s, v = load(0)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        acc = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
    else:
        # fori_loop over the clean prefix (no masking, buffers reused), then
        # one static final iteration that handles the ragged tail
        def online(ik, acc, m, l):
            s, v = load(ik)
            m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
            alpha = jnp.exp(m - m_new)
            p = jnp.exp(s - m_new)
            l = l * alpha + jnp.sum(p, axis=1, keepdims=True)
            acc = acc * alpha + jax.lax.dot_general(
                p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            return acc, m_new, l

        acc = jnp.zeros((bq, d), jnp.float32)
        m = jnp.full((bq, 1), _NEG_INF, jnp.float32)
        l = jnp.zeros((bq, 1), jnp.float32)
        acc, m, l = jax.lax.fori_loop(
            0, nk - 1, lambda ik, c: online(ik, *c), (acc, m, l)
        )
        acc, m, l = online(nk - 1, acc, m, l)

    o_ref[:] = (acc / l).astype(o_ref.dtype)
    # lse is stored LANE-oriented as (1, BQ): a (B, H, N, 1) residual would
    # tile-pad its unit lane dim 128x in HBM (226 MB instead of 1.8 MB per
    # decoder layer at B16 — seen in the B32 OOM dump); the tiny in-register
    # transpose here buys that back
    lse_ref[:] = (m + jnp.log(l)).T  # (1, BQ)


def _dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, *, scale, block_k, kv_len):
    """dQ for one (b, h, q_block): loop over key blocks."""
    q = q_ref[:].astype(jnp.float32)
    do = do_ref[:].astype(jnp.float32)
    lse = lse_ref[:].T    # stored (1, BQ) lane-oriented -> (BQ, 1)
    delta = delta_ref[:].T  # same
    nk = k_ref.shape[0] // block_k

    def body(ik, dq):
        k = k_ref[pl.ds(ik * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[pl.ds(ik * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        s = _mask_last_block(s, ik, block_k, kv_len)
        p = jnp.exp(s - lse)  # (BQ, BK)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta)
        return dq + jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    # fori_loop over the clean prefix (VMEM buffers reused), static ragged tail
    dq = jax.lax.fori_loop(0, nk - 1, body, jnp.zeros(q.shape, jnp.float32))
    dq = body(nk - 1, dq)
    dq_ref[:] = (dq * scale).astype(dq_ref.dtype)


def _dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
    dk_acc, dv_acc, *, scale, block_q, q_len, chunk,
):
    """dK, dV for one (b, h, k_block, q_chunk): loop over the chunk's query
    blocks, accumulating into f32 scratch that persists across the q-chunk
    grid dim (innermost, so the dk/dv output blocks are revisited
    consecutively and written once on the final chunk).

    The chunking exists for LONG sequences: holding the full padded q/do
    resident per program overflows scoped VMEM at 13,825 tokens x d=32 (the
    lane dim tile-pads 4x, so q alone is 3.6 MB — measured 16.7 MB > 16 MB
    at 192^3/p8, which forced remat_blocks on). A ~2048-row chunk caps
    residency at any N; q/do are re-read once per k-block, ~1 ms of extra
    HBM traffic at the 192^3 shape. Query-padding rows (q >= q_len) are
    masked unconditionally — with a traced chunk offset the ragged block is
    no longer statically identifiable."""
    k = k_ref[:].astype(jnp.float32)  # (BK, D)
    v = v_ref[:].astype(jnp.float32)
    nq = q_ref.shape[0] // block_q
    ic = pl.program_id(3)

    @pl.when(ic == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    chunk_start = ic * chunk

    def body(iq, _):
        q = q_ref[pl.ds(iq * block_q, block_q), :].astype(jnp.float32)
        do = do_ref[pl.ds(iq * block_q, block_q), :].astype(jnp.float32)
        lse = lse_ref[:, pl.ds(iq * block_q, block_q)].T  # (1, CHUNK)-stored
        delta = delta_ref[:, pl.ds(iq * block_q, block_q)].T
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (BQ, BK)
        p = jnp.exp(s - lse)
        # padded query rows contribute nothing (their lse/delta pad is zeros,
        # so p == e^s is finite garbage until this select kills it)
        q_idx = chunk_start + iq * block_q + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, 0
        )
        p = jnp.where(q_idx < q_len, p, 0.0)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta)
        dv_acc[:] += jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dk_acc[:] += jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return 0

    jax.lax.fori_loop(0, nq, body, 0)

    @pl.when(ic == pl.num_programs(3) - 1)
    def _emit():
        dk_ref[:] = (dk_acc[:] * scale).astype(dk_ref.dtype)
        dv_ref[:] = dv_acc[:].astype(dv_ref.dtype)


def _fused_bwd_kernel(
    q_ref, k_ref, v_ref, do_ref, o_ref, lse_ref,
    dq_ref, dk_ref, dv_ref,
    dk_acc, dv_acc,
    *, scale, block_q, kv_len, q_len,
):
    """dQ, dK, dV in ONE pass for the single-block-K layout (whole KV row
    resident in VMEM). One program per (b, h); loops over query blocks,
    writing each dq block and accumulating dk/dv in f32 scratch.

    Versus the classic two-kernel FlashAttention backward (separate dQ and
    dK/dV kernels) this halves the score/p recomputation: S and dP are built
    once per (q, k) block pair instead of twice, and delta = rowsum(dO * O)
    is computed inline instead of in an XLA prepass over (B, H, N, D).

    Ragged edges are Pallas edge blocks whose padding is GARBAGE, so tails
    are masked in-kernel: k/v tail rows are zeroed once (a 0-score column is
    killed by the -inf index mask, but garbage +-inf in k/v would still make
    0 * inf = NaN in the matmuls), and for the final query block p/do/o rows
    past q_len are zeroed so dead queries contribute nothing to dk/dv.
    """
    k = k_ref[:].astype(jnp.float32)  # (PK, D)
    v = v_ref[:].astype(jnp.float32)
    pq, pk = q_ref.shape[0], k.shape[0]
    nq = pq // block_q

    if pk > kv_len:
        kv_row = jax.lax.broadcasted_iota(jnp.int32, (pk, 1), 0) < kv_len
        k = jnp.where(kv_row, k, 0.0)
        v = jnp.where(kv_row, v, 0.0)

    dk_acc[:] = jnp.zeros_like(dk_acc)
    dv_acc[:] = jnp.zeros_like(dv_acc)

    key_mask = (
        jax.lax.broadcasted_iota(jnp.int32, (1, pk), 1) < kv_len
    )  # (1, PK): single K block always carries the ragged tail

    def body(iq, ragged):
        q = q_ref[pl.ds(iq * block_q, block_q), :].astype(jnp.float32)
        do = do_ref[pl.ds(iq * block_q, block_q), :].astype(jnp.float32)
        o = o_ref[pl.ds(iq * block_q, block_q), :].astype(jnp.float32)
        lse = lse_ref[:, pl.ds(iq * block_q, block_q)].T  # (1, PQ)-stored
        if ragged:
            q_row = iq * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (do.shape[0], 1), 0
            )
            dead = q_row >= q_len
            do = jnp.where(dead, 0.0, do)
            o = jnp.where(dead, 0.0, o)
            q = jnp.where(dead, 0.0, q)  # dead rows feed dk via ds^T q
        delta = jnp.sum(do * o, axis=-1, keepdims=True)  # (BQ, 1)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        s = jnp.where(key_mask, s, _NEG_INF)
        p = jnp.exp(s - lse)  # (BQ, PK)
        if ragged:
            # dead rows' lse is garbage: exp may be inf/NaN — select kills it
            p = jnp.where(dead, 0.0, p)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta)
        dq = jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dq_ref[pl.ds(iq * block_q, block_q), :] = (dq * scale).astype(dq_ref.dtype)
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


def _mh_fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale, kv_len):
    """Multi-head forward for SHORT sequences: one program handles a GROUP of
    heads (refs are (G, N, D)), amortising per-program dispatch/DMA overhead
    that dominates when each head's matmuls are only a few MXU tiles (the
    433-token masked encoder: grid (b, h, 1) left ~2/3 of the time in
    per-program overhead). Whole sequence in one block; ragged tails masked
    as in the blockwise kernels."""
    g = q_ref.shape[0]
    pk = k_ref.shape[1]
    key_col = jax.lax.broadcasted_iota(jnp.int32, (1, pk), 1)
    kv_row = jax.lax.broadcasted_iota(jnp.int32, (pk, 1), 0)
    for j in range(g):
        q = q_ref[j].astype(jnp.float32)  # (PQ, D)
        k = k_ref[j].astype(jnp.float32)  # (PK, D)
        v = v_ref[j].astype(jnp.float32)
        if pk > kv_len:
            v = jnp.where(kv_row < kv_len, v, 0.0)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        if pk > kv_len:
            s = jnp.where(key_col < kv_len, s, _NEG_INF)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        acc = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        o_ref[j] = (acc / l).astype(o_ref.dtype)
        lse_ref[j] = (m + jnp.log(l)).T  # (1, PQ) lane-oriented


def _mh_bwd_kernel(
    q_ref, k_ref, v_ref, do_ref, o_ref, lse_ref,
    dq_ref, dk_ref, dv_ref,
    *, scale, kv_len, q_len,
):
    """Multi-head fused backward for short sequences: per head-group program,
    single (N, N) score rebuild, dq/dk/dv all emitted. Masking mirrors
    _fused_bwd_kernel (ragged edge padding is garbage)."""
    g, pq = q_ref.shape[0], q_ref.shape[1]
    pk = k_ref.shape[1]
    key_col = jax.lax.broadcasted_iota(jnp.int32, (1, pk), 1)
    kv_row = jax.lax.broadcasted_iota(jnp.int32, (pk, 1), 0)
    q_row = jax.lax.broadcasted_iota(jnp.int32, (pq, 1), 0)
    ragged_q = pq > q_len
    for j in range(g):
        q = q_ref[j].astype(jnp.float32)
        k = k_ref[j].astype(jnp.float32)
        v = v_ref[j].astype(jnp.float32)
        do = do_ref[j].astype(jnp.float32)
        o = o_ref[j].astype(jnp.float32)
        lse = lse_ref[j].T  # (PQ, 1)
        if pk > kv_len:
            k = jnp.where(kv_row < kv_len, k, 0.0)
            v = jnp.where(kv_row < kv_len, v, 0.0)
        if ragged_q:
            dead = q_row >= q_len
            do = jnp.where(dead, 0.0, do)
            o = jnp.where(dead, 0.0, o)
            q = jnp.where(dead, 0.0, q)
        delta = jnp.sum(do * o, axis=-1, keepdims=True)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        if pk > kv_len:
            s = jnp.where(key_col < kv_len, s, _NEG_INF)
        p = jnp.exp(s - lse)
        if ragged_q:
            p = jnp.where(dead, 0.0, p)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta)
        dq_ref[j] = (
            jax.lax.dot_general(
                ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            ) * scale
        ).astype(dq_ref.dtype)
        dk_ref[j] = (
            jax.lax.dot_general(
                ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
            ) * scale
        ).astype(dk_ref.dtype)
        dv_ref[j] = jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(dv_ref.dtype)


# sequences at or below this length use the multi-head grouped kernels
_MH_MAX_SEQ = 512


def _head_group(h: int, n: int, d: int, dtype) -> int:
    """Heads per program: largest divisor of h whose buffers fit ~8 MB VMEM
    (inputs+outputs, double-buffered by Pallas)."""
    bytes_per_head = 8 * n * max(d, 128) * (2 if dtype == jnp.bfloat16 else 4)
    budget = 8 * 1024 * 1024
    g = max(1, min(h, budget // max(bytes_per_head, 1)))
    while h % g:
        g -= 1
    return g


def _pad_len(n: int, block: int) -> int:
    return ((n + block - 1) // block) * block


def _pad_seq(x: jnp.ndarray, to_len: int) -> jnp.ndarray:
    n = x.shape[-2]
    if n == to_len:
        return x
    pad = [(0, 0)] * x.ndim
    pad[-2] = (0, to_len - n)
    return jnp.pad(x, pad)


def _fwd(q, k, v, scale, block_q, block_k, interpret):
    b, h, n_q, d = q.shape
    n_kv = k.shape[2]

    if block_q is None and block_k is None and n_kv <= _MH_MAX_SEQ:
        # short sequences: grouped multi-head kernel (see _mh_fwd_kernel)
        g = _head_group(h, _pad_len(max(n_q, n_kv), 128), d, q.dtype)
        pq, pk = _pad_len(n_q, 128), _pad_len(n_kv, 128)
        kernel = functools.partial(_mh_fwd_kernel, scale=scale, kv_len=n_kv)
        o, lse = pl.pallas_call(
            kernel,
            grid=(b, h // g),
            in_specs=[
                pl.BlockSpec((None, g, pq, d), lambda b, j: (b, j, 0, 0)),
                pl.BlockSpec((None, g, pk, d), lambda b, j: (b, j, 0, 0)),
                pl.BlockSpec((None, g, pk, d), lambda b, j: (b, j, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((None, g, pq, d), lambda b, j: (b, j, 0, 0)),
                pl.BlockSpec((None, g, 1, pq), lambda b, j: (b, j, 0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((b, h, n_q, d), q.dtype),
                jax.ShapeDtypeStruct((b, h, 1, n_q), jnp.float32),
            ],
            interpret=interpret,
        )(q, k, v)
        return o, (lse, o)

    block_q, block_k = _default_blocks(n_kv, block_q, block_k, q.dtype)
    pq, pk = _pad_len(n_q, block_q), _pad_len(n_kv, block_k)

    if block_k >= n_kv:
        # single-block-K fast path, PAD-FREE: ragged Pallas edge blocks stand
        # in for the explicit jnp.pad/slice pairs (those cost full HBM copies
        # of q/k/v per call); garbage edge padding is masked in-kernel.
        kernel = functools.partial(
            _fwd_kernel, scale=scale, block_k=block_k, kv_len=n_kv
        )
        o, lse = pl.pallas_call(
            kernel,
            grid=(b, h, pl.cdiv(n_q, block_q)),
            in_specs=[
                pl.BlockSpec((None, None, block_q, d), lambda b, h, i: (b, h, i, 0)),
                pl.BlockSpec((None, None, block_k, d), lambda b, h, i: (b, h, 0, 0)),
                pl.BlockSpec((None, None, block_k, d), lambda b, h, i: (b, h, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((None, None, block_q, d), lambda b, h, i: (b, h, i, 0)),
                pl.BlockSpec((None, None, 1, block_q), lambda b, h, i: (b, h, 0, i)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((b, h, n_q, d), q.dtype),
                # lane-oriented (B, H, 1, N): a trailing unit dim would
                # tile-pad 128x in HBM (226 MB/decoder layer at B16)
                jax.ShapeDtypeStruct((b, h, 1, n_q), jnp.float32),
            ],
            interpret=interpret,
        )(q, k, v)
        return o, (lse, o)

    qp, kp, vp = _pad_seq(q, pq), _pad_seq(k, pk), _pad_seq(v, pk)
    grid = (b, h, pq // block_q)
    kernel = functools.partial(_fwd_kernel, scale=scale, block_k=block_k, kv_len=n_kv)
    o, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, None, block_q, d), lambda b, h, i: (b, h, i, 0)),
            pl.BlockSpec((None, None, pk, d), lambda b, h, i: (b, h, 0, 0)),
            pl.BlockSpec((None, None, pk, d), lambda b, h, i: (b, h, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((None, None, block_q, d), lambda b, h, i: (b, h, i, 0)),
            pl.BlockSpec((None, None, 1, block_q), lambda b, h, i: (b, h, 0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, pq, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, 1, pq), jnp.float32),
        ],
        interpret=interpret,
    )(qp, kp, vp)
    return o[:, :, :n_q], (lse, o)


def _bwd(q, k, v, o_padded, lse, do, scale, block_q, block_k, interpret):
    b, h, n_q, d = q.shape
    n_kv = k.shape[2]

    if block_q is None and block_k is None and n_kv <= _MH_MAX_SEQ:
        # short sequences: grouped multi-head fused backward (must mirror the
        # forward's dispatch so lse shapes line up)
        g = _head_group(h, _pad_len(max(n_q, n_kv), 128), d, q.dtype)
        pq, pk = _pad_len(n_q, 128), _pad_len(n_kv, 128)
        kernel = functools.partial(
            _mh_bwd_kernel, scale=scale, kv_len=n_kv, q_len=n_q
        )
        qspec = pl.BlockSpec((None, g, pq, d), lambda b, j: (b, j, 0, 0))
        kspec = pl.BlockSpec((None, g, pk, d), lambda b, j: (b, j, 0, 0))
        dq, dk, dv = pl.pallas_call(
            kernel,
            grid=(b, h // g),
            in_specs=[
                qspec, kspec, kspec, qspec, qspec,
                pl.BlockSpec((None, g, 1, pq), lambda b, j: (b, j, 0, 0)),
            ],
            out_specs=[qspec, kspec, kspec],
            out_shape=[
                jax.ShapeDtypeStruct((b, h, n_q, d), q.dtype),
                jax.ShapeDtypeStruct((b, h, n_kv, d), k.dtype),
                jax.ShapeDtypeStruct((b, h, n_kv, d), v.dtype),
            ],
            interpret=interpret,
        )(q, k, v, do, o_padded, lse)
        return dq, dk, dv

    block_q, block_k = _default_blocks(n_kv, block_q, block_k, q.dtype)
    pq, pk = _pad_len(n_q, block_q), _pad_len(n_kv, block_k)

    if pk == block_k:
        # single-block-K fast path, PAD-FREE (ragged edge blocks, garbage
        # masked in-kernel): one fused kernel computes dq + dk + dv with a
        # single S/P build per (q, k) block pair and inline delta.
        # q-block 128 for the fused kernel: M=128 fills exactly one MXU tile,
        # so the TOTAL tile count equals any larger block choice, while the
        # four (block_q, PK) f32 score buffers stay half the size — the whole
        # kernel then fits scoped VMEM even at PK=2048 with ragged edges.
        block_q = min(block_q, 128)
        pq = _pad_len(n_q, block_q)
        seq_spec = lambda bq: pl.BlockSpec((None, None, bq, d), lambda b, h: (b, h, 0, 0))
        dq, dk, dv = pl.pallas_call(
            functools.partial(
                _fused_bwd_kernel, scale=scale, block_q=block_q, kv_len=n_kv,
                q_len=n_q,
            ),
            grid=(b, h),
            in_specs=[
                seq_spec(pq),  # q (ragged when pq > n_q)
                seq_spec(pk),  # k (ragged when pk > n_kv)
                seq_spec(pk),  # v
                seq_spec(pq),  # do
                seq_spec(pq),  # o
                pl.BlockSpec((None, None, 1, pq), lambda b, h: (b, h, 0, 0)),  # lse
            ],
            out_specs=[seq_spec(pq), seq_spec(pk), seq_spec(pk)],
            out_shape=[
                jax.ShapeDtypeStruct((b, h, n_q, d), q.dtype),
                jax.ShapeDtypeStruct((b, h, n_kv, d), k.dtype),
                jax.ShapeDtypeStruct((b, h, n_kv, d), v.dtype),
            ],
            scratch_shapes=[
                pltpu.VMEM((pk, d), jnp.float32),
                pltpu.VMEM((pk, d), jnp.float32),
            ],
            interpret=interpret,
        )(q, k, v, do, o_padded, lse)
        return dq, dk, dv

    qp, kp, vp = _pad_seq(q, pq), _pad_seq(k, pk), _pad_seq(v, pk)
    dop = _pad_seq(do, pq)

    # delta = rowsum(dO * O) per query row (f32), lane-oriented (b, h, 1, pq)
    # to match the lse storage layout (no 128x unit-lane tile padding)
    delta = jnp.sum(
        dop.astype(jnp.float32) * o_padded.astype(jnp.float32), axis=-1
    )[:, :, None, :]

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale, block_k=block_k, kv_len=n_kv),
        grid=(b, h, pq // block_q),
        in_specs=[
            pl.BlockSpec((None, None, block_q, d), lambda b, h, i: (b, h, i, 0)),
            pl.BlockSpec((None, None, pk, d), lambda b, h, i: (b, h, 0, 0)),
            pl.BlockSpec((None, None, pk, d), lambda b, h, i: (b, h, 0, 0)),
            pl.BlockSpec((None, None, block_q, d), lambda b, h, i: (b, h, i, 0)),
            pl.BlockSpec((None, None, 1, block_q), lambda b, h, i: (b, h, 0, i)),
            pl.BlockSpec((None, None, 1, block_q), lambda b, h, i: (b, h, 0, i)),
        ],
        out_specs=pl.BlockSpec((None, None, block_q, d), lambda b, h, i: (b, h, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, pq, d), q.dtype),
        interpret=interpret,
    )(qp, kp, vp, dop, lse, delta)

    # q-chunking caps per-program VMEM at any sequence length (see
    # _dkv_kernel): ~2048-row chunks, re-padded so chunks divide evenly.
    # Only engage past a resident-size threshold — the q/do blocks tile-pad
    # their lane dim to 128, so the estimate uses max(d, 128); below it the
    # whole q stays resident (one chunk) and the kernel matches the historic
    # zero-overhead behaviour (measured fine at 128^3/d64; the 16 MB scoped
    # ceiling was only hit at 192^3/d32, q+do 7.2 MB resident).
    itemsize = 2 if q.dtype == jnp.bfloat16 else 4
    resident = 2 * pq * max(d, 128) * itemsize  # q + do
    nq_chunks = pl.cdiv(pq, 2048) if resident > _DKV_RESIDENT_BUDGET else 1
    chunk = _pad_len(-(-pq // nq_chunks), block_q)
    pq2 = chunk * nq_chunks
    if pq2 > pq:
        qp, dop = _pad_seq(qp, pq2), _pad_seq(dop, pq2)
        lane_pad = ((0, 0), (0, 0), (0, 0), (0, pq2 - pq))
        lse_p, delta_p = jnp.pad(lse, lane_pad), jnp.pad(delta, lane_pad)
    else:
        lse_p, delta_p = lse, delta

    dk, dv = pl.pallas_call(
        functools.partial(
            _dkv_kernel, scale=scale, block_q=block_q, q_len=n_q, chunk=chunk
        ),
        grid=(b, h, pk // block_k, nq_chunks),
        in_specs=[
            pl.BlockSpec((None, None, chunk, d), lambda b, h, i, c: (b, h, c, 0)),
            pl.BlockSpec((None, None, block_k, d), lambda b, h, i, c: (b, h, i, 0)),
            pl.BlockSpec((None, None, block_k, d), lambda b, h, i, c: (b, h, i, 0)),
            pl.BlockSpec((None, None, chunk, d), lambda b, h, i, c: (b, h, c, 0)),
            pl.BlockSpec((None, None, 1, chunk), lambda b, h, i, c: (b, h, 0, c)),
            pl.BlockSpec((None, None, 1, chunk), lambda b, h, i, c: (b, h, 0, c)),
        ],
        out_specs=[
            pl.BlockSpec((None, None, block_k, d), lambda b, h, i, c: (b, h, i, 0)),
            pl.BlockSpec((None, None, block_k, d), lambda b, h, i, c: (b, h, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, pk, d), k.dtype),
            jax.ShapeDtypeStruct((b, h, pk, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        interpret=interpret,
    )(qp, kp, vp, dop, lse_p, delta_p)

    return dq[:, :, :n_q], dk[:, :, :n_kv], dv[:, :, :n_kv]


# ---------------------------------------------------------------------------
# Self-sharding (VERDICT r1 #7): custom_partitioning over (batch, heads).
#
# The kernel is a single-device program; under a mesh, GSPMD cannot split a
# custom call by itself. These rules declare that the (B, H) axes shard freely
# while (N, D) stay replicated per shard, so a model-parallel qkv (heads split
# over 'model') or data-parallel batch flows STRAIGHT into the kernel — no
# ambient `jax.set_mesh`, no shard_map at the call site. Shardy propagation
# comes from the SdyShardingRule; the partition callback re-lowers the same
# Pallas program on the per-shard shapes.
# ---------------------------------------------------------------------------
from jax.experimental.custom_partitioning import SdyShardingRule, custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec


def _bh_sharding(mesh, sharding):
    """Keep the operand's (batch, head) placement, replicate (seq, depth)."""
    spec = getattr(sharding, "spec", None)
    if spec is None:
        return NamedSharding(mesh, PartitionSpec())
    b = spec[0] if len(spec) > 0 else None
    h = spec[1] if len(spec) > 1 else None
    return NamedSharding(mesh, PartitionSpec(b, h, None, None))


def _def_bh_partition(fn, n_out, operand_mappings, result_mappings, need_repl):
    cp = custom_partitioning(fn)

    def infer(mesh, arg_shapes, result_shape):
        out = _bh_sharding(mesh, arg_shapes[0].sharding)
        return (out,) * n_out if n_out > 1 else out

    def part(mesh, arg_shapes, result_shape):
        shard = _bh_sharding(mesh, arg_shapes[0].sharding)
        out = (shard,) * n_out if n_out > 1 else shard
        return mesh, fn, out, (shard,) * len(arg_shapes)

    cp.def_partition(
        partition=part,
        infer_sharding_from_operands=infer,
        sharding_rule=SdyShardingRule(
            operand_mappings, result_mappings, need_replication_factors=need_repl
        ),
    )
    return cp


@functools.lru_cache(maxsize=None)
def _fwd_cp(scale, block_q, block_k, interpret):
    def fn(q, k, v):
        o, (lse, o_padded) = _fwd(q, k, v, scale, block_q, block_k, interpret)
        return o, lse, o_padded

    return _def_bh_partition(
        fn,
        n_out=3,
        operand_mappings=(("b", "h", "n", "d"),) + (("b", "h", "m", "d"),) * 2,
        result_mappings=(
            # lse is lane-oriented (b, h, 1, n') — factor u is the unit dim
            ("b", "h", "n", "d"), ("b", "h", "u", "p"), ("b", "h", "p", "d"),
        ),
        need_repl=("n", "d", "m", "u", "p"),
    )


@functools.lru_cache(maxsize=None)
def _bwd_cp(scale, block_q, block_k, interpret):
    def fn(q, k, v, o_padded, lse, do):
        return _bwd(q, k, v, o_padded, lse, do, scale, block_q, block_k, interpret)

    return _def_bh_partition(
        fn,
        n_out=3,
        operand_mappings=(
            ("b", "h", "n", "d"),
            ("b", "h", "m", "d"),
            ("b", "h", "m", "d"),
            ("b", "h", "p", "d"),
            ("b", "h", "u", "p"),
            ("b", "h", "n", "d"),
        ),
        result_mappings=(
            ("b", "h", "n", "d"), ("b", "h", "m", "d"), ("b", "h", "m", "d"),
        ),
        need_repl=("n", "d", "m", "p", "u"),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float | None = None,
    block_q: int | None = None,
    block_k: int | None = None,
    interpret: bool = False,
):
    """softmax(q k^T * scale) v over (B, H, N, D), O(N) memory.

    Self-sharding: under a mesh, (B, H) follow the operand sharding and the
    kernel runs per-shard; (N, D) are replicated (see _def_bh_partition)."""
    scale = q.shape[-1] ** -0.5 if scale is None else scale
    out, _, _ = _fwd_cp(scale, block_q, block_k, interpret)(q, k, v)
    return out


def _flash_fwd(q, k, v, scale, block_q, block_k, interpret):
    scale = q.shape[-1] ** -0.5 if scale is None else scale
    out, lse, o_padded = _fwd_cp(scale, block_q, block_k, interpret)(q, k, v)
    return out, (q, k, v, o_padded, lse)


def _flash_bwd(scale, block_q, block_k, interpret, res, do):
    q, k, v, o_padded, lse = res
    scale = q.shape[-1] ** -0.5 if scale is None else scale
    dq, dk, dv = _bwd_cp(scale, block_q, block_k, interpret)(q, k, v, o_padded, lse, do)
    return dq, dk, dv


flash_attention.defvjp(_flash_fwd, _flash_bwd)


# ---------------------------------------------------------------------------
# Local (non-self-sharding) entry: the SAME kernels without the
# custom_partitioning wrapper. custom_partitioning ops are not legal inside
# manual shard_map axes, so per-stage callers — the GPipe pipeline
# (parallel/pp.py) runs attention inside a shard_map over 'pipe' — use this
# variant; each shard computes its local (B, H, N, D) block independently.
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def flash_attention_local(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float | None = None,
    block_q: int | None = None,
    block_k: int | None = None,
    interpret: bool = False,
):
    scale = q.shape[-1] ** -0.5 if scale is None else scale
    out, _ = _fwd(q, k, v, scale, block_q, block_k, interpret)
    return out


def _flash_local_fwd(q, k, v, scale, block_q, block_k, interpret):
    scale = q.shape[-1] ** -0.5 if scale is None else scale
    out, (lse, o_padded) = _fwd(q, k, v, scale, block_q, block_k, interpret)
    return out, (q, k, v, o_padded, lse)


def _flash_local_bwd(scale, block_q, block_k, interpret, res, do):
    q, k, v, o_padded, lse = res
    scale = q.shape[-1] ** -0.5 if scale is None else scale
    return _bwd(q, k, v, o_padded, lse, do, scale, block_q, block_k, interpret)


flash_attention_local.defvjp(_flash_local_fwd, _flash_local_bwd)
