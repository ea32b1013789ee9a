"""Packed-I/O flash attention: qkv stays in the projection's (B, N, 3C) layout.

Motivation (profiler, BASELINE.md): the (B, H, N, d) tensors the standard
kernel consumes cost real step time at the decoder's head_dim 32 —
`slice_bitcast` fusions splitting qkv into per-head tensors (11.5 ms/step),
their backward re-assembly copies, and 4x lane padding in HBM (d=32 on a
128-lane tile). This variant consumes the fused qkv Dense's OUTPUT directly:
(B, N, 3C) with C = H*d contiguous lanes — unpadded in HBM, no transposes,
no per-head HBM tensors. Mosaic only allows minor-dim blocks that are
128-divisible, so the grid blocks the lane dim in 128-lane groups
(= 128//d heads per program) and extracts each head with a static in-VMEM
lane slice; dq/dk/dv come back as three (B, N, C) arrays that XLA
concatenates for the projection's backward (one cheap lane-concat).

Scope: single-block-K sequences (padded N <= 2048 — every framework shape)
and head_dim in {32, 64, 128} (128 % d == 0). Math identical to
pallas_flash: f32 softmax, -inf index masking of ragged tails, lane-oriented
lse, fused single-pass backward. Self-sharding: batch shardable; the packed
lane dim is declared replicated (a contiguous lane shard would mix the q/k/v
sections) — tensor-parallel runs use the standard per-head flash path.

Wired into models/vit.py::Attention via attn_impl='flash_packed'; see
BASELINE.md for the in-model measurement.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.experimental.custom_partitioning import SdyShardingRule, custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec

from vit_ae_plus_plus_tpu.kernels.pallas_flash import _NEG_INF, _pad_len

_BLOCK_Q = 128
_GROUP_LANES = 128  # Mosaic's minimum lane-block granularity


def _pk_fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale, head_dim, seq_len):
    """One (b, lane-group): 128//d heads, whole sequence resident.

    q/k/v refs: (PN, 128) lane-group slices of the packed (B, N, 3C) tensor.
    """
    pn = q_ref.shape[0]
    d = head_dim
    hpg = _GROUP_LANES // d
    nq = pn // _BLOCK_Q

    kv_dead = None
    if pn > seq_len:
        kv_dead = jax.lax.broadcasted_iota(jnp.int32, (pn, 1), 0) >= seq_len
    key_mask = jax.lax.broadcasted_iota(jnp.int32, (1, pn), 1) < seq_len

    for hg in range(hpg):
        sl = slice(hg * d, (hg + 1) * d)
        k = k_ref[:, sl].astype(jnp.float32)  # (PN, d)
        v = v_ref[:, sl].astype(jnp.float32)
        if kv_dead is not None:
            v = jnp.where(kv_dead, 0.0, v)

        def q_block(iq, _):
            q = q_ref[pl.ds(iq * _BLOCK_Q, _BLOCK_Q), sl].astype(jnp.float32)
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            ) * scale
            if pn > seq_len:
                s = jnp.where(key_mask, s, _NEG_INF)
            m = jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=1, keepdims=True)
            acc = jax.lax.dot_general(
                p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            o_ref[pl.ds(iq * _BLOCK_Q, _BLOCK_Q), sl] = (acc / l).astype(o_ref.dtype)
            lse_ref[hg, :, pl.ds(iq * _BLOCK_Q, _BLOCK_Q)] = (m + jnp.log(l)).T
            return 0

        jax.lax.fori_loop(0, nq, q_block, 0)


def _pk_bwd_kernel(
    q_ref, k_ref, v_ref, o_ref, lse_ref, do_ref,
    dq_ref, dk_ref, dv_ref,
    dk_acc, dv_acc,
    *, scale, head_dim, seq_len,
):
    """One (b, lane-group): fused dq+dk+dv for 128//d heads."""
    pn = q_ref.shape[0]
    d = head_dim
    hpg = _GROUP_LANES // d
    nq = pn // _BLOCK_Q

    ragged = pn > seq_len
    key_mask = jax.lax.broadcasted_iota(jnp.int32, (1, pn), 1) < seq_len
    kv_dead = jax.lax.broadcasted_iota(jnp.int32, (pn, 1), 0) >= seq_len

    for hg in range(hpg):
        sl = slice(hg * d, (hg + 1) * d)
        k = k_ref[:, sl].astype(jnp.float32)
        v = v_ref[:, sl].astype(jnp.float32)
        if ragged:
            k = jnp.where(kv_dead, 0.0, k)
            v = jnp.where(kv_dead, 0.0, v)
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

        def body(iq, is_tail):
            rs = pl.ds(iq * _BLOCK_Q, _BLOCK_Q)
            q = q_ref[rs, sl].astype(jnp.float32)
            do = do_ref[rs, sl].astype(jnp.float32)
            o = o_ref[rs, sl].astype(jnp.float32)
            lse = lse_ref[hg, :, rs].T  # stored (1, PN) -> (BQ, 1)
            if is_tail:
                row = iq * _BLOCK_Q + jax.lax.broadcasted_iota(
                    jnp.int32, (_BLOCK_Q, 1), 0
                )
                dead = row >= seq_len
                q = jnp.where(dead, 0.0, q)
                do = jnp.where(dead, 0.0, do)
                o = jnp.where(dead, 0.0, o)
            delta = jnp.sum(do * o, axis=-1, keepdims=True)
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            ) * scale
            s = jnp.where(key_mask, s, _NEG_INF)
            p = jnp.exp(s - lse)
            if is_tail:
                p = jnp.where(dead, 0.0, p)
            dp = jax.lax.dot_general(
                do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            ds = p * (dp - delta)
            dq = jax.lax.dot_general(
                ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            dq_ref[rs, sl] = (dq * scale).astype(dq_ref.dtype)
            dv_acc[:] += jax.lax.dot_general(
                p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            dk_acc[:] += jax.lax.dot_general(
                ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            return 0

        jax.lax.fori_loop(0, nq - 1, lambda iq, _: body(iq, False), 0)
        body(nq - 1, ragged)
        dk_ref[:, sl] = (dk_acc[:] * scale).astype(dk_ref.dtype)
        dv_ref[:, sl] = dv_acc[:].astype(dv_ref.dtype)


def _check(n, c, head_dim):
    if _GROUP_LANES % head_dim:
        raise ValueError(f"head_dim {head_dim} must divide {_GROUP_LANES}")
    if c % _GROUP_LANES:
        raise ValueError(f"C={c} must be a multiple of {_GROUP_LANES}")
    if _pad_len(n, _BLOCK_Q) > 2048:
        raise ValueError(f"packed kernel supports padded N <= 2048, got {n}")


def _packed_fwd(qkv, scale, head_dim, interpret):
    b, n, c3 = qkv.shape
    c = c3 // 3
    nh = c // head_dim
    pn = _pad_len(n, _BLOCK_Q)
    groups = c // _GROUP_LANES
    hpg = _GROUP_LANES // head_dim
    o, lse = pl.pallas_call(
        functools.partial(
            _pk_fwd_kernel, scale=scale, head_dim=head_dim, seq_len=n
        ),
        grid=(b, groups),
        in_specs=[
            pl.BlockSpec((None, pn, _GROUP_LANES), lambda b, g: (b, 0, g)),
            pl.BlockSpec((None, pn, _GROUP_LANES),
                         lambda b, g, _c=c // _GROUP_LANES: (b, 0, _c + g)),
            pl.BlockSpec((None, pn, _GROUP_LANES),
                         lambda b, g, _c=c // _GROUP_LANES: (b, 0, 2 * _c + g)),
        ],
        out_specs=[
            pl.BlockSpec((None, pn, _GROUP_LANES), lambda b, g: (b, 0, g)),
            pl.BlockSpec((None, hpg, 1, pn), lambda b, g: (b, g, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, c), qkv.dtype),
            jax.ShapeDtypeStruct((b, nh, 1, n), jnp.float32),
        ],
        interpret=interpret,
    )(qkv, qkv, qkv)
    return o, lse


def _packed_bwd(qkv, o, lse, do, scale, head_dim, interpret):
    b, n, c3 = qkv.shape
    c = c3 // 3
    pn = _pad_len(n, _BLOCK_Q)
    groups = c // _GROUP_LANES
    hpg = _GROUP_LANES // head_dim
    qkv_spec = lambda t: pl.BlockSpec(
        (None, pn, _GROUP_LANES), lambda b, g, _t=t, _c=groups: (b, 0, _t * _c + g)
    )
    oc_spec = pl.BlockSpec((None, pn, _GROUP_LANES), lambda b, g: (b, 0, g))
    dq, dk, dv = pl.pallas_call(
        functools.partial(
            _pk_bwd_kernel, scale=scale, head_dim=head_dim, seq_len=n
        ),
        grid=(b, groups),
        in_specs=[
            qkv_spec(0), qkv_spec(1), qkv_spec(2),
            oc_spec,
            pl.BlockSpec((None, hpg, 1, pn), lambda b, g: (b, g, 0, 0)),
            oc_spec,
        ],
        out_specs=[oc_spec, oc_spec, oc_spec],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, c), qkv.dtype),
            jax.ShapeDtypeStruct((b, n, c), qkv.dtype),
            jax.ShapeDtypeStruct((b, n, c), qkv.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((pn, head_dim), jnp.float32),
            pltpu.VMEM((pn, head_dim), jnp.float32),
        ],
        interpret=interpret,
    )(qkv, qkv, qkv, o, lse, do)
    return dq, dk, dv


# -- self-sharding: batch shardable ONLY. The (B, N, 3C) lane dim cannot be
# partitioned meaningfully (a contiguous lane shard would mix q, k and v
# sections), so tensor-parallel runs use the standard per-head flash path.
def _axes_of(arg_shapes):
    spec = getattr(arg_shapes[0].sharding, "spec", None)
    bax = spec[0] if spec and len(spec) else None
    return bax, None


def _def_packed_partition(fn, out_kinds, operand_mappings, result_mappings, need_repl):
    cp = custom_partitioning(fn)

    def mk(mesh, bax, cax, kind):
        if kind in ("qkv", "o"):
            return NamedSharding(mesh, PartitionSpec(bax, None, cax))
        # lse (b, nh, 1, n): a C shard owns a head subset -> heads shard too
        return NamedSharding(mesh, PartitionSpec(bax, cax, None, None))

    def kind_of(s):
        return "lse" if s.ndim == 4 else "o"

    def infer(mesh, arg_shapes, result_shape):
        bax, cax = _axes_of(arg_shapes)
        outs = tuple(mk(mesh, bax, cax, k) for k in out_kinds)
        return outs if len(out_kinds) > 1 else outs[0]

    def part(mesh, arg_shapes, result_shape):
        bax, cax = _axes_of(arg_shapes)
        args = tuple(mk(mesh, bax, cax, kind_of(s)) for s in arg_shapes)
        outs = tuple(mk(mesh, bax, cax, k) for k in out_kinds)
        return mesh, fn, (outs if len(out_kinds) > 1 else outs[0]), args

    cp.def_partition(
        partition=part,
        infer_sharding_from_operands=infer,
        sharding_rule=SdyShardingRule(
            operand_mappings, result_mappings, need_replication_factors=need_repl
        ),
    )
    return cp


@functools.lru_cache(maxsize=None)
def _fwd_cp(scale, head_dim, interpret):
    def fn(qkv):
        return _packed_fwd(qkv, scale, head_dim, interpret)

    return _def_packed_partition(
        fn,
        out_kinds=("o", "lse"),
        operand_mappings=(("b", "n", "e"),),
        result_mappings=(("b", "n", "c"), ("b", "h", "u", "n")),
        need_repl=("n", "e", "c", "h", "u"),
    )


@functools.lru_cache(maxsize=None)
def _bwd_cp(scale, head_dim, interpret):
    def fn(qkv, o, lse, do):
        return _packed_bwd(qkv, o, lse, do, scale, head_dim, interpret)

    return _def_packed_partition(
        fn,
        out_kinds=("o", "o", "o"),
        operand_mappings=(
            ("b", "n", "e"), ("b", "n", "c"), ("b", "h", "u", "n"), ("b", "n", "c"),
        ),
        result_mappings=(("b", "n", "c"), ("b", "n", "c"), ("b", "n", "c")),
        need_repl=("n", "e", "c", "h", "u"),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def packed_flash_attention(
    qkv: jnp.ndarray,
    head_dim: int,
    scale: float | None = None,
    interpret: bool = False,
):
    """qkv (B, N, 3C) (the fused projection's output) -> (B, N, C)."""
    _check(qkv.shape[1], qkv.shape[2] // 3, head_dim)
    scale = head_dim ** -0.5 if scale is None else scale
    o, _ = _fwd_cp(scale, head_dim, interpret)(qkv)
    return o


def _vjp_fwd(qkv, head_dim, scale, interpret):
    _check(qkv.shape[1], qkv.shape[2] // 3, head_dim)
    scale = head_dim ** -0.5 if scale is None else scale
    o, lse = _fwd_cp(scale, head_dim, interpret)(qkv)
    return o, (qkv, o, lse)


def _vjp_bwd(head_dim, scale, interpret, res, do):
    qkv, o, lse = res
    scale = head_dim ** -0.5 if scale is None else scale
    dq, dk, dv = _bwd_cp(scale, head_dim, interpret)(qkv, o, lse, do)
    return (jnp.concatenate([dq, dk, dv], axis=-1),)


packed_flash_attention.defvjp(_vjp_fwd, _vjp_bwd)
