"""Fused LayerNorm for TPU, written in Pallas.

Motivation: the profiler attributes ~40 ms of the 279 ms flagship step to
XLA's LayerNorm fusions (`convert_reduce_fusion` 26.7 ms +
`multiply_reduce_fusion` 14.9 ms — see BASELINE.md); XLA reduces over the
feature (lane) axis with cross-lane vector ops, while these kernels run the
reductions ON THE MXU as matmuls against a ones-vector (x @ 1/C).

MEASURED OUTCOME (round 2): the kernel wins in isolation but LOSES in-model
(headline 53.4 vs 57.3 vol/s when wired into the trunks) — XLA had those LN
reductions fused into neighbouring matmul/convert pipelines, and pulling them
into a custom call forces extra HBM materialisation that outweighs the
reduction win. Kept as a tested drop-in (models/vit.py::FusedLayerNorm) and
as the recorded negative result; the trunks stay on nn.LayerNorm.

Forward:  y = (x - mean) * rsqrt(var + eps) * gamma + beta   over the last
          axis; mean/var in f32 regardless of input dtype (matches
          flax.linen.LayerNorm semantics used throughout the trunks).
Backward: dx = rstd * (g - mean(g) - xhat * mean(g * xhat)),  g = dy * gamma,
          plus per-block partial dgamma/dbeta rows summed outside (XLA's
          cross-block sum of an (nblocks, C) array is cheap).

Self-sharding: custom_partitioning declares the ROW axis (tokens) freely
shardable and the feature axis replicated, so data-parallel (B, N, C)
activations flow straight in under a mesh.

Parity: tests/test_fused_ln.py pins fwd+grads against flax nn.LayerNorm on
CPU (interpret mode) and the module wrapper keeps the same param names
('scale'/'bias'), so checkpoints are unaffected.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.custom_partitioning import SdyShardingRule, custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec

_BLOCK_R = 256


def _ones_col(c: int) -> jnp.ndarray:
    return jnp.ones((c, 1), jnp.float32)


def _ln_fwd_kernel(x_ref, gamma_ref, beta_ref, y_ref, mu_ref, rstd_ref, *, eps, n_rows):
    x = x_ref[:].astype(jnp.float32)  # (BR, C)
    c = x.shape[1]
    ones = _ones_col(c) / c
    # mean/var via MXU matmuls (lane-axis reductions are slow on the VPU)
    mu = jax.lax.dot_general(
        x, ones, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (BR, 1)
    var = jax.lax.dot_general(
        x * x, ones, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) - mu * mu
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (x - mu) * rstd
    y = xhat * gamma_ref[:].astype(jnp.float32) + beta_ref[:].astype(jnp.float32)
    y_ref[:] = y.astype(y_ref.dtype)
    mu_ref[:] = mu.T  # (1, BR) lane-oriented residuals
    rstd_ref[:] = rstd.T


def _ln_bwd_kernel(
    x_ref, gamma_ref, dy_ref, mu_ref, rstd_ref, dx_ref, *, n_rows,
):
    """dx only: the parameter grads (dgamma/dbeta) are ROW reductions, which
    XLA already performs at bandwidth; the slow lane-axis means (mg, mgx)
    happen here on the MXU."""
    x = x_ref[:].astype(jnp.float32)
    dy = dy_ref[:].astype(jnp.float32)
    c = x.shape[1]
    i = pl.program_id(0)
    bq = x.shape[0]
    # mask ragged tail rows (edge-block padding is garbage, incl. residuals)
    row = i * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, 1), 0)
    live = row < n_rows
    x = jnp.where(live, x, 0.0)
    dy = jnp.where(live, dy, 0.0)
    mu = jnp.where(live, mu_ref[:].T, 0.0)  # (BR, 1)
    rstd = jnp.where(live, rstd_ref[:].T, 0.0)
    xhat = (x - mu) * rstd
    g = dy * gamma_ref[:].astype(jnp.float32)
    ones = _ones_col(c) / c
    mg = jax.lax.dot_general(
        g, ones, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    mgx = jax.lax.dot_general(
        g * xhat, ones, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dx_ref[:] = (rstd * (g - mg - xhat * mgx)).astype(dx_ref.dtype)


def _rows(shape):
    r = 1
    for s in shape[:-1]:
        r *= s
    return r


def _bh_row_sharding(mesh, sharding):
    spec = getattr(sharding, "spec", None)
    if spec is None:
        return NamedSharding(mesh, PartitionSpec())
    return NamedSharding(mesh, PartitionSpec(spec[0] if len(spec) else None, None))


def _def_row_partition(fn, arg_kinds, out_kinds, operand_mappings,
                       result_mappings, need_repl):
    """kind per array: 'row' = (r, c) sharded on dim 0, 'lane' = (1, r)
    sharded on dim 1 (the lane-oriented residuals), 'repl' = replicated."""
    cp = custom_partitioning(fn)

    def shardings(mesh, axis, kinds):
        table = {
            "row": NamedSharding(mesh, PartitionSpec(axis, None)),
            "lane": NamedSharding(mesh, PartitionSpec(None, axis)),
            "repl": NamedSharding(mesh, PartitionSpec()),
        }
        return tuple(table[k] for k in kinds)

    def _row_axis(arg_shapes):
        spec = getattr(arg_shapes[0].sharding, "spec", None)
        return spec[0] if spec and len(spec) else None

    def infer(mesh, arg_shapes, result_shape):
        outs = shardings(mesh, _row_axis(arg_shapes), out_kinds)
        return outs if len(out_kinds) > 1 else outs[0]

    def part(mesh, arg_shapes, result_shape):
        axis = _row_axis(arg_shapes)
        outs = shardings(mesh, axis, out_kinds)
        return (
            mesh, fn, (outs if len(out_kinds) > 1 else outs[0]),
            shardings(mesh, axis, arg_kinds),
        )

    cp.def_partition(
        partition=part,
        infer_sharding_from_operands=infer,
        sharding_rule=SdyShardingRule(
            operand_mappings, result_mappings, need_replication_factors=need_repl
        ),
    )
    return cp


@functools.lru_cache(maxsize=None)
def _fwd_cp(eps, interpret):
    def fn(x2, gamma, beta):
        r, c = x2.shape
        br = min(_BLOCK_R, _pad(r))
        y, mu, rstd = pl.pallas_call(
            functools.partial(_ln_fwd_kernel, eps=eps, n_rows=r),
            grid=(pl.cdiv(r, br),),
            in_specs=[
                pl.BlockSpec((br, c), lambda i: (i, 0)),
                pl.BlockSpec((1, c), lambda i: (0, 0)),
                pl.BlockSpec((1, c), lambda i: (0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((br, c), lambda i: (i, 0)),
                pl.BlockSpec((1, br), lambda i: (0, i)),
                pl.BlockSpec((1, br), lambda i: (0, i)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((r, c), x2.dtype),
                jax.ShapeDtypeStruct((1, r), jnp.float32),
                jax.ShapeDtypeStruct((1, r), jnp.float32),
            ],
            interpret=interpret,
        )(x2, gamma, beta)
        return y, mu, rstd

    return _def_row_partition(
        fn,
        arg_kinds=("row", "repl", "repl"),
        out_kinds=("row", "lane", "lane"),
        operand_mappings=(("r", "c"), ("u", "c"), ("u", "c")),
        result_mappings=(("r", "c"), ("u", "r"), ("u", "r")),
        need_repl=("c", "u"),  # rows stay shardable (data-parallel tokens)
    )


@functools.lru_cache(maxsize=None)
def _bwd_cp(interpret):
    def fn(x2, gamma, dy2, mu, rstd):
        r, c = x2.shape
        br = min(_BLOCK_R, _pad(r))
        return pl.pallas_call(
            functools.partial(_ln_bwd_kernel, n_rows=r),
            grid=(pl.cdiv(r, br),),
            in_specs=[
                pl.BlockSpec((br, c), lambda i: (i, 0)),
                pl.BlockSpec((1, c), lambda i: (0, 0)),
                pl.BlockSpec((br, c), lambda i: (i, 0)),
                pl.BlockSpec((1, br), lambda i: (0, i)),
                pl.BlockSpec((1, br), lambda i: (0, i)),
            ],
            out_specs=pl.BlockSpec((br, c), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((r, c), x2.dtype),
            interpret=interpret,
        )(x2, gamma, dy2, mu, rstd)

    return _def_row_partition(
        fn,
        arg_kinds=("row", "repl", "row", "lane", "lane"),
        out_kinds=("row",),
        operand_mappings=(
            ("r", "c"), ("u", "c"), ("r", "c"), ("u", "r"), ("u", "r"),
        ),
        result_mappings=(("r", "c"),),
        need_repl=("c", "u"),
    )


def _pad(n):
    return ((n + 7) // 8) * 8


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_layernorm(x, gamma, beta, eps: float = 1e-6, interpret: bool = False):
    """LayerNorm over the last axis of x (any leading shape)."""
    out, _ = _fwd(x, gamma, beta, eps, interpret)
    return out


def _fwd(x, gamma, beta, eps, interpret):
    shape = x.shape
    c = shape[-1]
    x2 = x.reshape(-1, c)
    y, mu, rstd = _fwd_cp(eps, interpret)(x2, gamma.reshape(1, c), beta.reshape(1, c))
    return y.reshape(shape), (x2, mu, rstd)


def _fused_ln_fwd(x, gamma, beta, eps, interpret):
    y, res = _fwd(x, gamma, beta, eps, interpret)
    return y, (res, gamma, x.shape)


def _fused_ln_bwd(eps, interpret, carry, dy):
    (x2, mu, rstd), gamma, shape = carry
    c = shape[-1]
    dy2 = dy.reshape(-1, c)
    dx = _bwd_cp(interpret)(x2, gamma.reshape(1, c), dy2, mu, rstd)
    # parameter grads: ROW reductions (XLA's fast direction)
    dy_f = dy2.astype(jnp.float32)
    xhat = (x2.astype(jnp.float32) - mu.reshape(-1, 1)) * rstd.reshape(-1, 1)
    dgamma = jnp.sum(dy_f * xhat, axis=0)
    dbeta = jnp.sum(dy_f, axis=0)
    return (
        dx.reshape(shape),
        dgamma.reshape(gamma.shape).astype(gamma.dtype),
        dbeta.reshape(gamma.shape).astype(gamma.dtype),
    )


fused_layernorm.defvjp(_fused_ln_fwd, _fused_ln_bwd)
