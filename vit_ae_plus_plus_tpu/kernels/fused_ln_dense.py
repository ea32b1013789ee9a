"""Fused LayerNorm -> Dense Pallas kernel (LN+qkv / LN+fc1).

Round-2 lesson (kernels/fused_ln.py, measured): a STANDALONE LayerNorm custom
call loses in-model — XLA amortises the lane-axis stat reductions into the
neighbouring matmul pipelines, and the custom-call boundary forces an extra
HBM materialisation of the normalised activations. The corollary, executed
here: fuse the LN INTO the adjacent projection so the normalised tensor never
exists in HBM at all. Every pre-LN block pairs each LayerNorm with a Dense
(norm1 -> attn.qkv, norm2 -> mlp.Dense_0 — reference model/vit.py:139-144),
so one fused `y = LN(x) @ W + b` op covers the step's entire
convert_reduce/multiply_reduce profiler bucket (~40 ms, BASELINE.md).

Forward (one program per row block; W resident in VMEM across the grid):
    mu/var via MXU ones-matmuls (lane reductions are slow on the VPU),
    ln = ((x - mu) * rstd) * gamma + beta   computed in f32 in VMEM,
    y  = ln.astype(bf16) @ W + b            (f32 accumulation on the MXU).
Residuals: x (already in HBM), mu/rstd lane-oriented (1, R) f32 — the
(..., 1)-shaped alternative pads 128x on TPU.

Backward, ONE kernel, row-structured outputs only:
    dln = dY @ W^T          (MXU, in-kernel — never materialised by XLA)
    g   = dln * gamma
    dx  = rstd * (g - mean(g) - xhat * mean(g * xhat))   (means via MXU ones)
    emits dx AND dln to HBM.
The parameter grads then stay in XLA's fast row direction OUTSIDE the kernel:
    dW     = ln^T @ dY     (ln rematerialised from x/mu/rstd, fused into the
                            matmul's input pipeline by XLA)
    db     = sum_rows dY
    dgamma = sum_rows (dln * xhat),  dbeta = sum_rows dln.
Keeping cross-row accumulations out of the kernel is what makes the op
cleanly shardable: every kernel output is row-partitioned, so the same
custom_partitioning row rule as fused_ln applies and GSPMD inserts the
cross-shard reductions for the XLA-side parameter-grad sums.

Numerics match flax nn.LayerNorm(eps, f32 stats) + nn.Dense(dtype=bf16)
(tests/test_fused_ln_dense.py pins fwd + all five grads against the unfused
pair); dln is accumulated in f32, slightly BETTER than the unfused bf16
chain. TP-compatibility: NOT compatible with a model-sharded W (the kernel
holds the full (C, F) matrix); models under a 'model' axis > 1 keep the
unfused path (models/vit.py gates on the abstract mesh, and train/step.py
rejects packed/auto attention under TP for the same reason).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from vit_ae_plus_plus_tpu.kernels.fused_ln import _def_row_partition, _ones_col

_BLOCK_R = 256


def _lnd_fwd_kernel(x_ref, gamma_ref, beta_ref, w_ref, b_ref,
                    y_ref, mu_ref, rstd_ref, *, eps):
    x = x_ref[:].astype(jnp.float32)  # (BR, C)
    c = x.shape[1]
    ones = _ones_col(c) / c
    mu = jax.lax.dot_general(
        x, ones, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (BR, 1)
    var = jax.lax.dot_general(
        x * x, ones, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) - mu * mu
    rstd = jax.lax.rsqrt(var + eps)
    ln = ((x - mu) * rstd) * gamma_ref[:].astype(jnp.float32) \
        + beta_ref[:].astype(jnp.float32)
    w = w_ref[:]
    acc = jax.lax.dot_general(
        ln.astype(w.dtype), w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BR, F)
    y_ref[:] = (acc.astype(y_ref.dtype)
                + b_ref[:].astype(y_ref.dtype))  # bias add in compute dtype
    mu_ref[:] = mu.T  # (1, BR) lane-oriented residuals
    rstd_ref[:] = rstd.T


def _lnd_bwd_kernel(x_ref, gamma_ref, w_ref, dy_ref, mu_ref, rstd_ref,
                    dx_ref, dln_ref):
    dy = dy_ref[:]
    w = w_ref[:]  # (C, F)
    dln = jax.lax.dot_general(
        dy, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (BR, C) f32
    x = x_ref[:].astype(jnp.float32)
    c = x.shape[1]
    mu = mu_ref[:].T  # (BR, 1)
    rstd = rstd_ref[:].T
    xhat = (x - mu) * rstd
    g = dln * gamma_ref[:].astype(jnp.float32)
    ones = _ones_col(c) / c
    mg = jax.lax.dot_general(
        g, ones, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    mgx = jax.lax.dot_general(
        g * xhat, ones, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    # garbage edge-block rows never reach HBM (Pallas clips the final block
    # to the array extent), and nothing here mixes rows — no masking needed
    dx_ref[:] = (rstd * (g - mg - xhat * mgx)).astype(dx_ref.dtype)
    dln_ref[:] = dln


def _block_r(r: int, c: int, f: int, itemsize: int) -> int:
    """Row-block size bounded so W + double-buffered blocks stay well under
    the 16 MB VMEM scope (W is resident: f32 weights are the parity leg)."""
    budget = 11 * 2**20 - (c * f + c) * itemsize
    per_row = (c + 2 * f) * itemsize + 8 * c  # x + dy/y (2x buf) + f32 temps
    br = max(32, min(_BLOCK_R, budget // max(per_row, 1)))
    br = (br // 32) * 32
    return min(br, ((r + 31) // 32) * 32)


@functools.lru_cache(maxsize=None)
def _fwd_cp(eps, interpret):
    def fn(x2, gamma, beta, w, b):
        r, c = x2.shape
        f = w.shape[1]
        br = _block_r(r, c, f, x2.dtype.itemsize)
        y, mu, rstd = pl.pallas_call(
            functools.partial(_lnd_fwd_kernel, eps=eps),
            grid=(pl.cdiv(r, br),),
            in_specs=[
                pl.BlockSpec((br, c), lambda i: (i, 0)),
                pl.BlockSpec((1, c), lambda i: (0, 0)),
                pl.BlockSpec((1, c), lambda i: (0, 0)),
                pl.BlockSpec((c, f), lambda i: (0, 0)),
                pl.BlockSpec((1, f), lambda i: (0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((br, f), lambda i: (i, 0)),
                pl.BlockSpec((1, br), lambda i: (0, i)),
                pl.BlockSpec((1, br), lambda i: (0, i)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((r, f), x2.dtype),
                jax.ShapeDtypeStruct((1, r), jnp.float32),
                jax.ShapeDtypeStruct((1, r), jnp.float32),
            ],
            interpret=interpret,
        )(x2, gamma, beta, w, b)
        return y, mu, rstd

    return _def_row_partition(
        fn,
        arg_kinds=("row", "repl", "repl", "repl", "repl"),
        out_kinds=("row", "lane", "lane"),
        operand_mappings=(("r", "c"), ("u", "c"), ("u", "c"), ("c", "f"), ("u", "f")),
        result_mappings=(("r", "f"), ("u", "r"), ("u", "r")),
        need_repl=("c", "u", "f"),
    )


@functools.lru_cache(maxsize=None)
def _bwd_cp(interpret):
    def fn(x2, gamma, w, dy2, mu, rstd):
        r, c = x2.shape
        f = w.shape[1]
        br = _block_r(r, c, f, x2.dtype.itemsize)
        return pl.pallas_call(
            _lnd_bwd_kernel,
            grid=(pl.cdiv(r, br),),
            in_specs=[
                pl.BlockSpec((br, c), lambda i: (i, 0)),
                pl.BlockSpec((1, c), lambda i: (0, 0)),
                pl.BlockSpec((c, f), lambda i: (0, 0)),
                pl.BlockSpec((br, f), lambda i: (i, 0)),
                pl.BlockSpec((1, br), lambda i: (0, i)),
                pl.BlockSpec((1, br), lambda i: (0, i)),
            ],
            out_specs=[
                pl.BlockSpec((br, c), lambda i: (i, 0)),
                pl.BlockSpec((br, c), lambda i: (i, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((r, c), x2.dtype),
                jax.ShapeDtypeStruct((r, c), jnp.float32),
            ],
            interpret=interpret,
        )(x2, gamma, w, dy2, mu, rstd)

    return _def_row_partition(
        fn,
        arg_kinds=("row", "repl", "repl", "row", "lane", "lane"),
        out_kinds=("row", "row"),
        operand_mappings=(
            ("r", "c"), ("u", "c"), ("c", "f"), ("r", "f"), ("u", "r"), ("u", "r"),
        ),
        result_mappings=(("r", "c"), ("r", "c")),
        need_repl=("c", "u", "f"),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_ln_dense(x, gamma, beta, w, b, eps: float = 1e-6,
                   interpret: bool = False):
    """y = LayerNorm(x; gamma, beta, eps) @ w + b over the last axis of x.

    x: (..., C) in compute dtype; w: (C, F); gamma/beta: (C,); b: (F,).
    w/b are cast to x.dtype before the matmul (flax nn.Dense(dtype=...)
    semantics); parameter grads come back in the params' own dtype.
    """
    y, _ = _lnd_fwd(x, gamma, beta, w, b, eps, interpret)
    return y


def _lnd_fwd(x, gamma, beta, w, b, eps, interpret):
    shape = x.shape
    c = shape[-1]
    x2 = x.reshape(-1, c)
    wc = w.astype(x.dtype)
    y, mu, rstd = _fwd_cp(eps, interpret)(
        x2, gamma.reshape(1, c), beta.reshape(1, c), wc, b.reshape(1, -1).astype(x.dtype)
    )
    return y.reshape(*shape[:-1], w.shape[1]), (x2, mu, rstd)


def _fused_fwd(x, gamma, beta, w, b, eps, interpret):
    y, res = _lnd_fwd(x, gamma, beta, w, b, eps, interpret)
    return y, (res, gamma, beta, w, x.shape)


def _fused_bwd(eps, interpret, carry, dy):
    (x2, mu, rstd), gamma, beta, w, shape = carry
    c = shape[-1]
    f = w.shape[1]
    dy2 = dy.reshape(-1, f)
    dx, dln = _bwd_cp(interpret)(
        x2, gamma.reshape(1, c), w.astype(x2.dtype), dy2, mu, rstd
    )
    # parameter grads: row reductions / row-space matmuls — XLA's fast
    # direction, and the cross-shard sums GSPMD inserts for free
    xhat = (x2.astype(jnp.float32) - mu.reshape(-1, 1)) * rstd.reshape(-1, 1)
    ln = (xhat * gamma.astype(jnp.float32) + beta.astype(jnp.float32)).astype(x2.dtype)
    dw = jax.lax.dot_general(
        ln, dy2, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    db = jnp.sum(dy2.astype(jnp.float32), axis=0)
    dgamma = jnp.sum(dln * xhat, axis=0)
    dbeta = jnp.sum(dln, axis=0)
    return (
        dx.reshape(shape),
        dgamma.astype(gamma.dtype),
        dbeta.astype(beta.dtype),
        dw.astype(w.dtype),
        db.astype(w.dtype),
    )


fused_ln_dense.defvjp(_fused_fwd, _fused_bwd)
