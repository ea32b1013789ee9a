"""int8 quantized feature-extraction engine (serving fast path).

The reference extracts SSL features with the f32/f16 trunk under autocast
(/root/reference/utils/feature_extraction.py:33-34); it has no quantized
inference. On TPU v5e the MXU executes int8 x int8 -> int32 at 2x the bf16
rate (394 vs 197 TOPS nominal), so the extraction/serving path — encoder-only
`forward_features`, no gradients — can run its seven Dense projections per
block on int8 operands:

- weights: symmetric per-OUTPUT-channel int8 (absmax / 127), quantized once
  at load (`quantize_params`);
- activations: symmetric per-TOKEN dynamic int8, computed on the fly;
- accumulation in int32, dequantised by the rank-1 outer product of the two
  scales; LayerNorms, attention (the Pallas flash kernel), GELU and the
  residual stream stay bf16/f32.

This is a standalone pure function over the standard checkpoint tree — the
flax module and its params are untouched, so checkpoints need no conversion
and `quantize=False` must reproduce `model.forward_features` exactly (the
wiring-parity test). Quality is validated by feature cosine similarity
against the f32 trunk (tests/test_quant_extract.py).

CLI: `extract-features --quantize int8`.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from vit_ae_plus_plus_tpu.configs import ViTConfig
from vit_ae_plus_plus_tpu.kernels import multihead_attention
from vit_ae_plus_plus_tpu.ops import patchify


def quantize_dense(kernel: jnp.ndarray):
    """(in, out) f32 kernel -> (int8 kernel, (out,) f32 scale)."""
    kernel = kernel.astype(jnp.float32)
    amax = jnp.maximum(jnp.max(jnp.abs(kernel), axis=0), 1e-12)
    scale = amax / 127.0
    w8 = jnp.clip(jnp.round(kernel / scale), -127, 127).astype(jnp.int8)
    return w8, scale


_DENSE_PATHS = ("qkv", "proj", "Dense_0", "Dense_1")


def quantize_params(params: Any) -> Any:
    """Standard trunk param tree -> same tree with every block Dense kernel
    (and the patch-embed projection) replaced by {'w8', 'scale'}; everything
    else (LN, biases, tokens, heads) passes through in f32."""

    def walk(tree, under_dense):
        out = {}
        for name, sub in tree.items():
            if isinstance(sub, dict):
                out[name] = walk(sub, under_dense or name in _DENSE_PATHS
                                 or name == "patch_embed")
            elif name == "kernel" and under_dense:
                w8, scale = quantize_dense(sub)
                out[name] = {"w8": w8, "scale": scale}
            else:
                out[name] = sub
        return out

    return walk(params, False)


def _qdot(x: jnp.ndarray, w, bias: Optional[jnp.ndarray], quantized: bool,
          out_dtype) -> jnp.ndarray:
    """x @ W (+ bias). Quantized: per-token dynamic int8 x per-channel int8
    weight -> int32 accumulate -> dequantise."""
    if not quantized:
        y = jnp.dot(x, w.astype(x.dtype))
    else:
        xf = x.astype(jnp.float32)
        amax = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-12)
        xscale = amax / 127.0
        x8 = jnp.clip(jnp.round(xf / xscale), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            x8, w["w8"],
            (((x8.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = acc.astype(jnp.float32) * xscale * w["scale"]
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)


def _layernorm(x, scale, bias, eps=1e-6):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(x.dtype)


def _block(x, bp, num_heads, attn_impl, quantized, dtype):
    b, n, c = x.shape
    y = _layernorm(x, bp["norm1"]["scale"], bp["norm1"]["bias"])
    qkv = _qdot(y, bp["attn"]["qkv"]["kernel"], bp["attn"]["qkv"]["bias"],
                quantized, dtype)
    qkv = qkv.reshape(b, n, 3, num_heads, c // num_heads)
    q, k, v = (jnp.moveaxis(qkv[:, :, i], 1, 2) for i in range(3))
    attn = multihead_attention(q, k, v, impl=attn_impl)
    attn = jnp.moveaxis(attn, 1, 2).reshape(b, n, c)
    x = x + _qdot(attn, bp["attn"]["proj"]["kernel"], bp["attn"]["proj"]["bias"],
                  quantized, dtype)
    y = _layernorm(x, bp["norm2"]["scale"], bp["norm2"]["bias"])
    y = _qdot(y, bp["mlp"]["Dense_0"]["kernel"], bp["mlp"]["Dense_0"]["bias"],
              quantized, dtype)
    y = jax.nn.gelu(y.astype(jnp.float32), approximate=False).astype(dtype)
    y = _qdot(y, bp["mlp"]["Dense_1"]["kernel"], bp["mlp"]["Dense_1"]["bias"],
              quantized, dtype)
    return x + y


def quant_forward_features(params: Any, cfg: ViTConfig, volume: jnp.ndarray,
                           quantized: bool = True) -> jnp.ndarray:
    """`VisionTransformer3D.forward_features` (models/vit.py:345-358) over the
    standard param tree. `params` must be pre-processed by `quantize_params`
    when `quantized=True`; with `quantized=False` and the raw tree this is
    numerically the f32/bf16 trunk (wiring-parity-tested)."""
    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    x = patchify(volume.astype(dtype), cfg.patch_size)
    x = _qdot(x, params["patch_embed"]["proj"]["kernel"],
              params["patch_embed"]["proj"]["bias"], quantized, dtype)
    b = x.shape[0]
    cls = jnp.broadcast_to(params["cls_token"].astype(dtype), (b, 1, x.shape[-1]))
    x = jnp.concatenate([cls, x], axis=1)
    pos = params.get("pos_embed")
    if pos is None:  # the MAE trunk's sincos table is not a param
        from vit_ae_plus_plus_tpu.ops import get_3d_sincos_pos_embed

        pos = jnp.asarray(get_3d_sincos_pos_embed(
            x.shape[-1], cfg.grid_size, cls_token=True)[None])
    x = x + pos.astype(dtype)
    for i in range(cfg.depth):
        x = _block(x, params[f"blocks_{i}"], cfg.num_heads, cfg.attn_impl,
                   quantized, dtype)
    if cfg.global_pool:
        pooled = jnp.mean(x[:, 1:, :], axis=1)
        return _layernorm(pooled, params["fc_norm"]["scale"],
                          params["fc_norm"]["bias"]).astype(jnp.float32)
    x = _layernorm(x, params["norm"]["scale"], params["norm"]["bias"])
    return x[:, 0].astype(jnp.float32)


def make_quant_feature_fn(cfg: ViTConfig, mesh=None):
    """jitted (qparams, batch) -> features. Two-arg form so the params tree
    stays a runtime argument — required by the AOT engine serializer
    (serving_aot.py), which must lower a function whose weights are inputs,
    not trace-time constants embedded in the executable."""

    def step_fn(qparams, batch):
        return quant_forward_features(qparams, cfg, batch, quantized=True)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        return jax.jit(step_fn, in_shardings=(repl, data), out_shardings=data)
    return jax.jit(step_fn)


def make_quant_feature_step(cfg: ViTConfig, params: Any, mesh=None):
    """jitted (batch,) -> features closure over pre-quantized params
    (the int8 counterpart of train/step.py::make_feature_step)."""
    qparams = quantize_params(jax.tree.map(lambda x: x, params))
    fn = make_quant_feature_fn(cfg, mesh=mesh)
    step = lambda batch: fn(qparams, batch)  # noqa: E731
    step.qparams, step.quant_fn = qparams, fn  # AOT hooks (serving_aot.py)
    return step
