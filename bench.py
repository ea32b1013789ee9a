"""Headline benchmark: BraTS ViT-AE++ pretraining throughput (volumes/sec/chip).

Runs the full contrastive ViT-B MAE training step (masked recon + Sobel edge
loss + SimSiam contrastive term, AdamW) on synthetic 96^3 single-channel
volumes at the reference workload shape (config.ini [K_FOLD]: patch 8, mask
0.75, batch 4 — we use the largest batch that fits for throughput, as a
production deployment would).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes no numbers (BASELINE.md) and its stack
(torch+CUDA) cannot run here; the baseline denominator is the measured
XLA-attention f32 batch-4 configuration of THIS framework mirroring the
reference's execution style (f32 everywhere, batch 4) — i.e. vs_baseline
reports the speedup of the tuned path (bf16 + flash attention + big batch)
over the parity path on identical hardware.

IMPORTANT (axon platform): block_until_ready does not block; we sync by
pulling a scalar to the host.
"""

import json
import time

import jax
import jax.numpy as jnp

from vit_ae_plus_plus_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def make_step(dtype: str, batch: int, attn_impl: str):
    from vit_ae_plus_plus_tpu.models import MODEL_ZOO, build_model
    from vit_ae_plus_plus_tpu.train import create_train_state, make_adamw, make_train_step

    cfg = MODEL_ZOO["contr_mae_vit_base_patch16"](
        volume_size=96, patch_size=8, in_chans=1, dtype=dtype, attn_impl=attn_impl
    )
    model = build_model(cfg)
    v = jax.random.normal(jax.random.PRNGKey(0), (batch, 1, 96, 96, 96), jnp.float32)
    tx = make_adamw(1e-3, weight_decay=0.05)
    state = create_train_state(
        model, (v, v), tx, {"params": jax.random.PRNGKey(1), "mask": jax.random.PRNGKey(2)}
    )
    step = make_train_step(model, 8, mask_ratio=0.75, contr_weight=0.001, donate=True)
    return step, state, v


def measure(dtype: str, batch: int, attn_impl: str, iters: int = 20) -> float:
    step, state, v = make_step(dtype, batch, attn_impl)
    rng = jax.random.PRNGKey(3)
    w = jnp.float32(0.01)
    # warmup + compile
    state, metrics = step(state, v, v, rng, w)
    float(metrics["loss"])  # sync (axon: block_until_ready is a no-op)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, v, v, rng, w)
    float(metrics["loss"])
    dt = (time.perf_counter() - t0) / iters
    return batch / dt  # volumes/sec


def main():
    # parity-style path: f32, batch 4, XLA attention (how the reference runs)
    base = measure("float32", 4, "xla")
    # tuned TPU path: bf16 compute, flash attention, batch 16
    tuned = measure("bfloat16", 16, "auto")
    print(
        json.dumps(
            {
                "metric": "brats_pretrain_volumes_per_sec_per_chip",
                "value": round(tuned, 2),
                "unit": "volumes/sec",
                "vs_baseline": round(tuned / base, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
