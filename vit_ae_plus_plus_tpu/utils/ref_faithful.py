"""The reference-faithful benchmark leg: execute what the reference executes.

The headline `vs_baseline` compares the tuned TPU path against a
"parity-style" leg that mirrors the reference's *configuration* (f32, batch
4, materialised-scores attention) but still benefits from every algorithmic
choice this framework made (separable MXU filters, batched two-view encoder,
loss kept in patch space, no per-step host sync). This module instead builds
a step that is faithful to the reference's per-iteration COMPUTATION GRAPH
(/root/reference/model/vit_autoenc.py:205-285,
utils/train_one_epoch.py:40-105), so `vs_reference_faithful` measures "this
framework vs the reference's algorithm on identical TPU hardware":

- two SEQUENTIAL encoder passes (view1 then view2), not the batched 2B trick
  (vit_autoenc.py:272,277);
- XLA attention with the (B, H, N, N) score tensor materialised in HBM
  (model/vit.py:117-121), f32 everywhere, batch 4 (config.ini:28);
- target patchified AND unpatchified every step even though unpatchify∘
  patchify is the identity (vit_autoenc.py:211,221);
- the target blurred by the DENSE 11^3 Gaussian conv — 1331 MACs/voxel —
  exactly as gaussian_filter.py:16-26 (not the separable 33-MAC rewrite);
- Sobel edge maps via the 1->3-channel 3^3 lax.conv (sobel_filter.py:12-45),
  not the banded-matmul path;
- the edge-map MSE computed TWICE, as the reference's eager code does
  (vit_autoenc.py:224-225) — an optimization_barrier stops XLA from CSE-ing
  the duplicate the way torch's eager mode cannot;
- the VGG16 perceptual forward executed under no-grad EVERY step: the
  reference evaluates `self.perceptual_weight * self.perceptual_loss(...)`
  before multiplying by the (default 0) weight (vit_autoenc.py:229-230), so
  the full fold-depth-into-batch VGG forward over both volumes runs each
  iteration regardless. Weights are random here (no egress for the
  checkpoint) — identical FLOPs/layout, which is all a throughput
  denominator needs;
- a HOST SYNC every iteration: the loop must pull the loss scalar to the
  host per step (loss.item() at train_one_epoch.py:60 plus the explicit
  `torch.cuda.synchronize()` at :76), done by the caller via
  `float(metrics["loss"])`. `torch.cuda.empty_cache()` (:105) has no JAX
  equivalent (XLA owns memory) and is charged at zero cost here — the
  measured ratio is therefore a LOWER bound on the real gap.

What is deliberately NOT reproduced: the host input pipeline. On this dev
box H2D rides a ~45 MB/s tunnel (BASELINE.md), so a streamed faithful leg
would measure the tunnel, not the reference; the faithful step runs on
resident tensors, which again only UNDERSTATES the reference's true
per-step cost (its DataLoader + torchio augmentation is charged at zero).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from vit_ae_plus_plus_tpu.ops import (
    masked_mse_loss,
    negative_cosine_loss,
    patchify,
    unpatchify,
)
from vit_ae_plus_plus_tpu.ops.filters import (
    gaussian_blur_3d_dense,
    sobel_edges_3d_conv,
)
from vit_ae_plus_plus_tpu.train.state import TrainState


def make_reference_faithful_step(
    model,
    patch_size: int,
    *,
    mask_ratio: float = 0.75,
    contr_weight: float = 0.001,
    run_vgg: bool = True,
    donate: bool = True,
):
    """Build `step(state, view1, view2, rng, edge_map_weight) -> (state, metrics)`
    executing the reference's per-iteration graph (see module docstring).
    The caller's loop must sync per iteration (`float(metrics["loss"])`)."""
    perceptual_fn = None
    if run_vgg:
        from vit_ae_plus_plus_tpu.models.vgg import build_perceptual

        _, _, perceptual_fn = build_perceptual(None)

    def forward(mdl, view1, view2):
        # sequential two-pass forward, reference ContrastiveMAEViT.forward
        # (vit_autoenc.py:270-285)
        latent, mask, ids_restore = mdl.forward_encoder(view1, mask_ratio)
        pred = mdl.forward_decoder(latent, ids_restore)
        latent2, _, _ = mdl.forward_encoder(view2, mask_ratio)
        z1 = latent.reshape(-1, latent.shape[-1])
        z2 = latent2.reshape(-1, latent2.shape[-1])
        p1, p2, z1, z2 = mdl.heads(z1, z2, train=True, apply_proj=False)
        return pred, mask, p1, p2, jax.lax.stop_gradient(z1), jax.lax.stop_gradient(z2)

    def step_fn(state: TrainState, view1, view2, rng, edge_map_weight):
        rng1 = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            variables = {"params": params}
            kwargs = {}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
                kwargs["mutable"] = ["batch_stats"]
            result = model.apply(
                variables, view1, view2, method=forward, rngs={"mask": rng1}, **kwargs
            )
            (pred, mask, p1, p2, z1, z2), mutated = (
                result if kwargs else (result, {})
            )
            pred = pred.astype(jnp.float32)
            target = patchify(view1.astype(jnp.float32), patch_size)

            # unpatchify BOTH pred and target (vit_autoenc.py:221) — the
            # target round-trip is the identity but the reference pays it
            pred_vol = unpatchify(pred, patch_size)
            target_vol = unpatchify(target, patch_size)

            blurred = gaussian_blur_3d_dense(target_vol, 2.0)
            pred_edges = sobel_edges_3d_conv(pred_vol)
            target_edges = sobel_edges_3d_conv(blurred)
            raw_edge = jnp.mean((pred_edges - target_edges) ** 2)
            # the duplicated eager F.mse_loss (vit_autoenc.py:224-225);
            # barrier so XLA cannot CSE what torch cannot
            pe2, te2 = jax.lax.optimization_barrier((pred_edges, target_edges))
            edge_loss = edge_map_weight * jnp.mean((pe2 - te2) ** 2)

            recon = masked_mse_loss(pred, target, mask)

            if perceptual_fn is not None:
                # executed every step, gradient-free, result multiplied by
                # the default-0 weight AFTER the forward (vit_autoenc.py:229)
                percep = jax.lax.stop_gradient(perceptual_fn(pred_vol, target_vol))
            else:
                percep = jnp.float32(0.0)

            contr = contr_weight * negative_cosine_loss(p1, p2, z1, z2)
            total = edge_loss + recon + contr
            metrics = {
                "loss": total,
                "edge_map_loss": raw_edge,
                "reconstruction_loss": recon,
                # keep the VGG forward live in the graph (metrics output),
                # exactly as torch keeps it live by executing eagerly
                "perceptual_loss": percep,
                "contr_loss": contr,
            }
            return total, (metrics, mutated.get("batch_stats", state.batch_stats))

        (_, (metrics, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        state = state.apply_gradients(grads)
        state = state.replace(batch_stats=new_bs)
        return state, metrics

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())
