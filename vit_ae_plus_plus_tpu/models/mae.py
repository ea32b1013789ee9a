"""3D Masked Autoencoder, TPU-first.

Parity: reference MaskedAutoencoderViT / ContrastiveMAEViT
(/root/reference/model/vit_autoenc.py:14-285). Architectural mapping:

- fixed (non-learned) 3D sincos pos-embed tables for encoder + decoder,
  grid size round(num_patches^(1/3)) (vit_autoenc.py:65-77) — baked as
  constants into the compiled graph, not parameters;
- random 75% masking by argsort of uniform noise (ops.random_masking);
- encoder: cls token + kept tokens through `depth` blocks + LayerNorm;
- decoder: Dense embed, mask-token scatter via inverse permutation
  (ops.restore_tokens), decoder pos-embed, `decoder_depth` blocks,
  per-patch pixel regression head, cls dropped;
- contrastive variant: second view through the encoder only, per-token
  flattened latents (B*(len_keep+1), D) fed to a SimSiam predictor; the
  optional 3-layer projector is built but NOT applied in forward — a
  reference quirk kept for parity (vit_autoenc.py:253-262 vs :270-285).

The model returns raw tensors; the composite loss (masked MSE + Sobel edge +
perceptual metric + contrastive) is assembled in train/objective.py so the
whole thing fuses into one jitted/pjit'ed XLA graph.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from vit_ae_plus_plus_tpu.configs import MAEConfig
from vit_ae_plus_plus_tpu.models.vit import (
    Block,
    ContrastiveHeads,
    PatchEmbed3D,
    dense_init,
    token_init,
    _dt,
)
from vit_ae_plus_plus_tpu.ops import get_3d_sincos_pos_embed, random_masking, restore_tokens


class MaskedAutoencoderViT3D(nn.Module):
    cfg: MAEConfig

    def setup(self):
        c = self.cfg
        dtype = _dt(c.dtype)
        block_cls = nn.remat(Block) if c.remat_blocks else Block
        grid = round(c.num_patches ** (1 / 3))

        # encoder
        self.patch_embed = PatchEmbed3D(c.patch_size, c.embed_dim, dtype=dtype)
        self.cls_token = self.param("cls_token", token_init, (1, 1, c.embed_dim))
        self.pos_embed = jnp.asarray(
            get_3d_sincos_pos_embed(c.embed_dim, grid, cls_token=True)[None], jnp.float32
        )
        self.blocks = [
            block_cls(c.num_heads, c.mlp_ratio, attn_impl=c.attn_impl, dtype=dtype,
                      ln_fusion=c.ln_fusion,
                      ln_dtype=getattr(c, "ln_dtype", "float32"),
                      batch_constraint=c.batch_shard_activations,
                      name=f"blocks_{i}")
            for i in range(c.depth)
        ]
        self.norm = nn.LayerNorm(epsilon=1e-6, dtype=dtype)

        # decoder
        self.decoder_embed = nn.Dense(c.decoder_embed_dim, kernel_init=dense_init, dtype=dtype)
        self.mask_token = self.param("mask_token", token_init, (1, 1, c.decoder_embed_dim))
        self.decoder_pos_embed = jnp.asarray(
            get_3d_sincos_pos_embed(c.decoder_embed_dim, grid, cls_token=True)[None], jnp.float32
        )
        self.decoder_blocks = [
            block_cls(
                c.decoder_num_heads,
                c.mlp_ratio,
                attn_impl=c.attn_impl,
                dtype=dtype,
                ln_fusion=c.ln_fusion,
                ln_dtype=getattr(c, "ln_dtype", "float32"),
                batch_constraint=c.batch_shard_activations,
                name=f"decoder_blocks_{i}",
            )
            for i in range(c.decoder_depth)
        ]
        self.decoder_norm = nn.LayerNorm(epsilon=1e-6, dtype=dtype)
        self.decoder_pred = nn.Dense(c.patch_dim, kernel_init=dense_init, dtype=dtype)

        if c.contrastive:
            self.heads = ContrastiveHeads(c.embed_dim, use_proj=c.use_proj, dtype=dtype)

    def forward_encoder(self, x, mask_ratio: float, noise: Optional[jnp.ndarray] = None):
        """(B, C, S, S, S) -> latent (B, 1+len_keep, D), mask, ids_restore.

        Parity: reference vit_autoenc.py:157-177.
        """
        x = self.patch_embed(x)
        x = x + self.pos_embed[:, 1:, :].astype(x.dtype)
        if noise is None and mask_ratio > 0:
            noise = jax.random.uniform(self.make_rng("mask"), x.shape[:2])
        if mask_ratio > 0:
            x, mask, ids_restore = random_masking(x, mask_ratio, noise=noise)
        else:
            b, l, _ = x.shape
            mask = jnp.zeros((b, l), x.dtype)
            ids_restore = jnp.broadcast_to(jnp.arange(l), (b, l))
        cls = self.cls_token.astype(x.dtype) + self.pos_embed[:, :1, :].astype(x.dtype)
        x = jnp.concatenate([jnp.broadcast_to(cls, (x.shape[0], 1, x.shape[-1])), x], axis=1)
        for blk in self.blocks:
            x = blk(x)
        x = self.norm(x)
        return x, mask, ids_restore

    def forward_decoder(self, latent, ids_restore):
        """latent (B, 1+len_keep, D) -> pred (B, L, p^3*C).

        Parity: reference vit_autoenc.py:179-203.
        """
        x = self.decoder_embed(latent)
        x_ = restore_tokens(x[:, 1:, :], self.mask_token, ids_restore)
        x = jnp.concatenate([x[:, :1, :], x_], axis=1)
        x = x + self.decoder_pos_embed.astype(x.dtype)
        for blk in self.decoder_blocks:
            x = blk(x)
        x = self.decoder_norm(x)
        x = self.decoder_pred(x)
        return x[:, 1:, :]

    def __call__(
        self,
        view1,
        view2=None,
        mask_ratio: float = 0.75,
        noise: Optional[jnp.ndarray] = None,
        train: bool = True,
    ):
        """Full forward. Returns a dict of raw tensors for the loss assembly.

        With `cfg.contrastive` and `view2`, mirrors ContrastiveMAEViT.forward
        (vit_autoenc.py:270-285): view2 goes through the encoder only (with
        its own mask draw), latents are flattened per-token INCLUDING the cls
        row, z's are stop-gradient'd.
        """
        if self.cfg.contrastive and view2 is not None:
            # Batch both views through ONE encoder call (2B batch): identical
            # math to two sequential passes (no BN in the trunk) but better
            # MXU utilisation. The predictor heads still see each view
            # separately, preserving the reference's per-view BatchNorm stats.
            b = view1.shape[0]
            both = jnp.concatenate([view1, view2], axis=0)
            latent_all, mask_all, ids_all = self.forward_encoder(
                both, mask_ratio, noise=noise
            )
            latent, latent2 = latent_all[:b], latent_all[b:]
            mask, ids_restore = mask_all[:b], ids_all[:b]
            pred = self.forward_decoder(latent, ids_restore)
            out = {"pred": pred, "mask": mask, "ids_restore": ids_restore, "latent": latent}
            z1 = latent.reshape(-1, latent.shape[-1])
            z2 = latent2.reshape(-1, latent2.shape[-1])
            p1, p2, z1, z2 = self.heads(z1, z2, train=train, apply_proj=False)
            out.update(
                p1=p1,
                p2=p2,
                z1=jax.lax.stop_gradient(z1),
                z2=jax.lax.stop_gradient(z2),
            )
            return out

        latent, mask, ids_restore = self.forward_encoder(view1, mask_ratio, noise=noise)
        pred = self.forward_decoder(latent, ids_restore)
        return {"pred": pred, "mask": mask, "ids_restore": ids_restore, "latent": latent}
