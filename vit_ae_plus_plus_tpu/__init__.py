"""ViT-AE++ TPU: a TPU-native (JAX / XLA / Pallas / pjit) framework for
self-supervised 3D medical-image representation learning.

Re-designed from scratch with the capabilities of the ViT-AE++ reference
(chinmay5/vit_ae_plus_plus): 3D Masked Autoencoder pretraining with edge-map /
perceptual / contrastive auxiliary objectives, SSL feature extraction, k-fold
downstream evaluation (linear probe / fine-tune / classical ML), and MoCo-v3 /
3D-ResNet comparison baselines — all built TPU-first:

- compute path: functional Flax modules compiled by XLA, with Pallas flash
  attention for the hot O(N^2) op;
- parallelism: `jax.sharding.Mesh` + NamedSharding (data / model axes), no
  hand-written communication layer;
- precision: bf16 compute / f32 params & reductions (no grad scaler needed);
- data: host-side numpy/scipy augmentation feeding on-device patchification.
"""

__version__ = "0.1.0"
