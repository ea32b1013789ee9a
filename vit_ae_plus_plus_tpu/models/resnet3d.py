"""3D ResNet supervised baseline.

Parity: reference /root/reference/k_fold_training_scripts/resnet_3d.py:1-243
(the Kataoka 3D-ResNet family): conv1 (7,7,7)/(1,2,2) stride + maxpool,
4 stages of Basic/Bottleneck blocks, adaptive average pool, fc head; depths
10/18/34/50/101/152/200; shortcut type 'B' (1x1x1 conv + BN downsample).

TPU notes: channel-LAST layout internally (NDHWC) — the native layout for XLA
TPU convolutions — with an NCDHW wrapper to keep the reference's data
contract; BatchNorm statistics in f32.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

conv_init = nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal")


def _bn_dt(dtype):
    """BatchNorm statistics at least at f32 under low-precision compute; full
    width under the f64 trajectory-oracle tests (same rule as MoCoMLP)."""
    return jnp.promote_types(jnp.float32, dtype)


class BasicBlock3D(nn.Module):
    planes: int
    stride: int = 1
    expansion = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        residual = x
        y = nn.Conv(self.planes, (3, 3, 3), (self.stride,) * 3, padding=1, use_bias=False,
                    kernel_init=conv_init, dtype=self.dtype)(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=_bn_dt(self.dtype))(y)
        y = nn.relu(y)
        y = nn.Conv(self.planes, (3, 3, 3), padding=1, use_bias=False,
                    kernel_init=conv_init, dtype=self.dtype)(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=_bn_dt(self.dtype))(y)
        if self.stride != 1 or x.shape[-1] != self.planes:
            residual = nn.Conv(self.planes, (1, 1, 1), (self.stride,) * 3, use_bias=False,
                               kernel_init=conv_init, dtype=self.dtype)(x)
            residual = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                    dtype=_bn_dt(self.dtype))(residual)
        return nn.relu(y + residual)


class Bottleneck3D(nn.Module):
    planes: int
    stride: int = 1
    expansion = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        residual = x
        out_planes = self.planes * self.expansion
        y = nn.Conv(self.planes, (1, 1, 1), use_bias=False, kernel_init=conv_init,
                    dtype=self.dtype)(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=_bn_dt(self.dtype))(y)
        y = nn.relu(y)
        y = nn.Conv(self.planes, (3, 3, 3), (self.stride,) * 3, padding=1, use_bias=False,
                    kernel_init=conv_init, dtype=self.dtype)(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=_bn_dt(self.dtype))(y)
        y = nn.relu(y)
        y = nn.Conv(out_planes, (1, 1, 1), use_bias=False, kernel_init=conv_init,
                    dtype=self.dtype)(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=_bn_dt(self.dtype))(y)
        if self.stride != 1 or x.shape[-1] != out_planes:
            residual = nn.Conv(out_planes, (1, 1, 1), (self.stride,) * 3, use_bias=False,
                               kernel_init=conv_init, dtype=self.dtype)(x)
            residual = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                    dtype=_bn_dt(self.dtype))(residual)
        return nn.relu(y + residual)


DEPTH_CONFIGS = {
    10: (BasicBlock3D, (1, 1, 1, 1)),
    18: (BasicBlock3D, (2, 2, 2, 2)),
    34: (BasicBlock3D, (3, 4, 6, 3)),
    50: (Bottleneck3D, (3, 4, 6, 3)),
    101: (Bottleneck3D, (3, 4, 23, 3)),
    152: (Bottleneck3D, (3, 8, 36, 3)),
    200: (Bottleneck3D, (3, 24, 36, 3)),
}
INPLANES = (64, 128, 256, 512)


class ResNet3D(nn.Module):
    """generate_model equivalent (resnet_3d.py:216-242)."""

    depth: int = 10
    n_classes: int = 2
    widen_factor: float = 1.0
    no_max_pool: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True, return_features: bool = False):
        """x: (N, C, D, H, W) — reference data contract; NDHWC inside."""
        block_cls, layers = DEPTH_CONFIGS[self.depth]
        x = x.astype(self.dtype).transpose(0, 2, 3, 4, 1)  # -> NDHWC
        x = nn.Conv(int(INPLANES[0] * self.widen_factor), (7, 7, 7), (1, 2, 2),
                    padding=((3, 3), (3, 3), (3, 3)), use_bias=False,
                    kernel_init=conv_init, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=_bn_dt(self.dtype))(x)
        x = nn.relu(x)
        if not self.no_max_pool:
            x = nn.max_pool(x, (3, 3, 3), (2, 2, 2), padding=((1, 1), (1, 1), (1, 1)))
        for stage, (planes, n_blocks) in enumerate(zip(INPLANES, layers)):
            planes = int(planes * self.widen_factor)
            for b in range(n_blocks):
                stride = 2 if (stage > 0 and b == 0) else 1
                x = block_cls(planes, stride, dtype=self.dtype)(x, train=train)
        x = jnp.mean(x, axis=(1, 2, 3))  # adaptive avg pool to (N, C)
        if return_features:
            return x
        return nn.Dense(self.n_classes, dtype=self.dtype)(x)

    def forward_features(self, x, train: bool = False):
        return self(x, train=train, return_features=True)


def generate_model(model_depth: int, n_classes: int = 2, n_input_channels: int = 1,
                   **kw) -> ResNet3D:
    """Reference-compatible constructor (resnet_3d.py:216). n_input_channels is
    implicit in the data here (flax infers conv input channels)."""
    if model_depth not in DEPTH_CONFIGS:
        raise ValueError(f"invalid depth {model_depth}")
    return ResNet3D(depth=model_depth, n_classes=n_classes, **kw)
