"""VGG16 perceptual loss (Flax port of the reference's torchvision slices).

Parity: reference /root/reference/model/model_utils/perceptual_loss.py:11-84 —
VGG16 `features` sliced at relu1_2 / relu2_2 / relu3_3 / relu4_3 (indices
0-3 / 4-8 / 9-15 / 16-22), volumes folded depth-into-batch as 2D slices
(:48-49), single channels repeated to 3 (:50-51), per-input-channel loss
averaged (:72-77), and the MSE over the four tap activations averaged.

Weights: the reference loads either torchvision's ImageNet VGG16 or its own
SSL checkpoint `model/ckp-399.pth` (README download). Neither is available in
this environment (zero egress, no torchvision); `load_torch_vgg_state_dict`
converts such a checkpoint when the user supplies one, otherwise the module
runs with He-init random weights — numerically valid (it's a fixed random
projection) but NOT equivalent to the reference's pretrained loss, and the
default `perceptual_weight=0` (config.ini:34) means the term is off anyway.

Reference quirk kept: the perceptual term in the composite objective is
gradient-free (train/objective.py applies stop_gradient, mirroring the
torch.no_grad() wrap at vit_autoenc.py:229-230 and the autograd-severing
`torch.as_tensor([...])` at perceptual_loss.py:68-69).
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import numpy as np
import jax.numpy as jnp
import flax.linen as nn

# (out_channels, pool_before) per conv, torchvision vgg16.features order,
# up to index 22 (relu4_3)
_VGG_SLICES: Tuple[Tuple[Tuple[int, bool], ...], ...] = (
    ((64, False), (64, False)),                 # conv1_1, conv1_2 -> relu1_2
    ((128, True), (128, False)),                # pool, conv2_1, conv2_2 -> relu2_2
    ((256, True), (256, False), (256, False)),  # pool, conv3_1..3 -> relu3_3
    ((512, True), (512, False), (512, False)),  # pool, conv4_1..3 -> relu4_3
)


class VGG16Features(nn.Module):
    """Returns the 4 tap activations for a (N, 3, H, W) batch."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        x = x.astype(self.dtype).transpose(0, 2, 3, 1)  # NCHW -> NHWC
        taps = []
        conv_idx = 0
        for slice_cfg in _VGG_SLICES:
            for out_ch, pool_before in slice_cfg:
                if pool_before:
                    x = nn.max_pool(x, (2, 2), (2, 2))
                x = nn.Conv(out_ch, (3, 3), padding=1, dtype=self.dtype,
                            name=f"conv_{conv_idx}")(x)
                x = nn.relu(x)
                conv_idx += 1
            taps.append(x)
        return taps


def load_torch_vgg_state_dict(state_dict: Dict[str, np.ndarray]) -> Dict:
    """torchvision vgg16 state_dict -> VGG16Features params.

    torch conv weight (O, I, kh, kw) -> flax (kh, kw, I, O). Only the
    `features.{i}` conv entries up to index 22 are used.
    """
    conv_feature_indices = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21]
    params = {}
    for conv_idx, feat_idx in enumerate(conv_feature_indices):
        w = np.asarray(state_dict[f"features.{feat_idx}.weight"])
        b = np.asarray(state_dict[f"features.{feat_idx}.bias"])
        params[f"conv_{conv_idx}"] = {
            "kernel": w.transpose(2, 3, 1, 0),
            "bias": b,
        }
    return params


def make_perceptual_fn(vgg_model: VGG16Features, vgg_params: Dict):
    """Returns perceptual_fn(pred_vol, target_vol) -> scalar, with the
    reference's fold-depth-into-batch + channel-loop semantics."""

    def one_view(x2d):
        if x2d.shape[1] == 1:
            x2d = jnp.repeat(x2d, 3, axis=1)
        return vgg_model.apply({"params": vgg_params}, x2d)

    def per_channel(x1, x2):
        # (B, 1, D, H, W) -> (B*D, 1, H, W) (perceptual_loss.py:46-49)
        def fold(v):
            v = v.transpose(0, 2, 1, 3, 4)
            return v.reshape(-1, *v.shape[2:])

        a_taps = one_view(fold(x1))
        b_taps = one_view(fold(x2))
        losses = [jnp.mean((a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2)
                  for a, b in zip(a_taps, b_taps)]
        return jnp.mean(jnp.stack(losses))

    def perceptual_fn(pred_vol, target_vol):
        ch = pred_vol.shape[1]
        total = 0.0
        for idx in range(ch):
            total = total + per_channel(
                pred_vol[:, idx : idx + 1], target_vol[:, idx : idx + 1]
            )
        return total / ch

    return perceptual_fn


def build_perceptual(torch_ckpt_path: str | None = None, seed: int = 0):
    """(vgg_model, params, perceptual_fn). Loads + converts a torch checkpoint
    if given, else He-init random weights (with a loud warning)."""
    import jax

    model = VGG16Features()
    if torch_ckpt_path is not None:
        import torch

        sd = torch.load(torch_ckpt_path, map_location="cpu")
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        params = load_torch_vgg_state_dict({k: v.numpy() for k, v in sd.items()})
    else:
        print("WARNING: no VGG checkpoint given - perceptual loss uses random "
              "(He-init) features, not the reference's pretrained ones")
        dummy = jnp.zeros((1, 3, 32, 32))
        params = model.init({"params": jax.random.PRNGKey(seed)}, dummy)["params"]
    return model, params, make_perceptual_fn(model, params)
