"""VGG16 perceptual module: structure parity vs a torch oracle built from the
same conv stack, weight conversion round-trip, and the loss-fold semantics."""

import numpy as np
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from vit_ae_plus_plus_tpu.models.vgg import (
    VGG16Features,
    build_perceptual,
    load_torch_vgg_state_dict,
    make_perceptual_fn,
)

CONV_FEATURE_INDICES = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21]
POOL_BEFORE = {5, 10, 17}  # first conv of slices 2-4 has a maxpool before it
CHANNELS = [64, 64, 128, 128, 256, 256, 256, 512, 512, 512]


def make_torch_state_dict(seed=0):
    rng = np.random.default_rng(seed)
    sd = {}
    in_ch = 3
    for feat_idx, out_ch in zip(CONV_FEATURE_INDICES, CHANNELS):
        sd[f"features.{feat_idx}.weight"] = rng.standard_normal(
            (out_ch, in_ch, 3, 3)).astype(np.float32) * 0.05
        sd[f"features.{feat_idx}.bias"] = rng.standard_normal(out_ch).astype(np.float32) * 0.01
        in_ch = out_ch
    return sd


def torch_taps(x, sd):
    """Oracle forward through the conv stack with relu + pools, collecting the
    4 tap activations (torchvision features indices 3, 8, 15, 22)."""
    taps = []
    t = torch.from_numpy(x)
    slice_ends = {1: 0, 3: 1, 6: 2, 9: 3}  # conv ordinal -> tap after
    conv_ord = 0
    for feat_idx in CONV_FEATURE_INDICES:
        if feat_idx in POOL_BEFORE:
            t = F.max_pool2d(t, 2, 2)
        w = torch.from_numpy(sd[f"features.{feat_idx}.weight"])
        b = torch.from_numpy(sd[f"features.{feat_idx}.bias"])
        t = F.relu(F.conv2d(t, w, b, padding=1))
        if conv_ord in slice_ends:
            taps.append(t)
        conv_ord += 1
    return taps


def test_vgg_taps_match_torch_oracle():
    sd = make_torch_state_dict()
    params = load_torch_vgg_state_dict(sd)
    model = VGG16Features()
    x = np.random.default_rng(1).standard_normal((2, 3, 32, 32)).astype(np.float32)
    got = model.apply({"params": params}, jnp.asarray(x))
    want = torch_taps(x, sd)
    assert len(got) == 4
    for g, w in zip(got, want):
        g = np.asarray(g).transpose(0, 3, 1, 2)  # NHWC -> NCHW
        np.testing.assert_allclose(g, w.numpy(), rtol=1e-3, atol=1e-4)


def test_perceptual_fn_matches_reference_semantics():
    """Multi-channel volumes: fold depth into batch per channel, repeat 1->3,
    mean over taps, mean over channels (perceptual_loss.py:46-77)."""
    sd = make_torch_state_dict()
    params = load_torch_vgg_state_dict(sd)
    model = VGG16Features()
    fn = make_perceptual_fn(model, params)
    rng = np.random.default_rng(2)
    v1 = rng.standard_normal((2, 2, 8, 32, 32)).astype(np.float32)
    v2 = rng.standard_normal((2, 2, 8, 32, 32)).astype(np.float32)
    got = float(fn(jnp.asarray(v1), jnp.asarray(v2)))

    total = 0.0
    for ch in range(2):
        a = v1[:, ch:ch + 1].transpose(0, 2, 1, 3, 4).reshape(-1, 1, 32, 32)
        b = v2[:, ch:ch + 1].transpose(0, 2, 1, 3, 4).reshape(-1, 1, 32, 32)
        a3, b3 = np.repeat(a, 3, 1), np.repeat(b, 3, 1)
        taps_a, taps_b = torch_taps(a3, sd), torch_taps(b3, sd)
        total += float(np.mean([F.mse_loss(x, y).item() for x, y in zip(taps_a, taps_b)]))
    want = total / 2
    assert np.isclose(got, want, rtol=1e-3)


def test_build_perceptual_random_fallback():
    model, params, fn = build_perceptual(None)
    v = jnp.zeros((1, 1, 8, 32, 32))
    assert float(fn(v, v)) == 0.0


def make_torchvision_vgg16():
    """The exact torchvision vgg16 module layout (tv.vgg16().features indices
    0-30 + classifier keys), built locally — no egress, no torchvision import.
    Classifier shapes are shrunk (they must merely EXIST to prove the
    converter ignores them, as the reference loads with strict=False,
    perceptual_loss.py:20-24)."""
    import torch.nn as nn

    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512, "M"]
    layers, in_ch = [], 3
    for v in cfg:
        if v == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers += [nn.Conv2d(in_ch, v, 3, padding=1), nn.ReLU(inplace=True)]
            in_ch = v
    return nn.ModuleDict({"features": nn.Sequential(*layers),
                          "classifier": nn.Sequential(nn.Linear(8, 8), nn.ReLU(),
                                                      nn.Linear(8, 8))})


def test_torchvision_shaped_checkpoint_roundtrip(tmp_path):
    """An actual torch-saved, torchvision-shaped VGG16 state_dict (all 13
    feature convs + classifier keys) converts through build_perceptual and
    reproduces the torch oracle's tap activations (VERDICT #8a; reference
    perceptual_loss.py:15-24)."""
    torch.manual_seed(0)
    module = make_torchvision_vgg16()
    # keys come out as features.{i}.weight etc — identical to torchvision
    sd = module.state_dict()
    assert "features.0.weight" in sd and "features.21.weight" in sd
    assert "features.28.weight" in sd and "classifier.0.weight" in sd
    path = str(tmp_path / "vgg16_ckpt.pth")
    torch.save(sd, path)

    model, params, fn = build_perceptual(path)
    x = np.random.default_rng(3).standard_normal((2, 3, 32, 32)).astype(np.float32)
    got = model.apply({"params": params}, jnp.asarray(x))
    np_sd = {k: v.numpy() for k, v in sd.items() if k.startswith("features.")}
    want = torch_taps(x, np_sd)
    for g, w in zip(got, want):
        g = np.asarray(g).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(g, w.numpy(), rtol=1e-3, atol=1e-4)
