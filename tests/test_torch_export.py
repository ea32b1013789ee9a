"""torch .pth EXPORT shim: models trained in this framework hand back to the
reference's PyTorch tooling. Pins (a) export -> import round-trip identity,
(b) strict `load_state_dict` into a torch module with the reference's exact
attribute names/shapes (model/vit_autoenc.py:14-285), including the fixed
sincos pos-embeds the reference stores as frozen Parameters and the BN
running stats of the contrastive heads, and (c) the export-torch CLI."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vit_ae_plus_plus_tpu.configs import MAEConfig
from vit_ae_plus_plus_tpu.models import MaskedAutoencoderViT3D
from vit_ae_plus_plus_tpu.train.checkpoint import (
    export_mae_torch_state_dict,
    export_torch_state_dict,
    import_torch_batch_stats,
    import_torch_state_dict,
)

CFG = MAEConfig(
    volume_size=16, patch_size=4, in_chans=2, embed_dim=24, depth=2, num_heads=3,
    decoder_embed_dim=12, decoder_depth=2, decoder_num_heads=2,
    contrastive=True, use_proj=True,
)


def _variables(cfg=CFG, seed=0):
    model = MaskedAutoencoderViT3D(cfg)
    s = cfg.volume_size
    v = jnp.asarray(
        np.random.default_rng(seed).standard_normal(
            (2, cfg.in_chans, s, s, s)
        ).astype(np.float32)
    )
    return model.init(
        {"params": jax.random.PRNGKey(seed), "mask": jax.random.PRNGKey(1)},
        v, v if cfg.contrastive else None,
    )


def _flat(tree):
    return {
        jax.tree_util.keystr(k): np.asarray(v)
        for k, v in jax.tree_util.tree_flatten_with_path(tree)[0]
    }


def test_export_import_roundtrip_identity():
    variables = _variables()
    sd = export_mae_torch_state_dict(
        variables["params"], CFG, batch_stats=variables.get("batch_stats")
    )
    params = import_torch_state_dict(
        sd, patch_size=CFG.patch_size, in_chans=CFG.in_chans, mae=True
    )
    stats = import_torch_batch_stats(sd)

    want_p, got_p = _flat(variables["params"]), _flat(params)
    assert set(want_p) == set(got_p), set(want_p) ^ set(got_p)
    for k in want_p:
        np.testing.assert_array_equal(want_p[k], got_p[k], err_msg=k)

    want_s, got_s = _flat(variables["batch_stats"]), _flat(stats)
    assert set(want_s) == set(got_s), set(want_s) ^ set(got_s)
    for k in want_s:
        np.testing.assert_array_equal(want_s[k], got_s[k], err_msg=k)


def _reference_torch_mae(cfg):
    """A torch module with the reference's EXACT state_dict surface
    (attribute names, Sequential head indices, frozen pos-embed Parameters —
    model/vit_autoenc.py:14-285 + model/vit.py:78-144). Behaviour-free: it
    exists to make `load_state_dict(strict=True)` the key/shape oracle."""
    import torch
    import torch.nn as nn

    d, dd = cfg.embed_dim, cfg.decoder_embed_dim
    n = cfg.num_patches

    def block(dim):
        b = nn.Module()
        b.norm1 = nn.LayerNorm(dim, eps=1e-6)
        b.attn = nn.Module()
        b.attn.qkv = nn.Linear(dim, dim * 3)
        b.attn.proj = nn.Linear(dim, dim)
        b.norm2 = nn.LayerNorm(dim, eps=1e-6)
        b.mlp = nn.Module()
        b.mlp.fc1 = nn.Linear(dim, int(dim * cfg.mlp_ratio))
        b.mlp.fc2 = nn.Linear(int(dim * cfg.mlp_ratio), dim)
        return b

    m = nn.Module()
    m.patch_embed = nn.Module()
    m.patch_embed.proj = nn.Conv3d(
        cfg.in_chans, d, kernel_size=cfg.patch_size, stride=cfg.patch_size
    )
    m.cls_token = nn.Parameter(torch.zeros(1, 1, d))
    m.pos_embed = nn.Parameter(torch.zeros(1, n + 1, d), requires_grad=False)
    m.blocks = nn.ModuleList([block(d) for _ in range(cfg.depth)])
    m.norm = nn.LayerNorm(d, eps=1e-6)
    m.decoder_embed = nn.Linear(d, dd)
    m.mask_token = nn.Parameter(torch.zeros(1, 1, dd))
    m.decoder_pos_embed = nn.Parameter(torch.zeros(1, n + 1, dd), requires_grad=False)
    m.decoder_blocks = nn.ModuleList([block(dd) for _ in range(cfg.decoder_depth)])
    m.decoder_norm = nn.LayerNorm(dd, eps=1e-6)
    m.decoder_pred = nn.Linear(dd, cfg.patch_dim)
    if cfg.contrastive:
        m.predictor = nn.Sequential(
            nn.Linear(d, d, bias=False), nn.BatchNorm1d(d),
            nn.ReLU(inplace=True), nn.Linear(d, d),
        )
        if cfg.use_proj:
            m.projection_head = nn.Sequential(
                nn.Linear(d, d, bias=False), nn.BatchNorm1d(d), nn.ReLU(inplace=True),
                nn.Linear(d, d, bias=False), nn.BatchNorm1d(d), nn.ReLU(inplace=True),
                nn.Linear(d, d, bias=False), nn.BatchNorm1d(d, affine=False),
            )
    return m


def test_strict_torch_load_and_value_layout():
    torch = pytest.importorskip("torch")
    variables = _variables()
    sd = export_mae_torch_state_dict(
        variables["params"], CFG, batch_stats=variables.get("batch_stats")
    )
    ref = _reference_torch_mae(CFG)
    missing_extra = ref.load_state_dict(
        {k: torch.from_numpy(np.asarray(v).copy()) for k, v in sd.items()}, strict=True
    )
    assert not missing_extra.missing_keys and not missing_extra.unexpected_keys

    # layouts: torch Linear weight is the transposed Dense kernel; the Conv3d
    # patch embed re-folds the dense rows back to (D, C, pz, py, px)
    qkv = variables["params"]["blocks_0"]["attn"]["qkv"]["kernel"]
    np.testing.assert_allclose(
        ref.blocks[0].attn.qkv.weight.detach().numpy(), np.asarray(qkv).T
    )
    dense = np.asarray(variables["params"]["patch_embed"]["proj"]["kernel"])
    conv = ref.patch_embed.proj.weight.detach().numpy()
    p, c = CFG.patch_size, CFG.in_chans
    np.testing.assert_allclose(conv[:, 0, 0, 0, 0], dense[0])
    np.testing.assert_allclose(conv[:, 1, 0, 0, 0], dense[1])  # c fastest
    np.testing.assert_allclose(conv[:, 0, 0, 0, 1], dense[2])  # then dx

    # the synthesised frozen pos-embeds match the model's own constants
    model = MaskedAutoencoderViT3D(CFG)
    from vit_ae_plus_plus_tpu.ops import get_3d_sincos_pos_embed

    want = get_3d_sincos_pos_embed(CFG.embed_dim, CFG.grid_size, cls_token=True)[None]
    np.testing.assert_allclose(ref.pos_embed.numpy(), want.astype(np.float32))

    # BN running stats flowed through (predictor.1 tracks flax batch_stats)
    np.testing.assert_allclose(
        ref.predictor[1].running_mean.numpy(),
        np.asarray(variables["batch_stats"]["heads"]["predictor"]["BatchNorm_0"]["mean"]),
    )


def test_export_defaults_running_stats_when_params_only():
    """min-loss checkpoints store params only; the projector's final BN is
    affine-free (no params) — export must still emit its running stats."""
    variables = _variables()
    sd = export_mae_torch_state_dict(variables["params"], CFG)  # no batch_stats
    np.testing.assert_array_equal(
        sd["projection_head.7.running_var"], np.ones(CFG.embed_dim, np.float32)
    )
    np.testing.assert_array_equal(
        sd["predictor.1.running_mean"], np.zeros(CFG.embed_dim, np.float32)
    )
    assert int(sd["predictor.1.num_batches_tracked"]) == 0


def test_plain_vit_export_covers_classifier_keys():
    from vit_ae_plus_plus_tpu.configs import ViTConfig
    from vit_ae_plus_plus_tpu.models import VisionTransformer3D

    cfg = ViTConfig(volume_size=16, patch_size=4, in_chans=1, embed_dim=24, depth=1,
                    num_heads=3, num_classes=2, global_pool=True)
    model = VisionTransformer3D(cfg)
    v = jnp.zeros((1, 1, 16, 16, 16))
    params = model.init({"params": jax.random.PRNGKey(0)}, v)["params"]
    sd = export_torch_state_dict(params, cfg.patch_size, cfg.in_chans)
    # learned pos_embed is a param and must export under its own name
    assert sd["pos_embed"].shape == (1, cfg.num_patches + 1, cfg.embed_dim)
    assert sd["head.weight"].shape == (2, cfg.embed_dim)
    assert sd["fc_norm.weight"].shape == (cfg.embed_dim,)
    back = import_torch_state_dict(sd, patch_size=cfg.patch_size, in_chans=cfg.in_chans)
    want, got = _flat(params), _flat(back)
    assert set(want) == set(got)
    for k in want:
        np.testing.assert_array_equal(want[k], got[k], err_msg=k)


def test_export_torch_cli(tmp_path):
    torch = pytest.importorskip("torch")
    from vit_ae_plus_plus_tpu.cli import main as cli_main
    from vit_ae_plus_plus_tpu.models import MODEL_ZOO
    from vit_ae_plus_plus_tpu.pipelines.probe_kfold import _mae_params_template
    from vit_ae_plus_plus_tpu.train.checkpoint import save_params

    cfg = MODEL_ZOO["contr_mae_vit_tiny_patch4"](volume_size=16, in_chans=1)
    template = _mae_params_template(cfg, 42)
    params = jax.tree.map(
        lambda x: np.random.default_rng(0).standard_normal(x.shape).astype(x.dtype),
        template,
    )
    ckpt = str(tmp_path / "checkpoint-min_loss")
    save_params(ckpt, params)
    out = str(tmp_path / "exported.pth")
    rc = cli_main([
        "export-torch", "--checkpoint", ckpt, "--out", out,
        "--model", "contr_mae_vit_tiny_patch4", "--volume-size", "16",
        "--in-channels", "1",
    ])
    assert rc == 0
    sd = torch.load(out)
    assert "decoder_pos_embed" in sd and "predictor.3.weight" in sd
    np.testing.assert_allclose(
        sd["blocks.0.attn.qkv.weight"].numpy(),
        np.asarray(params["blocks_0"]["attn"]["qkv"]["kernel"]).T,
    )
