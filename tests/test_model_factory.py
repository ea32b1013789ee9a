"""get_models compat-shim parity (reference model/model_factory.py:9-29).

The four dispatch names must return the same module *types* as the reference,
and the reference-parity config must apply zero dropout: the reference accepts
`drop_path` but DropPath is commented out there (model/vit.py:133-141), so a
config with drop_path=0.1 trains with no stochastic regularisation at all.
"""

from types import SimpleNamespace

import jax
import jax.numpy as jnp
import pytest

from vit_ae_plus_plus_tpu.models import get_models
from vit_ae_plus_plus_tpu.models.mae import MaskedAutoencoderViT3D
from vit_ae_plus_plus_tpu.models.vit import (
    VisionTransformer3D,
    VisionTransformer3DContrastive,
)


def _args(**kw):
    base = dict(
        model="mae_vit_tiny_patch4",
        volume_size=16,
        in_channels=1,
        patch_size=4,
        nb_classes=2,
        global_pool=True,
        drop_path=0.1,  # reference default config.ini value — must stay inert
    )
    base.update(kw)
    return SimpleNamespace(**base)


def test_factory_module_types():
    m, _ = get_models("autoenc", _args())
    assert isinstance(m, MaskedAutoencoderViT3D)
    m, _ = get_models("autoenc_contr", _args(model="contr_mae_vit_tiny_patch4"))
    assert isinstance(m, MaskedAutoencoderViT3D)
    m, _ = get_models("vit", _args())
    assert isinstance(m, VisionTransformer3D)
    m, _ = get_models("contrastive", _args())
    assert isinstance(m, VisionTransformer3DContrastive)
    with pytest.raises(ValueError):
        get_models("nope", _args())


def test_vit_drop_path_is_inert():
    """drop_path=0.1 must enable NO dropout (reference vit.py:133-141)."""
    model, cfg = get_models("vit", _args())
    assert cfg.drop_rate == 0.0 and cfg.attn_drop_rate == 0.0
    x = jnp.ones((1, 1, 16, 16, 16))
    # a model with live dropout would demand a 'dropout' rng in train mode
    variables = model.init({"params": jax.random.PRNGKey(0)}, x)
    y1 = model.apply(variables, x, train=True)
    y2 = model.apply(variables, x, train=True)
    assert jnp.allclose(y1, y2)


def test_contrastive_factory_two_view_forward():
    model, _ = get_models("contrastive", _args(use_proj=True))
    x = jnp.ones((2, 1, 16, 16, 16))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, x)
    out, _ = model.apply(variables, x, x, mutable=["batch_stats"])
    p1, p2, z1, z2 = out
    # heads operate at embed_dim: the reference's only runnable configuration
    # is num_classes == 0 / head = Identity (model/vit.py:311-337)
    assert p1.shape == z1.shape == (2, 768)
    # projector params must exist (built in the reference even when unused)
    paths = [
        jax.tree_util.keystr(p)
        for p, _ in jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    ]
    assert any("projector" in p for p in paths)


def test_fastdec_preset_same_params_different_heads():
    """The opt-in fast decoder changes ONLY the decoder head split (8 x d64
    instead of the reference's 16 x d32): identical parameter shapes, width,
    depth — the MXU-friendly non-parity variant documented in models/zoo.py."""
    import dataclasses

    from vit_ae_plus_plus_tpu.models import MODEL_ZOO

    base = MODEL_ZOO["contr_mae_vit_base_patch16"](volume_size=16, patch_size=4)
    fast = MODEL_ZOO["contr_mae_vit_base_patch16_fastdec"](volume_size=16, patch_size=4)
    assert base.decoder_num_heads == 16 and fast.decoder_num_heads == 8
    # head count is the ONLY difference: parameter shapes depend on the other
    # fields alone (heads only reshape the qkv activations), so the variant is
    # checkpoint-compatible with the parity architecture
    diffs = {
        f.name
        for f in dataclasses.fields(base)
        if getattr(base, f.name) != getattr(fast, f.name)
    }
    assert diffs == {"decoder_num_heads"}


def test_fast_preset_same_params_widest_heads():
    """The `_fast` preset widens heads to the d=128 floor-optimal split in
    BOTH trunks (6-head encoder, 4-head decoder) without touching any
    parameter shape — parity checkpoints load unchanged."""
    import dataclasses

    import jax

    from vit_ae_plus_plus_tpu.models import MODEL_ZOO, build_model

    base = MODEL_ZOO["contr_mae_vit_base_patch16"](volume_size=16, patch_size=4)
    fast = MODEL_ZOO["contr_mae_vit_base_patch16_fast"](volume_size=16, patch_size=4)
    assert fast.num_heads == 6 and fast.decoder_num_heads == 4
    assert fast.embed_dim // fast.num_heads == 128
    assert fast.decoder_embed_dim // fast.decoder_num_heads == 128
    diffs = {
        f.name
        for f in dataclasses.fields(base)
        if getattr(base, f.name) != getattr(fast, f.name)
    }
    assert diffs == {"num_heads", "decoder_num_heads"}
    # parameter trees are byte-identical in structure and shape
    x = jax.numpy.zeros((1, 1, 16, 16, 16))
    rngs = {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)}
    pb = build_model(base).init(rngs, x, x)["params"]
    pf = build_model(fast).init(rngs, x, x)["params"]
    assert jax.tree.map(lambda a: a.shape, pb) == jax.tree.map(lambda a: a.shape, pf)
