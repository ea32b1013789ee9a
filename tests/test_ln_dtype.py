"""Opt-in `--ln-dtype bfloat16` (models/vit.py::ln_stats_dtype): block-LN
statistics at bf16 instead of flax's >= f32 pin. Non-parity precision lever
like --loss-filters-dtype; measured on TPU in BASELINE.md. These tests pin
(a) checkpoint interchangeability (identical param tree), (b) numerical
equivalence within bf16 tolerance, (c) the config plumb-through."""

import numpy as np
import jax
import jax.numpy as jnp

from vit_ae_plus_plus_tpu.configs import MAEConfig, ViTConfig
from vit_ae_plus_plus_tpu.models import MaskedAutoencoderViT3D, VisionTransformer3D


def _vit_cfg(**kw):
    return ViTConfig(
        volume_size=16, patch_size=4, in_chans=1, embed_dim=32, depth=2,
        num_heads=2, num_classes=0, global_pool=True, **kw,
    )


def test_ln_dtype_param_tree_identical_and_outputs_close():
    cfg32 = _vit_cfg()
    cfg16 = _vit_cfg(ln_dtype="bfloat16")
    m32, m16 = VisionTransformer3D(cfg32), VisionTransformer3D(cfg16)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 1, 16, 16, 16))
    v = m32.init({"params": jax.random.PRNGKey(1)}, x)
    # same tree -> checkpoints are interchangeable between the two graphs
    v16 = m16.init({"params": jax.random.PRNGKey(1)}, x)
    assert jax.tree.structure(v) == jax.tree.structure(v16)
    assert all(
        a.shape == b.shape
        for a, b in zip(jax.tree.leaves(v), jax.tree.leaves(v16))
    )
    out32 = np.asarray(m32.apply(v, x, method=m32.forward_features))
    out16 = np.asarray(m16.apply(v, x, method=m16.forward_features))
    # bf16 has ~3 significant decimal digits; two blocks of bf16-stats LN
    # leave features equal to ~1e-2 relative on unit-scale activations
    err = np.max(np.abs(out32 - out16)) / (np.max(np.abs(out32)) + 1e-9)
    assert err < 5e-2, f"bf16-stats LN diverged: rel {err:.3e}"
    assert err > 0, "ln_dtype=bfloat16 produced bit-identical output (inert?)"


def test_ln_dtype_flows_from_mae_config_to_both_stacks():
    cfg = MAEConfig(
        volume_size=16, patch_size=4, in_chans=1, embed_dim=32, depth=1,
        num_heads=2, decoder_embed_dim=24, decoder_depth=1,
        decoder_num_heads=2, ln_dtype="bfloat16",
    )
    model = MaskedAutoencoderViT3D(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 1, 16, 16, 16))
    v = model.init({"params": jax.random.PRNGKey(1), "mask": jax.random.PRNGKey(2)}, x)
    out = model.apply(v, x, rngs={"mask": jax.random.PRNGKey(3)})
    assert np.isfinite(np.asarray(out["pred"])).all()
    # encoder_vit_config carries the lever to the extraction/serving trunk
    assert cfg.encoder_vit_config().ln_dtype == "bfloat16"


def test_forced_fusion_warns_when_ln_dtype_bf16():
    """ln_fusion='on' forces the fused LN+Dense path whose stats are f32;
    combining it with ln_dtype='bfloat16' must warn instead of silently
    ignoring the dtype flag (ADVICE r4)."""
    import warnings

    cfg = _vit_cfg(ln_fusion="on", ln_dtype="bfloat16")
    m = VisionTransformer3D(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 1, 16, 16, 16))
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        m.init({"params": jax.random.PRNGKey(1)}, x)
    assert any("ln_dtype" in str(w.message) and "fused" in str(w.message)
               for w in caught)

    # either flag alone stays silent
    for kw in ({"ln_fusion": "on"}, {"ln_dtype": "bfloat16"}):
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            VisionTransformer3D(_vit_cfg(**kw)).init(
                {"params": jax.random.PRNGKey(1)}, x)
        assert not [w for w in caught if "ln_dtype" in str(w.message)]
