"""Checkpoint manager: save/restore round-trip + resume, and the torch .pth
import shim layout conversions."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vit_ae_plus_plus_tpu.configs import MAEConfig
from vit_ae_plus_plus_tpu.models import MaskedAutoencoderViT3D
from vit_ae_plus_plus_tpu.train import create_train_state, make_adamw
from vit_ae_plus_plus_tpu.train.checkpoint import (
    CheckpointManager,
    import_torch_state_dict,
    load_params,
    save_params,
)

TINY = MAEConfig(
    volume_size=16, patch_size=4, in_chans=1, embed_dim=24, depth=1, num_heads=3,
    decoder_embed_dim=12, decoder_depth=1, decoder_num_heads=2,
)


def _state():
    model = MaskedAutoencoderViT3D(TINY)
    v = jnp.zeros((1, 1, 16, 16, 16))
    return create_train_state(
        model, (v,), make_adamw(1e-3),
        {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)},
    )


def test_manager_roundtrip_restores_epoch_and_state(tmp_path):
    state = _state()
    mgr = CheckpointManager(str(tmp_path / "ck"))
    state = state.replace(step=jnp.asarray(17))
    mgr.save(3, state, epoch=3, min_loss=1.25)
    mgr.wait()

    fresh = _state()
    restored, epoch, min_loss = mgr.restore(fresh)
    assert epoch == 3 and min_loss == 1.25
    assert int(restored.step) == 17
    np.testing.assert_allclose(
        np.asarray(restored.params["cls_token"]), np.asarray(state.params["cls_token"])
    )


def test_restore_without_checkpoint_is_noop(tmp_path):
    state = _state()
    mgr = CheckpointManager(str(tmp_path / "empty"))
    restored, epoch, min_loss = mgr.restore(state)
    assert epoch is None and restored is state  # None = no checkpoint (0 is valid)
    assert min_loss == float("inf")


def test_save_params_overwrites(tmp_path):
    state = _state()
    path = str(tmp_path / "p")
    save_params(path, jax.device_get(state.params))
    p2 = jax.tree.map(lambda x: x + 1, jax.device_get(state.params))
    save_params(path, p2)  # min-loss re-save must not raise
    loaded = load_params(path, jax.device_get(state.params))
    np.testing.assert_allclose(
        np.asarray(loaded["cls_token"]), np.asarray(p2["cls_token"])
    )


def test_torch_import_shim_layouts():
    rng = np.random.default_rng(0)
    p, c, d = 4, 2, 24
    sd = {
        "patch_embed.proj.weight": rng.standard_normal((d, c, p, p, p)).astype(np.float32),
        "patch_embed.proj.bias": rng.standard_normal(d).astype(np.float32),
        "cls_token": rng.standard_normal((1, 1, d)).astype(np.float32),
        "blocks.0.norm1.weight": np.ones(d, np.float32),
        "blocks.0.norm1.bias": np.zeros(d, np.float32),
        "blocks.0.attn.qkv.weight": rng.standard_normal((3 * d, d)).astype(np.float32),
        "blocks.0.attn.qkv.bias": np.zeros(3 * d, np.float32),
        "blocks.0.mlp.fc1.weight": rng.standard_normal((4 * d, d)).astype(np.float32),
        "blocks.0.mlp.fc1.bias": np.zeros(4 * d, np.float32),
        "decoder_pos_embed": rng.standard_normal((1, 65, 12)).astype(np.float32),
    }
    params = import_torch_state_dict(sd, patch_size=p, in_chans=c)
    # Linear -> transposed kernel
    np.testing.assert_allclose(
        params["blocks_0"]["attn"]["qkv"]["kernel"], sd["blocks.0.attn.qkv.weight"].T
    )
    # mlp.fc1 -> Dense_0
    np.testing.assert_allclose(
        params["blocks_0"]["mlp"]["Dense_0"]["kernel"], sd["blocks.0.mlp.fc1.weight"].T
    )
    # LayerNorm weight -> scale
    np.testing.assert_allclose(params["blocks_0"]["norm1"]["scale"], np.ones(d))
    # conv patch embed flattened to (dz, dy, dx, c) rows: row ordering check
    kernel = params["patch_embed"]["proj"]["kernel"]
    assert kernel.shape == (p**3 * c, d)
    w = sd["patch_embed.proj.weight"]
    np.testing.assert_allclose(kernel[0], w[:, 0, 0, 0, 0])   # (dz=0,dy=0,dx=0,c=0)
    np.testing.assert_allclose(kernel[1], w[:, 1, 0, 0, 0])   # c fastest
    np.testing.assert_allclose(kernel[2], w[:, 0, 0, 0, 1])   # then dx
    # decoder_pos_embed skipped (fixed constant in this framework)
    assert "decoder_pos_embed" not in params


def test_resolve_checkpoint_path_url_and_local(tmp_path):
    """URL checkpoints download once into the cache (reference resume-from-URL,
    utils/misc.py:318-323); local paths pass through untouched."""
    from vit_ae_plus_plus_tpu.train.checkpoint import resolve_checkpoint_path

    src = tmp_path / "ckpt.pth"
    src.write_bytes(b"payload")
    cache = tmp_path / "cache"
    url = "file://" + str(src)
    got = resolve_checkpoint_path(url, cache_dir=str(cache))
    # cache keyed by URL hash + basename (distinct URLs sharing a basename
    # must not collide), no stray .part file left behind
    assert got.endswith("_ckpt.pth") and got.startswith(str(cache))
    assert open(got, "rb").read() == b"payload"
    assert not os.path.exists(got + ".part")
    # cached: a second resolve must not re-download
    src.write_bytes(b"changed")
    assert resolve_checkpoint_path(url, cache_dir=str(cache)) == got
    assert open(got, "rb").read() == b"payload"
    # a different URL with the same basename gets its own cache entry
    src2 = tmp_path / "other" / "ckpt.pth"
    src2.parent.mkdir()
    src2.write_bytes(b"other-model")
    got2 = resolve_checkpoint_path("file://" + str(src2), cache_dir=str(cache))
    assert got2 != got and open(got2, "rb").read() == b"other-model"
    assert resolve_checkpoint_path("/some/local/path") == "/some/local/path"


def test_legacy_lars_checkpoint_raises_actionable_error(tmp_path):
    """A MoCo checkpoint written under the old optax.lars chain order
    (lr before trace — momentum buffer holds lr-scaled steps) must fail
    restore with a message that names the problem and the two sound
    remediations, not orbax's generic metadata-tree mismatch. The buffer is
    semantically unconvertible, so silent remapping would be a bug."""
    import optax

    from vit_ae_plus_plus_tpu.train import create_train_state
    from vit_ae_plus_plus_tpu.train.optim import make_lars

    model = MaskedAutoencoderViT3D(TINY)
    v = jnp.zeros((1, 1, 16, 16, 16))
    rngs = {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)}
    state = create_train_state(model, (v,), make_lars(1e-3), rngs)

    # write a payload whose opt_state uses the PRE-reorder stock-optax layout
    legacy_tx = optax.lars(
        1e-3, weight_decay=1e-6, momentum=0.9, trust_coefficient=0.001
    )
    legacy_state = state.replace(opt_state=legacy_tx.init(state.params))
    mgr = CheckpointManager(str(tmp_path / "legacy"))
    mgr.save(0, legacy_state, epoch=4, min_loss=0.5)
    mgr.wait()

    # `state` carries the CURRENT make_lars layout as the restore template
    with pytest.raises(ValueError, match="pre-fix LARS layout"):
        mgr.restore(state)
