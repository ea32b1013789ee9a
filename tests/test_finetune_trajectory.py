"""Composed FINE-TUNE update parity vs a torch replica of the reference loop.

test_train_trajectory.py pins the SSL pretraining update. The fine-tune path
composes a different stack the reference runs per iteration
(/root/reference/post_training_utils/fine_tune_epoch.py:40-75, 354-392;
utils/lr_decay.py:15-75; utils/lr_sched.py:9-21; utils/custom_loss.py:7-18;
timm 0.5.4 Mixup):

    timm Mixup (flip-partner, shared Beta(0.1, 0.1) lambda,
    label_smoothing=0.1) -> classifier ViT forward (global-pool + fc_norm)
    -> SoftCrossEntropyWithWeightsLoss (class-weighted, batch-dim
    normalisation) -> grads -> param_groups_lrd (BEiT layer-wise lr decay
    0.75^(num_layers - layer_id) per group, no-decay for 1-D params +
    {pos_embed, cls_token}) -> AdamW(0.9, 0.999) -> per-ITERATION
    warmup-cosine lr, scaled per group.

Both sides run 10 steps on CPU float64 from identical init through OUR
production objects — make_supervised_steps (the jitted train_step the
finetune pipelines call, mixup computed INSIDE the step from the step rng)
and make_layerwise_adamw + warmup_cosine_schedule — and through a torch
loop written from the reference's lines. Mixup randomness is aligned by
construction, not bypassed: the torch side feeds the (mixed_x, soft_y) that
our timm_mixup produces for the SAME folded rng the production step derives
(rng = fold_in(base, state.step), finetune.py:149-155), so the jax side's
in-step mixup is exercised, and any drift in it would break the loss trace.

Why float64: same argument as test_train_trajectory.py — Adam turns
independent f32 rounding noise on low-gradient elements into lr-scale
updates; in f64 the noise floor sits ~8 orders below any semantic bug
(wrong layer-id map, decayed pos_embed, per-epoch lr, betas, or a drifted
soft-CE normalisation each diverge by >1e-3 within 10 steps).
"""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from vit_ae_plus_plus_tpu.configs import ViTConfig
from vit_ae_plus_plus_tpu.models import VisionTransformer3D
from vit_ae_plus_plus_tpu.pipelines.finetune import make_supervised_steps, timm_mixup
from vit_ae_plus_plus_tpu.train.optim import make_layerwise_adamw, warmup_cosine_schedule
from vit_ae_plus_plus_tpu.train.state import TrainState

import torch_oracle as oracle
from test_train_trajectory import _max_rel_err, _torch_tree

B = 4
VOL = 16
PATCH = 4
STEPS = 10
SPE = 2
EPOCHS = 5
WARMUP = 2
LR = 1e-3
MIN_LR = 1e-5
WD = 0.05
LAYER_DECAY = 0.75
CLASS_W = np.array([1.0, 3.0], np.float32)  # reference args.cross_entropy_wt


@pytest.fixture(autouse=True)
def _float64_mode():
    jax.config.update("jax_enable_x64", True)
    prev = torch.get_default_dtype()
    torch.set_default_dtype(torch.float64)
    try:
        yield
    finally:
        torch.set_default_dtype(prev)
        jax.config.update("jax_enable_x64", False)


CFG = dict(
    volume_size=VOL, patch_size=PATCH, in_chans=1, embed_dim=24, depth=2,
    num_heads=3, num_classes=2, global_pool=True, dtype="float64",
)


def _data():
    rng = np.random.default_rng(11)
    vols = rng.standard_normal((STEPS, B, 1, VOL, VOL, VOL)).astype(np.float64)
    labels = rng.integers(0, 2, (STEPS, B))
    return vols, labels


def _run_jax(model, params, vols, labels, base_rng):
    tx = make_layerwise_adamw(
        params, model.cfg.depth,
        warmup_cosine_schedule(LR, MIN_LR, WARMUP, EPOCHS, SPE),
        weight_decay=WD, layer_decay=LAYER_DECAY,
    )
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       batch_stats={}, opt_state=tx.init(params), tx=tx)
    train_step, _ = make_supervised_steps(
        model, num_classes=2, class_weights=CLASS_W, use_mixup=True,
    )
    losses = []
    for i in range(STEPS):
        state, metrics = train_step(
            state, jnp.asarray(vols[i]), jnp.asarray(labels[i]), base_rng
        )
        losses.append(float(metrics["loss"]))
    return losses, jax.device_get(state.params)


def _run_torch(cfg, params, vols, labels, base_rng):
    tparams, named = _torch_tree(params)
    groups = oracle.param_groups_lrd(named, WD, cfg.depth, LAYER_DECAY)
    opt = torch.optim.AdamW(groups, lr=LR)  # betas (0.9, 0.999), the
    # reference finetune passes none (fine_tune_epoch.py:363)
    w = torch.from_numpy(CLASS_W.astype(np.float64))

    losses = []
    for i in range(STEPS):
        oracle.adjust_learning_rate(opt, i / SPE, LR, MIN_LR, WARMUP, EPOCHS)
        # the production step derives rng = fold_in(base, state.step)
        # (finetune.py make_supervised_steps); reproduce its exact mixup
        # draw so both sides see the same mixed batch and soft targets
        rng_i = jax.random.fold_in(base_rng, i)
        mx, my = timm_mixup(rng_i, jnp.asarray(vols[i]),
                            jnp.asarray(labels[i]), 2)
        feats = oracle.vit_forward_features(
            np.asarray(mx, np.float64), tparams, cfg, global_pool=True
        )
        logits = oracle.linear(feats, tparams["head"]["kernel"],
                               tparams["head"]["bias"])
        loss = oracle.soft_ce_with_weights(
            logits, torch.from_numpy(np.asarray(my, np.float64)), w
        )
        opt.zero_grad()
        loss.backward()
        opt.step()
        losses.append(float(loss.detach()))
    return losses, tparams


def test_finetune_trajectory_matches_torch_reference_loop():
    cfg = ViTConfig(**CFG)
    model = VisionTransformer3D(cfg)
    vols, labels = _data()
    base_rng = jax.random.PRNGKey(5)

    variables = model.init({"params": jax.random.PRNGKey(1)},
                           jnp.asarray(vols[0]))
    params = jax.tree.map(lambda x: jnp.asarray(x, jnp.float64),
                          variables["params"])

    # make_supervised_steps donates the state (production behaviour); give
    # the jax side its own buffer copy so `params` stays alive for torch
    jax_losses, jax_params = _run_jax(
        model, jax.tree.map(jnp.array, params), vols, labels, base_rng
    )
    torch_losses, torch_params = _run_torch(cfg, params, vols, labels, base_rng)

    # Calibrated on CPU f64: correct composition measures worst loss rel
    # 3.9e-8 / worst param leaf 5.0e-8; injected semantic bugs (decaying
    # pos_embed/cls, layer_decay=1.0, betas=(0.9, 0.95)) each diverge to
    # 0.59-0.87 within 10 steps — ~7 orders above these thresholds.
    for i, (got, want) in enumerate(zip(jax_losses, torch_losses)):
        assert abs(got - want) <= 5e-7 * abs(want), (
            f"loss diverged at step {i}: {got} vs {want}\n"
            f"jax:   {jax_losses}\ntorch: {torch_losses}"
        )

    rel, where = _max_rel_err(jax_params, torch_params)
    assert rel < 1e-6, f"param trajectory diverged: rel {rel:.2e} at {where}"
