"""Composed LINEAR-PROBE update parity vs a torch replica of the reference loop.

Completes the trajectory-parity triptych (pretrain: test_train_trajectory.py,
fine-tune: test_finetune_trajectory.py) with the third production update stack
the reference runs per iteration
(/root/reference/k_fold_training_scripts/k_fold_cross_valid_linear_projection.py:31-45,
265-283; post_training_utils/fine_tune_epoch.py:52-53 — the probe reuses the
fine-tune's train_one_epoch; utils/lr_sched.py:9-21):

    MixUp3D (random-permutation partner, TWO independent Beta(0.1, 0.1)
    lambdas — one per partial_mixup call, inputs and one-hot targets mixed
    with different lambdas, no label smoothing) -> classifier ViT forward
    (head re-init trunc_normal(2e-5)) -> SoftCrossEntropyWithWeightsLoss ->
    grads -> HEAD-ONLY SGD(momentum=0.9, weight_decay=0; the probe's
    bootstrap key FINE_TUNE_K_FOLD sets weight_decay = 0, config.ini:78,
    and the optimizer sees exactly the 2 head tensors,
    linear_projection.py:267-272) -> per-ITERATION warmup-cosine lr.

Both sides run 10 steps on CPU float64 from identical init through OUR
production objects — head_init_2e5, freeze_backbone_tx(make_sgd(sched, 0.9)),
make_supervised_steps(mixup_impl='reference') exactly as
pipelines/probe_kfold.py:111,130-133 composes them — and through a torch loop
written from the reference's lines. Mixup randomness is aligned by
construction: the torch side consumes the (mixed_x, soft_y) our mixup_3d
produces for the SAME folded rng the production step derives, so the jax
side's in-step mixup is exercised and any drift in it breaks the loss trace.

The param fingerprint doubles as the freeze proof: if freeze_backbone_tx ever
let a trunk leaf move (torch's optimizer only holds the head), the tree
comparison diverges at that leaf.
"""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from vit_ae_plus_plus_tpu.configs import ViTConfig
from vit_ae_plus_plus_tpu.models import VisionTransformer3D
from vit_ae_plus_plus_tpu.pipelines.finetune import (
    freeze_backbone_tx,
    head_init_2e5,
    make_supervised_steps,
    mixup_3d,
)
from vit_ae_plus_plus_tpu.train.optim import make_sgd, warmup_cosine_schedule
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
LR = 1e-2
MIN_LR = 0.0  # reference default for the probe (linear_projection.py:65)
CLASS_W = np.array([1.0, 3.0], np.float32)


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
    rng = np.random.default_rng(23)
    vols = rng.standard_normal((STEPS, B, 1, VOL, VOL, VOL)).astype(np.float64)
    labels = rng.integers(0, 2, (STEPS, B))
    return vols, labels


def _run_jax(model, params, vols, labels, base_rng):
    sched = warmup_cosine_schedule(LR, MIN_LR, WARMUP, EPOCHS, SPE)
    tx = freeze_backbone_tx(params, make_sgd(sched, momentum=0.9))
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       batch_stats={}, opt_state=tx.init(params), tx=tx)
    train_step, _ = make_supervised_steps(
        model, num_classes=2, class_weights=CLASS_W, use_mixup=True,
        mixup_impl="reference",
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
    head = [p for name, p in named if name.startswith("head/")]
    assert len(head) == 2  # the reference's fc.weight/fc.bias assert
    opt = torch.optim.SGD(head, lr=LR, momentum=0.9, weight_decay=0.0)
    w = torch.from_numpy(CLASS_W.astype(np.float64))

    losses = []
    for i in range(STEPS):
        oracle.adjust_learning_rate(opt, i / SPE, LR, MIN_LR, WARMUP, EPOCHS)
        # reproduce the production step's exact mixup draw
        # (rng = fold_in(base, state.step); one_hot targets, two lambdas)
        rng_i = jax.random.fold_in(base_rng, i)
        one_hot = jax.nn.one_hot(jnp.asarray(labels[i]), 2)
        mx, my = mixup_3d(rng_i, jnp.asarray(vols[i]), one_hot)
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


def test_probe_trajectory_matches_torch_reference_loop():
    cfg = ViTConfig(**CFG)
    model = VisionTransformer3D(cfg)
    vols, labels = _data()
    base_rng = jax.random.PRNGKey(9)

    variables = model.init({"params": jax.random.PRNGKey(3)},
                           jnp.asarray(vols[0]))
    params = jax.tree.map(lambda x: jnp.asarray(x, jnp.float64),
                          variables["params"])
    params = head_init_2e5(params, jax.random.PRNGKey(4))

    jax_losses, jax_params = _run_jax(
        model, jax.tree.map(jnp.array, params), vols, labels, base_rng
    )
    torch_losses, torch_params = _run_torch(cfg, params, vols, labels, base_rng)

    # Calibrated on CPU f64: correct composition measures worst loss rel
    # 2.3e-8 / worst param leaf 1.8e-8; injected semantic bugs (momentum 0.8,
    # a shared-lambda mixup) diverge to 0.12-1.05 within 10 steps — ~7 orders
    # above these thresholds.
    for i, (got, want) in enumerate(zip(jax_losses, torch_losses)):
        assert abs(got - want) <= 5e-7 * abs(want), (
            f"loss diverged at step {i}: {got} vs {want}\n"
            f"jax:   {jax_losses}\ntorch: {torch_losses}"
        )

    rel, where = _max_rel_err(jax_params, torch_params)
    assert rel < 1e-6, f"param trajectory diverged: rel {rel:.2e} at {where}"
