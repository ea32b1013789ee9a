"""Composed 3D-ResNet-baseline training-UPDATE parity vs a torch replica of
the reference loop.

The supervised ResNet baseline is the last reference training loop without a
trajectory oracle (MAE/contrastive, fine-tune, probe, and MoCo have theirs).
Its composition (/root/reference/k_fold_training_scripts/train_3d_resnet.py:
29-74, 259-267 + utils/lr_sched.py:9-21):

    per-ITERATION warmup-cosine lr at fractional epoch -> BN-heavy ResNet-10
    forward (batch statistics in train mode) -> class-weighted CE
    (CrossEntropyLoss(weight=[3, 1]): weighted per-sample NLL normalised by
    the sum of selected weights) -> plain Adam (torch defaults 0.9/0.999,
    eps 1e-8, no weight decay).

Both sides run 10 steps on CPU float64 from identical init through OUR
production objects — generate_model + make_resnet_steps + make_resnet_tx (the
exact jitted step and optimizer resnet_kfold builds) — and through a torch
loop written from the reference's lines (resnet3d_forward + Adam +
adjust_learning_rate in torch_oracle.py). Per-step losses, the final param
tree, and the BN running buffers must agree. Writing this test caught a real
bug: resnet_kfold ran CONSTANT lr 1e-4 where the reference schedules lr per
iteration (train_3d_resnet.py:47-48), and weighted_ce hard-cast logits to f32.

This doubles as the first numerical oracle for ResNet3D at all (the prior
tests checked shapes/variance only): conv1 stride/padding, the maxpool, the
shortcut-'B' downsample convs, BN epsilon/momentum, and the avgpool+fc head
are all pinned here, forward AND backward.

Why float64: same argument as the sibling trajectory tests. Adam normalises
per-element by sqrt(v̂), so f32 rounding noise turns into lr-scale drift on
low-gradient leaves; in f64 the noise floor sits ~8 orders below any semantic
bug (constant lr, eps inside the sqrt, biased-vs-unbiased CE normalisation).
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from vit_ae_plus_plus_tpu.models.resnet3d import generate_model
from vit_ae_plus_plus_tpu.pipelines.resnet_kfold import make_resnet_steps, make_resnet_tx
from vit_ae_plus_plus_tpu.train.state import TrainState

import torch_oracle as oracle
from test_train_trajectory import _torch_tree

B = 4
VOL = 16
STEPS = 10
SPE = 2
EPOCHS = 5
WARMUP = 2          # warmup ends mid-run: both schedule branches exercised
LR = 1e-3           # more motion than the production 1e-4; same composition
MIN_LR = 1e-5
CLASS_W = (3.0, 1.0)
LAYERS = (1, 1, 1, 1)  # depth 10


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


def _data():
    rng = np.random.default_rng(11)
    x = rng.standard_normal((STEPS, B, 1, VOL, VOL, VOL))
    # both classes present in every batch so the [3, 1] weighting matters
    y = np.stack([rng.permutation(np.arange(B) % 2) for _ in range(STEPS)])
    return x, y.astype(np.int64)


def _run_jax(model, variables, x, y):
    tx = make_resnet_tx(LR, EPOCHS, SPE, min_lr=MIN_LR, warmup_epochs=WARMUP)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]), tx=tx,
    )
    train_step, _ = make_resnet_steps(model, np.asarray(CLASS_W))
    rng = jax.random.PRNGKey(0)  # unused: no stochastic augment in this step
    losses = []
    for i in range(STEPS):
        state, m = train_step(state, jnp.asarray(x[i]), jnp.asarray(y[i]), rng)
        losses.append(float(m["loss"]))
    return losses, jax.device_get(state.params), jax.device_get(state.batch_stats)


def _run_torch(variables, x, y):
    tparams, named = _torch_tree(variables["params"])
    opt = torch.optim.Adam([p for _, p in named], lr=LR)
    bufs = {}
    losses = []
    for i in range(STEPS):
        oracle.adjust_learning_rate(opt, i / SPE, LR, MIN_LR, WARMUP, EPOCHS)
        logits = oracle.resnet3d_forward(oracle.t(x[i]), tparams, bufs,
                                         layers=LAYERS)
        loss = F.cross_entropy(logits, torch.from_numpy(y[i]),
                               weight=oracle.t(np.asarray(CLASS_W)))
        opt.zero_grad()
        loss.backward()
        opt.step()
        losses.append(float(loss.detach()))
    return losses, tparams, bufs


def _worst_err(got_tree, want_tree, rtol, atol):
    worst = (0.0, "")
    for (path, got), (_, want) in zip(
        jax.tree_util.tree_flatten_with_path(got_tree)[0],
        jax.tree_util.tree_flatten_with_path(want_tree)[0],
    ):
        w = want.detach().numpy() if isinstance(want, torch.Tensor) else np.asarray(want)
        g = np.asarray(got)
        err = np.max(np.abs(g - w)) / (rtol * np.max(np.abs(w)) + atol)
        if err > worst[0]:
            worst = (float(err), jax.tree_util.keystr(path))
    return worst


def _flat_bn_stats(batch_stats):
    """flax batch_stats tree -> {'BasicBlock3D_0/BatchNorm_0': {mean, var}}
    matching the oracle's buffer naming."""
    out = {}
    for key, sub in batch_stats.items():
        if key.startswith("BatchNorm"):
            out[key] = sub
        else:
            for bn_key, stats in sub.items():
                out[f"{key}/{bn_key}"] = stats
    return out


def test_resnet_trajectory_matches_torch_reference_loop():
    model = generate_model(10, n_classes=2, widen_factor=0.25, dtype=jnp.float64)
    x, y = _data()
    sample = jnp.zeros((B, 1, VOL, VOL, VOL))
    variables = model.init({"params": jax.random.PRNGKey(5)}, sample)
    variables = jax.tree.map(lambda v: jnp.asarray(v, jnp.float64), variables)

    jax_losses, jax_params, jax_bs = _run_jax(
        model, jax.tree.map(jnp.array, variables), x, y)
    torch_losses, torch_params, torch_bufs = _run_torch(variables, x, y)

    # Calibrated on CPU f64: correct composition measures worst loss rel
    # 2.9e-13 and worst param leaf 4.2e-4x the rtol=1e-9/atol=1e-12 line; the
    # constant-lr bug this test caught lands at 2.1e9x the same line by
    # step 10 — a >1e12 separation.
    for i, (got, want) in enumerate(zip(jax_losses, torch_losses)):
        assert abs(got - want) <= 1e-9 * abs(want), (
            f"loss diverged at step {i}: {got} vs {want}\n"
            f"jax:   {jax_losses}\ntorch: {torch_losses}"
        )

    err, where = _worst_err(jax_params, torch_params, rtol=1e-9, atol=1e-12)
    assert err < 1, f"param trajectory diverged: {err:.2e}x tol at {where}"

    # BN running buffers: means agree directly; torch accumulates the
    # UNBIASED batch var where flax accumulates the biased one, so rescale
    # flax's accumulated batch contributions by n/(n-1) (per-layer n from the
    # oracle) and leave the momentum-decayed init value 1.0 unscaled.
    flat = _flat_bn_stats(jax_bs)
    assert set(flat) == set(torch_bufs)
    for name, stats in flat.items():
        buf = torch_bufs[name]
        np.testing.assert_allclose(
            np.asarray(stats["mean"]), buf["mean"].numpy(),
            rtol=1e-9, atol=1e-12, err_msg=f"running mean diverged at {name}")
        c = buf["n"] / (buf["n"] - 1)
        corrected = np.asarray(stats["var"]) * c - 0.9 ** STEPS * (c - 1)
        np.testing.assert_allclose(
            corrected, buf["var"].numpy(),
            rtol=1e-9, atol=1e-12, err_msg=f"running var diverged at {name}")
