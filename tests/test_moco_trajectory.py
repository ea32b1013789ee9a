"""Composed MoCo-v3 training-UPDATE parity vs a torch replica of the
reference loop.

test_train_trajectory.py pins the MAE pretraining update, and the finetune/
probe tests pin the supervised stacks. The MoCo baseline composes yet another
stack the reference runs per iteration
(/root/reference/other_baselines/mocov3/main_3d_moco_k_fold.py:426-455,
516-542; moco/builder.py:56-98; moco/optimizer.py:10-43):

    per-ITERATION warmup + half-cycle-cosine-to-zero lr, per-ITERATION cosine
    MoCo momentum m: m0 -> 1 -> EMA update of the momentum encoder with the
    CURRENT base params BEFORE the key forward (inside builder.forward) ->
    symmetric InfoNCE (CE over arange labels, * 2T) on
    predictor(projector(trunk(x))) vs momentum projector(trunk(x)) ->
    LARS (weight decay + trust ratio for >1-D params only, heavy-ball
    momentum).

Both sides run 10 steps on CPU float64 from identical init through OUR
production objects — build_moco_model + make_moco_train_step (the jitted
step moco_kfold runs) + make_lars + warmup_cosine_schedule +
adjust_moco_momentum — and through a torch loop written from the reference's
lines (RefLARS and the MoCo oracle pieces in torch_oracle.py). Per-step
losses, the final base parameter tree, AND the final momentum-encoder tree
must agree: the momentum tree is the sharp part, since it integrates the
m-schedule — applying m(i) one iteration late (the pre-round-4 step ordering)
shifts every momentum leaf while leaving constant-m runs identical.

Why float64: same argument as the sibling tests — in f32, independent
rounding noise on both sides masks small semantic drifts. LARS is gentler
than Adam (layer-wise, not per-element normalisation), but the EMA off-by-one
it must catch perturbs the keys by ~(1-m)*lr-scale per step, far below f32
loss noise at 10 steps.
"""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from vit_ae_plus_plus_tpu.configs import DataConfig
from vit_ae_plus_plus_tpu.pipelines.moco_kfold import (
    MoCoState,
    adjust_moco_momentum,
    build_moco_model,
    make_moco_train_step,
)
from vit_ae_plus_plus_tpu.train import warmup_cosine_schedule
from vit_ae_plus_plus_tpu.train.optim import make_lars

import torch_oracle as oracle
from test_train_trajectory import _torch_tree

B = 4
VOL = 16
PATCH = 4
STEPS = 10
SPE = 2
EPOCHS = 5
WARMUP = 2
LR = 0.05
WD = 0.01          # larger than the production 1e-6 so a decay-mask bug shows
MOCO_M = 0.9       # faster EMA motion than the production 0.99: schedule bugs grow
TEMP = 1.0


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


def _model():
    data_cfg = DataConfig(volume_size=VOL, in_channels=1)
    return build_moco_model(
        data_cfg, compute_dtype="float64", arch="vit",
        moco_dim=8, moco_mlp_dim=16,
        vit_overrides=dict(patch_size=PATCH, embed_dim=24, depth=2, num_heads=3),
    )


def _data():
    rng = np.random.default_rng(23)
    x1 = rng.standard_normal((STEPS, B, 1, VOL, VOL, VOL))
    x2 = rng.standard_normal((STEPS, B, 1, VOL, VOL, VOL))
    return x1, x2


def _run_jax(model, variables, x1, x2):
    tx = make_lars(warmup_cosine_schedule(LR, 0.0, WARMUP, EPOCHS, SPE),
                   weight_decay=WD)
    state = MoCoState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        momentum_params=jax.tree.map(jnp.copy, variables["params"]),
        momentum_batch_stats=jax.tree.map(
            jnp.copy, variables.get("batch_stats", {})),
        opt_state=tx.init(variables["params"]),
        tx=tx,
    )
    step = make_moco_train_step(model, temperature=TEMP)
    losses = []
    for i in range(STEPS):
        m = adjust_moco_momentum(i / SPE, MOCO_M, EPOCHS)
        state, metrics = step(state, jnp.asarray(x1[i]), jnp.asarray(x2[i]),
                              jnp.float64(m))
        losses.append(float(metrics["loss"]))
    return losses, jax.device_get(state.params), jax.device_get(state.momentum_params)


def _run_torch(cfg, variables, x1, x2):
    tparams, named = _torch_tree(variables["params"])
    # momentum encoder = trunk + projector only: the reference zips
    # base_encoder.parameters() (which holds the grafted projector as its
    # head) with momentum_encoder.parameters(); the predictor is a separate
    # module and is never EMA'd (builder.py:28-33, 57-61)
    mom = {
        part: jax.tree.map(
            lambda p: p.detach().clone(), tparams[part])
        for part in ("trunk", "projector")
    }
    opt = oracle.RefLARS([p for _, p in named], lr=LR, weight_decay=WD)

    losses = []
    for i in range(STEPS):
        oracle.adjust_learning_rate(opt, i / SPE, LR, 0.0, WARMUP, EPOCHS)
        m = oracle.moco_momentum_schedule(i / SPE, EPOCHS, MOCO_M)
        # EMA with the CURRENT base params, before the key forward
        # (builder.py forward: _update_momentum_encoder precedes the key pass)
        for part in ("trunk", "projector"):
            mom[part] = jax.tree.map(
                lambda pm, pb: pm * m + pb.detach() * (1.0 - m),
                mom[part], tparams[part])

        tx1, tx2 = oracle.t(x1[i]), oracle.t(x2[i])
        q1 = oracle.moco_vit_encode(tx1, tparams, cfg, use_predictor=True)
        q2 = oracle.moco_vit_encode(tx2, tparams, cfg, use_predictor=True)
        with torch.no_grad():
            k1 = oracle.moco_vit_encode(tx1, mom, cfg, use_predictor=False)
            k2 = oracle.moco_vit_encode(tx2, mom, cfg, use_predictor=False)
        loss = (oracle.moco_contrastive_loss(q1, k2, TEMP)
                + oracle.moco_contrastive_loss(q2, k1, TEMP))

        opt.zero_grad()
        loss.backward()
        opt.step()
        losses.append(float(loss.detach()))
    return losses, tparams, mom


def _worst_err(got_tree, want_tree, rtol, atol):
    """Worst per-leaf max|got-want| / (rtol*max|want| + atol).

    Unlike the MAE trajectory's pure-relative check, this one needs an atol:
    MoCo's trunk/norm/bias is mathematically gradient-free (a constant shift
    of every trunk feature is removed by the projector's first BatchNorm, and
    the momentum branch is stop-gradient), so both integrators hold only
    ~1e-13 of f64 cancellation noise there and a relative comparison is
    noise/noise."""
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


def test_moco_trajectory_matches_torch_reference_loop():
    model = _model()
    x1, x2 = _data()

    sample = jnp.asarray(x1[0])
    variables = model.init({"params": jax.random.PRNGKey(3)}, sample,
                           use_predictor=True)
    variables = jax.tree.map(lambda x: jnp.asarray(x, jnp.float64), variables)

    jax_losses, jax_params, jax_mom = _run_jax(
        model, jax.tree.map(jnp.array, variables), x1, x2)
    torch_losses, torch_params, torch_mom = _run_torch(
        model.cfg, variables, x1, x2)

    # Calibrated on CPU f64: correct composition measures worst loss rel
    # 2.5e-11 at step 10, worst gradient-carrying param leaf 7e-11 rel /
    # gradient-free trunk/norm/bias 2e-13 abs. Injected semantic bugs — EMA
    # after the optimizer step (m one iteration late), decayed biases, trust
    # ratio on 1-D params, per-epoch lr, optax.lars's lr-before-trace momentum
    # (which this test caught) — each land orders of magnitude above the
    # rtol=1e-9/atol=1e-11 lines.
    for i, (got, want) in enumerate(zip(jax_losses, torch_losses)):
        assert abs(got - want) <= 1e-9 * abs(want), (
            f"loss diverged at step {i}: {got} vs {want}\n"
            f"jax:   {jax_losses}\ntorch: {torch_losses}"
        )

    err, where = _worst_err(jax_params, torch_params, rtol=1e-9, atol=1e-11)
    assert err < 1, f"base param trajectory diverged: {err:.2e}x tol at {where}"

    # the momentum tree integrates the m-schedule: the sharpest signal for
    # EMA-ordering bugs (trunk + projector; the predictor copy is unused and
    # not part of the reference's momentum encoder)
    for part in ("trunk", "projector"):
        err, where = _worst_err(jax_mom[part], torch_mom[part],
                                rtol=1e-9, atol=1e-11)
        assert err < 1, (
            f"momentum tree diverged in {part}: {err:.2e}x tol at {where}")
