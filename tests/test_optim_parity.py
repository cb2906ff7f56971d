"""SGD + schedule parity vs torch (the reference's optimizer semantics)."""
import numpy as np
import pytest

import jax.numpy as jnp

from rpo_tpu.engine.optim import lr_at_epoch, sgd_init, sgd_update

torch = pytest.importorskip("torch")


def test_sgd_matches_torch():
    rng = np.random.RandomState(0)
    w0 = rng.randn(4, 8).astype(np.float32)

    t_w = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.SGD([t_w], lr=0.01, momentum=0.9, weight_decay=5e-4)

    j_w = {"w": jnp.asarray(w0)}
    state = sgd_init(j_w)

    for step in range(5):
        g = rng.randn(4, 8).astype(np.float32)
        opt.zero_grad()
        t_w.grad = torch.from_numpy(g.copy())
        opt.step()
        j_w, state = sgd_update(
            j_w, {"w": jnp.asarray(g)}, state, 0.01, momentum=0.9, weight_decay=5e-4
        )
        np.testing.assert_allclose(
            np.asarray(j_w["w"]), t_w.detach().numpy(), rtol=1e-6, atol=1e-7
        )


def test_sgd_nesterov_matches_torch():
    rng = np.random.RandomState(1)
    w0 = rng.randn(6).astype(np.float32)
    t_w = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.SGD([t_w], lr=0.05, momentum=0.9, weight_decay=0.0, nesterov=True)
    j_w = {"w": jnp.asarray(w0)}
    state = sgd_init(j_w)
    for _ in range(4):
        g = rng.randn(6).astype(np.float32)
        opt.zero_grad()
        t_w.grad = torch.from_numpy(g.copy())
        opt.step()
        j_w, state = sgd_update(
            j_w, {"w": jnp.asarray(g)}, state, 0.05,
            momentum=0.9, weight_decay=0.0, nesterov=True,
        )
        np.testing.assert_allclose(
            np.asarray(j_w["w"]), t_w.detach().numpy(), rtol=1e-6, atol=1e-7
        )


def test_cosine_schedule_matches_torch():
    """Per-epoch cosine matches torch CosineAnnealingLR(T_max=MAX_EPOCH)."""

    class O:
        LR = 0.01
        MAX_EPOCH = 15
        LR_SCHEDULER = "cosine"
        WARMUP_EPOCH = -1
        WARMUP_TYPE = "constant"
        WARMUP_CONS_LR = 1e-5
        WARMUP_MIN_LR = 1e-5
        STEPSIZE = (-1,)
        GAMMA = 0.1

    w = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([w], lr=O.LR)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=O.MAX_EPOCH)
    for epoch in range(O.MAX_EPOCH):
        torch_lr = opt.param_groups[0]["lr"]
        ours = lr_at_epoch(O, epoch)
        np.testing.assert_allclose(ours, torch_lr, rtol=1e-6)
        opt.step()  # torch wants optimizer.step() before scheduler.step()
        sched.step()


def test_constant_warmup_composition_matches_dassl():
    """lr_at_epoch's warmup->cosine composition vs a torch reconstruction
    of Dassl's ConstantWarmupScheduler (stepped once per epoch): warmup
    epochs at cons_lr, then the cosine successor restarts from ITS epoch 0
    — the first post-warmup epoch trains at the full base LR."""
    from tests.test_full_protocol_parity import DasslConstantWarmup

    class O:
        LR = 0.01
        MAX_EPOCH = 15
        LR_SCHEDULER = "cosine"
        WARMUP_EPOCH = 1
        WARMUP_TYPE = "constant"
        WARMUP_CONS_LR = 1e-5
        WARMUP_MIN_LR = 1e-5
        STEPSIZE = (-1,)
        GAMMA = 0.1

    w = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([w], lr=O.LR)
    cosine = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=O.MAX_EPOCH)
    sched = DasslConstantWarmup(opt, cosine, O.WARMUP_EPOCH, O.WARMUP_CONS_LR)
    for epoch in range(O.MAX_EPOCH):
        torch_lr = opt.param_groups[0]["lr"]
        np.testing.assert_allclose(
            lr_at_epoch(O, epoch), torch_lr, rtol=1e-9,
            err_msg=f"epoch {epoch}",
        )
        opt.step()
        sched.step()


def test_sgd_dampening_matches_torch():
    """torch applies (1-dampening) to every buffer update EXCEPT the very
    first write (buf starts as the raw grad) — sgd_update reproduces that
    via the SGDState.step counter."""
    rng = np.random.RandomState(3)
    w0 = rng.randn(4, 8).astype(np.float32)

    t_w = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.SGD(
        [t_w], lr=0.01, momentum=0.9, weight_decay=5e-4, dampening=0.3
    )

    j_w = {"w": jnp.asarray(w0)}
    state = sgd_init(j_w)

    for step in range(6):
        g = rng.randn(4, 8).astype(np.float32)
        opt.zero_grad()
        t_w.grad = torch.from_numpy(g.copy())
        opt.step()
        j_w, state = sgd_update(
            j_w, {"w": jnp.asarray(g)}, state, 0.01,
            momentum=0.9, weight_decay=5e-4, dampening=0.3,
        )
        np.testing.assert_allclose(
            np.asarray(j_w["w"]), t_w.detach().numpy(), rtol=1e-6, atol=1e-7,
            err_msg=f"diverged at step {step}",
        )


def test_warmup_recount_false_counts_warmup_epochs():
    """OPTIM.WARMUP_RECOUNT=False: the successor runs on the absolute
    epoch index (warmup epochs count toward the cosine), instead of
    restarting at full LR after warmup."""
    import math
    import types

    base = dict(
        LR=0.01, MAX_EPOCH=10, LR_SCHEDULER="cosine",
        WARMUP_EPOCH=1, WARMUP_TYPE="constant", WARMUP_CONS_LR=1e-5,
        WARMUP_MIN_LR=1e-5, STEPSIZE=(-1,), GAMMA=0.1,
    )
    recount = types.SimpleNamespace(**base, WARMUP_RECOUNT=True)
    absolute = types.SimpleNamespace(**base, WARMUP_RECOUNT=False)
    assert lr_at_epoch(recount, 0) == lr_at_epoch(absolute, 0) == 1e-5
    # first post-warmup epoch: recount restarts at full LR ...
    np.testing.assert_allclose(lr_at_epoch(recount, 1), 0.01)
    # ... absolute continues the cosine at epoch index 1
    np.testing.assert_allclose(
        lr_at_epoch(absolute, 1), 0.01 * 0.5 * (1 + math.cos(math.pi * 1 / 10))
    )
    # default (attr missing) == recount semantics
    legacy = types.SimpleNamespace(**base)
    assert lr_at_epoch(legacy, 1) == lr_at_epoch(recount, 1)
