"""Optimizer + LR schedule with Dassl-equivalent semantics.

The reference uses torch SGD (momentum 0.9, weight decay 5e-4, Dassl
defaults) stepped per batch, with a *per-epoch* cosine schedule and a
1-epoch constant warmup (configs/trainers/RPO/main.yaml:16-23; scheduler
advanced by update_lr() at the last batch of each epoch, rpo.py:313-314).

TPU-native: the learning rate for the epoch is computed host-side and
passed into the jitted train step as a scalar argument — one jit cache
entry regardless of schedule, no torch-style scheduler objects.

SGD update matches torch exactly (decoupled schedules aside):
    g = grad + wd * p
    buf = momentum * buf + g          (dampening 0)
    p = p - lr * buf                  (nesterov False)
"""
from __future__ import annotations

import math
from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp


class SGDState(NamedTuple):
    momentum: Any  # pytree like params
    # update count, needed for torch-exact dampening (torch skips the
    # (1-dampening) factor on the very first buffer write); legacy
    # single-field states unpickle with the default and behave as fresh
    step: Any = 0


def sgd_init(params) -> SGDState:
    return SGDState(
        momentum=jax.tree_util.tree_map(jnp.zeros_like, params),
        step=jnp.zeros((), jnp.int32),
    )


def sgd_update(
    params,
    grads,
    state: SGDState,
    lr,
    momentum: float = 0.9,
    weight_decay: float = 5e-4,
    nesterov: bool = False,
    dampening: float = 0.0,
) -> Tuple[Any, SGDState]:
    tm = jax.tree_util.tree_map
    g_wd = tm(lambda g, p: g + weight_decay * p, grads, params)
    if dampening:
        # torch SGD: the FIRST buffer write is buf = g (no dampening);
        # afterwards buf = momentum*buf + (1-dampening)*g.  torch forbids
        # nesterov with dampening (same check in the caller's config).
        first = jnp.asarray(state.step) == 0
        new_buf = tm(
            lambda b, g: jnp.where(first, g, momentum * b + (1.0 - dampening) * g),
            state.momentum, g_wd,
        )
    else:
        new_buf = tm(lambda b, g: momentum * b + g, state.momentum, g_wd)
    step = tm(lambda b, g: momentum * b + g, new_buf, g_wd) if nesterov else new_buf
    new_params = tm(lambda p, s: p - lr * s, params, step)
    return new_params, SGDState(
        momentum=new_buf, step=jnp.asarray(state.step) + 1
    )


def lr_at_epoch(cfg_optim, epoch: int) -> float:
    """Per-epoch LR with warmup, matching Dassl's scheduler composition.

    Dassl wraps the main scheduler in a warmup scheduler
    (_BaseWarmupScheduler): epochs < WARMUP_EPOCH yield the warmup LR
    (constant or linear ramp); the wrapper only starts delegating
    ``step()`` to the successor once warmup ends, and the successor's
    epoch counter starts at 0 at that point — so the main schedule runs
    over (epoch - WARMUP_EPOCH), i.e. a cosine restarts at the FULL base
    LR on the first post-warmup epoch (the CoOp/RPO warmup trick: one
    epoch at 1e-5, then cosine from LR).  Pinned against a torch
    reconstruction of Dassl's scheduler in
    tests/test_full_protocol_parity.py.
    """
    lr = float(cfg_optim.LR)
    max_epoch = int(cfg_optim.MAX_EPOCH)
    warmup = int(cfg_optim.WARMUP_EPOCH)
    if warmup > 0:
        if epoch < warmup:
            if cfg_optim.WARMUP_TYPE == "constant":
                return float(cfg_optim.WARMUP_CONS_LR)
            if cfg_optim.WARMUP_TYPE == "linear":
                # Dassl _LinearWarmupScheduler: WARMUP_MIN_LR at epoch 0,
                # then LR * epoch / warmup_epoch
                if epoch == 0:
                    return float(cfg_optim.WARMUP_MIN_LR)
                return lr * epoch / warmup
            raise ValueError(f"Unknown WARMUP_TYPE {cfg_optim.WARMUP_TYPE}")
        if getattr(cfg_optim, "WARMUP_RECOUNT", True):
            epoch = epoch - warmup  # successor schedule recounts from 0
        # WARMUP_RECOUNT=False: the successor runs on the absolute epoch
        # index (warmup epochs count toward the main schedule)

    sched = cfg_optim.LR_SCHEDULER
    if sched == "cosine":
        return lr * 0.5 * (1.0 + math.cos(math.pi * epoch / max_epoch))
    if sched == "single_step":
        step = cfg_optim.STEPSIZE[0] if cfg_optim.STEPSIZE else -1
        if step <= 0:
            return lr
        return lr * (float(cfg_optim.GAMMA) ** (epoch // step))
    if sched == "multi_step":
        passed = sum(1 for s in cfg_optim.STEPSIZE if epoch >= s)
        return lr * (float(cfg_optim.GAMMA) ** passed)
    if sched == "constant":
        return lr
    raise ValueError(f"Unknown LR_SCHEDULER {sched}")
