"""Multi-step training-dynamics parity for the baseline methods.

Counterpart of test_train_dynamics_parity (RPO): 8 SGD steps with the
protocol optimizer (momentum 0.9, wd 5e-4) and the warmup->cosine
schedule, identical data, our jitted step vs the torch reference —
  - CoOp:   reference CustomCLIP (/root/reference/trainers/coop.py) +
            external cross-entropy (its trainer computes CE in
            forward_backward, coop.py:259-291), trainable ctx only.
  - CoCoOp: reference CustomCLIP (/root/reference/trainers/cocoop.py) in
            train mode (returns CE loss, cocoop.py:191-192), trainable
            ctx + meta_net.
  - LP:     hand-rolled torch loop of the reference math
            (linear_prob.py:61-97: identity-init linear on UNnormalized
            image features vs frozen normalized text features) — the
            reference module hardcodes eye(512) (linear_prob.py:71-72)
            and cannot instantiate at the small oracle dims.

A divergence anywhere in loss, grads, optimizer, or schedule composition
shows up in the parameter trajectory.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rpo_tpu.engine.optim import lr_at_epoch, sgd_init, sgd_update
from rpo_tpu.methods import cocoop as jcocoop
from rpo_tpu.methods import coop as jcoop
from rpo_tpu.methods import linear_probe as jlp

from .oracle import load_reference_module
from .test_coop_parity import CLASSNAMES, N_CTX, _coop_cfg, small_clip  # noqa: F401

torch = pytest.importorskip("torch")

MOMENTUM = 0.9
WEIGHT_DECAY = 5e-4
STEPS = 8
STEPS_PER_EPOCH = 2


class _O:
    LR = 0.002  # CoOp/CoCoOp/LP protocol LR
    MAX_EPOCH = 4
    LR_SCHEDULER = "cosine"
    WARMUP_EPOCH = 1
    WARMUP_TYPE = "constant"
    WARMUP_CONS_LR = 1e-5
    WARMUP_MIN_LR = 1e-5
    STEPSIZE = (-1,)
    GAMMA = 0.1


def _batches(seed, n=STEPS, b=2):
    rng = np.random.RandomState(seed)
    return [
        (
            rng.randn(b, 32, 32, 3).astype(np.float32),
            rng.randint(0, len(CLASSNAMES), size=b),
        )
        for _ in range(n)
    ]


def _torch_sgd(params):
    return torch.optim.SGD(
        params, lr=1.0, momentum=MOMENTUM, weight_decay=WEIGHT_DECAY
    )


def _from_torch(t):
    """Copy a torch tensor into a jax array.

    ``jnp.asarray(t.detach().numpy())`` is ZERO-COPY on the CPU backend:
    the jax array aliases the torch parameter's storage, so the torch
    optimizer's in-place ``opt.step()`` (which runs before the jax step
    in the trajectory loop below) silently mutates what jax reads.
    ``np.array`` forces a real copy at capture time.
    """
    return jnp.asarray(np.array(t.detach().numpy()))


def _run_trajectory(jstep, jparams, torch_step, batches):
    """Drive both loops over the same batches; assert per-step losses."""
    jo = sgd_init(jparams)
    for step, (imgs, labels) in enumerate(batches):
        lr = lr_at_epoch(_O, step // STEPS_PER_EPOCH)
        loss_t = torch_step(imgs, labels, lr)
        jparams, jo, loss_j = jstep(
            jparams, jo, jnp.asarray(imgs), jnp.asarray(labels), lr
        )
        np.testing.assert_allclose(
            float(loss_j), loss_t, rtol=2e-3, atol=2e-3,
            err_msg=f"loss diverged at step {step}",
        )
    return jparams


def test_coop_trajectory_matches_reference(small_clip):
    model, params, cfg = small_clip
    ref_coop = load_reference_module("/root/reference/trainers/coop.py", "_ref_coop_dyn")
    torch.manual_seed(11)
    ref_model = ref_coop.CustomCLIP(_coop_cfg(), CLASSNAMES, model).float()
    pl = ref_model.prompt_learner
    for p in ref_model.parameters():
        p.requires_grad_(False)
    pl.ctx.requires_grad_(True)
    opt = _torch_sgd([pl.ctx])

    task = jcoop.make_task(
        cfg, CLASSNAMES, N_CTX, False, "end", " ".join(["X"] * N_CTX)
    )
    jparams = {"ctx": _from_torch(pl.ctx)}

    def torch_step(imgs, labels, lr):
        for g in opt.param_groups:
            g["lr"] = lr
        opt.zero_grad()
        logits = ref_model(torch.from_numpy(imgs).permute(0, 3, 1, 2))
        loss = torch.nn.functional.cross_entropy(logits, torch.from_numpy(labels))
        loss.backward()
        opt.step()
        return float(loss.detach())

    @jax.jit
    def jstep(p, o, images, labels, lr):
        def loss_fn(pp):
            logits = jcoop.coop_logits(pp, params, task, images)
            logp = jax.nn.log_softmax(logits, -1)
            return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], 1))

        loss, g = jax.value_and_grad(loss_fn)(p)
        p, o = sgd_update(p, g, o, lr, momentum=MOMENTUM, weight_decay=WEIGHT_DECAY)
        return p, o, loss

    jparams = _run_trajectory(jstep, jparams, torch_step, _batches(21))
    np.testing.assert_allclose(
        np.asarray(jparams["ctx"]), pl.ctx.detach().numpy(), rtol=5e-3, atol=5e-4
    )


def test_cocoop_trajectory_matches_reference(small_clip):
    model, params, cfg = small_clip
    ref_cocoop = load_reference_module(
        "/root/reference/trainers/cocoop.py", "_ref_cocoop_dyn"
    )
    torch.manual_seed(12)
    ref_model = ref_cocoop.CustomCLIP(_coop_cfg(), CLASSNAMES, model).float()
    pl = ref_model.prompt_learner
    for p in ref_model.parameters():
        p.requires_grad_(False)
    train_params = [pl.ctx] + list(pl.meta_net.parameters())
    for p in train_params:
        p.requires_grad_(True)
    opt = _torch_sgd(train_params)
    pl.train()  # training flag -> forward(image, label) returns CE loss

    task = jcoop.make_task(
        cfg, CLASSNAMES, N_CTX, False, "end", " ".join(["X"] * N_CTX)
    )
    jparams = {
        "ctx": _from_torch(pl.ctx),
        "meta_net": {
            "w1": _from_torch(pl.meta_net.linear1.weight).T,
            "b1": _from_torch(pl.meta_net.linear1.bias),
            "w2": _from_torch(pl.meta_net.linear2.weight).T,
            "b2": _from_torch(pl.meta_net.linear2.bias),
        },
    }

    def torch_step(imgs, labels, lr):
        for g in opt.param_groups:
            g["lr"] = lr
        opt.zero_grad()
        loss = ref_model(
            torch.from_numpy(imgs).permute(0, 3, 1, 2), torch.from_numpy(labels)
        )
        loss.backward()
        opt.step()
        return float(loss.detach())

    @jax.jit
    def jstep(p, o, images, labels, lr):
        def loss_fn(pp):
            logits = jcocoop.cocoop_logits(pp, params, task, images)
            logp = jax.nn.log_softmax(logits, -1)
            return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], 1))

        loss, g = jax.value_and_grad(loss_fn)(p)
        p, o = sgd_update(p, g, o, lr, momentum=MOMENTUM, weight_decay=WEIGHT_DECAY)
        return p, o, loss

    jparams = _run_trajectory(jstep, jparams, torch_step, _batches(22))
    np.testing.assert_allclose(
        np.asarray(jparams["ctx"]), pl.ctx.detach().numpy(), rtol=5e-3, atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(jparams["meta_net"]["w1"]),
        pl.meta_net.linear1.weight.detach().numpy().T,
        rtol=5e-3, atol=5e-4,
    )
    np.testing.assert_allclose(
        np.asarray(jparams["meta_net"]["w2"]),
        pl.meta_net.linear2.weight.detach().numpy().T,
        rtol=5e-3, atol=5e-4,
    )
    np.testing.assert_allclose(
        np.asarray(jparams["meta_net"]["b1"]),
        pl.meta_net.linear1.bias.detach().numpy(),
        rtol=5e-3, atol=5e-4,
    )
    np.testing.assert_allclose(
        np.asarray(jparams["meta_net"]["b2"]),
        pl.meta_net.linear2.bias.detach().numpy(),
        rtol=5e-3, atol=5e-4,
    )


def test_lp_trajectory_matches_reference_math(small_clip):
    model, params, cfg = small_clip
    lp_cfg = _coop_cfg()
    d = cfg.embed_dim

    # frozen normalized text features, both sides (linear_prob.py:77-83)
    from rpo_tpu.models.clip import encode_text
    from rpo_tpu.tokenizer import tokenize

    prompts = [lp_cfg.TRAINER.LP.PROMPT.format(cls_name=c) for c in CLASSNAMES]
    tokens = tokenize(prompts)
    text_f = encode_text(params, cfg, jnp.asarray(tokens)).astype(jnp.float32)
    text_f = text_f / jnp.linalg.norm(text_f, axis=-1, keepdims=True)
    with torch.no_grad():
        ref_tf = model.encode_text(torch.from_numpy(np.asarray(tokens, np.int64)))
        ref_tf = ref_tf / ref_tf.norm(dim=-1, keepdim=True)

    # torch loop of the reference forward: identity-init linear on
    # unnormalized image features (linear_prob.py:70-72, 85-95)
    W = torch.nn.Parameter(torch.eye(d))
    b = torch.nn.Parameter(torch.zeros(d))
    opt = _torch_sgd([W, b])

    def torch_step(imgs, labels, lr):
        for g in opt.param_groups:
            g["lr"] = lr
        opt.zero_grad()
        with torch.no_grad():
            imf = model.encode_image(torch.from_numpy(imgs).permute(0, 3, 1, 2))
        logits = model.logit_scale.exp().detach() * (imf @ W.t() + b) @ ref_tf.t()
        loss = torch.nn.functional.cross_entropy(logits, torch.from_numpy(labels))
        loss.backward()
        opt.step()
        return float(loss.detach())

    jparams = {"w": jnp.eye(d), "b": jnp.zeros((d,))}

    @jax.jit
    def jstep(p, o, images, labels, lr):
        def loss_fn(pp):
            logits = jlp.lp_logits(pp, params, cfg, text_f, images)
            logp = jax.nn.log_softmax(logits, -1)
            return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], 1))

        loss, g = jax.value_and_grad(loss_fn)(p)
        p, o = sgd_update(p, g, o, lr, momentum=MOMENTUM, weight_decay=WEIGHT_DECAY)
        return p, o, loss

    jparams = _run_trajectory(jstep, jparams, torch_step, _batches(23))
    # our w is (in, out) = torch W.T
    np.testing.assert_allclose(
        np.asarray(jparams["w"]), W.detach().numpy().T, rtol=5e-3, atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(jparams["b"]), b.detach().numpy(), rtol=5e-3, atol=5e-4
    )
