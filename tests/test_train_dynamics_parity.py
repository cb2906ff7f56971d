"""End-to-end training-dynamics parity: N SGD steps of RPO, identical
data/schedule, our jitted step vs the reference CustomCLIP + torch SGD.

This pins the integration of loss, masks, gradients, optimizer, and
schedule — a divergence anywhere shows up in the prompt trajectory.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rpo_tpu.engine.optim import lr_at_epoch, sgd_init, sgd_update
from rpo_tpu.methods import rpo as jrpo
from rpo_tpu.models.clip import CLIPConfig, convert_state_dict

from .test_rpo_parity import CLASSNAMES, K, PROMPT, _ref_cfg, pair, ref_rpo_module  # noqa: F401

torch = pytest.importorskip("torch")

MOMENTUM = 0.9
WEIGHT_DECAY = 5e-4


def test_multi_step_trajectory_matches_reference(pair):
    ref_model, params, task, prompts0 = pair
    frozen = jrpo.make_frozen(params, task)

    class O:
        LR = 0.01
        MAX_EPOCH = 4
        LR_SCHEDULER = "cosine"
        WARMUP_EPOCH = 1
        WARMUP_TYPE = "constant"
        WARMUP_CONS_LR = 1e-5
        WARMUP_MIN_LR = 1e-5
        STEPSIZE = (-1,)
        GAMMA = 0.1

    # torch side: trainable prompt tensors + SGD (reference build_model
    # optimizes only the prompt_learner, rpo.py:274-276)
    pl = ref_model.prompt_learner
    pl.text_prompt.requires_grad_(True)
    pl.img_prompt.requires_grad_(True)
    opt = torch.optim.SGD(
        [pl.text_prompt, pl.img_prompt],
        lr=1.0,  # lr set per step below
        momentum=MOMENTUM,
        weight_decay=WEIGHT_DECAY,
    )
    pl.train()

    def train_step(p, o, images, labels, lr):
        def loss_fn(pp):
            loss, _ = jrpo.rpo_loss(pp, frozen, task, images, labels)
            return loss

        loss, g = jax.value_and_grad(loss_fn)(p)
        p, o = sgd_update(p, g, o, lr, momentum=MOMENTUM, weight_decay=WEIGHT_DECAY)
        return p, o, loss

    jstep = jax.jit(train_step)
    jp, jo = prompts0, sgd_init(prompts0)

    # Reference quirk: on CPU, `self.text_x.to(device)` (rpo.py:174) is a
    # no-op returning the same tensor, so the in-place prompt scatter
    # (rpo.py:176-177) mutates persistent state and poisons autograd
    # across steps (masked on CUDA where .to() copies).  Restore a fresh
    # detached copy each step to emulate the CUDA behavior.
    text_x_orig = ref_model.text_x.detach().clone()

    rng = np.random.RandomState(7)
    steps_per_epoch = 2
    for step in range(8):
        ref_model.text_x = text_x_orig.detach().clone()
        epoch = step // steps_per_epoch
        lr = lr_at_epoch(O, epoch)
        imgs = rng.randn(2, 224, 224, 3).astype(np.float32)
        labels = rng.randint(0, len(CLASSNAMES), size=2)

        # torch step
        for group in opt.param_groups:
            group["lr"] = lr
        opt.zero_grad()
        loss_t = ref_model(
            torch.from_numpy(imgs).permute(0, 3, 1, 2), torch.from_numpy(labels)
        )
        loss_t.backward()
        opt.step()

        # jax step
        jp, jo, loss_j = jstep(jp, jo, jnp.asarray(imgs), jnp.asarray(labels), lr)

        np.testing.assert_allclose(
            float(loss_j), float(loss_t.detach()), rtol=2e-3, atol=2e-3,
            err_msg=f"loss diverged at step {step}",
        )

    np.testing.assert_allclose(
        np.asarray(jp["text_prompt"]),
        pl.text_prompt.detach().numpy(),
        rtol=5e-3, atol=5e-4,
    )
    np.testing.assert_allclose(
        np.asarray(jp["img_prompt"]),
        pl.img_prompt.detach().numpy(),
        rtol=5e-3, atol=5e-4,
    )
