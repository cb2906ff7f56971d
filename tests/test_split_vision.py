"""Split vision tower (training fast path) vs the fused masked tower.

The visual mask blocks the K prompt columns for every row
(/root/reference/trainers/rpo.py:153-159): frozen cls+patch rows see
plain self-attention and prompt rows only read frozen columns, so the
two formulations are the same math in different structure.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rpo_tpu.methods import rpo as core
from rpo_tpu.models.clip import ARCHS, init_clip


@pytest.fixture(scope="module")
def setup():
    cfg = ARCHS["TINY"]
    params = init_clip(jax.random.PRNGKey(0), cfg)
    classnames = [f"thing {i}" for i in range(6)]
    K = 3
    task = core.make_task(cfg, classnames, "a photo of a _.", K)
    prompts = core.init_prompts(jax.random.PRNGKey(1), params, cfg, K)
    frozen = core.make_frozen(params, task)
    imgs = jnp.asarray(np.random.RandomState(0).randn(4, 32, 32, 3), jnp.float32)
    return cfg, task, prompts, frozen, imgs


def test_image_features_match(setup):
    cfg, task, prompts, frozen, imgs = setup
    fused = core.encode_image_with_prompts(prompts, frozen, task, imgs)
    split = core.encode_image_prompts_split(prompts, frozen, task, imgs)
    assert split.shape == (4, task.K, cfg.embed_dim)
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(split), atol=1e-5, rtol=0
    )


def test_loss_and_grads_match(setup):
    cfg, task, prompts, frozen, imgs = setup
    labels = jnp.asarray([0, 2, 4, 5], jnp.int32)

    def make_loss(split):
        return lambda p: core.rpo_loss(
            p, frozen, task, imgs, labels, split_vision=split
        )[0]

    l_f, g_f = jax.value_and_grad(make_loss(False))(prompts)
    l_s, g_s = jax.value_and_grad(make_loss(True))(prompts)
    assert abs(float(l_f) - float(l_s)) < 1e-5
    for key in g_f:
        np.testing.assert_allclose(
            np.asarray(g_f[key]), np.asarray(g_s[key]), atol=1e-5, rtol=0,
            err_msg=f"grad mismatch for {key}",
        )


def test_frozen_rows_carry_no_prompt_gradient(setup):
    """The structural claim itself: grads of the split loss w.r.t. the
    visual prompt flow only through the prompt-row path — perturbing the
    image prompt must not change frozen K/V (checked via jvp of the
    frozen tower being zero along img_prompt directions is implicit in
    the grad match above); here we pin that the split path produces
    nonzero prompt grads at all (it actually trains)."""
    cfg, task, prompts, frozen, imgs = setup
    labels = jnp.asarray([0, 2, 4, 5], jnp.int32)
    g = jax.grad(
        lambda p: core.rpo_loss(p, frozen, task, imgs, labels)[0]
    )(prompts)
    assert float(jnp.abs(g["img_prompt"]).max()) > 0.0
    assert float(jnp.abs(g["text_prompt"]).max()) > 0.0
