"""Data-parallel correctness on the virtual 8-device CPU mesh:
sharded training must match single-device training (SURVEY.md §4).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rpo_tpu.engine.optim import sgd_init, sgd_update
from rpo_tpu.methods import rpo as core
from rpo_tpu.models.clip import TINY, init_clip
from rpo_tpu.parallel.dp import (
    make_mesh,
    pad_multiple,
    shard_eval_step,
    shard_train_step,
)


@pytest.fixture(scope="module")
def setup():
    assert jax.device_count() == 8, "conftest must provide 8 virtual devices"
    cfg = TINY
    params = init_clip(jax.random.PRNGKey(0), cfg)
    task = core.make_task(cfg, ["dog", "cat", "plane", "boat"], "a photo of a _.", K=2)
    prompts = core.init_prompts(jax.random.PRNGKey(1), params, cfg, 2)
    frozen = core.make_frozen(params, task)

    def train_step(prompts, opt_state, frozen, images, labels, mask, lr):
        def loss_fn(p):
            logits = core.rpo_logits(p, frozen, task, images)
            logp = jax.nn.log_softmax(logits, axis=-1)
            nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
            return jnp.sum(nll * mask) / jnp.sum(mask)

        loss, grads = jax.value_and_grad(loss_fn)(prompts)
        prompts, opt_state = sgd_update(prompts, grads, opt_state, lr)
        return prompts, opt_state, loss

    return cfg, params, task, prompts, frozen, train_step


@pytest.mark.slow
def test_dp_matches_single_device(setup):
    cfg, params, task, prompts0, frozen, train_step = setup
    rng = np.random.RandomState(0)
    B = pad_multiple(12, 8)  # 16: includes padding rows
    images = jnp.asarray(rng.randn(B, 32, 32, 3), jnp.float32)
    labels = jnp.asarray(rng.randint(0, 4, size=B), jnp.int32)
    mask = jnp.asarray((np.arange(B) < 12).astype(np.float32))

    mesh = make_mesh()
    dp_step = shard_train_step(train_step, mesh, donate=False)
    single_step = jax.jit(train_step)

    p_dp, o_dp = prompts0, sgd_init(prompts0)
    p_sd, o_sd = prompts0, sgd_init(prompts0)
    for i in range(3):
        p_dp, o_dp, loss_dp = dp_step(p_dp, o_dp, frozen, images, labels, mask, jnp.float32(0.05))
        p_sd, o_sd, loss_sd = single_step(p_sd, o_sd, frozen, images, labels, mask, jnp.float32(0.05))
        np.testing.assert_allclose(float(loss_dp), float(loss_sd), rtol=1e-5)
    for k in p_dp:
        np.testing.assert_allclose(
            np.asarray(p_dp[k]), np.asarray(p_sd[k]), rtol=1e-5, atol=1e-6
        )


def test_dp_eval_matches(setup):
    cfg, params, task, prompts, frozen, _ = setup
    rng = np.random.RandomState(1)
    images = jnp.asarray(rng.randn(16, 32, 32, 3), jnp.float32)
    text_f = core.encode_text_with_prompts(prompts, frozen, task)

    def eval_step(prompts, frozen, text_f, images):
        return core.rpo_logits(prompts, frozen, task, images, text_f=text_f)

    mesh = make_mesh()
    dp_logits = shard_eval_step(eval_step, mesh)(prompts, frozen, text_f, images)
    sd_logits = jax.jit(eval_step)(prompts, frozen, text_f, images)
    np.testing.assert_allclose(
        np.asarray(dp_logits), np.asarray(sd_logits), rtol=1e-5, atol=1e-5
    )


def test_dp_eval_local_shard_map_matches(setup):
    """shard_map per-device-local eval (the path that lets Pallas kernels
    ride a data-parallel mesh) == GSPMD eval == single device."""
    from rpo_tpu.parallel.dp import shard_eval_step_local

    cfg, params, task, prompts, frozen, _ = setup
    rng = np.random.RandomState(4)
    images = jnp.asarray(rng.randn(16, 32, 32, 3), jnp.float32)
    text_f = core.encode_text_with_prompts(prompts, frozen, task)

    def eval_step(prompts, frozen, text_f, images):
        return core.rpo_logits(prompts, frozen, task, images, text_f=text_f)

    mesh = make_mesh()
    local_logits = shard_eval_step_local(eval_step, mesh)(
        prompts, frozen, text_f, images
    )
    sd_logits = jax.jit(eval_step)(prompts, frozen, text_f, images)
    np.testing.assert_allclose(
        np.asarray(local_logits), np.asarray(sd_logits), rtol=1e-5, atol=1e-5
    )


def test_dp_eval_local_none_text_f(setup):
    """None text_f (methods without a cached text tower) passes through
    the shard_map spec as an empty pytree."""
    from rpo_tpu.parallel.dp import shard_eval_step_local

    cfg, params, task, prompts, frozen, _ = setup
    rng = np.random.RandomState(5)
    images = jnp.asarray(rng.randn(8, 32, 32, 3), jnp.float32)

    def eval_step(prompts, frozen, text_f, images):
        assert text_f is None
        return core.rpo_logits(prompts, frozen, task, images)

    mesh = make_mesh()
    out = shard_eval_step_local(eval_step, mesh)(prompts, frozen, None, images)
    ref = jax.jit(lambda p, fz, im: core.rpo_logits(p, fz, task, im))(
        prompts, frozen, images
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_dp_multi_step_matches_sequential(setup):
    """Grouped scan dispatch under DP shardings == sequential single steps."""
    from rpo_tpu.parallel.dp import shard_multi_step

    cfg, params, task, prompts0, frozen, train_step = setup

    def multi_step(p, o, frozen, imgs_g, labels_g, mask_g, lr):
        def body(carry, batch):
            p, o = carry
            imgs, labels, mask = batch
            p, o, loss = train_step(p, o, frozen, imgs, labels, mask, lr)
            return (p, o), loss

        (p, o), losses = jax.lax.scan(body, (p, o), (imgs_g, labels_g, mask_g))
        return p, o, losses

    rng = np.random.RandomState(3)
    G, B = 3, 8
    imgs = jnp.asarray(rng.randn(G, B, 32, 32, 3), jnp.float32)
    labels = jnp.asarray(rng.randint(0, 4, (G, B)), jnp.int32)
    masks = jnp.ones((G, B), jnp.float32)
    lr = jnp.float32(0.05)

    mesh = make_mesh()
    dp_multi = shard_multi_step(multi_step, mesh, donate=False)
    p_dp, o_dp, losses_dp = dp_multi(prompts0, sgd_init(prompts0), frozen, imgs, labels, masks, lr)

    p_sd, o_sd = prompts0, sgd_init(prompts0)
    seq_losses = []
    step = jax.jit(train_step)
    for i in range(G):
        p_sd, o_sd, loss = step(p_sd, o_sd, frozen, imgs[i], labels[i], masks[i], lr)
        seq_losses.append(float(loss))
    np.testing.assert_allclose(np.asarray(losses_dp), seq_losses, rtol=1e-5)
    for k in p_dp:
        np.testing.assert_allclose(
            np.asarray(p_dp[k]), np.asarray(p_sd[k]), rtol=1e-5, atol=1e-6
        )


def test_padded_rows_do_not_change_grads(setup):
    """Masked padding must be a no-op for the training math."""
    cfg, params, task, prompts, frozen, train_step = setup
    rng = np.random.RandomState(2)
    imgs = rng.randn(8, 32, 32, 3).astype(np.float32)
    labels = rng.randint(0, 4, size=8).astype(np.int32)

    from rpo_tpu.engine.optim import sgd_init

    # exact batch
    p1, _, l1 = jax.jit(train_step)(
        prompts, sgd_init(prompts), frozen, jnp.asarray(imgs), jnp.asarray(labels),
        jnp.ones((8,), jnp.float32), jnp.float32(0.05),
    )
    # padded with garbage rows, masked out
    imgs_pad = np.concatenate([imgs, 100 * np.ones((8, 32, 32, 3), np.float32)])
    labels_pad = np.concatenate([labels, np.zeros((8,), np.int32)])
    mask = np.concatenate([np.ones(8), np.zeros(8)]).astype(np.float32)
    p2, _, l2 = jax.jit(train_step)(
        prompts, sgd_init(prompts), frozen, jnp.asarray(imgs_pad), jnp.asarray(labels_pad),
        jnp.asarray(mask), jnp.float32(0.05),
    )
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for k in p1:
        np.testing.assert_allclose(np.asarray(p1[k]), np.asarray(p2[k]), rtol=1e-5, atol=1e-7)
