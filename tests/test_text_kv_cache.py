"""Frozen-text KV cache: the prompt-rows-only fast path must equal the
full masked 77-token tower.

Why this holds: the reference text mask blocks every column >= idx_c for
every row (/root/reference/trainers/rpo.py:144-151), so frozen-token
activations equal the vanilla causal encoding at every layer (prompt-
independent) and prompt rows only cross-attend to frozen columns.
precompute_text_kv caches those K/V once per task; the fast path pushes
only the K prompt rows per class through the tower.
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
    # heterogeneous classname lengths exercise per-class idx masking
    classnames = [f"a longer class name {i}" for i in range(6)] + [
        "cat",
        "dog machine",
    ]
    K = 5
    task = core.make_task(cfg, classnames, "a photo of a _.", K)
    prompts = core.init_prompts(jax.random.PRNGKey(1), params, cfg, K)
    return cfg, params, task, prompts


def test_bundle_contains_cache(setup):
    cfg, params, task, prompts = setup
    fz = core.make_frozen(params, task)
    assert "text_kv" in fz and "prompt_col_mask" in fz
    L, n_cls, H, T, Dh = fz["text_kv"]["k"].shape
    assert L == cfg.text_layers
    assert n_cls == task.n_cls
    assert H == cfg.text_heads
    assert T == int(task.len_prompts.max())
    assert H * Dh == cfg.text_width
    # opting out restores the round-1 bundle
    fz_full = core.make_frozen(params, task, cache_text_kv=False)
    assert "text_kv" not in fz_full


def test_text_features_match_full_tower(setup):
    cfg, params, task, prompts = setup
    fz_full = core.make_frozen(params, task, cache_text_kv=False)
    fz_fast = core.make_frozen(params, task)
    tf_full = core.encode_text_with_prompts(prompts, fz_full, task)
    tf_fast = core.encode_text_with_prompts(prompts, fz_fast, task)
    assert tf_fast.shape == (task.n_cls, task.K, cfg.embed_dim)
    np.testing.assert_allclose(
        np.asarray(tf_full), np.asarray(tf_fast), atol=1e-5, rtol=0
    )


@pytest.mark.slow
def test_loss_and_grads_match_full_tower(setup):
    cfg, params, task, prompts = setup
    imgs = jnp.asarray(np.random.RandomState(0).randn(3, 32, 32, 3), jnp.float32)
    labels = jnp.asarray([0, 4, 7], jnp.int32)

    def make_loss(fz):
        return lambda p: core.rpo_loss(p, fz, task, imgs, labels)[0]

    fz_full = core.make_frozen(params, task, cache_text_kv=False)
    fz_fast = core.make_frozen(params, task)
    l_full, g_full = jax.value_and_grad(make_loss(fz_full))(prompts)
    l_fast, g_fast = jax.value_and_grad(make_loss(fz_fast))(prompts)
    assert abs(float(l_full) - float(l_fast)) < 1e-5
    for key in g_full:
        np.testing.assert_allclose(
            np.asarray(g_full[key]), np.asarray(g_fast[key]), atol=1e-5, rtol=0,
            err_msg=f"grad mismatch for {key}",
        )


def test_training_trajectory_matches_full_tower(setup):
    """8 SGD steps through the fast path track the full-tower trajectory."""
    from rpo_tpu.engine.optim import sgd_init, sgd_update

    cfg, params, task, prompts = setup
    rng = np.random.RandomState(1)

    def run(fz):
        p = jax.tree_util.tree_map(jnp.copy, prompts)
        opt = sgd_init(p)

        @jax.jit
        def step(p, opt, imgs, labels):
            def loss_fn(p):
                return core.rpo_loss(p, fz, task, imgs, labels)[0]

            loss, grads = jax.value_and_grad(loss_fn)(p)
            p, opt = sgd_update(p, grads, opt, jnp.float32(0.05), momentum=0.9)
            return p, opt, loss

        losses = []
        for i in range(8):
            r = np.random.RandomState(100 + i)
            imgs = jnp.asarray(r.randn(4, 32, 32, 3), jnp.float32)
            labels = jnp.asarray(r.randint(0, task.n_cls, 4), jnp.int32)
            p, opt, loss = step(p, opt, imgs, labels)
            losses.append(float(loss))
        return p, losses

    p_full, loss_full = run(core.make_frozen(params, task, cache_text_kv=False))
    p_fast, loss_fast = run(core.make_frozen(params, task))
    np.testing.assert_allclose(loss_full, loss_fast, atol=1e-4, rtol=0)
    for key in p_full:
        np.testing.assert_allclose(
            np.asarray(p_full[key]), np.asarray(p_fast[key]), atol=1e-4, rtol=0
        )
