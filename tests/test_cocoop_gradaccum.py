"""CoCoOp large-batch gradient accumulation (r5) must be numerically
equivalent to the monolithic step.

The grad-accum step exists purely as the large-batch perf/memory fix
(BASELINE.md r5: B=32 326 -> 421 img/s on TPU v5e; peak memory = one
chunk's text-tower residuals, zero remat recompute).  Masked CE is
row-separable, so the sum of per-chunk gradients of sum(nll*mask) IS the
full-batch gradient — loss / accuracy / updated params must match the
monolithic step to fp32 reassociation tolerance, including zero-weight
padded rows.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rpo_tpu.engine.optim import sgd_init
from rpo_tpu.methods import cocoop, coop
from rpo_tpu.methods.base_trainer import CLIPMethodTrainer
from rpo_tpu.models.clip import ARCHS, encode_image, init_clip


class _Host:
    """Just the SGD hyperparameters the step factories read off self."""

    _momentum = 0.9
    _weight_decay = 5e-4
    _nesterov = False
    _dampening = 0.0


@pytest.fixture(scope="module")
def setup():
    cfg = ARCHS["TINY"]
    clip_params = init_clip(jax.random.PRNGKey(0), cfg)
    classnames = [f"thing {i}" for i in range(6)]
    k_ctx, k_meta = jax.random.split(jax.random.PRNGKey(1))
    ctx_params, prefix, n_ctx = coop.init_ctx(
        k_ctx, clip_params, cfg, len(classnames), 3, False, ""
    )
    params = {
        "ctx": ctx_params["ctx"],
        "meta_net": cocoop.init_meta_net(k_meta, cfg.embed_dim, cfg.text_width),
    }
    task = coop.make_task(cfg, classnames, n_ctx, False, "end", prefix)
    frozen = {"clip": clip_params}
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.randn(8, 32, 32, 3), jnp.float32)
    labels = jnp.asarray(rng.randint(0, 6, size=8), jnp.int32)
    mask = jnp.asarray([1.0] * 6 + [0.0] * 2, jnp.float32)  # padded rows
    return task, params, frozen, imgs, labels, mask


def _mono_step(task):
    logits_fn = lambda p, frozen, images: cocoop.cocoop_logits(
        p, frozen["clip"], task, images
    )
    return jax.jit(CLIPMethodTrainer._make_train_step(_Host(), logits_fn))


def _gacc_step(task, chunk_size):
    precompute = lambda frozen, images: encode_image(
        frozen["clip"], task.cfg, images
    ).astype(jnp.float32)
    chunk_logits = lambda p, frozen, imf_c: cocoop.cocoop_logits(
        p, frozen["clip"], task, None, image_features=imf_c
    )
    return jax.jit(
        CLIPMethodTrainer._make_grad_accum_train_step(
            _Host(), precompute, chunk_logits, chunk_size
        )
    )


@pytest.fixture(scope="module")
def mono_result(setup):
    task, params, frozen, imgs, labels, mask = setup
    mono = _mono_step(task)
    lr = jnp.float32(0.1)
    return mono(
        jax.tree_util.tree_map(lambda x: x, params),
        sgd_init(params), frozen, imgs, labels, mask, lr,
    )


@pytest.mark.parametrize("chunk", [2, 4, 3, 8, 16])
def test_gradaccum_step_matches_monolithic(setup, mono_result, chunk):
    """chunk=2/4 engage multi-chunk accumulation; 3 (indivisible) is
    decremented to 2; 8 (== B) and 16 (> B) run as one chunk — all five
    produce the monolithic step's numbers."""
    task, params, frozen, imgs, labels, mask = setup
    lr = jnp.float32(0.1)
    gacc = _gacc_step(task, chunk)
    p1, o1, l1, a1 = mono_result
    p2, o2, l2, a2 = gacc(
        jax.tree_util.tree_map(lambda x: x, params),
        sgd_init(params), frozen, imgs, labels, mask, lr,
    )
    assert abs(float(l1) - float(l2)) < 1e-5
    assert float(a1) == pytest.approx(float(a2))
    flat1 = jax.tree_util.tree_leaves_with_path(p1)
    flat2 = dict(jax.tree_util.tree_leaves_with_path(p2))
    for path, leaf in flat1:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat2[path]), atol=1e-5, rtol=0,
            err_msg=f"param mismatch at {path} with chunk={chunk}",
        )


def test_gradaccum_multi_step_trajectory(setup):
    """Three consecutive steps (momentum buffers engaged) stay aligned —
    accumulation must compose with the SGD state across steps."""
    task, params, frozen, imgs, labels, mask = setup
    lr = jnp.float32(0.05)
    mono, gacc = _mono_step(task), _gacc_step(task, 4)
    p_m, o_m = params, sgd_init(params)
    p_g, o_g = params, sgd_init(params)
    for _ in range(3):
        p_m, o_m, l_m, _ = mono(p_m, o_m, frozen, imgs, labels, mask, lr)
        p_g, o_g, l_g, _ = gacc(p_g, o_g, frozen, imgs, labels, mask, lr)
        assert abs(float(l_m) - float(l_g)) < 3e-5
    np.testing.assert_allclose(
        np.asarray(p_m["ctx"]), np.asarray(p_g["ctx"]), atol=3e-5, rtol=0
    )


def test_trainer_dispatches_gradaccum_at_large_batch(setup):
    """The trainer-level step must route B>=16 to grad accumulation and
    produce the same math as the monolithic formulation there too (the
    dispatch is trace-time on the static batch size)."""
    task, params, frozen, _imgs, _labels, _mask = setup
    rng = np.random.RandomState(1)
    imgs = jnp.asarray(rng.randn(16, 32, 32, 3), jnp.float32)
    labels = jnp.asarray(rng.randint(0, 6, size=16), jnp.int32)
    mask = jnp.asarray([1.0] * 16, jnp.float32)
    lr = jnp.float32(0.1)
    p1, _, l1, a1 = _mono_step(task)(
        params, sgd_init(params), frozen, imgs, labels, mask, lr
    )
    p2, _, l2, a2 = _gacc_step(task, 8)(
        params, sgd_init(params), frozen, imgs, labels, mask, lr
    )
    assert abs(float(l1) - float(l2)) < 1e-5
    assert float(a1) == pytest.approx(float(a2))
    np.testing.assert_allclose(
        np.asarray(p1["ctx"]), np.asarray(p2["ctx"]), atol=1e-5, rtol=0
    )
