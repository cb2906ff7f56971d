"""TRAIN.MICROBATCH (chunked forward inside one loss/grad) must be
numerically equivalent to the monolithic train step.

The knob exists purely as a large-batch XLA layout fix (BASELINE.md r4:
B=128 1500 -> 1919 img/s on TPU v5e); the math is the same full-batch
gradient, so loss / accuracy / updated params must match the monolithic
step to fp32 reassociation tolerance.
"""
import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rpo_tpu.engine.optim import sgd_init
from rpo_tpu.methods import rpo as core
from rpo_tpu.methods.base_trainer import CLIPMethodTrainer
from rpo_tpu.models.clip import ARCHS, init_clip

from .test_engine_e2e import run_cli


class _Host:
    """Just the SGD hyperparameters _make_train_step reads off self."""

    _momentum = 0.9
    _weight_decay = 5e-4
    _nesterov = False
    _dampening = 0.0


@pytest.fixture(scope="module")
def setup():
    cfg = ARCHS["TINY"]
    params = init_clip(jax.random.PRNGKey(0), cfg)
    classnames = [f"thing {i}" for i in range(6)]
    task = core.make_task(cfg, classnames, "a photo of a _.", 3)
    prompts = core.init_prompts(jax.random.PRNGKey(1), params, cfg, 3)
    frozen = core.make_frozen(params, task)
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.randn(8, 32, 32, 3), jnp.float32)
    labels = jnp.asarray(rng.randint(0, 6, size=8), jnp.int32)
    mask = jnp.asarray([1.0] * 6 + [0.0] * 2, jnp.float32)  # padded rows
    return task, prompts, frozen, imgs, labels, mask


def _make_step(task, microbatch):
    logits_fn = lambda p, frozen, images, text_f: core.rpo_logits(
        p, frozen, task, images, text_f=text_f, split_vision=True
    )
    precompute = lambda p, frozen: core.encode_text_with_prompts(p, frozen, task)
    return jax.jit(
        CLIPMethodTrainer._make_train_step(
            _Host(), logits_fn, microbatch=microbatch, precompute=precompute
        )
    )


@pytest.fixture(scope="module")
def mono_result(setup):
    """One monolithic-step run shared by every parametrized case (the
    mono trace is identical across cases; rebuilding it per case costs
    ~5 redundant XLA compiles on the fast lane)."""
    task, prompts, frozen, imgs, labels, mask = setup
    mono = _make_step(task, 0)
    lr = jnp.float32(0.1)
    return mono(dict(prompts), sgd_init(prompts), frozen, imgs, labels,
                mask, lr)


@pytest.mark.parametrize("mb", [4, 2, 3, 8, 16])
def test_microbatch_step_matches_monolithic(setup, mono_result, mb):
    """mb=4/2 engage chunking; mb=3 (indivisible), 8 (== B) and 16 (> B)
    must fall back to the monolithic trace — all five produce the same
    step."""
    task, prompts, frozen, imgs, labels, mask = setup
    lr = jnp.float32(0.1)
    chunked = _make_step(task, mb)
    p0 = prompts
    p1, o1, l1, a1 = mono_result
    p2, o2, l2, a2 = chunked(dict(p0), sgd_init(prompts), frozen, imgs,
                             labels, mask, lr)
    assert abs(float(l1) - float(l2)) < 1e-5
    assert float(a1) == pytest.approx(float(a2))
    for key in p1:
        np.testing.assert_allclose(
            np.asarray(p1[key]), np.asarray(p2[key]), atol=1e-5, rtol=0,
            err_msg=f"param mismatch for {key} at microbatch={mb}",
        )


def _losses(stdout: str):
    return [float(m) for m in re.findall(r"loss (\d+\.\d+) \(", stdout)]


def test_spmd_microbatch_matches_single_device(setup):
    """The shard_map train path (per-device-local chunks, psum'd grads;
    _make_train_step axis_name=...) must reproduce the single-device
    monolithic step across a 3-step momentum trajectory, including
    zero-weight padded rows.  B=16 over the 8-virtual-device mesh gives
    2 rows/device; microbatch=1 makes every device actually chunk."""
    from rpo_tpu.parallel.dp import make_mesh, shard_train_step_spmd

    task, prompts, frozen, _imgs, _labels, _mask = setup
    rng = np.random.RandomState(3)
    B = 16
    imgs = jnp.asarray(rng.randn(B, 32, 32, 3), jnp.float32)
    labels = jnp.asarray(rng.randint(0, 6, size=B), jnp.int32)
    mask = jnp.asarray((np.arange(B) < 13).astype(np.float32))
    lr = jnp.float32(0.05)

    logits_fn = lambda p, frozen, images, text_f: core.rpo_logits(
        p, frozen, task, images, text_f=text_f, split_vision=True
    )
    precompute = lambda p, frozen: core.encode_text_with_prompts(p, frozen, task)
    local = CLIPMethodTrainer._make_train_step(
        _Host(), logits_fn, microbatch=1, precompute=precompute,
        axis_name="data",
    )
    spmd = shard_train_step_spmd(local, make_mesh(), donate=False)
    mono = _make_step(task, 0)

    p_s, o_s = dict(prompts), sgd_init(prompts)
    p_m, o_m = dict(prompts), sgd_init(prompts)
    for _ in range(3):
        p_s, o_s, l_s, a_s = spmd(p_s, o_s, frozen, imgs, labels, mask, lr)
        p_m, o_m, l_m, a_m = mono(p_m, o_m, frozen, imgs, labels, mask, lr)
        assert abs(float(l_s) - float(l_m)) < 1e-5
        assert float(a_s) == pytest.approx(float(a_m))
    for key in p_m:
        np.testing.assert_allclose(
            np.asarray(p_m[key]), np.asarray(p_s[key]), atol=1e-5, rtol=0,
            err_msg=f"param mismatch for {key} on the spmd microbatch path",
        )


def test_microbatch_engages_under_data_parallel(tmp_path):
    """r5 (VERDICT r4 weak #3): under a pure data-parallel mesh the knob
    now ENGAGES via the shard_map train path (per-device-local chunk
    slices, psum'd grads) instead of being disabled — and the loss
    trajectory must match the mb=0 dp run (the math is the same global
    masked mean either way).  run_cli inherits the conftest's
    8-virtual-CPU-device XLA flag, so the CLI subprocess builds the
    data-parallel mesh; batch 16 over 8 devices = 2 rows/device, mb=1
    chunks them."""
    args = [
        "--seed", "1",
        "--trainer", "RPO",
        "--dataset-config-file", "configs/datasets/synthetic.yaml",
        "--config-file", "configs/trainers/RPO/main.yaml",
        "DATASET.NUM_SHOTS", "4",
        "OPTIM.MAX_EPOCH", "1",
        "MODEL.BACKBONE.NAME", "TINY",
        "INPUT.SIZE", "(32, 32)",
        "DATALOADER.TRAIN_X.BATCH_SIZE", "16",
        "TRAINER.RPO.PREC", "fp32",
        "TRAIN.PRINT_FREQ", "1",
    ]
    out_mb = run_cli(["--output-dir", str(tmp_path / "dp_mb")] + args
                     + ["TRAIN.MICROBATCH", "1"])
    assert "Multiple devices detected" in out_mb, (
        "test precondition: the CLI subprocess must see the 8-device mesh"
    )
    assert "per-device chunking via shard_map" in out_mb
    assert "Finish training" in out_mb
    out_mono = run_cli(["--output-dir", str(tmp_path / "dp_mono")] + args
                       + ["TRAIN.MICROBATCH", "0"])
    l_mb, l_mono = _losses(out_mb), _losses(out_mono)
    assert len(l_mb) == len(l_mono) > 0
    np.testing.assert_allclose(l_mb, l_mono, rtol=1e-4, atol=1e-5)


def test_microbatch_ignored_under_tensor_parallel(tmp_path):
    """Under dp x tp the step body is a GSPMD tensor-parallel program;
    the knob must be disabled LOUDLY there (rpo_trainer tp guard)."""
    out = run_cli([
        "--output-dir", str(tmp_path / "tp"),
        "--seed", "1",
        "--trainer", "RPO",
        "--dataset-config-file", "configs/datasets/synthetic.yaml",
        "--config-file", "configs/trainers/RPO/main.yaml",
        "DATASET.NUM_SHOTS", "4",
        "OPTIM.MAX_EPOCH", "1",
        "MODEL.BACKBONE.NAME", "TINY",
        "INPUT.SIZE", "(32, 32)",
        "DATALOADER.TRAIN_X.BATCH_SIZE", "8",
        "TRAINER.RPO.PREC", "fp32",
        "TRAIN.MICROBATCH", "4",
        "TRAIN.TENSOR_PARALLEL", "2",
    ])
    assert "TRAIN.MICROBATCH=4 ignored under TRAIN.TENSOR_PARALLEL" in out
    assert "Finish training" in out


@pytest.mark.slow
def test_cli_trajectory_matches(tmp_path):
    """Full production wiring: 2-epoch TINY RPO run with and without
    TRAIN.MICROBATCH produces the same loss trajectory and accuracy."""
    args = [
        "--seed", "1",
        "--trainer", "RPO",
        "--dataset-config-file", "configs/datasets/synthetic.yaml",
        "--config-file", "configs/trainers/RPO/main.yaml",
        "DATASET.NUM_SHOTS", "4",
        "OPTIM.MAX_EPOCH", "2",
        "MODEL.BACKBONE.NAME", "TINY",
        "INPUT.SIZE", "(32, 32)",
        "DATALOADER.TRAIN_X.BATCH_SIZE", "8",
        "DATALOADER.TEST.BATCH_SIZE", "16",
        "TRAINER.RPO.PREC", "fp32",
        "TRAIN.PRINT_FREQ", "1",
    ]
    s0 = run_cli(["--output-dir", str(tmp_path / "mono")] + args
                 + ["TRAIN.MICROBATCH", "0"])
    s4 = run_cli(["--output-dir", str(tmp_path / "mb4")] + args
                 + ["TRAIN.MICROBATCH", "4"])
    l0, l4 = _losses(s0), _losses(s4)
    assert len(l0) == len(l4) > 0
    np.testing.assert_allclose(l0, l4, rtol=1e-4, atol=1e-5)
    a0 = re.search(r"\* accuracy: ([\.\d]+)%", s0).group(1)
    a4 = re.search(r"\* accuracy: ([\.\d]+)%", s4).group(1)
    assert a0 == a4


def test_coop_microbatch_matches_monolithic():
    """r5: TRAIN.MICROBATCH is wired for CoOp too (B=128 monolithic 2920
    vs 3639 img/s chunked at mb=32 on v5e — same tower-scan layout cliff
    as RPO).  Chunked step == monolithic step, including the hoisted
    text-feature precompute (gradient flows through it either way)."""
    from rpo_tpu.methods import coop

    cfg = ARCHS["TINY"]
    params = init_clip(jax.random.PRNGKey(0), cfg)
    classnames = [f"thing {i}" for i in range(6)]
    ctx_params, prefix, n_ctx = coop.init_ctx(
        jax.random.PRNGKey(1), params, cfg, 6, 2, False, ""
    )
    task = coop.make_task(cfg, classnames, n_ctx, False, "end", prefix)
    frozen = {"clip": params}

    logits_fn = lambda p, fz, images, text_f: coop.coop_logits(
        p, fz["clip"], task, images, text_f=text_f
    )
    precompute = lambda p, fz: coop.coop_text_features(p, fz["clip"], task)

    rng = np.random.RandomState(5)
    imgs = jnp.asarray(rng.randn(8, 32, 32, 3), jnp.float32)
    labels = jnp.asarray(rng.randint(0, 6, size=8), jnp.int32)
    mask = jnp.asarray([1.0] * 7 + [0.0], jnp.float32)
    lr = jnp.float32(0.05)

    steps = {
        mb: jax.jit(CLIPMethodTrainer._make_train_step(
            _Host(), logits_fn, microbatch=mb, precompute=precompute
        ))
        for mb in (0, 4)
    }
    p0 = ctx_params
    p1, o1, l1, a1 = steps[0](dict(p0), sgd_init(ctx_params), frozen, imgs,
                              labels, mask, lr)
    p2, o2, l2, a2 = steps[4](dict(p0), sgd_init(ctx_params), frozen, imgs,
                              labels, mask, lr)
    assert abs(float(l1) - float(l2)) < 1e-5
    assert float(a1) == pytest.approx(float(a2))
    np.testing.assert_allclose(
        np.asarray(p1["ctx"]), np.asarray(p2["ctx"]), atol=1e-5, rtol=0
    )


def test_lp_microbatch_matches_monolithic():
    """r5: TRAIN.MICROBATCH wired for LP (chunks the grad-free vision
    tower; frozen text features, no precompute)."""
    from rpo_tpu.methods.linear_probe import lp_logits
    from rpo_tpu.models.clip import encode_text
    from rpo_tpu.tokenizer import eot_trim, tokenize

    cfg = ARCHS["TINY"]
    params = init_clip(jax.random.PRNGKey(0), cfg)
    tokens = jnp.asarray(eot_trim(tokenize([f"a photo of thing {i}." for i in range(6)])))
    tf = encode_text(params, cfg, tokens).astype(jnp.float32)
    text_f = tf / jnp.linalg.norm(tf, axis=-1, keepdims=True)
    d = cfg.embed_dim
    lp_params = {"w": jnp.eye(d, dtype=jnp.float32), "b": jnp.zeros((d,), jnp.float32)}
    frozen = {"clip": params, "text_f": text_f}

    logits_fn = lambda p, fz, images: lp_logits(
        p, fz["clip"], cfg, fz["text_f"], images
    )
    rng = np.random.RandomState(6)
    imgs = jnp.asarray(rng.randn(8, 32, 32, 3), jnp.float32)
    labels = jnp.asarray(rng.randint(0, 6, size=8), jnp.int32)
    mask = jnp.asarray([1.0] * 6 + [0.0] * 2, jnp.float32)
    lr = jnp.float32(0.01)

    steps = {
        mb: jax.jit(CLIPMethodTrainer._make_train_step(
            _Host(), logits_fn, microbatch=mb
        ))
        for mb in (0, 2)
    }
    p0 = lp_params
    p1, o1, l1, a1 = steps[0](dict(p0), sgd_init(lp_params), frozen, imgs,
                              labels, mask, lr)
    p2, o2, l2, a2 = steps[2](dict(p0), sgd_init(lp_params), frozen, imgs,
                              labels, mask, lr)
    assert abs(float(l1) - float(l2)) < 1e-5
    assert float(a1) == pytest.approx(float(a2))
    for key in p1:
        np.testing.assert_allclose(
            np.asarray(p1[key]), np.asarray(p2[key]), atol=1e-5, rtol=0,
            err_msg=f"param mismatch for {key} on the LP microbatch path",
        )


def test_coop_cli_microbatch_engages(tmp_path):
    """CLI wiring: a CoOp run with TRAIN.MICROBATCH chunking engaged must
    match the monolithic loss trajectory (production path through
    _build_microbatched_train_step)."""
    args = [
        "--seed", "1",
        "--trainer", "CoOp",
        "--dataset-config-file", "configs/datasets/synthetic.yaml",
        "--config-file", "configs/trainers/CoOp/vit_b16_ep50.yaml",
        "DATASET.NUM_SHOTS", "4",
        "OPTIM.MAX_EPOCH", "1",
        "MODEL.BACKBONE.NAME", "TINY",
        "INPUT.SIZE", "(32, 32)",
        "DATALOADER.TRAIN_X.BATCH_SIZE", "8",
        "TRAINER.COOP.PREC", "fp32",
        "TRAIN.PRINT_FREQ", "1",
    ]
    out_mb = run_cli(["--output-dir", str(tmp_path / "coop_mb")] + args
                     + ["TRAIN.MICROBATCH", "4"])
    assert "Finish training" in out_mb
    out_mono = run_cli(["--output-dir", str(tmp_path / "coop_mono")] + args
                       + ["TRAIN.MICROBATCH", "0"])
    l_mb, l_mono = _losses(out_mb), _losses(out_mono)
    assert len(l_mb) == len(l_mono) > 0
    np.testing.assert_allclose(l_mb, l_mono, rtol=1e-4, atol=1e-5)
