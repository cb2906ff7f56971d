"""Benchmark: RPO 16-shot training throughput on one chip.

Measures the reference workload at protocol fidelity (SURVEY.md §6):
ViT-B/16, K=24, n_cls=51 (Caltech101 base split), train batch 4
(configs/trainers/RPO/main_K24.yaml) — full jitted train step including
the masked text tower over all classes, the masked vision tower, prompt
gradients, and the SGD update.  Also reports eval images/sec.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

vs_baseline compares against the PyTorch reference's measured training
throughput on its recommended hardware.  The repo publishes no numbers
(BASELINE.md), so until a reference run is possible we use a documented
estimate: RPO K=24 fp16 batch-4 training on a single V100/A100-class GPU
processes roughly 25 steps/s ≈ 100 images/s (full CLIP fwd+bwd at batch 4
plus a 51x77 masked text tower per step).  Target is >=5x (BASELINE.json).
"""
from __future__ import annotations

import json
import time

import numpy as np

REFERENCE_TRAIN_IMGS_PER_SEC_ESTIMATE = 100.0  # see module docstring
REFERENCE_EVAL_IMGS_PER_SEC_ESTIMATE = 400.0

N_CLS = 51
K = 24
TRAIN_BATCH = 4
EVAL_BATCH = 100


def main() -> None:
    import os

    import jax

    cache = os.environ.get(
        "RPO_TPU_XLA_CACHE", os.path.expanduser("~/.cache/rpo_tpu/xla")
    )
    if cache and cache != "0":
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import jax.numpy as jnp

    from rpo_tpu.data.transforms import device_normalize_fn
    from rpo_tpu.engine.optim import sgd_init, sgd_update
    from rpo_tpu.methods import rpo as core
    from rpo_tpu.models.clip import VIT_B16, cast_params, init_clip

    cfg = VIT_B16
    params = cast_params(init_clip(jax.random.PRNGKey(0), cfg), jnp.bfloat16)
    classnames = [f"object category {i}" for i in range(N_CLS)]
    task = core.make_task(cfg, classnames, "a photo of a _.", K)
    prompts = core.init_prompts(jax.random.PRNGKey(1), params, cfg, K)
    # frozen backbone is a jit ARGUMENT (a closure would embed the 300MB
    # pytree into the executable as constants -> minutes of compile)
    frozen = core.make_frozen(params, task)
    normalize = device_normalize_fn(
        [0.48145466, 0.4578275, 0.40821073],
        [0.26862954, 0.26130258, 0.27577711],
        dtype=jnp.bfloat16,
    )

    def train_step(prompts, opt_state, frozen, images_u8, labels, mask, lr):
        def loss_fn(p):
            imgs = normalize(images_u8)
            logits = core.rpo_logits(p, frozen, task, imgs, split_vision=True)
            logp = jax.nn.log_softmax(logits, axis=-1)
            nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
            return jnp.sum(nll * mask) / jnp.sum(mask)

        loss, grads = jax.value_and_grad(loss_fn)(prompts)
        prompts, opt_state = sgd_update(prompts, grads, opt_state, lr)
        return prompts, opt_state, loss

    def eval_step(prompts, frozen, text_f, images_u8):
        from rpo_tpu.ops.attention import pallas_attention_scope

        with pallas_attention_scope(True):  # fused attention on eval path
            imgs = normalize(images_u8)
            return core.rpo_logits(prompts, frozen, task, imgs, text_f=text_f)

    train_jit = jax.jit(train_step, donate_argnums=(0, 1))
    eval_jit = jax.jit(eval_step)
    text_feat_jit = jax.jit(
        lambda p, fz: core.encode_text_with_prompts(p, fz, task)
    )

    rng = np.random.RandomState(0)
    imgs = jnp.asarray(
        rng.randint(0, 256, size=(TRAIN_BATCH, 224, 224, 3)), jnp.uint8
    )
    labels = jnp.asarray(rng.randint(0, N_CLS, size=TRAIN_BATCH), jnp.int32)
    mask = jnp.ones((TRAIN_BATCH,), jnp.float32)
    opt_state = sgd_init(prompts)
    lr = jnp.float32(0.01)

    # --- on-device Pallas correctness gate (VERDICT r1 weak #3): both
    # kernels vs the XLA path at the real shapes, asserted before timing.
    from rpo_tpu.ops import attention as attn_ops

    def _pallas_gate():
        if jax.default_backend() == "cpu":
            print("pallas gate: skipped (cpu backend)")
            return
        r = np.random.RandomState(7)

        def check(name, B, H, Lq, Lk, D, bias):
            q = jnp.asarray(r.randn(B, H, Lq, D), jnp.bfloat16)
            k = jnp.asarray(r.randn(B, H, Lk, D), jnp.bfloat16)
            v = jnp.asarray(r.randn(B, H, Lk, D), jnp.bfloat16)

            def run(use):
                with attn_ops.pallas_attention_scope(use):
                    return jax.jit(
                        lambda q, k, v: attn_ops.dot_product_attention(q, k, v, bias)
                    )(q, k, v)

            a = np.asarray(run(True), np.float32)
            b = np.asarray(run(False), np.float32)
            err = np.abs(a - b).max()
            assert err < 2e-2, f"pallas {name} mismatch: {err}"
            print(f"pallas gate: {name} max|pallas-xla| = {err:.2e} OK")

        text_bias = jnp.asarray(core.build_text_mask(task.len_prompts))
        check("text-masked (51,8,77,77)", N_CLS, 8, 77, 77, 64, text_bias)
        S = cfg.vision_seq_len + K
        vis_bias = jnp.asarray(core.build_visual_mask(S, K))
        check(f"vision-masked (4,12,{S},{S})", 4, 12, S, S, 64, vis_bias)
        # the REAL eval batch: the timed program is shape-specialized to
        # B=100 (grid grouping G depends on B), so gate that exact shape
        check("vision-rect (100,12,221,197)", 100, 12, S, cfg.vision_seq_len, 64, None)

        # paired-head rect tower (the eval hot path) vs the XLA tower.
        # blk rides as a jit ARGUMENT (closure arrays embed as constants).
        from rpo_tpu.models.clip.layers import rect_residual_block

        x = jnp.asarray(r.randn(4, S, cfg.vision_width) * 0.1, jnp.bfloat16)
        blk = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a[0]), frozen["clip"]["visual"]["blocks"]
        )

        def tower(use):
            with attn_ops.pallas_attention_scope(use):
                return jax.jit(
                    lambda x, blk: rect_residual_block(
                        x, blk, cfg.vision_heads, cfg.vision_seq_len
                    )
                )(x, blk)

        a = np.asarray(tower(True), np.float32)
        b = np.asarray(tower(False), np.float32)
        err = np.abs(a - b).max()
        assert err < 2e-2, f"paired rect tower mismatch: {err}"
        print(f"pallas gate: paired rect tower max|pallas-xla| = {err:.2e} OK")

        # Pallas inside shard_map (the production multi-device eval path;
        # untestable on the CPU mesh where Pallas is disabled): a 1-device
        # mesh on the real chip certifies the composition compiles + runs.
        from rpo_tpu.parallel.dp import make_mesh, shard_eval_step_local

        def shard_tower(xx, bb):
            with attn_ops.pallas_attention_scope(True):
                return rect_residual_block(
                    xx, bb, cfg.vision_heads, cfg.vision_seq_len
                )

        mesh1 = make_mesh(jax.devices()[:1])
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        sm = jax.jit(
            shard_map(
                shard_tower, mesh=mesh1, in_specs=(P("data"), P()),
                out_specs=P("data"), check_vma=False,
            )
        )
        c = np.asarray(sm(x, blk), np.float32)
        err = np.abs(c - b).max()
        assert err < 2e-2, f"pallas-in-shard_map mismatch: {err}"
        print(f"pallas gate: pallas-in-shard_map max|.-xla| = {err:.2e} OK")

    _pallas_gate()

    # warmup / compile
    t_c = time.perf_counter()
    prompts, opt_state, loss = train_jit(prompts, opt_state, frozen, imgs, labels, mask, lr)
    jax.block_until_ready(loss)
    train_compile_s = time.perf_counter() - t_c

    # Best of 3 timing passes: host dispatch rides a shared tunnel on this
    # environment whose latency varies minute-to-minute; the fastest pass
    # is the least-contended measurement of the same fixed device program.
    # Pass boundaries end with a HOST TRANSFER, not block_until_ready —
    # the latter does not reliably synchronize on this platform
    # (CLAUDE.md), which would let one pass's tail leak into the next.
    n_steps = 50
    train_passes = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n_steps):
            prompts, opt_state, loss = train_jit(
                prompts, opt_state, frozen, imgs, labels, mask, lr
            )
        float(loss)  # device->host sync
        train_passes.append(time.perf_counter() - t0)
    train_dt = min(train_passes)
    train_imgs_per_sec = n_steps * TRAIN_BATCH / train_dt
    steps_per_sec = n_steps / train_dt

    # eval throughput (text features cached once per task)
    eimgs = jnp.asarray(
        rng.randint(0, 256, size=(EVAL_BATCH, 224, 224, 3)), jnp.uint8
    )
    text_f = jax.block_until_ready(text_feat_jit(prompts, frozen))
    logits = jax.block_until_ready(eval_jit(prompts, frozen, text_f, eimgs))
    n_eval = 20
    eval_passes = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n_eval):
            logits = eval_jit(prompts, frozen, text_f, eimgs)
        # device->host transfer of the LAST program's output: the chip
        # executes programs in issue order, so this bounds the whole pass
        # (see the train-pass comment on block_until_ready)
        float(logits[0, 0])
        eval_passes.append(time.perf_counter() - t0)
    eval_dt = min(eval_passes)
    eval_imgs_per_sec = n_eval * EVAL_BATCH / eval_dt

    # Analytic FLOP counts (XLA cost_analysis counts a lax.scan body once,
    # not x layers, so it under-reports ~12x here).  Matmul = 2*M*N*K.
    # Backward through the prompt-only paths differentiates wrt INPUTS,
    # never weights (frozen backbone), so bwd ~= fwd for those paths.
    W, Wt = cfg.vision_width, cfg.text_width
    Lf, Kp, C, Bt = cfg.vision_seq_len, K, N_CLS, TRAIN_BATCH
    layers = cfg.vision_layers
    T_kv = int(task.len_prompts.max())
    patch_in = 3 * cfg.vision_patch_size ** 2

    def vit_fwd_flops(batch, lq, lk):
        """Per the rect tower: q rows lq, k/v rows lk, width W."""
        qkv = 2 * batch * (lq + 2 * lk) * W * W
        attn = 2 * 2 * batch * lq * lk * W  # QK^T and @V over all heads
        out = 2 * batch * lq * W * W
        mlp = 2 * 2 * batch * lq * W * (4 * W)
        return layers * (qkv + attn + out + mlp) + 2 * batch * (Lf - 1) * patch_in * W

    eval_step_flops = vit_fwd_flops(EVAL_BATCH, Lf + Kp, Lf)
    # train: frozen vision fwd + prompt-row cross path (fwd+bwd) +
    # cached-text prompt rows (fwd+bwd)
    frozen_fwd = vit_fwd_flops(Bt, Lf, Lf)
    cross_l = (
        2 * Bt * Kp * W * W * 2  # q proj + out proj
        + 2 * 2 * Bt * Kp * Lf * W  # cross attention
        + 2 * 2 * Bt * Kp * W * (4 * W)  # mlp
    )
    text_l = (
        2 * C * Kp * Wt * Wt * 2
        + 2 * 2 * C * Kp * T_kv * Wt
        + 2 * 2 * C * Kp * Wt * (4 * Wt)
    )
    train_step_flops = frozen_fwd + layers * (2 * cross_l + 2 * text_l)
    device_name = str(jax.devices()[0])
    peak = 197e12 if "v5 lite" in device_name else None
    perf_extras = {
        "train_step_analytic_gflops": round(train_step_flops / 1e9, 1),
        "eval_step_analytic_gflops": round(eval_step_flops / 1e9, 1),
        "train_achieved_tflops": round(train_step_flops * steps_per_sec / 1e12, 1),
        "eval_achieved_tflops": round(
            eval_step_flops * eval_imgs_per_sec / EVAL_BATCH / 1e12, 1
        ),
    }
    if peak:
        perf_extras["train_mfu"] = round(
            train_step_flops * steps_per_sec / peak, 3
        )
        perf_extras["eval_mfu"] = round(
            eval_step_flops * eval_imgs_per_sec / EVAL_BATCH / peak, 3
        )

    # 16-shot epoch wall-clock estimate: 51 classes * 16 shots / batch 4
    steps_per_epoch = int(np.ceil(N_CLS * 16 / TRAIN_BATCH))
    epoch_seconds = steps_per_epoch / steps_per_sec
    # protocol wall-clock (15 epochs, main_K24.yaml): warm excludes the
    # one-time XLA compile (persistent-cached across runs / hidden by the
    # trainer's async prewarm); cold includes it serially (upper bound).
    warm_16shot_s = 15 * epoch_seconds
    cold_16shot_s = train_compile_s + warm_16shot_s

    print(
        json.dumps(
            {
                "metric": "rpo_train_images_per_sec",
                "value": round(train_imgs_per_sec, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(
                    train_imgs_per_sec / REFERENCE_TRAIN_IMGS_PER_SEC_ESTIMATE, 3
                ),
                "extras": {
                    "train_steps_per_sec": round(steps_per_sec, 2),
                    "train_batch": TRAIN_BATCH,
                    "n_cls": N_CLS,
                    "K": K,
                    "epoch_16shot_seconds": round(epoch_seconds, 2),
                    "warm_16shot_train_seconds": round(warm_16shot_s, 1),
                    "cold_16shot_train_seconds": round(cold_16shot_s, 1),
                    "eval_images_per_sec": round(eval_imgs_per_sec, 2),
                    "train_compile_seconds": round(train_compile_s, 1),
                    "train_pass_seconds": [round(t, 3) for t in train_passes],
                    "eval_pass_seconds": [round(t, 3) for t in eval_passes],
                    "eval_vs_baseline": round(
                        eval_imgs_per_sec / REFERENCE_EVAL_IMGS_PER_SEC_ESTIMATE, 3
                    ),
                    **perf_extras,
                    "device": device_name,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
