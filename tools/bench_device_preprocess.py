"""A/B: host-resized 224 input vs device-resized small-source input.

Answers VERDICT r2 weak #3 with a measurement: for fixed-size small
sources (EuroSAT: 64x64 JPEGs), is it faster to (A) resize to 224 on the
host and ship (B,224,224,3) uint8 per eval batch, or (B) ship the raw
(B,64,64,3) uint8 (12x less tunnel traffic) and run
ops.preprocess.device_eval_preprocess (separable-bicubic MXU matmuls +
center-crop + normalize) inside the jitted eval step?

Unlike bench.py's eval timing (device-resident inputs, pure compute),
each iteration here transfers a HOST numpy batch — the real pipeline's
per-batch H2D cost is in the measurement, which is the point.

    python tools/bench_device_preprocess.py [--src 64] [--batch 100]
        [--iters 20]

Prints one JSON line with images/sec for both paths and the host-side
PIL resize cost they trade against.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MEAN = [0.48145466, 0.4578275, 0.40821073]
STD = [0.26862954, 0.26130258, 0.27577711]


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--src", type=int, default=64, help="source image size")
    ap.add_argument("--batch", type=int, default=100)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--n-cls", type=int, default=51)
    ap.add_argument("--k", type=int, default=24)
    ap.add_argument("--phase", choices=["eval", "train"], default="eval")
    args = ap.parse_args()
    if args.phase == "train":
        return bench_train(args)

    import jax
    import jax.numpy as jnp

    cache = os.environ.get(
        "RPO_TPU_XLA_CACHE", os.path.expanduser("~/.cache/rpo_tpu/xla")
    )
    if cache and cache != "0":
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)

    from rpo_tpu.data.transforms import device_normalize_fn
    from rpo_tpu.methods import rpo as core
    from rpo_tpu.models.clip import VIT_B16, cast_params, init_clip
    from rpo_tpu.ops.attention import pallas_attention_scope
    from rpo_tpu.ops.preprocess import device_eval_preprocess

    cfg = VIT_B16
    size = cfg.image_resolution
    params = cast_params(init_clip(jax.random.PRNGKey(0), cfg), jnp.bfloat16)
    classnames = [f"object category {i}" for i in range(args.n_cls)]
    task = core.make_task(cfg, classnames, "a photo of a _.", args.k)
    prompts = core.init_prompts(jax.random.PRNGKey(1), params, cfg, args.k)
    frozen = core.make_frozen(params, task)
    normalize = device_normalize_fn(MEAN, STD, dtype=jnp.bfloat16)
    text_f = core.encode_text_with_prompts(prompts, frozen, task)

    def eval_host_resized(prompts, frozen, text_f, images_u8):
        with pallas_attention_scope(True):
            return core.rpo_logits(
                prompts, frozen, task, normalize(images_u8), text_f=text_f
            )

    def eval_device_resized(prompts, frozen, text_f, images_small_u8):
        with pallas_attention_scope(True):
            imgs = device_eval_preprocess(
                images_small_u8, size, MEAN, STD
            ).astype(jnp.bfloat16)
            return core.rpo_logits(prompts, frozen, task, imgs, text_f=text_f)

    jit_a = jax.jit(eval_host_resized)
    jit_b = jax.jit(eval_device_resized)

    rng = np.random.RandomState(0)
    host_small = rng.randint(
        0, 256, size=(args.batch, args.src, args.src, 3)
    ).astype(np.uint8)

    # host-side PIL cost that path B eliminates (per-image resize to 224)
    from PIL import Image

    t0 = time.perf_counter()
    host_big = np.stack(
        [
            np.asarray(
                Image.fromarray(im).resize((size, size), Image.BICUBIC), np.uint8
            )
            for im in host_small
        ]
    )
    host_resize_s_per_batch = time.perf_counter() - t0

    def timed(jit_fn, host_batch, n_passes=3):
        logits = jit_fn(prompts, frozen, text_f, jnp.asarray(host_batch))
        float(logits[0, 0])  # compile + sync
        times = []
        for _ in range(n_passes):
            t0 = time.perf_counter()
            out = None
            for _ in range(args.iters):
                # fresh H2D transfer every iteration — the real pipeline's
                # per-batch cost (bench.py uses device-resident inputs)
                out = jit_fn(prompts, frozen, text_f, jnp.asarray(host_batch))
            float(out[0, 0])
            times.append(time.perf_counter() - t0)
        return args.iters * args.batch / min(times)

    a_img_s = timed(jit_a, host_big)
    b_img_s = timed(jit_b, host_small)

    # numerics: device path must agree with the host-PIL path closely
    la = np.asarray(
        jit_a(prompts, frozen, text_f, jnp.asarray(host_big)), np.float32
    )
    lb = np.asarray(
        jit_b(prompts, frozen, text_f, jnp.asarray(host_small)), np.float32
    )
    agree = float(
        (la.argmax(-1) == lb.argmax(-1)).mean()
    )

    print(
        json.dumps(
            {
                "metric": "device_resize_eval_images_per_sec",
                "value": round(b_img_s, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(b_img_s / a_img_s, 3),
                "extras": {
                    "host_resized_images_per_sec": round(a_img_s, 2),
                    "device_resized_images_per_sec": round(b_img_s, 2),
                    "h2d_bytes_per_batch_host_path": int(host_big.nbytes),
                    "h2d_bytes_per_batch_device_path": int(host_small.nbytes),
                    "host_pil_resize_seconds_per_batch": round(
                        host_resize_s_per_batch, 4
                    ),
                    "top1_agreement_host_vs_device_resize": agree,
                    "src_size": args.src,
                    "batch": args.batch,
                },
            }
        )
    )


def bench_train(args) -> None:
    """Train-path A/B at the protocol batch (default via --batch 4):
    host-augmented 224 batches vs raw source + on-device RandomResizedCrop
    (device_train_preprocess), each with a fresh H2D transfer per step."""
    import random

    import jax
    import jax.numpy as jnp

    cache = os.environ.get(
        "RPO_TPU_XLA_CACHE", os.path.expanduser("~/.cache/rpo_tpu/xla")
    )
    if cache and cache != "0":
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)

    from rpo_tpu.data.transforms import device_normalize_fn, sample_rrc_box
    from rpo_tpu.engine.optim import sgd_init, sgd_update
    from rpo_tpu.methods import rpo as core
    from rpo_tpu.models.clip import VIT_B16, cast_params, init_clip
    from rpo_tpu.ops.preprocess import device_train_preprocess

    cfg = VIT_B16
    size = cfg.image_resolution
    B = args.batch if args.batch != 100 else 4  # protocol train batch
    params = cast_params(init_clip(jax.random.PRNGKey(0), cfg), jnp.bfloat16)
    classnames = [f"object category {i}" for i in range(args.n_cls)]
    task = core.make_task(cfg, classnames, "a photo of a _.", args.k)
    prompts = core.init_prompts(jax.random.PRNGKey(1), params, cfg, args.k)
    frozen = core.make_frozen(params, task)
    normalize = device_normalize_fn(MEAN, STD, dtype=jnp.bfloat16)

    def step_from(prep):
        def train_step(prompts, opt_state, frozen, images, labels, mask, lr):
            def loss_fn(p):
                lg = core.rpo_logits(
                    p, frozen, task, prep(images), split_vision=True
                )
                lp = jax.nn.log_softmax(lg, -1)
                nll = -jnp.take_along_axis(lp, labels[:, None], -1)[:, 0]
                return jnp.sum(nll * mask) / jnp.sum(mask)

            loss, g = jax.value_and_grad(loss_fn)(prompts)
            prompts, opt_state = sgd_update(prompts, g, opt_state, lr)
            return prompts, opt_state, loss

        return jax.jit(train_step)

    jit_host = step_from(normalize)
    jit_dev = step_from(
        lambda d: device_train_preprocess(
            d["img"], d["box"], d["flip"], size, MEAN, STD
        ).astype(jnp.bfloat16)
    )

    rng = np.random.RandomState(0)
    random.seed(0)
    host_full = rng.randint(0, 256, size=(B, size, size, 3)).astype(np.uint8)
    host_aug = {
        "img": rng.randint(0, 256, size=(B, args.src, args.src, 3)).astype(np.uint8),
        "box": np.asarray(
            [sample_rrc_box(args.src, args.src) for _ in range(B)], np.int32
        ),
        "flip": rng.randint(0, 2, size=(B,)).astype(np.int32),
    }
    labels = jnp.asarray(rng.randint(0, args.n_cls, size=B), jnp.int32)
    mask = jnp.ones((B,), jnp.float32)
    lr = jnp.float32(0.01)

    def to_dev(x):
        return jax.tree_util.tree_map(jnp.asarray, x)

    def timed(jit_fn, host_batch, n=30):
        p, o = prompts, sgd_init(prompts)
        p, o, loss = jit_fn(p, o, frozen, to_dev(host_batch), labels, mask, lr)
        float(loss)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(n):
                p, o, loss = jit_fn(
                    p, o, frozen, to_dev(host_batch), labels, mask, lr
                )
            float(loss)
            times.append(time.perf_counter() - t0)
        return n * B / min(times)

    a_img_s = timed(jit_host, host_full)
    b_img_s = timed(jit_dev, host_aug)

    print(
        json.dumps(
            {
                "metric": "device_augment_train_images_per_sec",
                "value": round(b_img_s, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(b_img_s / a_img_s, 3),
                "extras": {
                    "host_augmented_images_per_sec": round(a_img_s, 2),
                    "device_augmented_images_per_sec": round(b_img_s, 2),
                    "h2d_bytes_per_step_host_path": int(host_full.nbytes),
                    "h2d_bytes_per_step_device_path": int(
                        host_aug["img"].nbytes
                        + host_aug["box"].nbytes
                        + host_aug["flip"].nbytes
                    ),
                    "train_batch": B,
                    "src_size": args.src,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
