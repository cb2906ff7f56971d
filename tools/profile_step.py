"""Profile the RPO train/eval step on the current backend and rank ops.

Captures a jax.profiler trace of N steady-state steps at reference
protocol fidelity (ViT-B/16, K=24, n_cls=51, train batch 4 / eval batch
100 — override via flags) and prints the top device ops by total time,
parsed in-process with jax.profiler.ProfileData (no TensorBoard needed).

    python tools/profile_step.py [--phase train|eval] [--steps 20]
        [--batch N] [--n-cls N] [--k K] [--backbone ViT-B/16]
        [--trace-dir DIR] [--top 25]

Notes for this environment (see CLAUDE.md): events overlap (async DMA
slices/copies run under compute), so per-op times do not sum to the step
time; the `jit_*` root event is the true step wall-clock on device.
"""
from __future__ import annotations

import argparse
import glob
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(args):
    import jax
    import jax.numpy as jnp

    from rpo_tpu.data.transforms import device_normalize_fn
    from rpo_tpu.engine.optim import sgd_init, sgd_update
    from rpo_tpu.methods import rpo as core
    from rpo_tpu.models.clip import ARCHS, cast_params, init_clip
    from rpo_tpu.ops.attention import pallas_attention_scope

    cfg = ARCHS[args.backbone]
    params = cast_params(init_clip(jax.random.PRNGKey(0), cfg), jnp.bfloat16)
    classnames = [f"object category {i}" for i in range(args.n_cls)]
    task = core.make_task(cfg, classnames, "a photo of a _.", args.k)
    prompts = core.init_prompts(jax.random.PRNGKey(1), params, cfg, args.k)
    frozen = core.make_frozen(params, task)
    normalize = device_normalize_fn(
        [0.48145466, 0.4578275, 0.40821073],
        [0.26862954, 0.26130258, 0.27577711],
        dtype=jnp.bfloat16,
    )

    def train_step(p, opt, fz, images_u8, labels, mask, lr):
        def loss_fn(p):
            imgs = normalize(images_u8)
            lg = core.rpo_logits(p, fz, task, imgs, split_vision=True)
            lp = jax.nn.log_softmax(lg, -1)
            nll = -jnp.take_along_axis(lp, labels[:, None], -1)[:, 0]
            return jnp.sum(nll * mask) / jnp.sum(mask)

        loss, g = jax.value_and_grad(loss_fn)(p)
        p, opt = sgd_update(p, g, opt, lr)
        return p, opt, loss

    def eval_step(p, fz, text_f, images_u8):
        with pallas_attention_scope(True):
            return core.rpo_logits(p, fz, task, normalize(images_u8), text_f=text_f)

    import numpy as np

    rng = np.random.RandomState(0)
    if args.phase in ("cocoop-eval", "cocoop-train"):
        # Mirrors bench.py::bench_cocoop / the CoCoOp trainer step
        # (methods/cocoop.py): vmapped per-image text towers, chunked
        # lax.map, eval scope split (Pallas vision, XLA text).
        from rpo_tpu.methods import cocoop
        from rpo_tpu.methods import coop as coop_core
        from rpo_tpu.models.clip import encode_image

        k_ctx, k_meta = jax.random.split(jax.random.PRNGKey(1))
        ctx_params, prefix, n_ctx = coop_core.init_ctx(
            k_ctx, params, cfg, args.n_cls, 4, False, "a photo of a"
        )
        mparams = {
            "ctx": ctx_params["ctx"],
            "meta_net": cocoop.init_meta_net(k_meta, cfg.embed_dim, cfg.text_width),
        }
        ctask = coop_core.make_task(cfg, classnames, n_ctx, False, "end", prefix)
        cfrozen = {"clip": params}
        imgs = jnp.asarray(
            rng.randint(0, 256, (args.batch, cfg.image_resolution,
                                 cfg.image_resolution, 3)), jnp.uint8)
        if args.phase == "cocoop-eval":
            chunk = max(1, min(8, args.batch))
            while args.batch % chunk:
                chunk -= 1

            def ceval(p, fz, images_u8):
                with pallas_attention_scope(True):
                    imf = encode_image(
                        fz["clip"], ctask.cfg, normalize(images_u8)
                    ).astype(jnp.float32)
                with pallas_attention_scope(False):
                    return cocoop.cocoop_logits(
                        p, fz["clip"], ctask, None, chunk=chunk,
                        image_features=imf,
                    )

            fn = jax.jit(ceval)

            def run_one():
                return fn(mparams, cfrozen, imgs)
        else:
            B = args.batch
            remat = B >= 16
            chunk = 0
            if remat:
                chunk = max(1, min(8, B))
                while B % chunk:
                    chunk -= 1

            def ctrain(p, opt, fz, images_u8, labels, mask, lr):
                def loss_fn(p):
                    lg = cocoop.cocoop_logits(
                        p, fz["clip"], ctask, normalize(images_u8),
                        chunk=chunk, remat_per_image=remat,
                    )
                    lp = jax.nn.log_softmax(lg, -1)
                    nll = -jnp.take_along_axis(lp, labels[:, None], -1)[:, 0]
                    return jnp.sum(nll * mask) / jnp.sum(mask)

                loss, g = jax.value_and_grad(loss_fn)(p)
                p, opt = sgd_update(p, g, opt, lr)
                return p, opt, loss

            fn = jax.jit(ctrain, donate_argnums=(0, 1))
            state = dict(p=mparams, opt=sgd_init(mparams))
            labels = jnp.asarray(rng.randint(0, args.n_cls, args.batch), jnp.int32)
            mask = jnp.ones((args.batch,), jnp.float32)
            lr = jnp.float32(0.002)

            def run_one():
                state["p"], state["opt"], loss = fn(
                    state["p"], state["opt"], cfrozen, imgs, labels, mask, lr
                )
                return loss
        return run_one
    if args.phase == "train":
        fn = jax.jit(train_step, donate_argnums=(0, 1))
        opt = sgd_init(prompts)
        state = dict(p=prompts, opt=opt)
        imgs = jnp.asarray(
            rng.randint(0, 256, (args.batch, cfg.image_resolution,
                                 cfg.image_resolution, 3)), jnp.uint8)
        labels = jnp.asarray(rng.randint(0, args.n_cls, args.batch), jnp.int32)
        mask = jnp.ones((args.batch,), jnp.float32)
        lr = jnp.float32(0.01)

        def run_one():
            state["p"], state["opt"], loss = fn(
                state["p"], state["opt"], frozen, imgs, labels, mask, lr
            )
            return loss
    else:
        fn = jax.jit(eval_step)
        text_f = jax.jit(
            lambda p, fz: core.encode_text_with_prompts(p, fz, task)
        )(prompts, frozen)
        imgs = jnp.asarray(
            rng.randint(0, 256, (args.batch, cfg.image_resolution,
                                 cfg.image_resolution, 3)), jnp.uint8)

        def run_one():
            return fn(prompts, frozen, text_f, imgs)

    return run_one


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--phase",
        choices=["train", "eval", "cocoop-train", "cocoop-eval"],
        default="train",
    )
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--n-cls", type=int, default=51)
    ap.add_argument("--k", type=int, default=24)
    ap.add_argument("--backbone", default="ViT-B/16")
    ap.add_argument("--trace-dir", default="/tmp/rpo_profile")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()
    if args.batch is None:
        args.batch = 4 if args.phase.endswith("train") else 100
        if args.phase == "cocoop-train":
            args.batch = 8  # best measured train batch (BASELINE.md r3)

    import shutil

    import jax
    import numpy as np

    run_one = build(args)
    np.asarray(run_one())  # compile + land

    shutil.rmtree(args.trace_dir, ignore_errors=True)
    jax.profiler.start_trace(args.trace_dir)
    out = None
    for _ in range(args.steps):
        out = run_one()
    np.asarray(out)  # host transfer = device sync on this backend
    jax.profiler.stop_trace()

    files = glob.glob(f"{args.trace_dir}/**/*.xplane.pb", recursive=True)
    if not files:
        print(f"no trace produced under {args.trace_dir}")
        return 1
    from jax.profiler import ProfileData

    pd = ProfileData.from_file(files[0])
    tot, cnt = defaultdict(float), defaultdict(int)
    for plane in pd.planes:
        if "tpu" not in plane.name.lower():
            continue
        for line in plane.lines:
            for ev in line.events:
                tot[ev.name] += ev.duration_ns
                cnt[ev.name] += 1
    print(f"device ops by total time ({args.phase}, {args.steps} steps, "
          f"batch {args.batch}):")
    for name, ns in sorted(tot.items(), key=lambda kv: -kv[1])[: args.top]:
        print(f"{ns / args.steps / 1e3:9.1f} us/step  x{cnt[name]:5d}  {name[:100]}")
    print(f"trace: {files[0]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
