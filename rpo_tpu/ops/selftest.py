"""On-device Pallas kernel self-test library.

Every Pallas kernel at every production shape vs the plain-XLA attention
path, each check fully isolated (own try/except + retry) — the bisection
tool that separates a kernel regression from an `axon` platform fault
(round 3's BENCH_r03.json crash mode: one transient FAILED_PRECONDITION
in the bench gate killed every number).

Used two ways:
  - ``tools/kernel_selftest.py`` — standalone CLI, one JSON line;
  - ``bench.py`` — as the hardened pre-timing gate: on any failure the
    bench downgrades the timed sections to the XLA path and reports the
    gate status inside its JSON instead of dying.

Production shapes covered (see bench.py and the trainers):
  - pallas_attention, text-masked   (51, 8, 77, 77, 64)    RPO text tower
  - pallas_attention, vision-masked (4, 12, 221, 221, 64)  RPO train tower
  - pallas_rect_attention           (100, 12, 221, 197, 64) RPO eval tower
  - pallas_rect_attention_paired    (100, 6, 221, 197, 128) eval hot path
  - pallas_rect_attention_paired backward (custom VJP)
  - rect_residual_block pallas-vs-xla (whole layer, eval path)
  - fused text layer (408, 16, 512) — the r5 whole-layer kernel on the
    CoCoOp eval per-image text towers (ops/fused_text_layer.py)
  - pallas inside shard_map (1-device mesh — the production dp eval path)
  - device_eval_preprocess  (4,64,64)->224 + (4,48,48)->32 vs host PIL
  - device_train_preprocess (4,64,64)->224 + (4,16,16)->32 vs host PIL
    (the INPUT.DEVICE_RESIZE production path, r5: silicon-only paths need
    silicon-side numerics gates — checked to the documented 1-2 u8 LSB
    resize contract, a per-check tolerance)

Reference parity surface: /root/reference/trainers/rpo.py:140-168 builds
the (bsz*heads, L, S) masks these kernels replace.
"""
from __future__ import annotations

import sys
import time
import traceback


def _checks(jax, jnp, np, frozen=None, task=None):
    """Yield (name, thunk) or (name, thunk, tol) tuples; each thunk
    returns a max-abs-err float and asserts nothing — the runner owns
    tolerance (the run-level default unless the check carries its own)
    and isolation.

    ``frozen``/``task`` may be passed by a caller that already holds the
    full-size CLIP objects (bench.py's gate) to avoid building a second
    ~300MB device pytree just for the whole-layer checks."""
    from rpo_tpu.methods import rpo as core
    from rpo_tpu.models.clip import VIT_B16, cast_params, init_clip
    from rpo_tpu.ops import attention as attn_ops

    cfg = VIT_B16
    if task is None or frozen is None:
        classnames = [f"object category {i}" for i in range(51)]
        task = core.make_task(cfg, classnames, "a photo of a _.", 24)
        params = cast_params(init_clip(jax.random.PRNGKey(0), cfg), jnp.bfloat16)
        frozen = core.make_frozen(params, task)
    N_CLS, K = len(task.len_prompts), int(task.K)
    S = cfg.vision_seq_len + K  # 221 at the production K=24
    r = np.random.RandomState(7)

    def qkv(B, H, Lq, Lk, D, dtype=jnp.bfloat16):
        q = jnp.asarray(r.randn(B, H, Lq, D), dtype)
        k = jnp.asarray(r.randn(B, H, Lk, D), dtype)
        v = jnp.asarray(r.randn(B, H, Lk, D), dtype)
        return q, k, v

    def attn_err(B, H, Lq, Lk, D, bias):
        q, k, v = qkv(B, H, Lq, Lk, D)

        def run(use):
            with attn_ops.pallas_attention_scope(use):
                return jax.jit(
                    lambda q, k, v: attn_ops.dot_product_attention(q, k, v, bias)
                )(q, k, v)

        a = np.asarray(run(True), np.float32)
        b = np.asarray(run(False), np.float32)
        return float(np.abs(a - b).max())

    text_bias = jnp.asarray(core.build_text_mask(task.len_prompts))
    vis_bias = jnp.asarray(core.build_visual_mask(S, K))

    yield (
        f"text-masked ({N_CLS},8,77,77)",
        lambda: attn_err(N_CLS, 8, 77, 77, 64, text_bias),
    )
    yield (
        f"vision-masked (4,12,{S},{S})",
        lambda: attn_err(4, 12, S, S, 64, vis_bias),
    )
    yield (
        f"vision-rect (100,12,{S},{cfg.vision_seq_len})",
        lambda: attn_err(100, 12, S, cfg.vision_seq_len, 64, None),
    )

    def paired_err():
        # paired layout: head pair i = real heads (2i, 2i+1) packed on lanes
        from rpo_tpu.ops.pallas_attention import pallas_rect_attention_paired

        B, H, Lq, Lk, D = 100, 12, S, cfg.vision_seq_len, 64
        q, k, v = qkv(B, H, Lq, Lk, D)

        def pack(x):
            B_, H_, L_, D_ = x.shape
            return x.reshape(B_, H_ // 2, 2, L_, D_).transpose(0, 1, 3, 2, 4).reshape(
                B_, H_ // 2, L_, 2 * D_
            )

        a2 = jax.jit(lambda q2, k2, v2: pallas_rect_attention_paired(q2, k2, v2, D))(
            pack(q), pack(k), pack(v)
        )
        with attn_ops.pallas_attention_scope(False):
            b = jax.jit(
                lambda q, k, v: attn_ops.dot_product_attention(q, k, v, None)
            )(q, k, v)
        return float(
            np.abs(np.asarray(a2, np.float32) - np.asarray(pack(b), np.float32)).max()
        )

    yield (f"vision-rect-paired (100,6,{S},{cfg.vision_seq_len})", paired_err)

    def paired_grad_err():
        from rpo_tpu.ops.pallas_attention import pallas_rect_attention_paired

        B, H2, Lq, Lk, D2 = 4, 6, S, cfg.vision_seq_len, 128
        q2, k2, v2 = qkv(B, H2, Lq, Lk, D2)

        def loss_pl(q2, k2, v2):
            return jnp.sum(pallas_rect_attention_paired(q2, k2, v2, 64) ** 2)

        def loss_xla(q2, k2, v2):
            outs = []
            for h in (0, 1):
                sl = slice(h * 64, (h + 1) * 64)
                with attn_ops.pallas_attention_scope(False):
                    outs.append(
                        attn_ops.dot_product_attention(
                            q2[..., sl], k2[..., sl], v2[..., sl], None
                        )
                    )
            return jnp.sum(jnp.concatenate(outs, axis=-1) ** 2)

        ga = jax.jit(jax.grad(loss_pl, argnums=(0, 1, 2)))(q2, k2, v2)
        gb = jax.jit(jax.grad(loss_xla, argnums=(0, 1, 2)))(q2, k2, v2)
        return max(
            float(np.abs(np.asarray(a, np.float32) - np.asarray(b, np.float32)).max())
            for a, b in zip(ga, gb)
        )

    yield ("vision-rect-paired grad (custom VJP)", paired_grad_err)

    # whole-layer check: the rect residual block (eval hot path) with the
    # REAL parameter structure, pallas vs xla
    def tower_err():
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

        return float(
            np.abs(
                np.asarray(tower(True), np.float32)
                - np.asarray(tower(False), np.float32)
            ).max()
        )

    yield ("rect residual block (whole layer)", tower_err)

    # fused whole-layer text kernel (r5): the CoCoOp eval path runs the
    # per-image text towers through ONE Pallas program per row-block
    # (LN1 -> QKV -> attn -> out -> LN2 -> MLP, ops/fused_text_layer.py)
    # at (chunk * n_cls, L~16, 512) — check at that production shape vs
    # the XLA residual block
    def fused_text_err():
        from rpo_tpu.models.clip.layers import residual_block
        from rpo_tpu.models.clip.model import causal_mask
        from rpo_tpu.ops.fused_text_layer import fused_text_layer

        L = 16
        x = jnp.asarray(r.randn(408, L, cfg.text_width) * 0.1, jnp.bfloat16)
        blk = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a[0]), frozen["clip"]["text"]["blocks"]
        )
        mask = causal_mask(L)
        ref = jax.jit(
            lambda x, b: residual_block(x, b, cfg.text_heads, mask[None, None])
        )(x, blk)
        got = jax.jit(
            lambda x, b: fused_text_layer(x, b, cfg.text_heads, mask)
        )(x, blk)
        return float(
            np.abs(np.asarray(got, np.float32) - np.asarray(ref, np.float32)).max()
        )

    yield ("fused text layer (408,16,512) whole-layer kernel", fused_text_err)

    def shard_map_err():
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        from rpo_tpu.models.clip.layers import rect_residual_block
        from rpo_tpu.parallel.dp import make_mesh

        x = jnp.asarray(r.randn(4, S, cfg.vision_width) * 0.1, jnp.bfloat16)
        blk = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a[0]), frozen["clip"]["visual"]["blocks"]
        )

        def shard_tower(xx, bb):
            with attn_ops.pallas_attention_scope(True):
                return rect_residual_block(xx, bb, cfg.vision_heads, cfg.vision_seq_len)

        mesh1 = make_mesh(jax.devices()[:1])
        sm = jax.jit(
            shard_map(
                shard_tower, mesh=mesh1, in_specs=(P("data"), P()),
                out_specs=P("data"), check_vma=False,
            )
        )
        with attn_ops.pallas_attention_scope(False):
            ref = jax.jit(
                lambda x, blk: rect_residual_block(
                    x, blk, cfg.vision_heads, cfg.vision_seq_len
                )
            )(x, blk)
        return float(
            np.abs(np.asarray(sm(x, blk), np.float32) - np.asarray(ref, np.float32)).max()
        )

    yield ("pallas-in-shard_map (1-device mesh)", shard_map_err)

    # device preprocess kernels (the INPUT.DEVICE_RESIZE production path,
    # ops/preprocess.py) vs the host PIL reference, to the documented
    # 1-2 u8 LSB resize contract (tests/test_device_preprocess.py) — in
    # normalized units that is 2.01 / (min(std) * 255).
    MEAN = [0.48145466, 0.4578275, 0.40821073]
    STD = [0.26862954, 0.26130258, 0.27577711]
    u8_tol = 2.01 / (min(STD) * 255.0)
    mean_h = np.asarray(MEAN, np.float32) * 255.0
    std_h = np.asarray(STD, np.float32) * 255.0

    def eval_prep_err():
        from PIL import Image

        from rpo_tpu.data.transforms import center_crop, resize_shorter
        from rpo_tpu.ops.preprocess import device_eval_preprocess

        errs = []
        for S, OUT in ((64, 224), (48, 32)):
            src = r.randint(0, 256, size=(4, S, S, 3)).astype(np.uint8)
            out = np.asarray(
                jax.jit(lambda x: device_eval_preprocess(x, OUT, MEAN, STD))(
                    jnp.asarray(src)
                ),
                np.float32,
            )
            for i in range(src.shape[0]):
                ref_u8 = np.asarray(
                    center_crop(
                        resize_shorter(Image.fromarray(src[i]), OUT, "bicubic"),
                        OUT,
                    ),
                    np.float32,
                )
                errs.append(np.abs(out[i] - (ref_u8 - mean_h) / std_h).max())
        return float(max(errs))

    yield ("device-eval-preprocess 64->224 + 48->32 vs PIL", eval_prep_err, u8_tol)

    def train_prep_err():
        import random as _random

        from PIL import Image

        from rpo_tpu.data.transforms import sample_rrc_box
        from rpo_tpu.ops.preprocess import device_train_preprocess

        rr = _random.Random(11)
        errs = []
        for S, OUT in ((64, 224), (16, 32)):
            B = 4
            src = r.randint(0, 256, size=(B, S, S, 3)).astype(np.uint8)
            boxes = [(0, 0, S, S)] + [
                sample_rrc_box(S, S, rng=rr) for _ in range(B - 1)
            ]
            flips = [i % 2 for i in range(B)]
            out = np.asarray(
                jax.jit(
                    lambda x, b, f: device_train_preprocess(
                        x, b, f, OUT, MEAN, STD
                    )
                )(
                    jnp.asarray(src),
                    jnp.asarray(boxes, jnp.int32),
                    jnp.asarray(flips, jnp.int32),
                ),
                np.float32,
            )
            for i, ((left, top, cw, ch), flip) in enumerate(zip(boxes, flips)):
                ref = Image.fromarray(src[i]).resize(
                    (OUT, OUT), Image.BICUBIC,
                    box=(left, top, left + cw, top + ch),
                )
                ref = np.asarray(ref, np.float32)
                if flip:
                    ref = ref[:, ::-1]
                errs.append(np.abs(out[i] - (ref - mean_h) / std_h).max())
        return float(max(errs))

    yield (
        "device-train-preprocess 64->224 + 16->32 vs PIL",
        train_prep_err,
        u8_tol,
    )


def run_selftest(
    tol: float = 2e-2,
    retries: int = 1,
    verbose: bool = True,
    frozen=None,
    task=None,
) -> dict:
    """Run every check isolated; return a results dict:

    {"metric": "kernel_selftest", "value": n_passed, "total": n,
     "checks": {name: "ok (err=..)" | "FAILED: ..."}, ...}

    Never raises on a check fault — a failure is a string in ``checks``.
    """
    import numpy as np

    import jax
    import jax.numpy as jnp

    results: dict = {}
    n_pass = 0
    t0 = time.perf_counter()
    for check in _checks(jax, jnp, np, frozen=frozen, task=task):
        name, thunk = check[0], check[1]
        check_tol = check[2] if len(check) > 2 else tol
        status = None
        for attempt in range(retries + 1):
            try:
                err = thunk()
                if err < check_tol:
                    status = f"ok (err={err:.2e})"
                else:
                    status = (
                        f"FAILED: mismatch err={err:.3e} >= tol={check_tol:.3g}"
                    )
                break
            except Exception as e:  # noqa: BLE001 — isolation is the point
                status = f"FAILED: {type(e).__name__}: {e}"
                if verbose:
                    traceback.print_exc(file=sys.stderr)
                if attempt < retries:
                    time.sleep(2.0)  # transient axon faults clear quickly
        results[name] = status
        if status.startswith("ok"):
            n_pass += 1
        if verbose:
            print(f"kernel selftest: {name}: {status}", file=sys.stderr)
    return {
        "metric": "kernel_selftest",
        "value": n_pass,
        "unit": "checks",
        "total": len(results),
        "checks": results,
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "seconds": round(time.perf_counter() - t0, 1),
    }
