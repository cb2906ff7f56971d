"""Shared trainer plumbing for all CLIP prompt methods.

Every reference method trainer repeats the same build/step/checkpoint
boilerplate (rpo.py:235-357, coop.py:211-325, cocoop.py, linear_prob.py);
here it lives once.  Subclasses implement ``build_method()`` which sets
``self.params`` / ``self.task`` and calls ``_install_steps`` with three
pure functions:

  train_step(params, opt_state, frozen, images_u8, labels, mask, lr)
      -> (params, opt_state, loss, acc)
  text_features(params, frozen) -> cached per-task tensors for eval (or None)
  eval_step(params, frozen, text_f, images_u8) -> logits

``frozen`` is the method's bundle of non-trainable device tensors
(backbone pytree + task constants), supplied via ``self._frozen`` and
passed as a jit argument — closing over it would embed ~300MB of
weights into the executable as constants (minutes of compile time).

The base wraps them in jit (single device) or GSPMD data-parallel
shardings (multi-device), manages the text-feature eval cache, and
implements the Dassl checkpoint surface over ``self.params``.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from rpo_tpu.data.transforms import device_normalize_fn
from rpo_tpu.engine.optim import SGDState, sgd_init
from rpo_tpu.engine.trainer import TrainerBase
from rpo_tpu.models.clip.pretrained import load_backbone


def make_image_prep(cfg, dtype):
    """uint8 batch -> normalized float batch, shape-aware.

    Full-size batches (train path, or eval without DEVICE_RESIZE) just
    normalize — XLA fuses it into the patch-embed matmul.  When
    INPUT.DEVICE_RESIZE > 0, eval batches arrive at the raw source size
    and the whole resize(bicubic, MXU matmuls) + center-crop + normalize
    chain runs on device (ops/preprocess.py::device_eval_preprocess) —
    measured 10.6x end-to-end eval throughput for 64x64 sources on a
    bandwidth-limited host->device link (BASELINE.md round 3), and 12x
    less transfer everywhere."""
    H, W = int(cfg.INPUT.SIZE[0]), int(cfg.INPUT.SIZE[1])
    mean, std = cfg.INPUT.PIXEL_MEAN, cfg.INPUT.PIXEL_STD
    base = device_normalize_fn(mean, std, dtype=dtype)
    if not int(cfg.INPUT.DEVICE_RESIZE):
        return base

    from rpo_tpu.ops.preprocess import (
        device_eval_preprocess,
        device_train_preprocess,
    )

    def prep(images_u8):
        if isinstance(images_u8, dict):
            # device-augment TRAIN batch: raw sources + host-sampled
            # crop/flip plans (loader._make_device_augment_batch)
            return device_train_preprocess(
                images_u8["img"], images_u8["box"], images_u8["flip"],
                H, mean, std,
            ).astype(dtype)
        if images_u8.shape[1] == H and images_u8.shape[2] == W:
            return base(images_u8)
        return device_eval_preprocess(images_u8, H, mean, std).astype(dtype)

    return prep


def prec_dtype(prec: str):
    """Map a reference PREC name to the compute dtype.

    ``fp16`` and ``amp`` BOTH map to bfloat16 on TPU, deliberately: the
    reference's amp path exists to pair fp16 compute with a GradScaler
    (reference trainers/rpo.py:278,300-307) because fp16's 5-bit exponent
    underflows gradients.  bf16 shares fp32's 8-bit exponent, so no loss
    scaling is needed and the amp/fp16 distinction collapses — the two
    settings compile to identical programs (pinned by
    tests/test_review_fixes.py::test_amp_aliases_fp16).
    """
    return {"fp16": jnp.bfloat16, "amp": jnp.bfloat16, "fp32": jnp.float32}[prec]


def prewarm_plan(group: int, num_batches: int):
    """Which train programs will the epoch loop actually dispatch?

    Mirrors ``engine/trainer.py::run_epoch``: the grouped program runs
    only for FULL groups of ``group`` batches; the trailing partial group
    (and everything, when ``group == 1`` or the epoch is shorter than one
    group) goes through the per-batch step.  Returns
    ``(warm_grouped, warm_single)``.
    """
    warm_grouped = group > 1 and num_batches >= group
    warm_single = not warm_grouped or num_batches % group != 0
    return warm_grouped, warm_single


class CLIPMethodTrainer(TrainerBase):
    prec_key = ""  # e.g. "RPO" -> cfg.TRAINER.RPO.PREC
    model_name = "model"
    log_acc = True  # reference RPO logs only loss; CoOp-family logs acc too

    def check_cfg(self, cfg) -> None:
        assert cfg.TRAINER[self.prec_key].PREC in ["fp16", "fp32", "amp"]

    def build_model(self) -> None:
        cfg = self.cfg
        prec = cfg.TRAINER[self.prec_key].PREC
        seed = max(int(cfg.SEED), 0)

        if prec == "amp":
            print(
                "PREC 'amp' on TPU: bf16 compute, no GradScaler "
                "(bf16 keeps fp32's exponent range; identical to PREC 'fp16' here)"
            )
        print(f"Loading CLIP (backbone: {cfg.MODEL.BACKBONE.NAME})")
        self.clip_params, self.clip_cfg = load_backbone(
            cfg.MODEL.BACKBONE.NAME, dtype=prec_dtype(prec), seed=seed
        )
        assert int(cfg.INPUT.SIZE[0]) == self.clip_cfg.image_resolution, (
            f"cfg_imsize ({cfg.INPUT.SIZE[0]}) must equal to "
            f"clip_imsize ({self.clip_cfg.image_resolution})"
        )
        self._normalize = make_image_prep(cfg, prec_dtype(prec))
        self._momentum = float(cfg.OPTIM.MOMENTUM)
        self._weight_decay = float(cfg.OPTIM.WEIGHT_DECAY)
        self._nesterov = bool(cfg.OPTIM.SGD_NESTEROV)
        self._dampening = float(cfg.OPTIM.SGD_DAMPNING)
        if self._nesterov and self._dampening:
            # torch.optim.SGD raises the same way
            raise ValueError("Nesterov momentum requires zero dampening")

        print("Building custom CLIP")
        self.build_method()

        if cfg.MODEL.INIT_WEIGHTS:
            # initialize the trainable module from a checkpoint file before
            # training (reference load_pretrained_weights, rpo.py:269-270)
            from rpo_tpu.engine.trainer import _load_checkpoint_file

            ckpt = _load_checkpoint_file(cfg.MODEL.INIT_WEIGHTS)
            print(f"Initializing {self.model_name} from {cfg.MODEL.INIT_WEIGHTS}")
            self.set_ckpt_state(self.model_name, ckpt["state_dict"])

        self.opt_state = sgd_init(self.params)
        self.register_model(self.model_name)
        names = {f"{self.model_name}.{k}" for k in self.params}
        print(f"Parameters to be updated: {names}")

    def build_method(self) -> None:
        raise NotImplementedError

    def _make_train_step(self, logits_fn, microbatch=0, precompute=None,
                         axis_name=None):
        """Standard training step over ``logits_fn(params, frozen,
        images_u8) -> (B, n_cls)``: masked cross-entropy (padded rows
        carry zero weight), grads w.r.t. the trainable pytree only,
        torch-exact SGD, masked top-1 accuracy.  Every method trainer's
        step is this algebra around its own logits call — one copy.

        ``microbatch`` (cfg.TRAIN.MICROBATCH): compute the forward in
        unrolled chunks of that size inside the ONE loss/grad — the
        optimizer still sees the full-batch gradient, so the math is the
        per-row-identical monolithic step.  This exists because at large
        batch XLA flips the tower scan's activation layout ({2,0,1} at
        B=128) and burns ~17 ms/step in layout-change copies; chunked
        tower calls stay at the small-batch shape it lays out well
        (B=128: 1500 -> 1919 img/s on TPU v5e, BASELINE.md r4).  When
        set, ``logits_fn`` takes a 4th argument ``ctx`` — per-step work
        shared across chunks (e.g. RPO's text tower), produced once by
        ``precompute(params, frozen)`` (None when no precompute).
        Chunking only engages for batches it divides evenly; other
        shapes (e.g. the protocol's batch 4) trace the monolithic path.

        ``axis_name``: when set, the step is built to run INSIDE a
        ``shard_map`` over that mesh axis — it sees only its device's
        batch shard and cross-device reduces the grads and the masked
        loss/accuracy sums with ``lax.psum`` before the (replicated) SGD
        update.  This is what lets TRAIN.MICROBATCH compose with data
        parallelism: chunk slices are per-device rows, legal where the
        GSPMD-sharded monolithic step cannot slice the global batch dim
        (VERDICT r4 weak #3).  The global math is identical: the psum'd
        sums ARE the full-batch sums.
        """
        from rpo_tpu.engine.optim import sgd_update

        mb = int(microbatch)

        def batch_logits(p, frozen, images_u8):
            leaves = images_u8["img"] if isinstance(images_u8, dict) else images_u8
            B = leaves.shape[0]
            if not 0 < mb < B or B % mb:
                if precompute is None:
                    return logits_fn(p, frozen, images_u8)
                return logits_fn(p, frozen, images_u8, precompute(p, frozen))
            ctx = None if precompute is None else precompute(p, frozen)
            parts = []
            for i in range(B // mb):
                sl = lambda t: t[i * mb:(i + 1) * mb]
                chunk = (
                    jax.tree_util.tree_map(sl, images_u8)
                    if isinstance(images_u8, dict) else sl(images_u8)
                )
                parts.append(
                    logits_fn(p, frozen, chunk)
                    if precompute is None
                    else logits_fn(p, frozen, chunk, ctx)
                )
            return jnp.concatenate(parts, axis=0)

        def train_step(params, opt_state, frozen, images_u8, labels, mask, lr):
            def loss_fn(p):
                logits = batch_logits(p, frozen, images_u8)
                logp = jax.nn.log_softmax(logits, axis=-1)
                nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
                return jnp.sum(nll * mask) / jnp.sum(mask), logits

            (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            params, opt_state = sgd_update(
                params, grads, opt_state, lr,
                momentum=self._momentum, weight_decay=self._weight_decay,
                nesterov=self._nesterov, dampening=self._dampening,
            )
            acc = jnp.sum((jnp.argmax(logits, -1) == labels) * mask) / jnp.sum(mask)
            return params, opt_state, loss, acc

        def train_step_spmd(params, opt_state, frozen, images_u8, labels, mask, lr):
            # shard_map body: local sums + psum == the global masked means.
            # Grads are taken of the UNNORMALIZED local nll sum (exact —
            # the normalizer is the psum'd mask total, applied after).
            def loss_fn(p):
                logits = batch_logits(p, frozen, images_u8)
                logp = jax.nn.log_softmax(logits, axis=-1)
                nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
                return jnp.sum(nll * mask), logits

            (nll_sum, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            correct = jnp.sum((jnp.argmax(logits, -1) == labels) * mask)
            denom = jax.lax.psum(jnp.sum(mask), axis_name)
            nll_sum = jax.lax.psum(nll_sum, axis_name)
            correct = jax.lax.psum(correct, axis_name)
            grads = jax.tree_util.tree_map(
                lambda g: jax.lax.psum(g, axis_name) / denom, grads
            )
            params, opt_state = sgd_update(
                params, grads, opt_state, lr,
                momentum=self._momentum, weight_decay=self._weight_decay,
                nesterov=self._nesterov, dampening=self._dampening,
            )
            return params, opt_state, nll_sum / denom, correct / denom

        return train_step_spmd if axis_name else train_step

    def _make_grad_accum_train_step(self, precompute_fn, chunk_logits_fn, chunk_size):
        """Exact gradient accumulation over image-chunks inside ONE jitted
        step.  Masked cross-entropy is row-separable, so the full-batch
        gradient is the SUM of per-chunk gradients of sum(nll*mask): each
        chunk's backward runs right after its forward inside a lax.scan
        whose carry is just the (tiny) trainable-grad pytree — peak
        memory is ONE chunk's residuals with ZERO recompute.  This is the
        CoCoOp large-batch answer: remat pays +1 text-tower forward
        (B=32: 427 -> 326 img/s on v5e), the monolithic no-remat stash
        degrades with B (345 at B=32), grad accumulation holds the B=8
        peak at any batch (B=32 421, B=64 433, B=128 429 — BASELINE.md
        r5).  Scan beats an unrolled loop HERE (282 at B=32) because the
        carry is the small grad pytree, not tower activations — the
        opposite trade from TRAIN.MICROBATCH's unroll (base_trainer
        _make_train_step), where the chunks live inside one backward.

        ``precompute_fn(frozen, images_u8) -> batch_ctx``: the shared
        params-INDEPENDENT per-batch work (e.g. the frozen vision tower),
        a pytree with leading batch dims.  It takes no ``params`` by
        construction — a params-dependent precompute would make per-chunk
        accumulation inexact (its cross-chunk grads would be dropped).
        ``chunk_logits_fn(params, frozen, ctx_chunk) -> (chunk, n_cls)``.
        Chunking requires divisibility; ``chunk_size`` is decremented
        until it divides B (B < chunk_size runs as one chunk)."""
        from rpo_tpu.engine.optim import sgd_update

        def train_step(params, opt_state, frozen, images_u8, labels, mask, lr):
            batch_ctx = precompute_fn(frozen, images_u8)
            B = jax.tree_util.tree_leaves(batch_ctx)[0].shape[0]
            c = max(1, min(int(chunk_size), B))
            while B % c:
                c -= 1
            nc = B // c

            def split(t):
                return t.reshape((nc, c) + t.shape[1:])

            ctx_cs = jax.tree_util.tree_map(split, batch_ctx)
            lab_cs = split(labels)
            mask_cs = split(mask)

            def chunk_loss(p, ctx_c, lab_c, m_c):
                logits = chunk_logits_fn(p, frozen, ctx_c)
                logp = jax.nn.log_softmax(logits, axis=-1)
                nll = -jnp.take_along_axis(logp, lab_c[:, None], axis=-1)[:, 0]
                correct = jnp.sum((jnp.argmax(logits, -1) == lab_c) * m_c)
                return jnp.sum(nll * m_c), correct

            gfun = jax.value_and_grad(chunk_loss, has_aux=True)
            zero = jax.tree_util.tree_map(jnp.zeros_like, params)

            def body(carry, xs):
                acc_g, nll_sum, cor_sum = carry
                (nll, cor), g = gfun(params, *xs)
                acc_g = jax.tree_util.tree_map(jnp.add, acc_g, g)
                return (acc_g, nll_sum + nll, cor_sum + cor), None

            init = (zero, jnp.float32(0.0), jnp.float32(0.0))
            (grads, nll_sum, cor_sum), _ = jax.lax.scan(
                body, init, (ctx_cs, lab_cs, mask_cs)
            )
            denom = jnp.sum(mask)
            grads = jax.tree_util.tree_map(lambda g: g / denom, grads)
            params, opt_state = sgd_update(
                params, grads, opt_state, lr,
                momentum=self._momentum, weight_decay=self._weight_decay,
                nesterov=self._nesterov, dampening=self._dampening,
            )
            return params, opt_state, nll_sum / denom, cor_sum / denom

        return train_step

    def _build_microbatched_train_step(self, logits_fn, precompute=None):
        """Resolve ``cfg.TRAIN.MICROBATCH`` against the device topology and
        build the train step (``_make_train_step``), installing the
        per-device-local shard_map variant (``self._local_train_step``)
        when chunking must compose with a pure data-parallel mesh.

        One copy of the topology policy, shared by every trainer whose
        step is the standard CE algebra over a ``logits_fn`` (RPO, CoOp,
        LP — the large-batch layout cliff is a property of the scanned
        frozen vision tower they all run, not of any one method:
        BASELINE.md r4/r5 batch tables).  Policy:

        - single device: chunk when ``0 < mb < B`` divides evenly;
        - pure dp mesh: build the step with ``axis_name="data"`` and let
          ``_install_steps`` wrap it in shard_map — chunk slices are
          per-device rows, legal where the GSPMD-sharded step cannot
          slice the global batch dim (VERDICT r4 weak #3);
        - dp x tp: chunking stays (loudly) off — the tensor-parallel
          program shards the tower math itself, and a shard_map wrapper
          would need the tp axis plumbed through every sharding
          constraint.
        """
        mb = int(self.cfg.TRAIN.MICROBATCH)
        if mb > 0 and jax.device_count() > 1:
            from rpo_tpu.parallel.tp import resolve_tp

            if resolve_tp(self.cfg):
                print(
                    f"TRAIN.MICROBATCH={mb} ignored under "
                    "TRAIN.TENSOR_PARALLEL: chunking is built for the pure "
                    "data-parallel mesh (shard_map per-device rows); the "
                    "tp program shards the tower math itself"
                )
                mb = 0
            else:
                print(
                    f"TRAIN.MICROBATCH={mb}: per-device chunking via "
                    f"shard_map over the {jax.device_count()}-device data "
                    "mesh"
                )
                self._local_train_step = self._make_train_step(
                    logits_fn, microbatch=mb, precompute=precompute,
                    axis_name="data",
                )
        return self._make_train_step(
            logits_fn, microbatch=mb, precompute=precompute
        )

    def _install_steps(self, train_step, text_features, eval_step) -> None:
        from rpo_tpu.ops.attention import pallas_attention_scope

        # Fused Pallas attention on forward-only (eval) paths: 1.45x the
        # eval step on TPU v5e (paired-head rect kernel).  Training keeps
        # the XLA path — measured faster at the protocol's batch 4 even
        # after the kernel work.  Multi-device eval runs the step
        # per-device-local under shard_map (shard_eval_step_local), which
        # is what lets the Pallas kernels — no GSPMD partitioning rule —
        # ride a data-parallel mesh.  RPO_TPU_PALLAS_ATTENTION=1/0
        # overrides.
        raw_eval, raw_text = eval_step, text_features

        def eval_step(*args):
            with pallas_attention_scope(True):
                return raw_eval(*args)

        if raw_text is not None:
            def text_features(*args):
                with pallas_attention_scope(True):
                    return raw_text(*args)

        def make_multi(step):
            def multi_step(params, opt_state, frozen, imgs_g, labels_g, mask_g, lr):
                """lax.scan over a group of batches: N sequential SGD steps in
                ONE dispatch (identical math; amortized host round trips)."""

                def body(carry, batch):
                    params, opt_state = carry
                    imgs, labels, mask = batch
                    params, opt_state, loss, acc = step(
                        params, opt_state, frozen, imgs, labels, mask, lr
                    )
                    return (params, opt_state), (loss, acc)

                (params, opt_state), (losses, accs) = jax.lax.scan(
                    body, (params, opt_state), (imgs_g, labels_g, mask_g)
                )
                return params, opt_state, losses, accs

            return multi_step

        multi_step = make_multi(train_step)

        n_dev = jax.device_count()
        tp_ctx = None
        if n_dev > 1:
            from rpo_tpu.parallel.tp import setup_tp_mesh

            tp_ctx = setup_tp_mesh(self.cfg)
        if tp_ctx is not None:
            # dp x tp: batch over "data", the tower math itself split over
            # "model" (Megatron-style head/hidden sharding, parallel/tp.py).
            # The tensor_parallel_scope disables the Pallas eval path at
            # trace time (no GSPMD rule for custom calls) — the scope wrap
            # above is a no-op under it.
            from rpo_tpu.parallel.tp import (
                shard_eval_step_tp,
                shard_multi_step_tp,
                shard_train_step_tp,
            )

            self.mesh, _, _ = tp_ctx
            self._train_step = shard_train_step_tp(train_step, self.mesh)
            self._train_multi_step = shard_multi_step_tp(multi_step, self.mesh)
            self._eval_step = shard_eval_step_tp(eval_step, self.mesh)
        elif n_dev > 1:
            from rpo_tpu.parallel.dp import (
                make_mesh,
                shard_eval_step_local,
                shard_multi_step,
                shard_multi_step_spmd,
                shard_train_step,
                shard_train_step_spmd,
            )

            print(f"Multiple devices detected (n={n_dev}), data-parallel mesh over ICI")
            self.mesh = make_mesh()
            local_step = getattr(self, "_local_train_step", None)
            if local_step is not None:
                # shard_map train path: the method built a per-device-local
                # step (psum'd grads/metrics inside, _make_train_step
                # axis_name=...) so batch-dim chunking (TRAIN.MICROBATCH)
                # stays legal under the mesh.
                self._train_step = shard_train_step_spmd(local_step, self.mesh)
                self._train_multi_step = shard_multi_step_spmd(
                    make_multi(local_step), self.mesh
                )
            else:
                self._train_step = shard_train_step(train_step, self.mesh)
                self._train_multi_step = shard_multi_step(multi_step, self.mesh)
            self._eval_step = shard_eval_step_local(eval_step, self.mesh)
        else:
            self.mesh = None
            self._train_step = jax.jit(train_step, donate_argnums=(0, 1))
            self._train_multi_step = jax.jit(multi_step, donate_argnums=(0, 1))
            self._eval_step = jax.jit(eval_step)
        self._text_features = jax.jit(text_features) if text_features else None
        self._text_f_cache = None
        assert hasattr(self, "_frozen"), "build_method must set self._frozen"
        self._prewarm_threads = []

    def before_train(self) -> None:
        super().before_train()
        if bool(self.cfg.TRAIN.PREWARM_COMPILE):
            self._prewarm_compiles()

    def _prewarm_compiles(self) -> None:
        """AOT-compile the phase programs on background threads.

        The reference has no compile step; ours is the cold-start cost
        (XLA). Kicking the train-group program and the eval/text programs
        off concurrently — before the first batch is even decoded —
        overlaps compilation with the host-side data pipeline and with
        each other, so the first real dispatch of each phase hits a warm
        jit cache.  Dummy zero batches at the loader's exact padded
        shapes make the avals identical to the real calls.

        Started from before_train (not build time) so eval-only runs
        never compile the training program, and joined at interpreter
        exit — a daemon thread killed inside a native XLA compile can
        take the process down with it.
        """
        import atexit
        import threading

        cfg = self.cfg
        from rpo_tpu.parallel.dp import pad_multiple
        from rpo_tpu.parallel.tp import data_axis_size

        # prewarmed shapes must match the loader's padding, which divides
        # by the DATA axis (device_count/tp under TRAIN.TENSOR_PARALLEL)
        n_dev = data_axis_size(cfg)
        H, W = int(cfg.INPUT.SIZE[0]), int(cfg.INPUT.SIZE[1])
        # device-resize mode: batches arrive at the raw source size
        S = int(cfg.INPUT.DEVICE_RESIZE)
        train_b = pad_multiple(int(cfg.DATALOADER.TRAIN_X.BATCH_SIZE), n_dev)
        test_b = pad_multiple(int(cfg.DATALOADER.TEST.BATCH_SIZE), n_dev)
        group = max(1, int(cfg.TRAIN.STEPS_PER_DISPATCH))
        num_batches = len(self.dm.train_loader_x)
        frozen = self._frozen

        def dummy_params():
            return jax.tree_util.tree_map(jnp.zeros_like, self.params)

        def batch(b):
            if S:  # device-augment mode: train batches are source-size dicts
                imgs = {
                    "img": jnp.zeros((b, S, S, 3), jnp.uint8),
                    "box": jnp.tile(jnp.asarray([[0, 0, S, S]], jnp.int32), (b, 1)),
                    "flip": jnp.zeros((b,), jnp.int32),
                }
            else:
                imgs = jnp.zeros((b, H, W, 3), jnp.uint8)
            return (
                imgs,
                jnp.zeros((b,), jnp.int32),
                jnp.ones((b,), jnp.float32),
            )

        def warm_train():
            lr = jnp.float32(0.0)
            imgs, labels, mask = batch(train_b)
            warm_grouped, warm_single = prewarm_plan(group, num_batches)
            if warm_grouped:
                tile = lambda t: jax.tree_util.tree_map(
                    lambda x: jnp.broadcast_to(x[None], (group,) + x.shape), t
                )
                self._train_multi_step(
                    dummy_params(), sgd_init(dummy_params()), frozen,
                    tile(imgs), tile(labels), tile(mask), lr,
                )
            if warm_single:
                self._train_step(
                    dummy_params(), sgd_init(dummy_params()), frozen,
                    imgs, labels, mask, lr,
                )

        eH, eW = (S, S) if S else (H, W)

        def warm_eval():
            p = dummy_params()
            text_f = (
                self._text_features(p, frozen)
                if self._text_features is not None
                else None
            )
            self._eval_step(p, frozen, text_f, jnp.zeros((test_b, eH, eW, 3), jnp.uint8))

        def guarded(fn):
            def run():
                try:
                    fn()
                except Exception as exc:  # prewarm must never kill a run —
                    # the lazy jit path compiles on first use regardless
                    print(f"(!) compile prewarm {fn.__name__} failed: {exc}")

            return run

        for fn in (warm_train, warm_eval):
            t = threading.Thread(
                target=guarded(fn), daemon=True, name=f"prewarm-{fn.__name__}"
            )
            t.start()
            self._prewarm_threads.append(t)
        atexit.register(self._join_prewarm)

    def _join_prewarm(self) -> None:
        for t in self._prewarm_threads:
            t.join()
        self._prewarm_threads = []

    # -- lifecycle hooks ----------------------------------------------------
    @staticmethod
    def _train_images(batch):
        """The images argument of the jitted train step: a plain uint8
        array, or (device-augment mode) a {img, box, flip} pytree."""
        if "box" in batch:
            return {
                "img": jnp.asarray(batch["img"]),
                "box": jnp.asarray(batch["box"]),
                "flip": jnp.asarray(batch["flip"]),
            }
        return jnp.asarray(batch["img"])

    def forward_backward(self, batch) -> Dict[str, float]:
        self.params, self.opt_state, loss, acc = self._train_step(
            self.params,
            self.opt_state,
            self._frozen,
            self._train_images(batch),
            jnp.asarray(batch["label"]),
            jnp.asarray(batch["mask"]),
            jnp.float32(self.current_lr),
        )
        self._text_f_cache = None
        # device scalars, NOT floats: conversion would force a
        # device->host sync every step (MetricMeter defers it to print
        # time — the per-step round trip dominates on tunneled TPUs)
        summary = {"loss": loss}
        if self.log_acc:
            summary["acc"] = 100.0 * acc
        return summary

    def forward_backward_multi(self, batches) -> list:
        """Run a group of batches as ONE device dispatch (lax.scan of the
        train step) — numerically identical sequential SGD; one
        host->device transfer and one program launch per group."""
        imgs = jnp.asarray(np.stack([b["img"] for b in batches]))
        if "box" in batches[0]:
            imgs = {
                "img": imgs,
                "box": jnp.asarray(np.stack([b["box"] for b in batches])),
                "flip": jnp.asarray(np.stack([b["flip"] for b in batches])),
            }
        labels = jnp.asarray(np.stack([b["label"] for b in batches]))
        masks = jnp.asarray(np.stack([b["mask"] for b in batches]))
        self.params, self.opt_state, losses, accs = self._train_multi_step(
            self.params, self.opt_state, self._frozen,
            imgs, labels, masks, jnp.float32(self.current_lr),
        )
        self._text_f_cache = None
        out = []
        for i in range(len(batches)):
            summary = {"loss": losses[i]}
            if self.log_acc:
                summary["acc"] = 100.0 * accs[i]
            out.append(summary)
        return out

    def model_inference_async(self, images: np.ndarray):
        """Dispatch the jitted eval step and return the device array —
        test() defers the numpy conversion so the next batch's dispatch
        overlaps this one's D2H transfer."""
        if self._text_features is not None and self._text_f_cache is None:
            self._text_f_cache = self._text_features(self.params, self._frozen)
        return self._eval_step(
            self.params, self._frozen, self._text_f_cache, jnp.asarray(images)
        )

    def model_inference(self, images: np.ndarray) -> np.ndarray:
        return np.asarray(self.model_inference_async(images), dtype=np.float32)

    # -- checkpoint state ---------------------------------------------------
    def get_ckpt_state(self, name: str):
        return self.params

    def set_ckpt_state(self, name: str, state) -> None:
        """Install checkpointed trainable state, validated against the
        method's own pytree (Dassl's strict=False semantics: stale /
        unexpected keys are dropped with a warning, missing keys keep
        their current init, but a SHAPE mismatch fails here at the load
        site, not later inside a jitted retrace)."""
        state = dict(state)  # never mutate the caller's dict
        for stale in ("token_prefix", "token_suffix"):
            state.pop(stale, None)
        if getattr(self, "params", None) is None:
            # bare/unbuilt trainer (layout-remap harnesses): nothing to
            # validate against — install as-is
            self.params = jax.tree_util.tree_map(
                lambda a: jnp.asarray(a, jnp.float32), state
            )
            self.opt_state = sgd_init(self.params)
            self._text_f_cache = None
            return
        unexpected = sorted(k for k in state if k not in self.params)
        missing = sorted(k for k in self.params if k not in state)
        if unexpected:
            print(f"WARNING: ignoring unexpected checkpoint keys for "
                  f"{name}: {unexpected}")
        if missing:
            print(f"WARNING: checkpoint for {name} missing keys "
                  f"{missing}; keeping their current values")

        def _install(key, old, new):
            arr = jnp.asarray(new, jnp.float32)
            if hasattr(old, "shape") and tuple(arr.shape) != tuple(old.shape):
                raise ValueError(
                    f"checkpoint shape mismatch for {name}.{key}: got "
                    f"{tuple(arr.shape)}, expected {tuple(old.shape)} — "
                    "is this a checkpoint from a different method/backbone?"
                )
            return arr

        merged = {}
        for k, old in self.params.items():
            if k not in state:
                merged[k] = old
            elif isinstance(old, dict):  # nested pytree (e.g. meta_net)
                merged[k] = jax.tree_util.tree_map(
                    lambda o, n, _k=k: _install(_k, o, n), old, state[k]
                )
            else:
                merged[k] = _install(k, old, state[k])
        self.params = merged
        self.opt_state = sgd_init(self.params)
        self._text_f_cache = None

    def get_optim_state(self, name: str):
        return self.opt_state.momentum

    def set_optim_state(self, name: str, state) -> None:
        # checkpoints store only the momentum pytree; a resumed optimizer
        # is past its first update, so step=1 (all torch cares about is
        # step != 0 for the first-write dampening special case)
        self.opt_state = SGDState(
            momentum=jax.tree_util.tree_map(jnp.asarray, state),
            step=jnp.ones((), jnp.int32),
        )
