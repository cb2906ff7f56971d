"""CoCoOp: Conditional Context Optimization — TPU-native.

Behavior contract: /root/reference/trainers/cocoop.py.  A meta-net
(Linear d_e -> d_e/16 -> ReLU -> Linear -> d_t) maps each image's CLIP
feature to a bias added to the shared context vectors; the text tower
then runs once per (image, class).

TPU-first reformulation: the reference loops over images in Python
(cocoop.py:153-161,183-189 — hence its batch-size-1 configs).  Here the
per-image text encode is ``vmap``-ed over the batch: one fused XLA
program of shape (B, n_cls, 77) — removing the batch-1 constraint.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from rpo_tpu.engine.registry import TRAINER_REGISTRY
from rpo_tpu.methods import coop as coop_core
from rpo_tpu.methods.base_trainer import CLIPMethodTrainer
from rpo_tpu.models.clip import encode_image

Params = Dict[str, jnp.ndarray]


def init_meta_net(key: jax.Array, vis_dim: int, ctx_dim: int) -> Params:
    """Two-layer MLP with torch nn.Linear default init
    (U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for weights and biases)."""
    hidden = vis_dim // 16
    k1, k2, k3, k4 = jax.random.split(key, 4)
    b1 = 1.0 / np.sqrt(vis_dim)
    b2 = 1.0 / np.sqrt(hidden)
    return {
        "w1": jax.random.uniform(k1, (vis_dim, hidden), jnp.float32, -b1, b1),
        "b1": jax.random.uniform(k2, (hidden,), jnp.float32, -b1, b1),
        "w2": jax.random.uniform(k3, (hidden, ctx_dim), jnp.float32, -b2, b2),
        "b2": jax.random.uniform(k4, (ctx_dim,), jnp.float32, -b2, b2),
    }


def meta_net_apply(p: Params, x: jax.Array) -> jax.Array:
    h = jax.nn.relu(x @ p["w1"].astype(x.dtype) + p["b1"].astype(x.dtype))
    return h @ p["w2"].astype(x.dtype) + p["b2"].astype(x.dtype)


def cocoop_logits(
    params: Params,
    clip_params,
    task: coop_core.CoOpTask,
    images: jax.Array,
    chunk: int = 0,
    remat_per_image: bool = False,
    image_features: Optional[jax.Array] = None,
    unroll_chunks: bool = False,
) -> jax.Array:
    """(B, n_cls) logits with image-conditioned contexts
    (cocoop.py:144-189), vmapped over the batch.

    ``chunk`` > 0 processes the batch in image-chunks — required at eval
    time for large class counts (ImageNet: B x n_cls x 77 text-tower
    activations would not fit memory vmapped over B=100; SURVEY.md §7
    hard part #5).  ``unroll_chunks`` picks the chunk mechanism:
    lax.map when False (one traced body — small programs, the eval
    default), an UNROLLED python loop when True (the TRAIN default at
    large batch: a scan carry re-pins the tower activations to the
    layout XLA picked for the carry, the same regression
    TRAIN.MICROBATCH fixes for RPO at B=128 — see base_trainer.py
    _make_train_step and BASELINE.md r4/r5 batch tables).

    ``remat_per_image`` wraps the per-image text encoder in
    jax.checkpoint: the backward pass recomputes each image's n_cls x 77
    text-tower activations instead of stashing all B of them — the
    standard TPU FLOPs-for-HBM trade that lets TRAINING batches scale
    past the memory wall (B=32 at n_cls=51 OOMs a v5e chip without it)."""
    cfg = task.cfg
    if image_features is None:
        image_features = encode_image(clip_params, cfg, images).astype(jnp.float32)
    imf = image_features / jnp.linalg.norm(image_features, axis=-1, keepdims=True)

    bias = meta_net_apply(params["meta_net"], imf)  # (B, ctx_dim)
    ctx = params["ctx"].astype(jnp.float32)  # (n_ctx, ctx_dim)
    ctx_shifted = ctx[None] + bias[:, None, :]  # (B, n_ctx, ctx_dim)

    # Truncated to task.text_len (exact under the causal mask — see
    # CoOpTask.text_len); CoCoOp is text-FLOP-bound (n_cls text encodes
    # per image), so this is the dominant-term reduction.
    tokens = jnp.asarray(task.text_tokens[:, : task.text_len])
    frozen_emb = clip_params["text"]["token_embedding"][tokens]
    scale = jnp.exp(clip_params["logit_scale"].astype(jnp.float32))

    def per_image(ctx_i, imf_i):
        prompts_emb = coop_core.assemble_prompt_embeddings(ctx_i, frozen_emb, task)
        text_f = coop_core.text_encoder(clip_params, cfg, prompts_emb, tokens)
        text_f = text_f.astype(jnp.float32)
        text_f = text_f / jnp.linalg.norm(text_f, axis=-1, keepdims=True)
        return scale * text_f @ imf_i  # (n_cls,)

    if remat_per_image:
        per_image = jax.checkpoint(per_image)

    from rpo_tpu.ops.fused_text_layer import use_fused_text

    if use_fused_text() and not remat_per_image:
        # Fused-kernel eval path: FLATTEN the (images, n_cls) towers into
        # one (c * n_cls, L, d) batch so the whole-layer Pallas kernel
        # (ops/fused_text_layer.py) sees a single row dimension — vmap
        # over images would push the batch through the pallas_call
        # batching rule with per-image row padding instead.  Identical
        # math to per_image: text_encoder is batch-agnostic over its
        # leading dim.  Forward-only (the scope is only enabled on eval
        # paths; the train paths never trace it).
        n_cls = tokens.shape[0]

        def per_image_batch(ctx_cc, imf_cc):  # (c, n_ctx, d_t), (c, d_e)
            prompts = jax.vmap(
                lambda ci: coop_core.assemble_prompt_embeddings(
                    ci, frozen_emb, task
                )
            )(ctx_cc)
            c = prompts.shape[0]
            flat = prompts.reshape((c * n_cls,) + prompts.shape[2:])
            toks = jnp.broadcast_to(
                tokens[None], (c,) + tokens.shape
            ).reshape(-1, tokens.shape[1])
            tf = coop_core.text_encoder(clip_params, cfg, flat, toks)
            tf = tf.astype(jnp.float32)
            tf = tf / jnp.linalg.norm(tf, axis=-1, keepdims=True)
            return scale * jnp.einsum(
                "cnd,cd->cn", tf.reshape(c, n_cls, -1), imf_cc
            )
    else:
        per_image_batch = None

    B = imf.shape[0]
    if chunk <= 0 or chunk >= B:
        if per_image_batch is not None:
            return per_image_batch(ctx_shifted, imf)
        return jax.vmap(per_image)(ctx_shifted, imf)
    assert B % chunk == 0, f"batch {B} not divisible by chunk {chunk}"
    if unroll_chunks:
        parts = [
            jax.vmap(per_image)(
                ctx_shifted[i : i + chunk], imf[i : i + chunk]
            )
            for i in range(0, B, chunk)
        ]
        return jnp.concatenate(parts, axis=0)
    ctx_c = ctx_shifted.reshape(B // chunk, chunk, *ctx_shifted.shape[1:])
    imf_c = imf.reshape(B // chunk, chunk, imf.shape[-1])
    chunk_fn = (
        per_image_batch
        if per_image_batch is not None
        else lambda a, b: jax.vmap(per_image)(a, b)
    )
    out = jax.lax.map(lambda args: chunk_fn(args[0], args[1]), (ctx_c, imf_c))
    return out.reshape(B, -1)


@TRAINER_REGISTRY.register()
class CoCoOp(CLIPMethodTrainer):
    """Trainer: /root/reference/trainers/cocoop.py:197-314."""

    prec_key = "COCOOP"
    model_name = "prompt_learner"

    def build_method(self) -> None:
        cfg = self.cfg
        tcfg = cfg.TRAINER.COCOOP
        seed = max(int(cfg.SEED), 0)
        k_ctx, k_meta = jax.random.split(jax.random.PRNGKey(seed))

        ctx_params, prompt_prefix, n_ctx = coop_core.init_ctx(
            k_ctx, self.clip_params, self.clip_cfg,
            len(self.dm.classnames), int(tcfg.N_CTX), False, tcfg.CTX_INIT,
        )
        print(f'Initial context: "{prompt_prefix}"')
        print(f"Number of context words (tokens): {n_ctx}")
        self.params = {
            "ctx": ctx_params["ctx"],
            "meta_net": init_meta_net(
                k_meta, self.clip_cfg.embed_dim, self.clip_cfg.text_width
            ),
        }
        self.task = coop_core.make_task(
            self.clip_cfg, self.dm.classnames, n_ctx, False, "end", prompt_prefix
        )

        task = self.task
        normalize = self._normalize
        self._frozen = {"clip": self.clip_params}

        def train_logits(p, frozen, images_u8):
            # Small batches (the protocol's batch 1/4/8): one plain vmap.
            return cocoop_logits(p, frozen["clip"], task, normalize(images_u8))

        mono_step = self._make_train_step(train_logits)

        # Large batches: exact gradient accumulation over image-chunks
        # (see _make_grad_accum_train_step).  The vision tower (frozen, no
        # grad) runs ONCE for the full batch as the precompute; the scan
        # accumulates per-chunk text-tower grads with a tiny carry.
        # Measured on v5e (n_cls=51): B=32 421 / B=64 433 / B=128 429
        # img/s vs 326 for the r3 remat+lax.map policy and 427 at B=8 —
        # large batch no longer loses (VERDICT r4 do-this #3), and the r3
        # "B>=16 OOMs plain" wall (pre-text-truncation) no longer binds:
        # memory peaks at ONE chunk's text-tower residuals, zero remat
        # recompute.
        def precompute_imf(frozen, images_u8):
            return encode_image(
                frozen["clip"], task.cfg, normalize(images_u8)
            ).astype(jnp.float32)

        def chunk_logits(p, frozen, imf_chunk):
            return cocoop_logits(
                p, frozen["clip"], task, None, image_features=imf_chunk
            )

        gacc_step = self._make_grad_accum_train_step(
            precompute_imf, chunk_logits, chunk_size=8
        )

        def train_step(params, opt_state, frozen, images_u8, labels, mask, lr):
            # trace-time dispatch on the (static) batch size
            step = gacc_step if images_u8.shape[0] >= 16 else mono_step
            return step(params, opt_state, frozen, images_u8, labels, mask, lr)

        def eval_step(params, frozen, _unused_text_f, images_u8):
            # chunked over images: bounds text-tower memory at large n_cls.
            # Scope split: the vision tower keeps the (outer) Pallas eval
            # scope, but the per-image text towers run at L = text_len
            # (~16 post-truncation) — rows far below the 128-lane tile,
            # where the paired-head kernel pads 8x dead lanes.  XLA wins
            # there: 983 vs 655 img/s on v5e (B=100, n_cls=51).
            from rpo_tpu.ops.attention import pallas_attention_scope

            B = images_u8.shape[0]
            # chunk target 10 (was 8 pre-fused-kernel): the fused text
            # tower amortizes its per-chunk launch over more rows —
            # measured 1271/1362/1391 img/s at chunk 4/5/10 on v5e
            # (B=100); the XLA fallback path is flat across 4-20
            # (BASELINE.md r3 sweep), so the larger target costs nothing
            # when the kernel is disabled.
            chunk = max(1, min(10, B))
            while B % chunk:
                chunk -= 1
            imf = encode_image(
                frozen["clip"], task.cfg, normalize(images_u8)
            ).astype(jnp.float32)
            # r5: the per-image text towers take the fused WHOLE-LAYER
            # Pallas kernel instead (LN1->QKV->attn->out->LN2->MLP in one
            # program per row-block, ops/fused_text_layer.py): the XLA
            # text path is per-op-latency bound at L~16, and the fused
            # tower measures 1.45x it at the (chunk*n_cls, L, d) shape.
            from rpo_tpu.ops.fused_text_layer import fused_text_scope

            with pallas_attention_scope(False), fused_text_scope(True):
                return cocoop_logits(
                    params, frozen["clip"], task, None,
                    chunk=chunk, image_features=imf,
                )

        self._install_steps(train_step, None, eval_step)

    def set_ckpt_state(self, name: str, state) -> None:
        """Accept reference torch checkpoints too: their prompt_learner
        state is flat ('ctx', 'meta_net.linear1.weight', ...) with torch's
        (out, in) Linear layout — remap to our nested pytree."""
        if "meta_net.linear1.weight" in state:
            state = {
                "ctx": state["ctx"],
                "meta_net": {
                    "w1": np.asarray(state["meta_net.linear1.weight"]).T,
                    "b1": state["meta_net.linear1.bias"],
                    "w2": np.asarray(state["meta_net.linear2.weight"]).T,
                    "b2": state["meta_net.linear2.bias"],
                },
            }
        super().set_ckpt_state(name, state)
