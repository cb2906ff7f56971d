"""CoOp: Context Optimization (Zhou et al., 2022) — TPU-native.

Behavior contract: /root/reference/trainers/coop.py.  Learnable context
vectors (n_ctx, d) — or (n_cls, n_ctx, d) with CSC — are spliced into the
embedded class prompts at an ``end``/``middle``/``front`` class-token
position, then run through the frozen causal text tower; logits are
cosine similarities against frozen image features.

TPU-first reformulation: the reference's per-class Python assembly loops
(coop.py:136-177) become a host-precomputed (n_cls, 77) index plan
consumed by one vectorized gather/where — a single fused XLA op for any
position mode, any n_cls (ImageNet's 1000 classes would unroll 1000
concats in the reference's trace).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rpo_tpu.engine.registry import TRAINER_REGISTRY
from rpo_tpu.methods.base_trainer import CLIPMethodTrainer
from rpo_tpu.models.clip import CLIPConfig, causal_mask, encode_image
from rpo_tpu.models.clip.layers import layer_norm
from rpo_tpu.models.clip.model import text_transformer_run
from rpo_tpu.tokenizer import get_tokenizer, tokenize
from rpo_tpu.tokenizer.bpe import eot_len

Params = Dict[str, jnp.ndarray]


@dataclasses.dataclass
class CoOpTask:
    cfg: CLIPConfig
    n_cls: int
    n_ctx: int
    csc: bool
    text_tokens: np.ndarray  # (n_cls, 77)
    ctx_mask: np.ndarray  # (n_cls, 77) bool: position is a context slot
    ctx_idx: np.ndarray  # (n_cls, 77) int: which context vector
    emb_idx: np.ndarray  # (n_cls, 77) int: which frozen-embedding position
    # Static per-task sequence length actually run through the text tower:
    # max over classes of (EOT position + 1), rounded up to a sublane
    # multiple of 8.  Exact under the causal mask — a query position only
    # attends to keys <= itself and only EOT positions are gathered, so
    # positions past the longest EOT are dead compute (the reference runs
    # all 77 and discards them, coop.py:46-57).  Typical prompts are
    # 10-16 tokens, so this cuts the text tower ~5x.
    text_len: int = 77


def build_position_plan(
    n_ctx: int, name_lens: np.ndarray, position: str, context_length: int = 77
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Index plan replicating the end/middle/front assembly
    (coop.py:126-177).  Position p of the final sequence takes either
    context vector ctx_idx[p] or frozen embedding emb_idx[p]."""
    n_cls = len(name_lens)
    L = context_length
    ctx_mask = np.zeros((n_cls, L), dtype=bool)
    ctx_idx = np.zeros((n_cls, L), dtype=np.int32)
    emb_idx = np.tile(np.arange(L, dtype=np.int32), (n_cls, 1))

    for c, name_len in enumerate(np.asarray(name_lens)):
        name_len = int(name_len)
        if position == "end":
            # [SOS][ctx*n_ctx][name,.,EOT,pad...]
            ctx_mask[c, 1 : 1 + n_ctx] = True
            ctx_idx[c, 1 : 1 + n_ctx] = np.arange(n_ctx)
            # emb positions beyond ctx region keep identity mapping
        elif position == "middle":
            h = n_ctx // 2
            p = 1
            ctx_mask[c, p : p + h] = True
            ctx_idx[c, p : p + h] = np.arange(h)
            p += h
            emb_idx[c, p : p + name_len] = 1 + n_ctx + np.arange(name_len)
            p += name_len
            ctx_mask[c, p : p + (n_ctx - h)] = True
            ctx_idx[c, p : p + (n_ctx - h)] = h + np.arange(n_ctx - h)
            # remaining positions: identity (suffix rest is already at
            # 1+n_ctx+name_len onwards in the tokenized layout)
        elif position == "front":
            p = 1
            emb_idx[c, p : p + name_len] = 1 + n_ctx + np.arange(name_len)
            p += name_len
            ctx_mask[c, p : p + n_ctx] = True
            ctx_idx[c, p : p + n_ctx] = np.arange(n_ctx)
        else:
            raise ValueError(f"Unknown CLASS_TOKEN_POSITION {position!r}")
    return ctx_mask, ctx_idx, emb_idx


def make_task(
    cfg: CLIPConfig,
    classnames,
    n_ctx: int,
    csc: bool,
    position: str,
    prompt_prefix: str,
) -> CoOpTask:
    """Tokenize '<prefix> <name>.' per class and build the splice plan
    (coop.py:98-116)."""
    tok = get_tokenizer()
    classnames = [name.replace("_", " ") for name in classnames]
    name_lens = np.asarray([len(tok.encode(name)) for name in classnames])
    prompts = [f"{prompt_prefix} {name}." for name in classnames]
    tokens = tokenize(prompts)
    ctx_mask, ctx_idx, emb_idx = build_position_plan(
        n_ctx, name_lens, position, cfg.context_length
    )
    text_len = eot_len(tokens)
    return CoOpTask(
        cfg=cfg,
        n_cls=len(classnames),
        n_ctx=n_ctx,
        csc=csc,
        text_tokens=tokens,
        ctx_mask=ctx_mask,
        ctx_idx=ctx_idx,
        emb_idx=emb_idx,
        text_len=text_len,
    )


def init_ctx(
    key: jax.Array,
    clip_params,
    cfg: CLIPConfig,
    n_cls: int,
    n_ctx: int,
    csc: bool,
    ctx_init: str,
) -> Tuple[Params, str, int]:
    """Context init (coop.py:72-91): from words if ctx_init, else
    N(0, 0.02).  Returns (params, prompt_prefix, n_ctx)."""
    if ctx_init:
        ctx_init = ctx_init.replace("_", " ")
        n_ctx = len(ctx_init.split(" "))
        tokens = tokenize(ctx_init)
        emb = np.asarray(
            clip_params["text"]["token_embedding"][jnp.asarray(tokens[0, 1 : 1 + n_ctx])],
            np.float32,
        )
        # NOTE: the reference applies CSC only in the random-init branch
        # (coop.py:83-89) — with ctx_init the context stays a single
        # shared (n_ctx, d) tensor even when CSC=True
        ctx = jnp.asarray(emb)
        prompt_prefix = ctx_init
    else:
        shape = (n_cls, n_ctx, cfg.text_width) if csc else (n_ctx, cfg.text_width)
        ctx = jax.random.normal(key, shape, jnp.float32) * 0.02
        prompt_prefix = " ".join(["X"] * n_ctx)
    return {"ctx": ctx}, prompt_prefix, n_ctx


def assemble_prompt_embeddings(
    ctx: jax.Array, frozen_emb: jax.Array, task: CoOpTask
) -> jax.Array:
    """(n_cls, 77, d) embedded prompts with context spliced in.

    ctx: (n_ctx, d) or (n_cls, n_ctx, d); frozen_emb: token embeddings of
    the tokenized prompts (n_cls, L, d) — L may be the truncated
    task.text_len; the plan arrays are sliced to match."""
    dtype = frozen_emb.dtype
    L = frozen_emb.shape[1]
    if ctx.ndim == 2:
        ctx_full = jnp.broadcast_to(ctx[None], (task.n_cls,) + ctx.shape)
    else:
        ctx_full = ctx
    ctx_full = ctx_full.astype(dtype)
    g_ctx = jnp.take_along_axis(
        ctx_full, jnp.asarray(task.ctx_idx[:, :L])[:, :, None], axis=1
    )
    g_emb = jnp.take_along_axis(
        frozen_emb, jnp.asarray(task.emb_idx[:, :L])[:, :, None], axis=1
    )
    return jnp.where(jnp.asarray(task.ctx_mask[:, :L])[:, :, None], g_ctx, g_emb)


def text_encoder(
    clip_params, cfg: CLIPConfig, prompts_emb: jax.Array, tokens: jax.Array
) -> jax.Array:
    """Causal text tower on pre-embedded prompts, EOT gather
    (coop.py:46-57).  Runs at the (possibly truncated) sequence length of
    ``prompts_emb`` — exact, see CoOpTask.text_len."""
    t = clip_params["text"]
    L = prompts_emb.shape[1]
    x = prompts_emb + t["positional_embedding"][:L].astype(prompts_emb.dtype)
    bias = causal_mask(L)[None, None]
    x = text_transformer_run(t, cfg, x, bias)
    x = layer_norm(x, t["ln_final"])
    eot_pos = jnp.argmax(tokens, axis=-1)
    x = x[jnp.arange(x.shape[0]), eot_pos]
    return jnp.einsum(
        "cd,de->ce", x, t["text_projection"], preferred_element_type=jnp.float32
    ).astype(x.dtype)


def coop_text_features(params: Params, clip_params, task: CoOpTask) -> jax.Array:
    tokens = jnp.asarray(task.text_tokens[:, : task.text_len])
    frozen_emb = clip_params["text"]["token_embedding"][tokens]
    prompts_emb = assemble_prompt_embeddings(params["ctx"], frozen_emb, task)
    return text_encoder(clip_params, task.cfg, prompts_emb, tokens)


def coop_logits(
    params: Params,
    clip_params,
    task: CoOpTask,
    images: jax.Array,
    image_features: Optional[jax.Array] = None,
    text_f: Optional[jax.Array] = None,
) -> jax.Array:
    """(B, n_cls) cosine logits (coop.py:195-208)."""
    if image_features is None:
        image_features = encode_image(clip_params, task.cfg, images)
    if text_f is None:
        text_f = coop_text_features(params, clip_params, task)
    img = image_features.astype(jnp.float32)
    txt = text_f.astype(jnp.float32)
    img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
    txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
    scale = jnp.exp(clip_params["logit_scale"].astype(jnp.float32))
    return scale * img @ txt.T


@TRAINER_REGISTRY.register()
class CoOp(CLIPMethodTrainer):
    """Trainer: /root/reference/trainers/coop.py:211-291."""

    prec_key = "COOP"
    model_name = "prompt_learner"

    def build_method(self) -> None:
        cfg = self.cfg
        tcfg = cfg.TRAINER.COOP
        seed = max(int(cfg.SEED), 0)
        position = tcfg.CLASS_TOKEN_POSITION or "end"

        self.params, prompt_prefix, n_ctx = init_ctx(
            jax.random.PRNGKey(seed),
            self.clip_params,
            self.clip_cfg,
            len(self.dm.classnames),
            int(tcfg.N_CTX),
            bool(tcfg.CSC),
            tcfg.CTX_INIT,
        )
        print(f'Initial context: "{prompt_prefix}"')
        print(f"Number of context words (tokens): {n_ctx}")
        self.task = make_task(
            self.clip_cfg, self.dm.classnames, n_ctx, bool(tcfg.CSC), position, prompt_prefix
        )

        task = self.task
        normalize = self._normalize
        self._frozen = {"clip": self.clip_params}

        # TRAIN.MICROBATCH: the same large-batch layout cliff RPO hits
        # lives in the scanned frozen vision tower CoOp also runs (B=128
        # monolithic 2920 vs 3639 img/s chunked at mb=32 on v5e,
        # BASELINE.md r5).  The text tower is batch-independent shared
        # per-step work — precomputed once, gradient flows through it.
        train_step = self._build_microbatched_train_step(
            lambda p, frozen, images_u8, text_f: coop_logits(
                p, frozen["clip"], task, normalize(images_u8), text_f=text_f
            ),
            precompute=lambda p, frozen: coop_text_features(
                p, frozen["clip"], task
            ),
        )

        def text_features(params, frozen):
            return coop_text_features(params, frozen["clip"], task)

        def eval_step(params, frozen, text_f, images_u8):
            imgs = normalize(images_u8)
            return coop_logits(params, frozen["clip"], task, imgs, text_f=text_f)

        self._install_steps(train_step, text_features, eval_step)
