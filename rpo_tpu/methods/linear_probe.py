"""Linear Probe baseline — TPU-native.

Behavior contract: /root/reference/trainers/linear_prob.py.  One trainable
Linear (d_t -> d_t) initialized to identity+zero-bias, applied to
*unnormalized* frozen image features; logits against frozen, normalized
text features built from TRAINER.LP.PROMPT (raw classnames, no underscore
replacement — linear_prob.py:66).
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from rpo_tpu.engine.registry import TRAINER_REGISTRY
from rpo_tpu.methods.base_trainer import CLIPMethodTrainer
from rpo_tpu.models.clip import encode_image, encode_text
from rpo_tpu.tokenizer import eot_trim, tokenize

Params = Dict[str, jnp.ndarray]


def lp_logits(
    params: Params, clip_params, cfg, text_f: jax.Array, images: jax.Array
) -> jax.Array:
    """(B, n_cls): scale * lp(image_features) @ text_f.T
    (linear_prob.py:85-97; image features intentionally unnormalized)."""
    imf = encode_image(clip_params, cfg, images).astype(jnp.float32)
    imf = imf @ params["w"] + params["b"]
    scale = jnp.exp(clip_params["logit_scale"].astype(jnp.float32))
    return scale * imf @ text_f.T


@TRAINER_REGISTRY.register()
class LP(CLIPMethodTrainer):
    """Trainer: /root/reference/trainers/linear_prob.py:100-191."""

    prec_key = "LP"
    model_name = "lp_layer"

    def build_method(self) -> None:
        cfg = self.cfg
        # applied to image features: dimension embed_dim (the reference uses
        # ln_final width, identical for ViT-B/16 where both are 512)
        d = self.clip_cfg.embed_dim
        self.params = {
            "w": jnp.eye(d, dtype=jnp.float32),
            "b": jnp.zeros((d,), jnp.float32),
        }
        self.task = None

        prompts = [
            cfg.TRAINER.LP.PROMPT.format(cls_name=c) for c in self.dm.classnames
        ]
        tokens = jnp.asarray(eot_trim(tokenize(prompts)))
        ccfg = self.clip_cfg

        # one jitted call (clip params as an ARGUMENT, never a closure —
        # CLAUDE.md): eager per-op dispatch of the 12-layer tower costs
        # hundreds of host round-trips on a remote-attached TPU
        def _encode(clip_params, toks):
            tf = encode_text(clip_params, ccfg, toks).astype(jnp.float32)
            return tf / jnp.linalg.norm(tf, axis=-1, keepdims=True)

        text_f = jax.jit(_encode)(self.clip_params, tokens)
        normalize = self._normalize
        self._frozen = {"clip": self.clip_params, "text_f": text_f}

        # TRAIN.MICROBATCH: chunk the (grad-free) vision tower at large
        # batch — the layout cliff is a property of the scanned tower all
        # CE-step methods share (BASELINE.md r5 CoOp/LP batch table).
        train_step = self._build_microbatched_train_step(
            lambda p, frozen, images_u8: lp_logits(
                p, frozen["clip"], ccfg, frozen["text_f"], normalize(images_u8)
            )
        )

        def eval_step(params, frozen, _unused, images_u8):
            return lp_logits(
                params, frozen["clip"], ccfg, frozen["text_f"], normalize(images_u8)
            )

        self._install_steps(train_step, None, eval_step)

    def set_ckpt_state(self, name: str, state) -> None:
        """Accept reference torch checkpoints too: their lp_layer state is
        {'weight': (out, in), 'bias'} (torch nn.Linear, applied as
        x @ W.T + b) — remap/transpose to our {'w': (in, out), 'b'}
        (applied as x @ w + b)."""
        if "weight" in state:
            import numpy as np

            state = {
                "w": np.asarray(state["weight"]).T,
                "b": np.asarray(state["bias"]),
            }
        super().set_ckpt_state(name, state)
