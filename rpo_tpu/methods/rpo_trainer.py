"""RPO trainer: plugs the functional RPO core into the engine lifecycle.

Reference: /root/reference/trainers/rpo.py:235-357 (class RPO(TrainerX)).
TPU-native training step: one jitted function computing grads w.r.t. the
prompt pytree only, with donated prompt/optimizer buffers; the per-epoch
LR enters as a scalar argument so the schedule causes no recompiles.
Precision: reference fp16 -> bf16 on TPU (PREC fp16/amp), fp32 kept as a
parity/debug mode.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from rpo_tpu.data.transforms import device_normalize_fn
from rpo_tpu.engine.optim import sgd_init, sgd_update
from rpo_tpu.engine.registry import TRAINER_REGISTRY
from rpo_tpu.engine.trainer import TrainerBase
from rpo_tpu.methods import rpo as core
from rpo_tpu.models.clip.pretrained import load_backbone


def _prec_dtype(prec: str):
    return {"fp16": jnp.bfloat16, "amp": jnp.bfloat16, "fp32": jnp.float32}[prec]


@TRAINER_REGISTRY.register()
class RPO(TrainerBase):
    def check_cfg(self, cfg) -> None:
        assert cfg.TRAINER.RPO.PREC in ["fp16", "fp32", "amp"]

    def build_model(self) -> None:
        cfg = self.cfg
        classnames = self.dm.classnames
        prec = cfg.TRAINER.RPO.PREC
        seed = max(int(cfg.SEED), 0)

        print(f"Loading CLIP (backbone: {cfg.MODEL.BACKBONE.NAME})")
        self.clip_params, self.clip_cfg = load_backbone(
            cfg.MODEL.BACKBONE.NAME, dtype=_prec_dtype(prec), seed=seed
        )
        assert int(cfg.INPUT.SIZE[0]) == self.clip_cfg.image_resolution, (
            f"cfg_imsize ({cfg.INPUT.SIZE[0]}) must equal to "
            f"clip_imsize ({self.clip_cfg.image_resolution})"
        )

        print("Building custom CLIP")
        K = int(cfg.TRAINER.RPO.K)
        self.task = core.make_task(self.clip_cfg, classnames, cfg.DATASET.PROMPT, K)
        self.prompts = core.init_prompts(
            jax.random.PRNGKey(seed), self.clip_params, self.clip_cfg, K
        )
        print("Parameters to be updated: {'prompt_learner.text_prompt', 'prompt_learner.img_prompt'}")
        self.opt_state = sgd_init(self.prompts)
        self.register_model("prompt_learner")

        normalize = device_normalize_fn(cfg.INPUT.PIXEL_MEAN, cfg.INPUT.PIXEL_STD)
        momentum = float(cfg.OPTIM.MOMENTUM)
        weight_decay = float(cfg.OPTIM.WEIGHT_DECAY)
        nesterov = bool(cfg.OPTIM.SGD_NESTEROV)
        frozen, task = self.clip_params, self.task
        text_x = core.precompute_text_x(frozen, task)

        def train_step(prompts, opt_state, images_u8, labels, mask, lr):
            def loss_fn(p):
                imgs = normalize(images_u8)
                logits = core.rpo_logits(p, frozen, task, imgs, text_x=text_x)
                logp = jax.nn.log_softmax(logits, axis=-1)
                nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
                return jnp.sum(nll * mask) / jnp.sum(mask)

            loss, grads = jax.value_and_grad(loss_fn)(prompts)
            prompts, opt_state = sgd_update(
                prompts, grads, opt_state, lr,
                momentum=momentum, weight_decay=weight_decay, nesterov=nesterov,
            )
            return prompts, opt_state, loss

        def text_features(prompts):
            return core.encode_text_with_prompts(prompts, frozen, task, text_x)

        def eval_step(prompts, text_f, images_u8):
            imgs = normalize(images_u8)
            return core.rpo_logits(prompts, frozen, task, imgs, text_f=text_f)

        # Data-parallel over all visible devices (the TPU replacement for
        # the reference's DataParallel-if-multi-gpu branch, rpo.py:282-285).
        n_dev = jax.device_count()
        if n_dev > 1:
            from rpo_tpu.parallel.dp import make_mesh, shard_eval_step, shard_train_step

            print(f"Multiple devices detected (n={n_dev}), data-parallel mesh over ICI")
            self.mesh = make_mesh()
            self._train_step = shard_train_step(train_step, self.mesh)
            self._eval_step = shard_eval_step(eval_step, self.mesh)
        else:
            self.mesh = None
            self._train_step = jax.jit(train_step, donate_argnums=(0, 1))
            self._eval_step = jax.jit(eval_step)
        self._text_features = jax.jit(text_features)
        self._text_f_cache = None

    def forward_backward(self, batch) -> Dict[str, float]:
        self.prompts, self.opt_state, loss = self._train_step(
            self.prompts,
            self.opt_state,
            jnp.asarray(batch["img"]),
            jnp.asarray(batch["label"]),
            jnp.asarray(batch["mask"]),
            jnp.float32(self.current_lr),
        )
        self._text_f_cache = None
        return {"loss": float(loss)}

    def model_inference(self, images: np.ndarray) -> np.ndarray:
        if self._text_f_cache is None:
            self._text_f_cache = self._text_features(self.prompts)
        return np.asarray(
            self._eval_step(self.prompts, self._text_f_cache, jnp.asarray(images)),
            dtype=np.float32,
        )

    # -- checkpoint state ---------------------------------------------------
    def get_ckpt_state(self, name: str):
        return self.prompts

    def set_ckpt_state(self, name: str, state) -> None:
        self.prompts = {
            "text_prompt": jnp.asarray(state["text_prompt"], jnp.float32),
            "img_prompt": jnp.asarray(state["img_prompt"], jnp.float32),
        }
        self._text_f_cache = None

    def get_optim_state(self, name: str):
        return self.opt_state.momentum

    def set_optim_state(self, name: str, state) -> None:
        from rpo_tpu.engine.optim import SGDState

        self.opt_state = SGDState(
            momentum=jax.tree_util.tree_map(jnp.asarray, state)
        )
