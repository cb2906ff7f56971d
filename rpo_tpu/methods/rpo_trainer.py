"""RPO trainer: plugs the functional RPO core into the engine lifecycle.

Reference: /root/reference/trainers/rpo.py:235-357 (class RPO(TrainerX)).
TPU-native training step: one jitted function computing grads w.r.t. the
prompt pytree only, with donated prompt/optimizer buffers; the per-epoch
LR enters as a scalar argument so the schedule causes no recompiles.
Precision: reference fp16 -> bf16 on TPU (PREC fp16/amp), fp32 kept as a
parity/debug mode.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from rpo_tpu.engine.registry import TRAINER_REGISTRY
from rpo_tpu.methods import rpo as core
from rpo_tpu.methods.base_trainer import CLIPMethodTrainer


@TRAINER_REGISTRY.register()
class RPO(CLIPMethodTrainer):
    prec_key = "RPO"
    model_name = "prompt_learner"
    log_acc = False  # reference RPO logs only loss (rpo.py:311)

    def build_method(self) -> None:
        cfg = self.cfg
        if not self.clip_cfg.is_vit:
            # the reference RPO hardcodes the ViT patch grid and d_v=768
            # (rpo.py:78,140-159); ResNet visual towers have no prompt
            # insertion points in its formulation
            raise ValueError(
                f"RPO requires a ViT backbone, got {cfg.MODEL.BACKBONE.NAME} "
                "(ModifiedResNet). Use CoOp/CoCoOp/LP/ZeroshotCLIP for RN "
                "backbones."
            )
        seed = max(int(cfg.SEED), 0)
        K = int(cfg.TRAINER.RPO.K)
        self.task = core.make_task(
            self.clip_cfg, self.dm.classnames, cfg.DATASET.PROMPT, K
        )
        self.params = core.init_prompts(
            jax.random.PRNGKey(seed), self.clip_params, self.clip_cfg, K
        )

        task = self.task
        normalize = self._normalize
        self._frozen = core.make_frozen(self.clip_params, task)

        # TRAIN.MICROBATCH chunks the vision tower inside one loss/grad
        # (large-batch layout fix, base_trainer._make_train_step); the text
        # tower is the shared per-step work, precomputed ONCE and threaded
        # through as ctx.  Gradient flows through it either way — it is
        # produced inside loss_fn from the live params.  Topology policy
        # (dp shard_map / tp off) lives in _build_microbatched_train_step.
        logits_fn = lambda p, frozen, images_u8, text_f: core.rpo_logits(
            p, frozen, task, normalize(images_u8),
            text_f=text_f, split_vision=True,
        )
        precompute = lambda p, frozen: core.encode_text_with_prompts(
            p, frozen, task
        )
        train_step = self._build_microbatched_train_step(
            logits_fn, precompute=precompute
        )

        def text_features(params, frozen):
            return core.encode_text_with_prompts(params, frozen, task)

        def eval_step(params, frozen, text_f, images_u8):
            imgs = normalize(images_u8)
            return core.rpo_logits(params, frozen, task, imgs, text_f=text_f)

        self._install_steps(train_step, text_features, eval_step)
