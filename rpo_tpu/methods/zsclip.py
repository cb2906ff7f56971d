"""Zero-shot CLIP baselines — TPU-native.

Behavior contract: /root/reference/trainers/zsclip.py.  ZeroshotCLIP
caches normalized text features from per-dataset hand templates;
ZeroshotCLIP2 ensembles IMAGENET_TEMPLATES_SELECT (+ the dataset
template, except ImageNet): mean then renormalize.
Both are eval-only (used with --eval-only in scripts/zsclip).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from rpo_tpu.engine.registry import TRAINER_REGISTRY
from rpo_tpu.engine.trainer import TrainerBase
from rpo_tpu.methods.templates import CUSTOM_TEMPLATES, IMAGENET_TEMPLATES_SELECT
from rpo_tpu.models.clip import encode_image, encode_text
from rpo_tpu.models.clip.pretrained import load_backbone
from rpo_tpu.tokenizer import eot_trim, tokenize


@TRAINER_REGISTRY.register()
class ZeroshotCLIP(TrainerBase):
    """zsclip.py:32-60."""

    def _text_features_for(self, templates) -> jnp.ndarray:
        """Normalized ensemble text features (zsclip.py:37-47, 79-92).

        The reference encodes template-by-template in a python loop; here
        all templates go through ONE jitted call — a lax.map over
        templates (each step encodes one template's n_cls prompts, so
        peak memory is one template's tower) — avoiding one host->device
        dispatch round per template over the slow tunnel.  Tokens are
        eot-trimmed to the global longest prompt (exact; ~5x fewer text
        rows than the reference's always-77, clip/model.py:354)."""
        all_tokens = eot_trim(
            np.stack([
                tokenize([
                    temp.format(c.replace("_", " "))
                    for c in self.dm.classnames
                ])
                for temp in templates
            ]).reshape(len(templates) * len(self.dm.classnames), -1)
        ).reshape(len(templates), len(self.dm.classnames), -1)

        ccfg = self.clip_cfg

        def ensemble(clip_params, tokens):
            def one_template(toks):
                tf = encode_text(clip_params, ccfg, toks).astype(jnp.float32)
                return tf / jnp.linalg.norm(tf, axis=-1, keepdims=True)

            feats = jnp.mean(jax.lax.map(one_template, tokens), axis=0)
            return feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)

        return jax.jit(ensemble)(self.clip_params, jnp.asarray(all_tokens))

    def _select_templates(self):
        temp = CUSTOM_TEMPLATES[self.cfg.DATASET.NAME]
        print(f"Prompts template: {temp!r}")
        return [temp]

    def build_model(self) -> None:
        cfg = self.cfg
        print(f"Loading CLIP (backbone: {cfg.MODEL.BACKBONE.NAME})")
        self.clip_params, self.clip_cfg = load_backbone(
            cfg.MODEL.BACKBONE.NAME, dtype=jnp.bfloat16, seed=max(int(cfg.SEED), 0)
        )
        from rpo_tpu.methods.base_trainer import make_image_prep

        self._normalize = make_image_prep(cfg, jnp.bfloat16)
        self.text_features = self._text_features_for(self._select_templates())

        ccfg, normalize = self.clip_cfg, self._normalize

        def eval_step(_params, frozen, text_f, images_u8):
            # fused Pallas attention on the forward-only image tower, as
            # in CLIPMethodTrainer._install_steps (thread-local trace flag)
            from rpo_tpu.ops.attention import pallas_attention_scope

            with pallas_attention_scope(True):
                imf = encode_image(
                    frozen["clip"], ccfg, normalize(images_u8)
                ).astype(jnp.float32)
            imf = imf / jnp.linalg.norm(imf, axis=-1, keepdims=True)
            scale = jnp.exp(frozen["clip"]["logit_scale"].astype(jnp.float32))
            return scale * imf @ text_f.T

        # Same mesh routing as CLIPMethodTrainer._install_steps: on a
        # multi-device host, eval runs per-device-local under shard_map
        # (the data manager already pads test batches to a device
        # multiple), so zero-shot sweeps scale like every other method.
        self._frozen = {"clip": self.clip_params}
        tp_ctx = None
        if jax.device_count() > 1:
            from rpo_tpu.parallel.tp import setup_tp_mesh

            tp_ctx = setup_tp_mesh(self.cfg)
        if tp_ctx is not None:
            # eval-only is the latency-bound regime tensor parallelism
            # exists for: split the tower math over the model axis
            # (parallel/tp.py; the scope forces the XLA attention path)
            from rpo_tpu.parallel.tp import shard_eval_step_tp

            self.mesh, _, _ = tp_ctx
            self._eval_step = shard_eval_step_tp(eval_step, self.mesh)
        elif jax.device_count() > 1:
            from rpo_tpu.parallel.dp import make_mesh, shard_eval_step_local

            print(
                f"Multiple devices detected (n={jax.device_count()}), "
                "data-parallel mesh over ICI"
            )
            self.mesh = make_mesh()
            self._eval_step = shard_eval_step_local(eval_step, self.mesh)
        else:
            self.mesh = None
            self._eval_step = jax.jit(eval_step)

    def forward_backward(self, batch):
        raise RuntimeError("ZeroshotCLIP is evaluation-only (use --eval-only)")

    def model_inference_async(self, images: np.ndarray):
        return self._eval_step(
            {}, self._frozen, self.text_features, jnp.asarray(images)
        )

    def model_inference(self, images: np.ndarray) -> np.ndarray:
        return np.asarray(self.model_inference_async(images), np.float32)

    # eval-only: nothing to checkpoint
    def save_model(self, epoch, is_best=False):
        pass

    def load_model(self, directory, epoch=None):
        if not directory:
            print("Note that load_model() is skipped as no pretrained model is given")


@TRAINER_REGISTRY.register()
class ZeroshotCLIP2(ZeroshotCLIP):
    """Prompt ensembling (zsclip.py:63-99)."""

    templates = IMAGENET_TEMPLATES_SELECT

    def _select_templates(self):
        templates = list(self.templates)
        if self.cfg.DATASET.NAME != "ImageNet":
            templates.append(CUSTOM_TEMPLATES[self.cfg.DATASET.NAME])
        print(f"Prompt ensembling (n={len(templates)})")
        return templates
