"""User-level CLIP API — the vendored package's public surface, TPU-native.

The reference ships a vendored ``clip`` package whose user-facing API is
``clip.available_models()`` / ``clip.load(name)`` / ``clip.tokenize(texts)``
(/root/reference/clip/clip.py:24-221).  The framework's trainers bypass
``load`` (they build from a state dict, like the reference's
``load_clip_to_cpu``, /root/reference/trainers/rpo.py:24-39), but a user
migrating scripts written against the vendored package expects the same
three calls.  This module provides them over the jax stack:

    from rpo_tpu import clip
    model, preprocess = clip.load("ViT-B/16")
    tokens = clip.tokenize(["a photo of a cat", "a photo of a dog"])
    image = preprocess(PIL.Image.open("cat.png"))[None]   # (1, H, W, 3)
    logits_per_image, logits_per_text = model(image, tokens)

Differences from the torch original, by design:

- ``load`` has no ``jit=`` flag: everything is XLA-compiled; the
  TorchScript-archive patching half of the reference ``load``
  (clip/clip.py:100-176) has no analog because there is no TorchScript.
- arrays are jax/numpy; images are **HWC** float (the TPU-native layout
  used everywhere in this framework), not CHW tensors.
- weight resolution is offline-first (``$CLIP_CHECKPOINT`` /
  ``~/.cache/clip`` / opt-in download) via
  :func:`rpo_tpu.models.clip.pretrained.load_backbone`; pass
  ``require_weights=True`` to fail rather than fall back to random init.
"""
from __future__ import annotations

from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rpo_tpu.models.clip import model as _m
from rpo_tpu.models.clip.pretrained import _URLS, find_checkpoint, load_backbone
from rpo_tpu.tokenizer.bpe import tokenize  # re-export; clip.py:185-221 contract

__all__ = ["available_models", "load", "tokenize", "CLIPModel"]

# eval-preprocessing constants, clip/clip.py:75-76 (also every trainer yaml)
PIXEL_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
PIXEL_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def available_models() -> List[str]:
    """Names accepted by :func:`load` (reference clip/clip.py:24-26)."""
    return list(_URLS)


class CLIPModel:
    """A loaded CLIP backbone with the reference nn.Module's call surface.

    Thin, functional-core wrapper: the weights live in ``self.params`` (a
    pytree, always passed as a jit ARGUMENT — never closed over), the
    architecture in ``self.cfg``.  Methods mirror the reference CLIP
    (/root/reference/clip/model.py:344-376): ``encode_image``,
    ``encode_text``, ``__call__`` -> (logits_per_image, logits_per_text).
    """

    def __init__(self, params: _m.Params, cfg: _m.CLIPConfig):
        self.params = params
        self.cfg = cfg
        # cfg is a tiny frozen dataclass: closing over it is free and
        # keeps the params pytree as the only traced argument.
        self._encode_image = jax.jit(lambda p, x: _m.encode_image(p, cfg, x))
        self._encode_text = jax.jit(lambda p, t: _m.encode_text(p, cfg, t))
        self._forward = jax.jit(lambda p, x, t: _m.clip_forward(p, cfg, x, t))

    # -- reference surface -------------------------------------------------
    @property
    def visual_input_resolution(self) -> int:
        return self.cfg.image_resolution

    @property
    def logit_scale(self) -> jax.Array:
        return self.params["logit_scale"]

    def encode_image(self, images) -> jax.Array:
        """(B, H, W, 3) normalized float -> (B, embed_dim) features."""
        images = jnp.asarray(images)
        if images.ndim == 3:
            images = images[None]
        return self._encode_image(self.params, images)

    def encode_text(self, tokens) -> jax.Array:
        """(B, L) int token ids (from :func:`tokenize`) -> (B, embed_dim)."""
        return self._encode_text(self.params, jnp.asarray(tokens))

    def __call__(self, images, tokens) -> Tuple[jax.Array, jax.Array]:
        images = jnp.asarray(images)
        if images.ndim == 3:
            images = images[None]
        return self._forward(self.params, images, jnp.asarray(tokens))


def _make_preprocess(n_px: int) -> Callable:
    """The reference ``_transform`` (clip/clip.py:71-78): resize shorter
    side to n_px (bicubic) -> center crop -> RGB -> scale to [0,1] ->
    normalize.  Takes a PIL image or a path; returns (n_px, n_px, 3)
    float32 HWC."""
    from rpo_tpu.data.transforms import center_crop, load_image, resize_shorter

    def preprocess(img) -> np.ndarray:
        if isinstance(img, str):
            img = load_image(img)
        img = resize_shorter(img, n_px, "bicubic")
        img = center_crop(img, n_px)
        if img.mode != "RGB":
            img = img.convert("RGB")
        x = np.asarray(img, np.float32) / 255.0
        return (x - PIXEL_MEAN) / PIXEL_STD

    return preprocess


def load(
    name: str,
    *,
    dtype=None,
    require_weights: bool = False,
    seed: int = 0,
) -> Tuple[CLIPModel, Callable]:
    """Load a CLIP backbone by name -> (model, preprocess).

    Mirrors the reference ``clip.load`` contract (clip/clip.py:86-99):
    ``name`` is one of :func:`available_models` (or, like the reference,
    a path/explicit checkpoint via ``$CLIP_CHECKPOINT``).  ``dtype``
    optionally casts the weights (e.g. ``jnp.bfloat16`` — the TPU analog
    of the reference's fp16 default on CUDA).  With no checkpoint
    available the backbone is randomly initialized with a loud warning
    unless ``require_weights`` is set.

    Keyword-only after ``name``: the reference's second positional arg is
    ``device`` (meaningless under XLA) — a mechanically ported
    ``clip.load("ViT-B/16", device)`` must fail loudly at the call site,
    not bind the device to ``dtype`` and crash deep in the weight cast.
    """
    path = find_checkpoint(name)  # once: cache-dir hits SHA-hash the file
    if require_weights and path is None:
        raise FileNotFoundError(
            f"No checkpoint for {name!r}: set $CLIP_CHECKPOINT, place it in "
            "$CLIP_CACHE_DIR/~/.cache/clip, or enable RPO_TPU_ALLOW_DOWNLOAD=1"
        )
    params, cfg = load_backbone(name, dtype=dtype, seed=seed, path=path)
    return CLIPModel(params, cfg), _make_preprocess(cfg.image_resolution)
