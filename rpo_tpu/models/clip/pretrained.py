"""Pretrained CLIP checkpoint resolution (offline-first).

The reference downloads from OpenAI URLs at run time
(/root/reference/clip/clip.py:29-68).  TPU pods run with no egress, so
resolution order here is:
  1. $CLIP_CHECKPOINT (explicit file),
  2. $CLIP_CACHE_DIR or ~/.cache/clip/<canonical-filename>,
  3. random initialization (with a loud warning) — structure-correct, for
     smoke tests and throughput benchmarking without weights.
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import jax

from .model import ARCHS, CLIPConfig, Params, cast_params, init_clip

_FILENAMES = {
    "ViT-B/16": "ViT-B-16.pt",
    "ViT-B/32": "ViT-B-32.pt",
    "RN50": "RN50.pt",
    "RN101": "RN101.pt",
    "RN50x4": "RN50x4.pt",
    "RN50x16": "RN50x16.pt",
}


def find_checkpoint(backbone_name: str) -> Optional[str]:
    explicit = os.environ.get("CLIP_CHECKPOINT")
    if explicit and os.path.exists(explicit):
        return explicit
    cache_dir = os.environ.get(
        "CLIP_CACHE_DIR", os.path.expanduser("~/.cache/clip")
    )
    fname = _FILENAMES.get(backbone_name)
    if fname:
        path = os.path.join(cache_dir, fname)
        if os.path.exists(path):
            return path
    return None


def load_backbone(
    backbone_name: str, dtype=None, seed: int = 0
) -> Tuple[Params, CLIPConfig]:
    """Resolve + load (or randomly init) a CLIP backbone as a jax pytree."""
    path = find_checkpoint(backbone_name)
    if path is not None:
        from .convert import load_clip

        print(f"Loading CLIP (backbone: {backbone_name}) from {path}")
        params, cfg = load_clip(path)
    else:
        if backbone_name not in ARCHS:
            raise KeyError(
                f"Unknown backbone {backbone_name!r} and no checkpoint found; "
                f"known: {sorted(ARCHS)}"
            )
        cfg = ARCHS[backbone_name]
        print(
            f"WARNING: no checkpoint found for {backbone_name} "
            "(set $CLIP_CHECKPOINT or $CLIP_CACHE_DIR); "
            "using RANDOM weights — accuracy will be chance level"
        )
        params = init_clip(jax.random.PRNGKey(seed), cfg)
    if dtype is not None:
        params = cast_params(params, dtype)
    return params, cfg
