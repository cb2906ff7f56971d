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

# HF-hub repo basenames accepted as alternate cache filenames (the HF
# CLIPModel state-dict layout is auto-remapped by convert.py)
_HF_NAMES = {
    "ViT-B/16": "clip-vit-base-patch16",
    "ViT-B/32": "clip-vit-base-patch32",
}

# Official OpenAI release URLs (SHA256 embedded in the path), as in the
# reference's _MODELS table (/root/reference/clip/clip.py:29-36).  Only
# used when RPO_TPU_ALLOW_DOWNLOAD=1 — TPU pods typically have no egress.
_URLS = {
    "RN50": "https://openaipublic.azureedge.net/clip/models/afeb0e10f9e5a86da6080e35cf09123aca3b358a0c3e3b6c78a7b63bc04b6762/RN50.pt",
    "RN101": "https://openaipublic.azureedge.net/clip/models/8fa8567bab74a42d41c5915025a8e4538c3bdbe8804a470a72f30b0d94fab599/RN101.pt",
    "RN50x4": "https://openaipublic.azureedge.net/clip/models/7e526bd135e493cef0776de27d5f42653e6b4c8bf9e0f653bb11773263205fdd/RN50x4.pt",
    "RN50x16": "https://openaipublic.azureedge.net/clip/models/52378b407f34354e150460fe41077663dd5b39c54cd0bfd2b27167a4a06ec9aa/RN50x16.pt",
    "ViT-B/32": "https://openaipublic.azureedge.net/clip/models/40d365715913c9da98579312b702a82c18be219cc2a73407c4526f58eba950af/ViT-B-32.pt",
    "ViT-B/16": "https://openaipublic.azureedge.net/clip/models/5806e77cd80f8b59890b7e101eabd078d9fb84e6937f9e85e4ecb61988df416f/ViT-B-16.pt",
}


def _maybe_download(backbone_name: str) -> Optional[str]:
    """Download + SHA256-verify a checkpoint when explicitly allowed
    (behavioral mirror of /root/reference/clip/clip.py:39-68)."""
    if os.environ.get("RPO_TPU_ALLOW_DOWNLOAD") != "1":
        return None
    url = _URLS.get(backbone_name)
    if url is None:
        return None
    import hashlib
    import urllib.request

    cache_dir = os.environ.get("CLIP_CACHE_DIR", os.path.expanduser("~/.cache/clip"))
    os.makedirs(cache_dir, exist_ok=True)
    target = os.path.join(cache_dir, os.path.basename(url))
    expected_sha = url.split("/")[-2]
    if not os.path.exists(target):
        print(f"Downloading {url} -> {target}")
        tmp = target + ".part"
        try:
            # explicit timeout: a blackholed connection (firewalled pod)
            # must trigger the random-init fallback, not hang startup
            with urllib.request.urlopen(url, timeout=60) as resp, open(
                tmp, "wb"
            ) as out:
                while True:
                    chunk = resp.read(1 << 20)
                    if not chunk:
                        break
                    out.write(chunk)
        except Exception as exc:  # no egress: fall back to random init
            print(f"(!) download failed ({exc}); continuing without weights")
            return None
        os.replace(tmp, target)
    with open(target, "rb") as f:
        if hashlib.sha256(f.read()).hexdigest() != expected_sha:
            raise RuntimeError(
                f"{target} exists but its SHA256 does not match; delete and retry"
            )
    return target


def find_checkpoint(backbone_name: str) -> Optional[str]:
    explicit = os.environ.get("CLIP_CHECKPOINT")
    if explicit:
        if not os.path.exists(explicit):
            # an explicitly-requested checkpoint must never silently fall
            # through to a different cached file or random init: that's a
            # full training run against the wrong weights
            raise FileNotFoundError(
                f"$CLIP_CHECKPOINT={explicit!r} does not exist "
                "(unset it to use the cache-dir/download resolution)"
            )
        return explicit
    cache_dir = os.environ.get(
        "CLIP_CACHE_DIR", os.path.expanduser("~/.cache/clip")
    )
    fname = _FILENAMES.get(backbone_name)
    if fname:
        path = os.path.join(cache_dir, fname)
        if not os.path.exists(path):
            # widened intake (VERDICT r3 #5): any locally-present variant
            # of the same backbone unlocks the real-weights stage — the
            # converter accepts open_clip envelopes, HF CLIPModel state
            # dicts, and safetensors (convert.normalize_state_dict)
            stem = os.path.splitext(fname)[0]
            alternates = [f"{stem}.safetensors", f"{stem}.bin"]
            hf_repo = _HF_NAMES.get(backbone_name)
            if hf_repo:
                alternates += [f"{hf_repo}.safetensors", f"{hf_repo}.bin"]
            for alt in alternates:
                alt_path = os.path.join(cache_dir, alt)
                if os.path.exists(alt_path):
                    print(
                        f"Using alternate-format checkpoint {alt_path} "
                        f"for {backbone_name} (auto-converted layout)"
                    )
                    return alt_path
        if os.path.exists(path):
            # verify cached files whose expected SHA we know (the OpenAI
            # URLs embed it) — a truncated download should be reported,
            # not loaded blind.  Like the reference _download
            # (clip.py:49-53), quarantine + redownload only when
            # downloading is enabled; otherwise warn and proceed (the
            # file may be deliberate custom weights at the canonical
            # name, and random init would be worse than trying it).
            url = _URLS.get(backbone_name)
            if url and os.path.basename(url) == fname:
                import hashlib

                with open(path, "rb") as f:
                    digest = hashlib.sha256(f.read()).hexdigest()
                if digest != url.split("/")[-2]:
                    if os.environ.get("RPO_TPU_ALLOW_DOWNLOAD") == "1":
                        print(
                            f"(!) cached {path} fails SHA256 verification; "
                            "quarantining and re-downloading"
                        )
                        os.rename(path, path + ".corrupt")
                        return _maybe_download(backbone_name)
                    print(
                        f"(!) {path} does not match the published SHA256 "
                        "for this backbone (custom weights, or a "
                        "truncated download)"
                    )
            return path
    return _maybe_download(backbone_name)


_UNRESOLVED = object()  # sentinel: path=None means "resolved to no checkpoint"


def load_backbone(
    backbone_name: str, dtype=None, seed: int = 0, path=_UNRESOLVED
) -> Tuple[Params, CLIPConfig]:
    """Resolve + load (or randomly init) a CLIP backbone as a jax pytree.

    ``path`` lets a caller that already ran :func:`find_checkpoint` skip
    the second resolution (cache-dir hits SHA256-hash the whole ~340 MB
    file per call); pass its result, including ``None`` for no-checkpoint.
    """
    if path is _UNRESOLVED:
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
