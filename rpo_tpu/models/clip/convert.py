"""Convert OpenAI CLIP torch checkpoints into rpo_tpu parameter pytrees.

Mirrors the shape-inference of the reference ``build_model``
(/root/reference/clip/model.py:403-427) and the loader fallback chain of
``load_clip_to_cpu`` (/root/reference/trainers/rpo.py:24-39): a checkpoint
file may be a TorchScript archive or a plain state dict.

Torch is used host-side only, for deserialization.  Layout transforms:
  - Linear weights (out, in) -> (in, out) so application is ``x @ w``.
  - conv1 patch kernel (width, 3, P, P) -> (P*P*3, width) matching
    ``patchify``'s (py, px, c) patch flattening.
  - Per-layer block params stacked along a leading [n_layers] axis for
    ``lax.scan``.
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np

from .model import CLIPConfig, Params


def _np(x) -> np.ndarray:
    if isinstance(x, np.ndarray):
        return x
    return x.detach().cpu().float().numpy()  # torch tensor


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a CLIP checkpoint file (JIT archive or state dict) to numpy."""
    import torch

    try:
        model = torch.jit.load(path, map_location="cpu").eval()
        state_dict = model.state_dict()
    except RuntimeError:
        state_dict = torch.load(path, map_location="cpu")
    if hasattr(state_dict, "state_dict"):
        state_dict = state_dict.state_dict()
    return {k: _np(v) for k, v in state_dict.items()}


def infer_config(sd: Dict[str, np.ndarray]) -> CLIPConfig:
    """Infer architecture hyperparameters from state-dict shapes
    (behavioral mirror of /root/reference/clip/model.py:403-427)."""
    text_width = sd["ln_final.weight"].shape[0]
    if "visual.proj" not in sd:  # ModifiedResNet backbone
        counts = tuple(
            len({k.split(".")[2] for k in sd if k.startswith(f"visual.layer{b}")})
            for b in (1, 2, 3, 4)
        )
        vision_width = sd["visual.layer1.0.conv1.weight"].shape[0]
        out_width = round((sd["visual.attnpool.positional_embedding"].shape[0] - 1) ** 0.5)
        return CLIPConfig(
            embed_dim=sd["text_projection"].shape[1],
            image_resolution=out_width * 32,
            vision_layers=counts,
            vision_width=vision_width,
            vision_patch_size=0,
            context_length=sd["positional_embedding"].shape[0],
            vocab_size=sd["token_embedding.weight"].shape[0],
            text_width=text_width,
            text_heads=text_width // 64,
            text_layers=len(
                {k.split(".")[2] for k in sd if k.startswith("transformer.resblocks")}
            ),
        )
    vision_width = sd["visual.conv1.weight"].shape[0]
    vision_layers = len(
        [k for k in sd if k.startswith("visual.") and k.endswith(".attn.in_proj_weight")]
    )
    vision_patch_size = sd["visual.conv1.weight"].shape[-1]
    grid = round((sd["visual.positional_embedding"].shape[0] - 1) ** 0.5)
    return CLIPConfig(
        embed_dim=sd["text_projection"].shape[1],
        image_resolution=vision_patch_size * grid,
        vision_layers=vision_layers,
        vision_width=vision_width,
        vision_patch_size=vision_patch_size,
        context_length=sd["positional_embedding"].shape[0],
        vocab_size=sd["token_embedding.weight"].shape[0],
        text_width=text_width,
        text_heads=text_width // 64,
        text_layers=len(
            {k.split(".")[2] for k in sd if k.startswith("transformer.resblocks")}
        ),
    )


def _ln(sd, prefix) -> Dict[str, np.ndarray]:
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def _stack_blocks(sd: Dict[str, np.ndarray], prefix: str, n_layers: int) -> Params:
    def per_layer(fn):
        return np.stack([fn(f"{prefix}.{i}") for i in range(n_layers)])

    return {
        "ln_1": {
            "scale": per_layer(lambda p: sd[f"{p}.ln_1.weight"]),
            "bias": per_layer(lambda p: sd[f"{p}.ln_1.bias"]),
        },
        "attn": {
            "qkv_w": per_layer(lambda p: sd[f"{p}.attn.in_proj_weight"].T),
            "qkv_b": per_layer(lambda p: sd[f"{p}.attn.in_proj_bias"]),
            "out_w": per_layer(lambda p: sd[f"{p}.attn.out_proj.weight"].T),
            "out_b": per_layer(lambda p: sd[f"{p}.attn.out_proj.bias"]),
        },
        "ln_2": {
            "scale": per_layer(lambda p: sd[f"{p}.ln_2.weight"]),
            "bias": per_layer(lambda p: sd[f"{p}.ln_2.bias"]),
        },
        "mlp": {
            "fc_w": per_layer(lambda p: sd[f"{p}.mlp.c_fc.weight"].T),
            "fc_b": per_layer(lambda p: sd[f"{p}.mlp.c_fc.bias"]),
            "proj_w": per_layer(lambda p: sd[f"{p}.mlp.c_proj.weight"].T),
            "proj_b": per_layer(lambda p: sd[f"{p}.mlp.c_proj.bias"]),
        },
    }


def convert_state_dict(sd: Dict[str, Any], cfg: CLIPConfig | None = None) -> Params:
    """Torch CLIP state dict (numpy or torch leaves) -> rpo_tpu pytree (fp32)."""
    sd = {k: _np(v) for k, v in sd.items()}
    if cfg is None:
        cfg = infer_config(sd)

    if not cfg.is_vit:
        from .resnet import convert_resnet_visual

        visual = convert_resnet_visual(sd, cfg.vision_layers)
        return _finish_convert(sd, visual, cfg)

    conv1 = sd["visual.conv1.weight"]  # (width, 3, P, P)
    # -> (P, P, 3, width) -> (P*P*3, width), matching patchify's (py, px, c).
    patch_embed = conv1.transpose(2, 3, 1, 0).reshape(-1, conv1.shape[0])

    visual = {
        "patch_embed": patch_embed,
        "class_embedding": sd["visual.class_embedding"],
        "positional_embedding": sd["visual.positional_embedding"],
        "ln_pre": _ln(sd, "visual.ln_pre"),
        "blocks": _stack_blocks(sd, "visual.transformer.resblocks", cfg.vision_layers),
        "ln_post": _ln(sd, "visual.ln_post"),
        "proj": sd["visual.proj"],
    }
    return _finish_convert(sd, visual, cfg)


def _finish_convert(sd: Dict[str, np.ndarray], visual: Params, cfg: CLIPConfig) -> Params:
    text = {
        "token_embedding": sd["token_embedding.weight"],
        "positional_embedding": sd["positional_embedding"],
        "blocks": _stack_blocks(sd, "transformer.resblocks", cfg.text_layers),
        "ln_final": _ln(sd, "ln_final"),
        "text_projection": sd["text_projection"],
    }
    import jax
    import jax.numpy as jnp

    params = {
        "visual": visual,
        "text": text,
        "logit_scale": sd["logit_scale"].reshape(()),
    }
    return jax.tree_util.tree_map(lambda a: jnp.asarray(a, jnp.float32), params)


def load_clip(path: str):
    """Checkpoint file -> (params fp32, CLIPConfig)."""
    sd = load_torch_state_dict(path)
    for key in ("input_resolution", "context_length", "vocab_size"):
        sd.pop(key, None)
    sd = {k: _np(v) for k, v in sd.items()}
    cfg = infer_config(sd)
    return convert_state_dict(sd, cfg=cfg), cfg
