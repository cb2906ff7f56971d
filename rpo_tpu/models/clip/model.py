"""CLIP in functional JAX: config, random init, and apply functions.

Architecture parity target: /root/reference/clip/model.py:210-376 (ViT
visual tower + masked-capable text transformer).  The model is exposed as
modular stage functions (embed → transformer → head) so methods like RPO
can splice learnable prompt tokens between stages without re-implementing
the towers (cf. /root/reference/trainers/rpo.py:161-232, which manually
decomposes the torch model for the same reason).

Everything here is shape-static: one jit specialization per
(n_cls, K, resolution) task, as planned in SURVEY.md §7.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from .layers import layer_norm, transformer

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    embed_dim: int = 512
    # vision
    image_resolution: int = 224
    vision_layers: Union[int, Tuple[int, int, int, int]] = 12
    vision_width: int = 768
    vision_patch_size: int = 16
    # text
    context_length: int = 77
    vocab_size: int = 49408
    text_width: int = 512
    text_heads: int = 8
    text_layers: int = 12

    @property
    def vision_heads(self) -> int:
        if self.is_vit:
            return self.vision_width // 64
        return self.vision_width * 32 // 64

    @property
    def grid_size(self) -> int:
        return self.image_resolution // self.vision_patch_size

    @property
    def vision_seq_len(self) -> int:
        return self.grid_size ** 2 + 1

    @property
    def is_vit(self) -> bool:
        return isinstance(self.vision_layers, int)


VIT_B16 = CLIPConfig()
VIT_B32 = dataclasses.replace(VIT_B16, vision_patch_size=32)
RN50 = CLIPConfig(
    embed_dim=1024, vision_layers=(3, 4, 6, 3), vision_width=64,
    vision_patch_size=0,
)
RN101 = CLIPConfig(
    embed_dim=512, vision_layers=(3, 4, 23, 3), vision_width=64,
    vision_patch_size=0,
)
RN50x4 = CLIPConfig(
    embed_dim=640, image_resolution=288, vision_layers=(4, 6, 10, 6),
    vision_width=80, vision_patch_size=0,
    text_width=640, text_heads=10, text_layers=12,
)
RN50x16 = CLIPConfig(
    embed_dim=768, image_resolution=384, vision_layers=(6, 8, 18, 8),
    vision_width=96, vision_patch_size=0,
    text_width=768, text_heads=12, text_layers=12,
)
# Test-size model: full structure, tiny dims (vision_width must be a
# multiple of 64 because vision_heads = width // 64, model.py:276).
TINY = CLIPConfig(
    embed_dim=64,
    image_resolution=32,
    vision_layers=2,
    vision_width=64,
    vision_patch_size=16,
    context_length=77,
    vocab_size=49408,
    text_width=64,
    text_heads=2,
    text_layers=2,
)

# TINY with a 128-wide vision tower (2 heads): the smallest shape whose
# BOTH towers can shard attention heads over a tensor-parallel mesh axis
# (TINY's vision tower has a single head; parallel/tp.py).
TINY_W128 = CLIPConfig(
    embed_dim=64,
    image_resolution=32,
    vision_layers=2,
    vision_width=128,
    vision_patch_size=16,
    context_length=77,
    vocab_size=49408,
    text_width=64,
    text_heads=2,
    text_layers=2,
)

# Test-size ModifiedResNet: one bottleneck per stage, width 16
# (attnpool heads = 16*32//64 = 8, feature dim 512 -> embed 64).
TINY_RN = CLIPConfig(
    embed_dim=64,
    image_resolution=32,
    vision_layers=(1, 1, 1, 1),
    vision_width=16,
    vision_patch_size=0,  # like the real RN configs: ViT-only paths must fail loudly
    context_length=77,
    vocab_size=49408,
    text_width=64,
    text_heads=2,
    text_layers=2,
)

ARCHS = {
    "ViT-B/16": VIT_B16,
    "ViT-B/32": VIT_B32,
    "RN50": RN50,
    "RN101": RN101,
    "RN50x4": RN50x4,
    "RN50x16": RN50x16,
    "TINY": TINY,
    "TINY_W128": TINY_W128,
    "TINY_RN": TINY_RN,
}


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _init_block_stack(key, n_layers: int, width: int, dtype) -> Params:
    """CLIP's transformer init scheme (/root/reference/clip/model.py:320-327)."""
    proj_std = (width ** -0.5) * ((2 * n_layers) ** -0.5)
    attn_std = width ** -0.5
    fc_std = (2 * width) ** -0.5
    ks = jax.random.split(key, 4)

    def n(k, shape, std):
        return (jax.random.normal(k, shape, jnp.float32) * std).astype(dtype)

    zeros = lambda shape: jnp.zeros(shape, dtype)
    ones = lambda shape: jnp.ones(shape, dtype)
    L = n_layers
    return {
        "ln_1": {"scale": ones((L, width)), "bias": zeros((L, width))},
        "attn": {
            "qkv_w": n(ks[0], (L, width, 3 * width), attn_std),
            "qkv_b": zeros((L, 3 * width)),
            "out_w": n(ks[1], (L, width, width), proj_std),
            "out_b": zeros((L, width)),
        },
        "ln_2": {"scale": ones((L, width)), "bias": zeros((L, width))},
        "mlp": {
            "fc_w": n(ks[2], (L, width, 4 * width), fc_std),
            "fc_b": zeros((L, 4 * width)),
            "proj_w": n(ks[3], (L, 4 * width, width), proj_std),
            "proj_b": zeros((L, width)),
        },
    }


def init_clip(key: jax.Array, cfg: CLIPConfig, dtype=jnp.float32) -> Params:
    """Random CLIP params with the reference init distributions."""
    # one key per independently-drawn leaf/stack (reusing a key across
    # leaves would correlate their "random" draws)
    kv, kt, kc, kp, ktok, kpos, ktxt, kcls, kproj = jax.random.split(key, 9)
    vw, tw = cfg.vision_width, cfg.text_width
    scale = vw ** -0.5

    def n(k, shape, std):
        return (jax.random.normal(k, shape, jnp.float32) * std).astype(dtype)

    if not cfg.is_vit:
        from .resnet import init_resnet_visual

        visual = init_resnet_visual(kv, cfg, dtype)
        text = {
            "token_embedding": n(ktok, (cfg.vocab_size, tw), 0.02),
            "positional_embedding": n(kpos, (cfg.context_length, tw), 0.01),
            "blocks": _init_block_stack(kt, cfg.text_layers, tw, dtype),
            "ln_final": {"scale": jnp.ones((tw,), dtype), "bias": jnp.zeros((tw,), dtype)},
            "text_projection": n(ktxt, (tw, cfg.embed_dim), tw ** -0.5),
        }
        return {
            "visual": visual,
            "text": text,
            "logit_scale": jnp.asarray(math.log(1 / 0.07), jnp.float32),
        }

    visual = {
        # patch embedding stored matmul-ready: (P*P*3, width)
        "patch_embed": n(kc, (cfg.vision_patch_size ** 2 * 3, vw), scale),
        "class_embedding": n(kcls, (vw,), scale),
        "positional_embedding": n(kp, (cfg.vision_seq_len, vw), scale),
        "ln_pre": {"scale": jnp.ones((vw,), dtype), "bias": jnp.zeros((vw,), dtype)},
        "blocks": _init_block_stack(kv, cfg.vision_layers, vw, dtype),
        "ln_post": {"scale": jnp.ones((vw,), dtype), "bias": jnp.zeros((vw,), dtype)},
        "proj": n(kproj, (vw, cfg.embed_dim), scale),
    }
    text = {
        "token_embedding": n(ktok, (cfg.vocab_size, tw), 0.02),
        "positional_embedding": n(kpos, (cfg.context_length, tw), 0.01),
        "blocks": _init_block_stack(kt, cfg.text_layers, tw, dtype),
        "ln_final": {"scale": jnp.ones((tw,), dtype), "bias": jnp.zeros((tw,), dtype)},
        "text_projection": n(ktxt, (tw, cfg.embed_dim), tw ** -0.5),
    }
    return {
        "visual": visual,
        "text": text,
        "logit_scale": jnp.asarray(math.log(1 / 0.07), jnp.float32),
    }


# ---------------------------------------------------------------------------
# masks
# ---------------------------------------------------------------------------

def causal_mask(length: int) -> jax.Array:
    """(L, L) float32 additive causal mask (model.py:332-338)."""
    from rpo_tpu.ops.attention import NEG_INF

    i = jnp.arange(length)[:, None]
    j = jnp.arange(length)[None, :]
    return jnp.where(j > i, NEG_INF, 0.0).astype(jnp.float32)


# ---------------------------------------------------------------------------
# vision tower stages
# ---------------------------------------------------------------------------

def patchify(images: jax.Array, patch_size: int) -> jax.Array:
    """(B, H, W, 3) -> (B, n_patches, P*P*3) ready for the MXU.

    Equivalent to the reference's stride-P conv (model.py:228) but phrased
    as reshape + single large matmul, the canonical TPU patch embed.
    Channel order within a patch is (py, px, c) — the converter permutes
    torch's (c, py, px) conv kernel to match.
    """
    B, H, W, C = images.shape
    P = patch_size
    x = images.reshape(B, H // P, P, W // P, P, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # B, gh, gw, P, P, C
    return x.reshape(B, (H // P) * (W // P), P * P * C)


def vision_embed(params: Params, cfg: CLIPConfig, images: jax.Array) -> jax.Array:
    """Images (B, H, W, 3) -> token sequence (B, 1+grid^2, width).

    Prepends the class embedding and adds positional embeddings
    (model.py:228-232).  ln_pre is NOT applied here — RPO appends prompt
    tokens first (/root/reference/trainers/rpo.py:198-206).
    """
    dtype = params["patch_embed"].dtype
    patches = patchify(images.astype(dtype), cfg.vision_patch_size)
    x = jnp.einsum(
        "bpd,dw->bpw", patches, params["patch_embed"],
        preferred_element_type=jnp.float32,
    ).astype(dtype)
    cls = jnp.broadcast_to(
        params["class_embedding"].astype(dtype), (x.shape[0], 1, cfg.vision_width)
    )
    x = jnp.concatenate([cls, x], axis=1)
    return x + params["positional_embedding"].astype(dtype)


def vision_transformer_run(
    params: Params,
    cfg: CLIPConfig,
    x: jax.Array,
    bias: Optional[jax.Array] = None,
    remat: bool = False,
) -> jax.Array:
    """ln_pre -> masked transformer over already-embedded vision tokens."""
    x = layer_norm(x, params["ln_pre"])
    return transformer(x, params["blocks"], cfg.vision_heads, bias, remat=remat)


def encode_image(
    params: Params, cfg: CLIPConfig, images: jax.Array, remat: bool = False
) -> jax.Array:
    """Standard CLIP image features (B, embed_dim) — CLS head (model.py:227-244),
    or the ModifiedResNet attention-pool head for RN backbones."""
    if not cfg.is_vit:
        from .resnet import resnet_encode_image

        return resnet_encode_image(params, cfg, images)
    v = params["visual"]
    x = vision_embed(v, cfg, images)
    x = vision_transformer_run(v, cfg, x, remat=remat)
    x = layer_norm(x[:, 0, :], v["ln_post"])
    return jnp.einsum(
        "bd,de->be", x, v["proj"], preferred_element_type=jnp.float32
    ).astype(x.dtype)


# ---------------------------------------------------------------------------
# text tower stages
# ---------------------------------------------------------------------------

def text_embed(params: Params, tokens: jax.Array) -> jax.Array:
    """Token ids (B, L) -> embedded sequence + positional (B, L, width).

    L may be shorter than the trained context length: callers can
    truncate past the longest EOT (exact under the causal mask — see
    encode_text)."""
    emb = params["token_embedding"][tokens]
    pos = params["positional_embedding"][: tokens.shape[1]]
    return emb + pos.astype(emb.dtype)


def text_transformer_run(
    params: Params,
    cfg: CLIPConfig,
    x: jax.Array,
    bias: Optional[jax.Array] = None,
    remat: bool = False,
) -> jax.Array:
    return transformer(x, params["blocks"], cfg.text_heads, bias, remat=remat)


def encode_text(
    params: Params, cfg: CLIPConfig, tokens: jax.Array, remat: bool = False
) -> jax.Array:
    """Standard CLIP text features: EOT-position head (model.py:347-360).

    Length-agnostic: runs at ``tokens.shape[1]``.  Passing tokens
    truncated anywhere past the longest EOT is exact — under the causal
    mask a query position only reads keys <= itself and only EOT
    positions are gathered, so later positions are dead compute (the
    reference always runs the full 77, model.py:354)."""
    t = params["text"]
    x = text_embed(t, tokens)
    bias = causal_mask(tokens.shape[1])[None, None]
    x = text_transformer_run(t, cfg, x, bias, remat=remat)
    x = layer_norm(x, t["ln_final"])
    eot_pos = jnp.argmax(tokens, axis=-1)
    x = x[jnp.arange(x.shape[0]), eot_pos]
    return jnp.einsum(
        "bd,de->be", x, t["text_projection"], preferred_element_type=jnp.float32
    ).astype(x.dtype)


def clip_forward(
    params: Params, cfg: CLIPConfig, images: jax.Array, tokens: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Contrastive logits (model.py:362-376)."""
    img = encode_image(params, cfg, images)
    txt = encode_text(params, cfg, tokens)
    img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
    txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
    scale = jnp.exp(params["logit_scale"]).astype(img.dtype)
    logits_per_image = scale * img @ txt.T
    return logits_per_image, logits_per_image.T


def cast_params(params: Params, dtype) -> Params:
    """Cast floating leaves to ``dtype``; logit_scale stays float32
    (it is the only trained backbone scalar and exp() of bf16 drifts)."""

    def cast(path, leaf):
        if path[-1].key == "logit_scale":
            return leaf
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            return leaf.astype(dtype)
        return leaf

    return jax.tree_util.tree_map_with_path(cast, params)
