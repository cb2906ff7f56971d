"""ModifiedResNet visual tower (RN50/RN101/RN50x4/RN50x16 CLIP backbones).

Behavior contract: /root/reference/clip/model.py:10-150 — 3-conv
anti-aliased stem, avgpool-before-stride bottlenecks, and a QKV attention
pooling head instead of average pooling.  Supported for the CoOp RN
configs and zero-shot CLIP (all RPO paper configs use ViT-B/16).

Functional JAX, NHWC layout, inference-mode BatchNorm (the backbone is
frozen in every method — running statistics are folded at conversion).
The attention pool computes only the query at the mean-token position
(mathematically identical to the reference's full attention + x[0] pick).
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


def conv2d(x: jax.Array, kernel: jax.Array, stride: int = 1, padding: int = 0) -> jax.Array:
    """NHWC conv with HWIO kernel."""
    return jax.lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def batch_norm(x: jax.Array, p: Params, eps: float = 1e-5) -> jax.Array:
    """Inference-mode BN in fp32 (frozen running stats)."""
    x32 = x.astype(jnp.float32)
    inv = jax.lax.rsqrt(p["var"].astype(jnp.float32) + eps)
    out = (x32 - p["mean"].astype(jnp.float32)) * inv * p["scale"].astype(
        jnp.float32
    ) + p["bias"].astype(jnp.float32)
    return out.astype(x.dtype)


def avg_pool(x: jax.Array, window: int) -> jax.Array:
    if window == 1:
        return x
    return jax.lax.reduce_window(
        x.astype(jnp.float32), 0.0, jax.lax.add,
        (1, window, window, 1), (1, window, window, 1), "VALID",
    ).astype(x.dtype) / (window * window)


def bottleneck(x: jax.Array, p: Params, stride: int) -> jax.Array:
    """model.py:40-53: conv1x1-bn-relu, conv3x3-bn-relu, avgpool(stride),
    conv1x1-bn; downsample = avgpool + conv1x1 + bn."""
    out = jax.nn.relu(batch_norm(conv2d(x, p["conv1"]), p["bn1"]))
    out = jax.nn.relu(batch_norm(conv2d(out, p["conv2"], padding=1), p["bn2"]))
    out = avg_pool(out, stride)
    out = batch_norm(conv2d(out, p["conv3"]), p["bn3"])
    if "downsample" in p:
        identity = avg_pool(x, stride)
        identity = batch_norm(
            conv2d(identity, p["downsample"]["conv"]), p["downsample"]["bn"]
        )
    else:
        identity = x
    return jax.nn.relu(out + identity)


def attention_pool(x: jax.Array, p: Params, n_heads: int) -> jax.Array:
    """model.py:56-90: prepend mean token, +pos, QKV attention, take the
    mean-token output.  x: (B, H, W, C) -> (B, output_dim)."""
    B, H, W, C = x.shape
    tokens = x.reshape(B, H * W, C)
    mean = jnp.mean(tokens.astype(jnp.float32), axis=1, keepdims=True).astype(x.dtype)
    tokens = jnp.concatenate([mean, tokens], axis=1)  # (B, HW+1, C)
    tokens = tokens + p["positional_embedding"].astype(tokens.dtype)

    def proj(name, t):
        return jnp.einsum(
            "bld,de->ble", t, p[f"{name}_w"].astype(t.dtype),
            preferred_element_type=jnp.float32,
        ).astype(t.dtype) + p[f"{name}_b"].astype(t.dtype)

    q = proj("q", tokens[:, :1])  # only the mean-token query is needed
    k = proj("k", tokens)
    v = proj("v", tokens)
    head_dim = C // n_heads
    L = H * W + 1

    def split(t, length):
        return t.reshape(B, length, n_heads, head_dim).transpose(0, 2, 1, 3)

    qh, kh, vh = split(q, 1), split(k, L), split(v, L)
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", qh, kh, preferred_element_type=jnp.float32
    ).astype(jnp.float32) * (head_dim ** -0.5)
    w = jax.nn.softmax(logits, axis=-1).astype(vh.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", w, vh)
    out = out.transpose(0, 2, 1, 3).reshape(B, 1, C)[:, 0]
    return (
        jnp.einsum(
            "bd,de->be", out, p["c_w"].astype(out.dtype),
            preferred_element_type=jnp.float32,
        ).astype(out.dtype)
        + p["c_b"].astype(out.dtype)
    )


def resnet_encode_image(params: Params, cfg, images: jax.Array) -> jax.Array:
    """Full ModifiedResNet forward: images (B, H, W, 3) -> (B, embed_dim)."""
    v = params["visual"]
    dtype = v["stem"]["conv1"].dtype
    x = images.astype(dtype)
    stem = v["stem"]
    x = jax.nn.relu(batch_norm(conv2d(x, stem["conv1"], stride=2, padding=1), stem["bn1"]))
    x = jax.nn.relu(batch_norm(conv2d(x, stem["conv2"], padding=1), stem["bn2"]))
    x = jax.nn.relu(batch_norm(conv2d(x, stem["conv3"], padding=1), stem["bn3"]))
    x = avg_pool(x, 2)
    for li, layer in enumerate(v["layers"]):
        stride = 1 if li == 0 else 2
        for bi, block in enumerate(layer):
            x = bottleneck(x, block, stride if bi == 0 else 1)
    heads = cfg.vision_width * 32 // 64
    return attention_pool(x, v["attnpool"], heads)


# ---------------------------------------------------------------------------
# conversion from torch state dict
# ---------------------------------------------------------------------------

def _conv(w: np.ndarray) -> np.ndarray:
    """torch OIHW -> HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def _bn(sd, prefix) -> Params:
    return {
        "scale": sd[f"{prefix}.weight"],
        "bias": sd[f"{prefix}.bias"],
        "mean": sd[f"{prefix}.running_mean"],
        "var": sd[f"{prefix}.running_var"],
    }


def convert_resnet_visual(sd: Dict[str, np.ndarray], layers: Tuple[int, ...]) -> Params:
    """visual.* keys of an RN CLIP state dict -> our pytree."""
    stem = {
        "conv1": _conv(sd["visual.conv1.weight"]),
        "bn1": _bn(sd, "visual.bn1"),
        "conv2": _conv(sd["visual.conv2.weight"]),
        "bn2": _bn(sd, "visual.bn2"),
        "conv3": _conv(sd["visual.conv3.weight"]),
        "bn3": _bn(sd, "visual.bn3"),
    }
    layer_params = []
    for li, n_blocks in enumerate(layers, start=1):
        blocks = []
        for bi in range(n_blocks):
            pfx = f"visual.layer{li}.{bi}"
            block = {
                "conv1": _conv(sd[f"{pfx}.conv1.weight"]),
                "bn1": _bn(sd, f"{pfx}.bn1"),
                "conv2": _conv(sd[f"{pfx}.conv2.weight"]),
                "bn2": _bn(sd, f"{pfx}.bn2"),
                "conv3": _conv(sd[f"{pfx}.conv3.weight"]),
                "bn3": _bn(sd, f"{pfx}.bn3"),
            }
            if f"{pfx}.downsample.0.weight" in sd:
                block["downsample"] = {
                    "conv": _conv(sd[f"{pfx}.downsample.0.weight"]),
                    "bn": _bn(sd, f"{pfx}.downsample.1"),
                }
            blocks.append(block)
        layer_params.append(blocks)
    attnpool = {
        "positional_embedding": sd["visual.attnpool.positional_embedding"],
        "q_w": sd["visual.attnpool.q_proj.weight"].T,
        "q_b": sd["visual.attnpool.q_proj.bias"],
        "k_w": sd["visual.attnpool.k_proj.weight"].T,
        "k_b": sd["visual.attnpool.k_proj.bias"],
        "v_w": sd["visual.attnpool.v_proj.weight"].T,
        "v_b": sd["visual.attnpool.v_proj.bias"],
        "c_w": sd["visual.attnpool.c_proj.weight"].T,
        "c_b": sd["visual.attnpool.c_proj.bias"],
    }
    return {"stem": stem, "layers": layer_params, "attnpool": attnpool}


def init_resnet_visual(key: jax.Array, cfg, dtype=jnp.float32) -> Params:
    """Random RN visual tower (structure-correct; for offline smoke runs)."""
    width = cfg.vision_width
    layers = cfg.vision_layers
    ks = iter(jax.random.split(key, 256))

    def conv(shape, fan_in):
        return (
            jax.random.normal(next(ks), shape, jnp.float32) * (fan_in ** -0.5)
        ).astype(dtype)

    def bn(c):
        return {
            "scale": jnp.ones((c,), dtype),
            "bias": jnp.zeros((c,), dtype),
            "mean": jnp.zeros((c,), dtype),
            "var": jnp.ones((c,), dtype),
        }

    stem = {
        "conv1": conv((3, 3, 3, width // 2), 27),
        "bn1": bn(width // 2),
        "conv2": conv((3, 3, width // 2, width // 2), 9 * width // 2),
        "bn2": bn(width // 2),
        "conv3": conv((3, 3, width // 2, width), 9 * width // 2),
        "bn3": bn(width),
    }
    layer_params = []
    inplanes = width
    for li, n_blocks in enumerate(layers):
        planes = width * (2 ** li)
        blocks = []
        for bi in range(n_blocks):
            block = {
                "conv1": conv((1, 1, inplanes, planes), inplanes),
                "bn1": bn(planes),
                "conv2": conv((3, 3, planes, planes), 9 * planes),
                "bn2": bn(planes),
                "conv3": conv((1, 1, planes, planes * 4), planes),
                "bn3": bn(planes * 4),
            }
            stride = (1 if li == 0 else 2) if bi == 0 else 1
            if stride > 1 or inplanes != planes * 4:
                block["downsample"] = {
                    "conv": conv((1, 1, inplanes, planes * 4), inplanes),
                    "bn": bn(planes * 4),
                }
            blocks.append(block)
            inplanes = planes * 4
        layer_params.append(blocks)

    embed_dim_feat = width * 32
    spacial = cfg.image_resolution // 32
    attnpool = {
        "positional_embedding": (
            jax.random.normal(next(ks), (spacial ** 2 + 1, embed_dim_feat), jnp.float32)
            / embed_dim_feat ** 0.5
        ).astype(dtype),
        **{
            f"{n}_w": conv((embed_dim_feat, embed_dim_feat), embed_dim_feat)
            for n in ("q", "k", "v")
        },
        **{f"{n}_b": jnp.zeros((embed_dim_feat,), dtype) for n in ("q", "k", "v")},
        "c_w": conv((embed_dim_feat, cfg.embed_dim), embed_dim_feat),
        "c_b": jnp.zeros((cfg.embed_dim,), dtype),
    }
    return {"stem": stem, "layers": layer_params, "attnpool": attnpool}
