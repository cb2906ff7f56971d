"""Transformer building blocks for CLIP, functional style.

Numerics contract (parity-critical, see SURVEY.md §2.2):
  - LayerNorm computes in float32 and casts back (reference
    /root/reference/clip/model.py:153-159 — the fp16-safe LN).
  - QuickGELU is ``x * sigmoid(1.702 x)`` — NOT exact GELU
    (/root/reference/clip/model.py:162-164).
  - Blocks are pre-LN residual: attn then 4x MLP
    (/root/reference/clip/model.py:167-191).

Params are plain pytrees (nested dicts of jnp arrays).  A transformer's
blocks are *stacked* along a leading layer axis and executed with
``lax.scan`` — one compiled block body regardless of depth, the idiomatic
XLA formulation (vs. the reference's Python loop over modules).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from rpo_tpu.ops.attention import (
    multihead_attention,
    multihead_attention_cached,
    multihead_attention_kv,
    multihead_attention_rect,
)
from rpo_tpu.parallel.tp import shard_hidden


def layer_norm(x: jax.Array, params: dict, eps: float = 1e-5) -> jax.Array:
    orig_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    normed = (x32 - mean) * jax.lax.rsqrt(var + eps)
    out = normed * params["scale"].astype(jnp.float32) + params["bias"].astype(
        jnp.float32
    )
    return out.astype(orig_dtype)


def quick_gelu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(1.702 * x)


def mlp(x: jax.Array, params: dict) -> jax.Array:
    """4x expansion MLP with QuickGELU."""
    h = jnp.einsum(
        "bld,dh->blh", x, params["fc_w"], preferred_element_type=jnp.float32
    ).astype(x.dtype) + params["fc_b"].astype(x.dtype)
    # under tensor_parallel_scope, pin the 4W hidden dim to the model
    # mesh axis (fc partitioned on its output dim, QuickGELU local, the
    # down-projection's contraction all-reduces; parallel/tp.py) — no-op
    # otherwise
    h = quick_gelu(shard_hidden(h))
    out = jnp.einsum(
        "blh,hd->bld", h, params["proj_w"], preferred_element_type=jnp.float32
    ).astype(x.dtype) + params["proj_b"].astype(x.dtype)
    return out


def residual_block(
    x: jax.Array,
    params: dict,
    n_heads: int,
    bias: Optional[jax.Array] = None,
) -> jax.Array:
    x = x + multihead_attention(layer_norm(x, params["ln_1"]), params["attn"], n_heads, bias)
    x = x + mlp(layer_norm(x, params["ln_2"]), params["mlp"])
    return x


def residual_block_kv(
    x: jax.Array,
    params: dict,
    n_heads: int,
    bias: Optional[jax.Array] = None,
):
    """residual_block that also returns this layer's (k, v) heads
    ((B, H, L, Dh)) — the per-layer state the RPO frozen-text cache stores."""
    attn_out, k, v = multihead_attention_kv(
        layer_norm(x, params["ln_1"]), params["attn"], n_heads, bias
    )
    x = x + attn_out
    x = x + mlp(layer_norm(x, params["ln_2"]), params["mlp"])
    return x, k, v


def rect_residual_block(
    x: jax.Array,
    params: dict,
    n_heads: int,
    n_kv: int,
) -> jax.Array:
    """Residual block whose attention lets every row read only the first
    ``n_kv`` rows — full self-attention under a block-column mask, with
    the masked K/V never computed and no bias materialized (the RPO
    eval-path vision tower)."""
    x = x + multihead_attention_rect(
        layer_norm(x, params["ln_1"]), params["attn"], n_heads, n_kv
    )
    x = x + mlp(layer_norm(x, params["ln_2"]), params["mlp"])
    return x


def cross_residual_block(
    x: jax.Array,
    k: jax.Array,
    v: jax.Array,
    params: dict,
    n_heads: int,
    bias: Optional[jax.Array] = None,
) -> jax.Array:
    """Residual block whose attention reads precomputed (k, v) heads
    instead of self-attending: the query rows never contribute keys or
    values.  Exactly the per-row computation of ``residual_block`` for a
    row whose attention mask blocks every query-row column (the RPO
    read-only prompt rows, /root/reference/trainers/rpo.py:144-151)."""
    x = x + multihead_attention_cached(
        layer_norm(x, params["ln_1"]), k, v, params["attn"], n_heads, bias
    )
    x = x + mlp(layer_norm(x, params["ln_2"]), params["mlp"])
    return x


def transformer(
    x: jax.Array,
    stacked_blocks: dict,
    n_heads: int,
    bias: Optional[jax.Array] = None,
    remat: bool = False,
    unroll: bool = False,
) -> jax.Array:
    """Run a stack of residual blocks via lax.scan over stacked params.

    stacked_blocks: pytree whose leaves have a leading [n_layers] axis.
    The attention ``bias`` is closed over (static per task), matching the
    reference's runtime-mask threading (/root/reference/clip/model.py:202-207).

    ``unroll=True`` fully unrolls the scan: ~25% faster fwd+bwd steady
    state on TPU v5e, but XLA compile of the unrolled fwd+bwd tower takes
    minutes (vs ~30s scanned) — a net loss for the reference protocol
    where every (dataset, seed, subsample) task is a fresh process.  Off
    by default; flip for long single-task runs.
    """
    from rpo_tpu.ops.fused_text_layer import use_fused_text

    if (
        not remat
        and bias is not None
        and x.ndim == 3
        and x.dtype == jnp.bfloat16
        and bias.ndim == 4
        and bias.shape[:2] == (1, 1)
        and bias.shape[2] == bias.shape[3] == x.shape[1]
        and x.shape[2] % n_heads == 0
        and use_fused_text()
    ):
        # Fused whole-layer Pallas tower (forward-only; the scope is only
        # enabled on eval paths).  Built for tiny-L towers where the XLA
        # lowering is per-op-latency bound — the CoCoOp per-image text
        # encode (ops/fused_text_layer.py; 1.45x the 12-layer tower at
        # (408, 16, 512) on v5e).
        from rpo_tpu.ops.fused_text_layer import fused_text_tower

        return fused_text_tower(x, stacked_blocks, n_heads, bias[0, 0])

    body = residual_block
    if remat:
        body = jax.checkpoint(body, static_argnums=(2,))

    n_layers = jax.tree_util.tree_leaves(stacked_blocks)[0].shape[0]

    def step(carry, layer_params):
        return body(carry, layer_params, n_heads, bias), None

    out, _ = jax.lax.scan(
        step, x, stacked_blocks, unroll=n_layers if unroll else 1
    )
    return out
