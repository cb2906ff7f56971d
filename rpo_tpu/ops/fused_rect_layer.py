"""Fused half-layer Pallas kernels for the rect (bias-free) eval tower.

The RPO/CoOp/LP/zsclip eval path runs the frozen vision tower as
``rect_residual_block`` (every row attends to the first ``n_kv`` rows;
masked K/V never computed).  Its profile at the production shape
(B=100, L=221, d=768 — BASELINE.md r3 eval close-out) is matmuls near
the MXU floor plus ~2.5 ms/step of fp32 LayerNorm islands and
residual-add HBM passes, and a paired-head attention kernel that spends
most of its 3.5 ms re-DMAing Q/K/V it could have kept in VMEM.

Two kernels fuse each residual HALF into one program per block:

  - ``fused_rect_attn_half``: x + out_proj(rect_attend(LN1(x))) — Q/K/V
    projection, per-head attention, out-projection and both residual
    reads/writes in one program; Q/K/V never visit HBM.
  - ``fused_mlp_half``: x + proj(QuickGELU(fc(LN2(x)))) over flattened
    rows.

A WHOLE-layer kernel (as ops/fused_text_layer.py does for the tiny-L
text towers) does not fit here: d=768 makes the full layer's weights
~14 MB bf16, over the ~16 MB VMEM budget once activations and double
buffers are counted; each half fits comfortably.

Numerics mirror the XLA path at every cast point (fp32 LN/softmax
islands — the parity contract).  Forward-only: only eval scopes
(use_pallas_attention) trace these.
"""
from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu is only importable where TPU support exists
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

# kill-switch (the selftest/bench downgrade path uses scopes; this is the
# explicit operator override, mirroring RPO_TPU_PALLAS_ATTENTION)
_ENV = _os.environ.get("RPO_TPU_FUSED_RECT", "")


def fused_rect_enabled() -> bool:
    return _ENV != "0"


def _ln_f32(x32, s_ref, b_ref, eps):
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    return (x32 - mean) * jax.lax.rsqrt(var + eps) * s_ref[...].astype(
        jnp.float32
    ) + b_ref[...].astype(jnp.float32)


def _attn_half_kernel(
    x_ref, ln1s, ln1b, wq, bq, wk, bk, wv, bv, wout, bout, o_ref,
    *, n_heads, n_kv, eps,
):
    xb = x_ref[...]  # (Nb, L, d)
    Nb, L, d = xb.shape
    dh = d // n_heads
    dtype = xb.dtype

    def proj(y2, w_ref, b_ref):
        out = jnp.dot(
            y2, w_ref[...], preferred_element_type=jnp.float32
        ).astype(dtype)
        return out + b_ref[...].astype(dtype)

    y = _ln_f32(xb.astype(jnp.float32), ln1s, ln1b, eps).astype(dtype)
    y2 = y.reshape(Nb * L, d)
    q = proj(y2, wq, bq).reshape(Nb, L, d)
    # K/V only exist for the first n_kv rows (the rect structure): the
    # projections never compute the masked rows at all
    ykv = y[:, :n_kv, :].reshape(Nb * n_kv, d)
    k = proj(ykv, wk, bk).reshape(Nb, n_kv, d)
    v = proj(ykv, wv, bv).reshape(Nb, n_kv, d)
    scale = dh ** -0.5
    heads = []
    for h in range(n_heads):
        sl = slice(h * dh, (h + 1) * dh)
        s = jax.lax.dot_general(
            q[:, :, sl], k[:, :, sl],
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        s = s * scale
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        w = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(dtype)
        heads.append(
            jax.lax.dot_general(
                w, v[:, :, sl],
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).astype(dtype)
        )
    attn = jnp.concatenate(heads, axis=-1).reshape(Nb * L, d)
    out = xb.reshape(Nb * L, d) + proj(attn, wout, bout)
    o_ref[...] = out.reshape(Nb, L, d)


def _mlp_half_kernel(x_ref, ln2s, ln2b, wfc, bfc, wproj, bproj, o_ref, *, eps):
    xb = x_ref[...]  # (Rb, d) flattened rows
    dtype = xb.dtype

    def proj(y2, w_ref, b_ref):
        out = jnp.dot(
            y2, w_ref[...], preferred_element_type=jnp.float32
        ).astype(dtype)
        return out + b_ref[...].astype(dtype)

    z = _ln_f32(xb.astype(jnp.float32), ln2s, ln2b, eps).astype(dtype)
    hdn = proj(z, wfc, bfc)
    # QuickGELU with explicit-dtype constants (Mosaic rejects weak-f32
    # scalar broadcasts into bf16 vectors — see ops/fused_text_layer.py)
    one = jnp.asarray(1.0, dtype)
    hdn = hdn * (one / (one + jnp.exp(-(jnp.asarray(1.702, dtype) * hdn))))
    o_ref[...] = xb + proj(hdn, wproj, bproj)


def _vmem_kw(interpret):
    return (
        {"memory_space": pltpu.VMEM}
        if (_HAS_PLTPU and not interpret)
        else {}
    )


def _grid_params(interpret):
    if not _HAS_PLTPU or interpret:
        return {}
    try:
        return {
            "compiler_params": pltpu.CompilerParams(
                dimension_semantics=("parallel",)
            )
        }
    except Exception:  # pragma: no cover
        return {}


def _row(t, dt):
    return t.reshape(1, -1).astype(dt)


def fused_rect_attn_half(
    x: jax.Array,
    ln_1: dict,
    attn: dict,
    n_heads: int,
    n_kv: int,
    block_batch: int = 2,
    interpret: bool = False,
    eps: float = 1e-5,
) -> jax.Array:
    """x + out_proj(rect_attention(LN1(x))) in one program per
    ``block_batch`` batch elements.  x: (B, L, d); requires
    B % block_batch == 0 (callers pass production batch shapes)."""
    B, L, d = x.shape
    dt = x.dtype
    wqkv, bqkv = attn["qkv_w"].astype(dt), attn["qkv_b"].astype(dt)
    while B % block_batch:
        block_batch -= 1
    kw = _vmem_kw(interpret)
    x_spec = pl.BlockSpec((block_batch, L, d), lambda i: (i, 0, 0), **kw)

    def const(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape), **kw)

    weights = [
        _row(ln_1["scale"], dt), _row(ln_1["bias"], dt),
        wqkv[:, :d], _row(bqkv[:d], dt),
        wqkv[:, d:2 * d], _row(bqkv[d:2 * d], dt),
        wqkv[:, 2 * d:], _row(bqkv[2 * d:], dt),
        attn["out_w"].astype(dt), _row(attn["out_b"], dt),
    ]
    return pl.pallas_call(
        functools.partial(
            _attn_half_kernel, n_heads=n_heads, n_kv=n_kv, eps=eps
        ),
        grid=(B // block_batch,),
        in_specs=[x_spec] + [const(w.shape) for w in weights],
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct((B, L, d), x.dtype),
        interpret=interpret,
        **_grid_params(interpret),
    )(x, *weights)


def fused_mlp_half(
    x: jax.Array,
    ln_2: dict,
    mlp: dict,
    block_rows: int = 224,
    interpret: bool = False,
    eps: float = 1e-5,
) -> jax.Array:
    """x + proj(QuickGELU(fc(LN2(x)))) over flattened (B*L, d) rows."""
    B, L, d = x.shape
    dt = x.dtype
    rows = B * L
    Rp = (rows + block_rows - 1) // block_rows * block_rows
    x2 = x.reshape(rows, d)
    if Rp != rows:
        x2 = jnp.pad(x2, ((0, Rp - rows), (0, 0)))
    kw = _vmem_kw(interpret)
    x_spec = pl.BlockSpec((block_rows, d), lambda i: (i, 0), **kw)

    def const(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape), **kw)

    weights = [
        _row(ln_2["scale"], dt), _row(ln_2["bias"], dt),
        mlp["fc_w"].astype(dt), _row(mlp["fc_b"], dt),
        mlp["proj_w"].astype(dt), _row(mlp["proj_b"], dt),
    ]
    out = pl.pallas_call(
        functools.partial(_mlp_half_kernel, eps=eps),
        grid=(Rp // block_rows,),
        in_specs=[x_spec] + [const(w.shape) for w in weights],
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct((Rp, d), x.dtype),
        interpret=interpret,
        **_grid_params(interpret),
    )(x2, *weights)
    return out[:rows].reshape(B, L, d)


def fused_rect_residual_block(
    x: jax.Array,
    params: dict,
    n_heads: int,
    n_kv: int,
    interpret: bool = False,
) -> jax.Array:
    """layers.rect_residual_block with both halves fused (one attention
    program per batch pair + one MLP program per row block)."""
    x = fused_rect_attn_half(
        x, params["ln_1"], params["attn"], n_heads, n_kv, interpret=interpret
    )
    return fused_mlp_half(x, params["ln_2"], params["mlp"], interpret=interpret)
