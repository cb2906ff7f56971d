"""Fused masked attention as a Pallas TPU kernel.

One kernel program per (batch, head) computes QK^T -> +bias -> softmax
-> @V entirely in VMEM: the (L, L) attention matrix never round-trips
HBM (the XLA path materializes fp32 logits and probabilities between
fusions).  Sequence lengths here are tiny (77 text / 197+K vision), so a
whole (L, L) tile fits VMEM comfortably — no flash-style tiling needed.

Softmax runs in float32 (parity contract, SURVEY.md §7 hard part #1);
matmuls use the MXU with float32 accumulation.

The custom VJP recomputes attention in plain XLA for the backward pass
(cheap at these lengths); the Pallas kernel accelerates forward-only
paths (evaluation — the dominant cost of the base-to-new protocol's
test phases) and the forward half of training.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu is only importable where TPU support exists
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale):
    q = q_ref[0, 0]  # (L, D)
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    bias = bias_ref[0, 0]  # (L, L) float32
    s = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = s * scale + bias
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    w = e / jnp.sum(e, axis=-1, keepdims=True)
    o = jnp.dot(w.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0, 0] = o.astype(o_ref.dtype)


def _rect_kernel(q_ref, k_ref, v_ref, o_ref, *, scale):
    """Bias-free attention: q rows may outnumber k/v rows (the RPO eval
    tower: 221 query rows attend to the 197 frozen columns — the masked
    prompt columns are simply never materialized)."""
    q = q_ref[0, 0]  # (Lq, D)
    k = k_ref[0, 0]  # (Lk, D)
    v = v_ref[0, 0]
    s = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = s * scale
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    w = e / jnp.sum(e, axis=-1, keepdims=True)
    o = jnp.dot(w.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0, 0] = o.astype(o_ref.dtype)


def _fwd_rect(q, k, v, interpret=False):
    B, H, Lq, D = q.shape
    Lk = k.shape[2]
    memspace = pltpu.VMEM if _HAS_PLTPU else None
    kw = {"memory_space": memspace} if memspace is not None else {}
    q_spec = pl.BlockSpec((1, 1, Lq, D), lambda b, h: (b, h, 0, 0), **kw)
    kv_spec = pl.BlockSpec((1, 1, Lk, D), lambda b, h: (b, h, 0, 0), **kw)
    return pl.pallas_call(
        functools.partial(_rect_kernel, scale=D ** -0.5),
        grid=(B, H),
        in_specs=[q_spec, kv_spec, kv_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, Lq, D), q.dtype),
        interpret=interpret,
    )(q, k, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def pallas_rect_attention(q, k, v, interpret=False):
    """Fused bias-free attention; q (B,H,Lq,D) vs k,v (B,H,Lk,D)."""
    return _fwd_rect(q, k, v, interpret)


def _rect_ref_forward(q, k, v):
    scale = q.shape[-1] ** -0.5
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    w = jax.nn.softmax(s.astype(jnp.float32) * scale, axis=-1)
    return w, jnp.einsum("bhqk,bhkd->bhqd", w.astype(v.dtype), v)


def _rect_fwd_rule(q, k, v, interpret=False):
    return _fwd_rect(q, k, v, interpret), (q, k, v)


def _rect_bwd_rule(interpret, res, g):
    q, k, v = res
    w, _ = _rect_ref_forward(q, k, v)
    scale = q.shape[-1] ** -0.5
    w_v = w.astype(v.dtype)
    dv = jnp.einsum("bhqk,bhqd->bhkd", w_v, g)
    dw = jnp.einsum("bhqd,bhkd->bhqk", g, v).astype(jnp.float32)
    ds = (w * (dw - jnp.sum(dw * w, axis=-1, keepdims=True))).astype(q.dtype)
    dq = jnp.einsum("bhqk,bhkd->bhqd", ds, k) * scale
    dk = jnp.einsum("bhqk,bhqd->bhkd", ds, q) * scale
    return dq, dk, dv


pallas_rect_attention.defvjp(_rect_fwd_rule, _rect_bwd_rule)


def _bias_spec_for(bias, L, kw):
    """BlockSpec that reads a shared (1,1,L,L) bias in place instead of
    materializing a (B,1,L,L) broadcast copy in HBM."""
    if bias.shape[0] == 1:
        return pl.BlockSpec((1, 1, L, L), lambda b, h: (0, 0, 0, 0), **kw)
    return pl.BlockSpec((1, 1, L, L), lambda b, h: (b, 0, 0, 0), **kw)


def _fwd_pallas(q, k, v, bias, interpret=False):
    B, H, L, D = q.shape
    scale = D ** -0.5
    bias = bias.astype(jnp.float32)

    memspace = pltpu.VMEM if _HAS_PLTPU else None
    kw = {"memory_space": memspace} if memspace is not None else {}
    qkv_spec = pl.BlockSpec((1, 1, L, D), lambda b, h: (b, h, 0, 0), **kw)
    bias_spec = _bias_spec_for(bias, L, kw)
    return pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        grid=(B, H),
        in_specs=[qkv_spec, qkv_spec, qkv_spec, bias_spec],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, L, D), q.dtype),
        interpret=interpret,
    )(q, k, v, bias)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def pallas_attention(q, k, v, bias, interpret=False):
    """Fused attention: q,k,v (B,H,L,D); bias broadcastable (B|1,1,L,L).

    Forward runs the Pallas kernel; backward recomputes with XLA ops.
    """
    return _fwd_pallas(q, k, v, bias, interpret)


def _ref_forward(q, k, v, bias):
    scale = q.shape[-1] ** -0.5
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    s = s.astype(jnp.float32) * scale + bias.astype(jnp.float32)
    w = jax.nn.softmax(s, axis=-1)
    return w, jnp.einsum("bhqk,bhkd->bhqd", w.astype(v.dtype), v)


def _fwd_rule(q, k, v, bias, interpret=False):
    # Residuals are just the inputs: the backward recomputes the (L, L)
    # probabilities with XLA ops.  A probs-saving kernel variant was
    # measured slower end-to-end in training (64.9 vs 55.5 steps/s on
    # TPU v5e) — recompute is cheap at these lengths and the kernel
    # stays forward-only.
    return _fwd_pallas(q, k, v, bias, interpret), (q, k, v, bias)


def _bwd_rule(interpret, res, g):
    q, k, v, bias = res
    w, _ = _ref_forward(q, k, v, bias)
    scale = q.shape[-1] ** -0.5
    w_v = w.astype(v.dtype)
    dv = jnp.einsum("bhqk,bhqd->bhkd", w_v, g)
    dw = jnp.einsum("bhqd,bhkd->bhqk", g, v).astype(jnp.float32)
    ds = w * (dw - jnp.sum(dw * w, axis=-1, keepdims=True))
    ds = ds.astype(q.dtype)
    dq = jnp.einsum("bhqk,bhkd->bhqd", ds, k) * scale
    dk = jnp.einsum("bhqk,bhqd->bhkd", ds, q) * scale
    # bias is a static mask in every caller; zero cotangent keeps the
    # custom_vjp signature total without doing real work (DCE'd).
    return dq, dk, dv, jnp.zeros_like(bias)


pallas_attention.defvjp(_fwd_rule, _bwd_rule)
