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


def _softmax_attend(q, k, v, scale, bias=None):
    """ONE copy of the fused kernel-body math — QK^T -> (+bias) -> f32
    softmax -> @V on (G, L*, D) blocks — shared by every forward kernel
    variant (masked, rect, each half of the paired kernel), mirroring
    _attention_bwd_math on the backward side."""
    s = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    s = s * scale
    if bias is not None:
        s = s + bias
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    w = e / jnp.sum(e, axis=-1, keepdims=True)
    return jax.lax.dot_general(
        w.astype(v.dtype), v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale):
    # bias block (G|1, L, L) float32 — broadcasts over G when shared
    o = _softmax_attend(q_ref[:, 0], k_ref[:, 0], v_ref[:, 0], scale, bias_ref[:, 0])
    o_ref[:, 0] = o.astype(o_ref.dtype)


def _rect_kernel(q_ref, k_ref, v_ref, o_ref, *, scale):
    """Bias-free attention: q rows may outnumber k/v rows (the RPO eval
    tower: 221 query rows attend to the 197 frozen columns — the masked
    prompt columns are simply never materialized).  Each program handles
    a group of G batch elements (batched dot_general): one-(b,h)-per-
    program launches thousands of tiny programs whose DMA/launch overhead
    dominates (measured 1.5x slower at the RPO eval shape)."""
    o = _softmax_attend(q_ref[:, 0], k_ref[:, 0], v_ref[:, 0], scale)
    o_ref[:, 0] = o.astype(o_ref.dtype)


def _parallel_grid_params() -> dict:
    """Mark both grid dimensions independent (no cross-iteration state):
    lets Mosaic schedule/pipeline programs freely (~3% at the eval shape).
    Interpret mode and older jaxlibs may lack CompilerParams — omit then."""
    if not _HAS_PLTPU:
        return {}
    try:
        return {
            "compiler_params": pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel")
            )
        }
    except Exception:  # pragma: no cover
        return {}


def _vmem_kw() -> dict:
    """BlockSpec memory-space kwargs (VMEM where pltpu exists)."""
    return {"memory_space": pltpu.VMEM} if _HAS_PLTPU else {}


def _batch_group(B: int, limit: int = 10, itemsize: int = 2) -> int:
    """Largest divisor of B not exceeding `limit` (VMEM headroom at the
    RPO eval shape caps the per-program group around 10 in bf16).  The
    cap was calibrated for 2-byte elements; wider dtypes (fp32 parity
    runs) double every block, so scale the cap down accordingly."""
    limit = max(1, (limit * 2) // max(2, itemsize))
    for g in range(min(limit, B), 0, -1):
        if B % g == 0:
            return g
    return 1


def _fwd_rect(q, k, v, interpret=False):
    B, H, Lq, D = q.shape
    Lk = k.shape[2]
    G = _batch_group(B, itemsize=q.dtype.itemsize)
    kw = _vmem_kw()
    q_spec = pl.BlockSpec((G, 1, Lq, D), lambda b, h: (b, h, 0, 0), **kw)
    kv_spec = pl.BlockSpec((G, 1, Lk, D), lambda b, h: (b, h, 0, 0), **kw)
    return pl.pallas_call(
        functools.partial(_rect_kernel, scale=D ** -0.5),
        grid=(B // G, H),
        in_specs=[q_spec, kv_spec, kv_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, Lq, D), q.dtype),
        interpret=interpret,
        **({} if interpret else _parallel_grid_params()),
    )(q, k, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def pallas_rect_attention(q, k, v, interpret=False):
    """Fused bias-free attention; q (B,H,Lq,D) vs k,v (B,H,Lk,D)."""
    return _fwd_rect(q, k, v, interpret)


def _attention_bwd_math(q, k, v, bias, g):
    """Shared XLA softmax-recompute backward for every kernel variant
    (rect = bias None; the paired kernel calls it per 64-lane half) —
    ONE copy of the attention-gradient algebra to keep in sync."""
    scale = q.shape[-1] ** -0.5
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    s = s.astype(jnp.float32) * scale
    if bias is not None:
        s = s + bias.astype(jnp.float32)
    w = jax.nn.softmax(s, axis=-1)
    w_v = w.astype(v.dtype)
    dv = jnp.einsum("bhqk,bhqd->bhkd", w_v, g)
    dw = jnp.einsum("bhqd,bhkd->bhqk", g, v).astype(jnp.float32)
    ds = (w * (dw - jnp.sum(dw * w, axis=-1, keepdims=True))).astype(q.dtype)
    dq = jnp.einsum("bhqk,bhkd->bhqd", ds, k) * scale
    dk = jnp.einsum("bhqk,bhqd->bhkd", ds, q) * scale
    return dq, dk, dv


def _rect_fwd_rule(q, k, v, interpret=False):
    return _fwd_rect(q, k, v, interpret), (q, k, v)


def _rect_bwd_rule(interpret, res, g):
    q, k, v = res
    return _attention_bwd_math(q, k, v, None, g)


pallas_rect_attention.defvjp(_rect_fwd_rule, _rect_bwd_rule)


# ---------------------------------------------------------------------------
# Paired-head rect attention: two 64-wide heads share one 128-lane block
# ---------------------------------------------------------------------------

def _rect_pair_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, half):
    """Like _rect_kernel but each "head" is a PAIR of real heads packed
    along the 128-lane dimension ((..., 2*half) with half=64): head_dim 64
    leaves every (sublane, 128-lane) tile — and therefore every DMA and
    MXU pass — half empty.  Packing pairs halves the data movement; the
    two halves are attended independently inside the program (their
    scores never mix).  Measured 3.5x over the per-(b,h) kernel at the
    RPO eval shape (100, 12, 221, 197, 64) on TPU v5e."""
    q = q_ref[:, 0]  # (G, Lq, 2*half)
    k = k_ref[:, 0]  # (G, Lk, 2*half)
    v = v_ref[:, 0]
    outs = [
        _softmax_attend(
            q[:, :, h * half : (h + 1) * half],
            k[:, :, h * half : (h + 1) * half],
            v[:, :, h * half : (h + 1) * half],
            scale,
        )
        for h in (0, 1)
    ]
    o_ref[:, 0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def _fwd_rect_paired(q2, k2, v2, half, interpret=False):
    B, H2, Lq, D2 = q2.shape
    Lk = k2.shape[2]
    G = _batch_group(B, itemsize=q2.dtype.itemsize)
    kw = _vmem_kw()
    q_spec = pl.BlockSpec((G, 1, Lq, D2), lambda b, h: (b, h, 0, 0), **kw)
    kv_spec = pl.BlockSpec((G, 1, Lk, D2), lambda b, h: (b, h, 0, 0), **kw)
    return pl.pallas_call(
        functools.partial(_rect_pair_kernel, scale=half ** -0.5, half=half),
        grid=(B // G, H2),
        in_specs=[q_spec, kv_spec, kv_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((B, H2, Lq, D2), q2.dtype),
        interpret=interpret,
        **({} if interpret else _parallel_grid_params()),
    )(q2, k2, v2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def pallas_rect_attention_paired(q2, k2, v2, half=64, interpret=False):
    """Bias-free attention on the PAIRED-HEAD layout: q2 (B, H/2, Lq,
    2*half), k2/v2 (B, H/2, Lk, 2*half), where real head 2i occupies
    lanes [:half] of pair-head i and real head 2i+1 lanes [half:].  The
    caller produces this layout for free by treating head pairs as one
    128-wide head in its projection einsums (ops/attention.py)."""
    return _fwd_rect_paired(q2, k2, v2, half, interpret)


def _rect_paired_fwd_rule(q2, k2, v2, half, interpret=False):
    return _fwd_rect_paired(q2, k2, v2, half, interpret), (q2, k2, v2)


def _rect_paired_bwd_rule(half, interpret, res, g):
    q2, k2, v2 = res
    grads = [
        _attention_bwd_math(
            q2[..., h * half : (h + 1) * half],
            k2[..., h * half : (h + 1) * half],
            v2[..., h * half : (h + 1) * half],
            None,
            g[..., h * half : (h + 1) * half],
        )
        for h in (0, 1)
    ]
    return tuple(
        jnp.concatenate([grads[0][i], grads[1][i]], axis=-1) for i in range(3)
    )


pallas_rect_attention_paired.defvjp(_rect_paired_fwd_rule, _rect_paired_bwd_rule)


def _bias_spec_for(bias, G, L, kw):
    """BlockSpec that reads a shared (1,1,L,L) bias in place instead of
    materializing a (B,1,L,L) broadcast copy in HBM."""
    if bias.shape[0] == 1:
        return pl.BlockSpec((1, 1, L, L), lambda b, h: (0, 0, 0, 0), **kw)
    return pl.BlockSpec((G, 1, L, L), lambda b, h: (b, 0, 0, 0), **kw)


def _fwd_pallas(q, k, v, bias, interpret=False):
    B, H, L, D = q.shape
    scale = D ** -0.5
    bias = bias.astype(jnp.float32)
    # per-batch biases ride in (G,1,L,L) blocks; they are f32 (L,L) maps,
    # so cap the group harder than the bias-free rect kernel
    G = _batch_group(
        B, limit=4 if bias.shape[0] != 1 else 10, itemsize=q.dtype.itemsize
    )

    kw = _vmem_kw()
    qkv_spec = pl.BlockSpec((G, 1, L, D), lambda b, h: (b, h, 0, 0), **kw)
    bias_spec = _bias_spec_for(bias, G, L, kw)
    return pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        grid=(B // G, H),
        in_specs=[qkv_spec, qkv_spec, qkv_spec, bias_spec],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, L, D), q.dtype),
        interpret=interpret,
        **({} if interpret else _parallel_grid_params()),
    )(q, k, v, bias)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def pallas_attention(q, k, v, bias, interpret=False):
    """Fused attention: q,k,v (B,H,L,D); bias broadcastable (B|1,1,L,L).

    Forward runs the Pallas kernel; backward recomputes with XLA ops.
    """
    return _fwd_pallas(q, k, v, bias, interpret)


def _fwd_rule(q, k, v, bias, interpret=False):
    # Residuals are just the inputs: the backward recomputes the (L, L)
    # probabilities with XLA ops.  A probs-saving kernel variant was
    # measured slower end-to-end in training (64.9 vs 55.5 steps/s on
    # TPU v5e) — recompute is cheap at these lengths and the kernel
    # stays forward-only.
    return _fwd_pallas(q, k, v, bias, interpret), (q, k, v, bias)


def _bwd_rule(interpret, res, g):
    q, k, v, bias = res
    dq, dk, dv = _attention_bwd_math(q, k, v, bias, g)
    # bias is a static mask in every caller; zero cotangent keeps the
    # custom_vjp signature total without doing real work (DCE'd).
    return dq, dk, dv, jnp.zeros_like(bias)


pallas_attention.defvjp(_fwd_rule, _bwd_rule)
