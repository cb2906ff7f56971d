"""Multi-head attention with additive bias — the hot op of the framework.

TPU-native design notes:
  - Layout is (batch, seq, dim) throughout; head split/merge are FOLDED
    INTO the projection matmuls' output layout (``_head_proj``) instead
    of torch-style LND permutes (cf. /root/reference/clip/model.py:235,351)
    — a reshape+transpose after the matmul lowers to a real layout copy
    on TPU (measured ~10% of the eval step).
  - Weights are stored as one (D, 3D) QKV block (torch checkpoint
    layout); the projection slices it into three per-head einsums so the
    head split is free (see _head_proj / _split_qkv).
  - Attention logits and softmax run in float32 regardless of the compute
    dtype (parity with fp16 CLIP requires stable softmax; bf16 logits lose
    too much).  The bias is additive, float32, broadcastable over
    (batch, heads, q_len, kv_len) — this replaces the reference's
    (bsz*heads, L, S) mask format (/root/reference/trainers/rpo.py:151).
  - Sequence lengths here are tiny (77 text / 197+K vision) so a plain
    XLA einsum attention is already compute-bound on the MXU; a fused
    Pallas kernel is provided in ``rpo_tpu.ops.pallas_attention`` and
    selected via ``use_pallas`` when shapes allow.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from rpo_tpu.parallel.tp import current_tp_scope, shard_heads

NEG_INF = -1e9  # finite -inf stand-in: keeps softmax NaN-free for fully masked rows

# Switch for the fused Pallas attention path (see pallas_attention.py).
# Measured on TPU v5e: faster on forward/eval paths, slower in training,
# so trainers enable it only around eval-path traces via
# ``pallas_attention_scope``.  The flag is THREAD-LOCAL: it is read at
# trace time, and the trainer's compile-prewarm traces the train program
# and the (Pallas-scoped) eval program on concurrent threads — a global
# would let one thread's scope leak into the other's trace and bake the
# wrong kernels into a jit-cached executable for the whole run.
# Env RPO_TPU_PALLAS_ATTENTION: "1" force-on everywhere, "0" force-off.
import contextlib as _contextlib
import os as _os
import threading as _threading

_ENV = _os.environ.get("RPO_TPU_PALLAS_ATTENTION", "")
_TLS = _threading.local()


def _flag() -> bool:
    return getattr(_TLS, "use_pallas", _ENV == "1")


def set_pallas_attention(enabled: bool) -> None:
    """Set the CALLING THREAD's default for the Pallas path.

    Like the scope, a no-op when $RPO_TPU_PALLAS_ATTENTION explicitly
    forces the path — the env override always wins."""
    if _ENV in ("0", "1"):
        return
    _TLS.use_pallas = enabled


def override_pallas_attention(mode) -> None:
    """Process-wide override, stronger than scopes: "0" forces the XLA
    path everywhere, "1" forces Pallas, None restores env control.

    Used by bench.py's hardened gate: when a kernel self-test check fails
    on device, the bench downgrades every subsequently-traced program to
    the XLA path and still reports numbers instead of dying (the
    BENCH_r03 failure mode)."""
    global _ENV
    _ENV = _os.environ.get("RPO_TPU_PALLAS_ATTENTION", "") if mode is None else mode


@_contextlib.contextmanager
def pallas_attention_scope(enabled: bool = True):
    """Enable/disable the Pallas path for ops *traced* inside the scope
    by the current thread (the flag is read at trace time; wrap the
    traced function body)."""
    if _ENV in ("0", "1"):  # explicit env overrides scopes
        yield
        return
    prev = _flag()
    _TLS.use_pallas = enabled
    try:
        yield
    finally:
        _TLS.use_pallas = prev


def use_pallas_attention() -> bool:
    if _ENV == "0":
        return False
    if current_tp_scope() is not None:
        # the GSPMD partitioner cannot split a Pallas custom call over the
        # tensor-parallel mesh axis; the XLA lowering is what it knows
        return False
    if jax.default_backend() in ("cpu",):
        return False  # the Mosaic kernels are TPU-only
    if _ENV == "1":
        return True  # explicit force-on beats any thread-local default
    return _flag()


def dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array] = None,
) -> jax.Array:
    """Scaled dot-product attention.

    q, k, v: (B, H, L, Dh).  bias: broadcastable to (B, H, Lq, Lk), float32
    additive.  Returns (B, H, Lq, Dh) in v.dtype.
    """
    # Pallas kernel coverage: (a) bias-free attention, square or
    # rectangular (the RPO eval tower: q over all rows, k/v over frozen
    # columns only); (b) square self-attention with a row-aligned bias.
    # The KV-cached text cross-attention (q_len=K, kv_len=max_seq,
    # row-broadcast bias) is a tiny contraction XLA handles well and
    # Pallas cannot tile (kv_len < 128, != q_len).
    if use_pallas_attention():
        if bias is None:
            from rpo_tpu.ops.pallas_attention import pallas_rect_attention

            return pallas_rect_attention(q, k, v)
        if (
            q.shape[-2] == k.shape[-2]
            and bias.shape[-2] == q.shape[-2]
            and bias.shape[-1] == k.shape[-2]  # a column-broadcast bias
            # (e.g. (B,1,L,1)) is legal for the XLA path but the kernel's
            # BlockSpec assumes a full (., ., L, L) bias array
            and bias.shape[1] == 1  # the kernel's bias block is pinned to
            # head 0 — a per-head bias must take the XLA path, not be
            # silently truncated to one head's bias for all heads
            and bias.shape[0] in (1, q.shape[0])  # any other batch dim is
            # non-broadcastable: XLA raises, but a Pallas BlockSpec would
            # clamp the out-of-range block index and silently reuse rows
        ):
            from rpo_tpu.ops.pallas_attention import pallas_attention

            return pallas_attention(q, k, v, bias)
    head_dim = q.shape[-1]
    scale = head_dim ** -0.5
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    logits = logits.astype(jnp.float32) * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", weights, v)


def _head_proj(x: jax.Array, w: jax.Array, b: jax.Array, n_heads: int) -> jax.Array:
    """(B, L, D) @ (D, H*Dh) -> (B, H, L, Dh) with the head split and
    transpose folded INTO the matmul output layout.

    A reshape+transpose after a plain (D, E) matmul lowers to a real
    layout copy on TPU (measured ~10% of the eval step); phrasing the
    projection as ``bld,dhk->bhlk`` lets XLA emit the target layout
    directly.
    """
    D = x.shape[-1]
    head_dim = w.shape[-1] // n_heads
    w = w.reshape(D, n_heads, head_dim)
    b = b.reshape(n_heads, head_dim)
    out = jnp.einsum(
        "bld,dhk->bhlk", x, w, preferred_element_type=jnp.float32
    ).astype(x.dtype)
    # under tensor_parallel_scope, pin the head axis to the model axis of
    # the mesh (each device computes H/tp heads; parallel/tp.py) — no-op
    # otherwise
    return shard_heads(out + b[None, :, None, :].astype(x.dtype))


def _split_qkv(x: jax.Array, params: dict, n_heads: int):
    """Slice the (D, 3D) QKV weight block into three head-layout
    projections -> per-head (B, H, L, Dh) triplet."""
    D = x.shape[-1]
    w, b = params["qkv_w"], params["qkv_b"]
    return tuple(
        _head_proj(x, w[:, i * D : (i + 1) * D], b[i * D : (i + 1) * D], n_heads)
        for i in range(3)
    )


def _out_proj(out: jax.Array, params: dict, dtype) -> jax.Array:
    """(B, H, L, Dh) attention output -> merged (B, L, D) projection,
    with the head merge folded into the matmul (see _head_proj)."""
    B, H, L, Dh = out.shape
    w = params["out_w"].reshape(H, Dh, H * Dh)
    return jnp.einsum(
        "bhlk,hkd->bld", out, w, preferred_element_type=jnp.float32
    ).astype(dtype) + params["out_b"].astype(dtype)


def multihead_attention(
    x: jax.Array,
    params: dict,
    n_heads: int,
    bias: Optional[jax.Array] = None,
) -> jax.Array:
    """Self-attention over x: (B, L, D) with fused QKV projection.

    params: {qkv_w: (D, 3D), qkv_b: (3D,), out_w: (D, D), out_b: (D,)}.
    Weight layout is (in, out) so application is ``x @ w`` (torch stores
    the transpose; the checkpoint converter handles it).
    """
    head_dim = x.shape[-1] // n_heads
    if (
        bias is None
        and use_pallas_attention()
        and head_dim == 64
        and n_heads % 2 == 0
    ):
        # unmasked self-attention == the rect tower with n_kv = L; rides
        # the paired-head kernel (zsclip / CoOp / LP image encoders)
        return multihead_attention_rect(x, params, n_heads, x.shape[1])
    q, k, v = _split_qkv(x, params, n_heads)
    out = dot_product_attention(q, k, v, bias)
    return _out_proj(out, params, x.dtype)


def multihead_attention_kv(
    x: jax.Array,
    params: dict,
    n_heads: int,
    bias: Optional[jax.Array] = None,
):
    """Like multihead_attention, but also returns the (k, v) heads
    ((B, H, L, Dh) each) so a caller can cache them for later
    cross-attention (the RPO frozen-text KV cache)."""
    q, k, v = _split_qkv(x, params, n_heads)
    out = dot_product_attention(q, k, v, bias)
    return _out_proj(out, params, x.dtype), k, v


def multihead_attention_rect(
    x: jax.Array,
    params: dict,
    n_heads: int,
    n_kv: int,
) -> jax.Array:
    """Self-attention where only the first ``n_kv`` rows contribute keys
    and values: queries for all L rows, k/v for x[:, :n_kv].  Equivalent
    to full self-attention under a mask blocking columns >= n_kv —
    without computing the masked K/V or materializing any bias.

    On the Pallas path with head_dim 64, HEAD PAIRS are projected as one
    128-lane "head" (the projection einsums emit the paired layout for
    free) and attended per-half inside the kernel: head_dim 64 leaves
    every 128-lane tile half empty, so pairing halves the attention DMA
    (measured 3.5x kernel / ~15% eval-step win on TPU v5e)."""
    D = x.shape[-1]
    w, b = params["qkv_w"], params["qkv_b"]
    head_dim = D // n_heads
    if use_pallas_attention() and head_dim == 64 and n_heads % 2 == 0:
        from rpo_tpu.ops.pallas_attention import pallas_rect_attention_paired

        H2 = n_heads // 2
        q2 = _head_proj(x, w[:, :D], b[:D], H2)
        k2 = _head_proj(x[:, :n_kv], w[:, D : 2 * D], b[D : 2 * D], H2)
        v2 = _head_proj(x[:, :n_kv], w[:, 2 * D :], b[2 * D :], H2)
        out = pallas_rect_attention_paired(q2, k2, v2, head_dim)
        return _out_proj(out, params, x.dtype)
    q = _head_proj(x, w[:, :D], b[:D], n_heads)
    k = _head_proj(x[:, :n_kv], w[:, D : 2 * D], b[D : 2 * D], n_heads)
    v = _head_proj(x[:, :n_kv], w[:, 2 * D :], b[2 * D :], n_heads)
    out = dot_product_attention(q, k, v, None)
    return _out_proj(out, params, x.dtype)


def multihead_attention_cached(
    x_q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    params: dict,
    n_heads: int,
    bias: Optional[jax.Array] = None,
) -> jax.Array:
    """Cross-attention of query rows x_q (B, Lq, D) against precomputed
    key/value heads k, v (B, H, Lk, Dh): only the q slice of the fused QKV
    projection is computed (1/3 of the projection FLOPs)."""
    D = x_q.shape[-1]
    q = _head_proj(x_q, params["qkv_w"][:, :D], params["qkv_b"][:D], n_heads)
    out = dot_product_attention(q, k.astype(x_q.dtype), v.astype(x_q.dtype), bias)
    return _out_proj(out, params, x_q.dtype)
