"""Fused whole-transformer-layer Pallas kernel for tiny-L text towers.

Motivation (BASELINE.md r3 CoCoOp close-out): CoCoOp eval runs n_cls
text towers PER IMAGE at L = text_len (~16 post-truncation).  The XLA
lowering issues ~15 small ops per layer body, and at these shapes each
fusion costs far more in dispatch/latency than its arithmetic
(residual-add fusions alone measured 23 ms/step, f32 score/softmax
fusions 18 ms/step at batch 100) — the step is per-op-latency bound,
not FLOP bound.  The earlier per-(b,h)-program Pallas attention kernel
LOSES here (the 128-lane tile pads ~8x dead lanes at L~16, BASELINE.md
scope-split note); this kernel instead fuses the ENTIRE residual block
(LN1 -> QKV -> per-head attention -> out-proj -> residual -> LN2 ->
MLP -> residual) into ONE program per row-block, so per-layer op count
drops ~15x and every intermediate lives in VMEM.

Numerics mirror the XLA path exactly at every cast point
(models/clip/layers.py, ops/attention.py): LayerNorm and softmax in
float32 (the parity contract, reference /root/reference/clip/model.py:
153-164), matmuls f32-accumulated then cast to the activation dtype,
QuickGELU in the activation dtype.

Forward-only: the consumer is the CoCoOp EVAL path (the train path uses
exact gradient accumulation and never traces this kernel).
"""
from __future__ import annotations

import contextlib as _contextlib
import functools
import os as _os
import threading as _threading

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu is only importable where TPU support exists
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False


_TLS = _threading.local()
_ENV = _os.environ.get("RPO_TPU_FUSED_TEXT", "")
# interpret mode runs the kernel body as plain JAX ops (any backend) —
# the CPU test hook for the end-to-end fused path
_INTERPRET = _os.environ.get("RPO_TPU_FUSED_TEXT_INTERPRET", "") == "1"


def _flag() -> bool:
    return getattr(_TLS, "enabled", False)


def _interpret() -> bool:
    return _INTERPRET


@_contextlib.contextmanager
def fused_text_scope(enabled: bool = True):
    """Enable the fused text-layer kernel for ops *traced* inside the
    scope by this thread (same trace-time semantics as
    pallas_attention_scope)."""
    if _ENV in ("0", "1"):
        yield
        return
    prev = _flag()
    _TLS.enabled = enabled
    try:
        yield
    finally:
        _TLS.enabled = prev


def use_fused_text() -> bool:
    if _ENV == "0":
        return False
    from rpo_tpu.parallel.tp import current_tp_scope

    if current_tp_scope() is not None:
        return False  # no GSPMD partitioning rule for the custom call
    if jax.default_backend() in ("cpu",) and not _interpret():
        return False  # Mosaic is TPU-only (unless interpreting)
    if _ENV == "1":
        return True
    return _flag()


def _layer_kernel(
    x_ref, mask_ref,
    ln1s, ln1b, wq, bq, wk, bk, wv, bv, wout, bout,
    ln2s, ln2b, wfc, bfc, wproj, bproj,
    o_ref, *, n_heads, eps,
):
    xb = x_ref[...]  # (Nb, L, d) activation dtype
    Nb, L, d = xb.shape
    dh = d // n_heads
    dtype = xb.dtype

    def ln(x32, s_ref, b_ref):
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        normed = (x32 - mean) * jax.lax.rsqrt(var + eps)
        return (
            normed * s_ref[...].astype(jnp.float32)
            + b_ref[...].astype(jnp.float32)
        )

    def proj(y2, w_ref, b_ref):
        out = jnp.dot(
            y2, w_ref[...], preferred_element_type=jnp.float32
        ).astype(dtype)
        return out + b_ref[...].astype(dtype)

    # --- attention half: x + out_proj(attend(LN1(x))) ---
    y = ln(xb.astype(jnp.float32), ln1s, ln1b).astype(dtype)
    y2 = y.reshape(Nb * L, d)
    q = proj(y2, wq, bq).reshape(Nb, L, d)
    k = proj(y2, wk, bk).reshape(Nb, L, d)
    v = proj(y2, wv, bv).reshape(Nb, L, d)
    scale = dh ** -0.5
    bias = mask_ref[...].astype(jnp.float32)  # (L, L) additive causal
    heads = []
    for h in range(n_heads):
        sl = slice(h * dh, (h + 1) * dh)
        s = jax.lax.dot_general(
            q[:, :, sl], k[:, :, sl],
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        s = s * scale + bias[None]
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
    x2 = xb.reshape(Nb * L, d) + proj(attn, wout, bout)

    # --- MLP half: x + proj(QuickGELU(fc(LN2(x)))) ---
    z = ln(x2.astype(jnp.float32), ln2s, ln2b).astype(dtype)
    hdn = proj(z, wfc, bfc)
    # QuickGELU in the activation dtype.  Spelled out with explicit-dtype
    # constants: Mosaic rejects the weak-f32 scalar broadcasts jax.nn.
    # sigmoid's lowering emits into a bf16 vector ('vector.broadcast'
    # element-type verification).
    one = jnp.asarray(1.0, dtype)
    sig = one / (one + jnp.exp(-(jnp.asarray(1.702, dtype) * hdn)))
    hdn = hdn * sig
    x2 = x2 + proj(hdn, wproj, bproj)
    o_ref[...] = x2.reshape(Nb, L, d)


def _pad_rows(n: int, block: int) -> int:
    return (n + block - 1) // block * block


def fused_text_layer(
    x: jax.Array,
    blk: dict,
    n_heads: int,
    mask: jax.Array,
    block_rows: int = 64,
    interpret: bool = None,
    eps: float = 1e-5,
) -> jax.Array:
    """One residual block (layers.residual_block) as a single Pallas
    program per row-block.  x: (N, L, d); blk: one layer's params
    ({ln_1, attn, ln_2, mlp}); mask: additive (L, L) float32 (causal)."""
    if interpret is None:
        interpret = _interpret()
    N, L, d = x.shape
    a, m = blk["attn"], blk["mlp"]
    dt = x.dtype
    wqkv, bqkv = a["qkv_w"].astype(dt), a["qkv_b"].astype(dt)

    Np = _pad_rows(N, block_rows)
    if Np != N:
        x = jnp.pad(x, ((0, Np - N), (0, 0), (0, 0)))

    kw = {"memory_space": pltpu.VMEM} if (_HAS_PLTPU and not interpret) else {}
    x_spec = pl.BlockSpec((block_rows, L, d), lambda i: (i, 0, 0), **kw)

    def const2(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape), **kw)

    row = lambda t: t.reshape(1, -1).astype(dt)
    weights = [
        blk["ln_1"]["scale"], blk["ln_1"]["bias"],
        wqkv[:, :d], bqkv[:d],
        wqkv[:, d:2 * d], bqkv[d:2 * d],
        wqkv[:, 2 * d:], bqkv[2 * d:],
        a["out_w"].astype(dt), a["out_b"],
        blk["ln_2"]["scale"], blk["ln_2"]["bias"],
        m["fc_w"].astype(dt), m["fc_b"],
        m["proj_w"].astype(dt), m["proj_b"],
    ]
    weights = [w if w.ndim == 2 else row(w) for w in weights]
    in_specs = [x_spec, const2(mask.shape)] + [const2(w.shape) for w in weights]

    params = {}
    if _HAS_PLTPU and not interpret:
        try:
            params["compiler_params"] = pltpu.CompilerParams(
                dimension_semantics=("parallel",)
            )
        except Exception:  # pragma: no cover
            pass
    out = pl.pallas_call(
        functools.partial(_layer_kernel, n_heads=n_heads, eps=eps),
        grid=(Np // block_rows,),
        in_specs=in_specs,
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct((Np, L, d), x.dtype),
        interpret=interpret,
        **params,
    )(x, mask.astype(jnp.float32), *weights)
    return out[:N] if Np != N else out


def fused_text_tower(
    x: jax.Array,
    stacked_blocks: dict,
    n_heads: int,
    mask: jax.Array,
    block_rows: int = 64,
    interpret: bool = None,
) -> jax.Array:
    """The full text transformer (layers.transformer) with the fused
    whole-layer kernel as the scan body.  x: (N, L, d); mask: additive
    causal (L, L) f32.  L is padded to the f32 sublane multiple (8) —
    exact under the causal mask: padded key columns sit at j >= L > i
    for every real query row i, so they are always masked; padded query
    rows are dead compute, sliced off on return."""
    if interpret is None:
        interpret = _interpret()
    N, L, d = x.shape
    Lp = (L + 7) // 8 * 8
    if Lp != L:
        from rpo_tpu.models.clip.model import causal_mask

        x = jnp.pad(x, ((0, 0), (0, Lp - L), (0, 0)))
        mask = causal_mask(Lp).at[:L, :L].set(mask.astype(jnp.float32))
    else:
        mask = mask.astype(jnp.float32)

    def step(carry, layer_params):
        return (
            fused_text_layer(
                carry, layer_params, n_heads, mask,
                block_rows=block_rows, interpret=interpret,
            ),
            None,
        )

    out, _ = jax.lax.scan(step, x, stacked_blocks)
    return out[:, :L] if Lp != L else out
