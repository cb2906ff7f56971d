"""Pallas fused attention vs the XLA reference path (interpret mode on CPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rpo_tpu.ops.attention import NEG_INF, dot_product_attention
from rpo_tpu.ops.pallas_attention import pallas_attention


def _inputs(B=3, H=2, L=10, D=8, seed=0):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(B, H, L, D), jnp.float32)
    k = jnp.asarray(rng.randn(B, H, L, D), jnp.float32)
    v = jnp.asarray(rng.randn(B, H, L, D), jnp.float32)
    # per-batch causal + column-block mask, like the RPO text mask
    i = np.arange(L)
    bias = np.where(i[None, :] > i[:, None], NEG_INF, 0.0).astype(np.float32)
    bias = np.tile(bias, (B, 1, 1, 1)).reshape(B, 1, L, L)
    for b in range(B):
        bias[b, 0, :, L - 1 - b :] = NEG_INF
    return q, k, v, jnp.asarray(bias)


def test_forward_matches_xla():
    q, k, v, bias = _inputs()
    ref = dot_product_attention(q, k, v, bias)
    out = pallas_attention(q, k, v, bias, True)  # interpret mode
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_backward_matches_xla():
    q, k, v, bias = _inputs(seed=1)

    def loss_pallas(q, k, v):
        return jnp.sum(pallas_attention(q, k, v, bias, True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(dot_product_attention(q, k, v, bias) ** 2)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_rect_forward_matches_xla():
    """Bias-free rectangular kernel == masked attention with the last
    columns blocked (the RPO eval vision tower)."""
    from rpo_tpu.ops.pallas_attention import pallas_rect_attention

    q, k, v, _ = _inputs(seed=3)
    Lk = 7  # only the first 7 rows contribute keys/values
    out = pallas_rect_attention(q, k[:, :, :Lk], v[:, :, :Lk], True)
    L = q.shape[2]
    bias = np.zeros((1, 1, L, L), np.float32)
    bias[..., Lk:] = NEG_INF
    ref = dot_product_attention(q, k, v, jnp.asarray(bias))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_rect_backward_matches_xla():
    from rpo_tpu.ops.pallas_attention import pallas_rect_attention

    q, k, v, _ = _inputs(seed=4)
    kr, vr = k[:, :, :6], v[:, :, :6]

    def loss_pallas(q, kr, vr):
        return jnp.sum(pallas_rect_attention(q, kr, vr, True) ** 2)

    def loss_ref(q, kr, vr):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, kr) * (q.shape[-1] ** -0.5)
        w = jax.nn.softmax(s.astype(jnp.float32), axis=-1)
        return jnp.sum(jnp.einsum("bhqk,bhkd->bhqd", w.astype(vr.dtype), vr) ** 2)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, kr, vr)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, kr, vr)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_rect_batched_groups():
    """The rect kernel groups batch elements per program (_batch_group);
    a batch needing G>1 must give identical results to per-element."""
    from rpo_tpu.ops.pallas_attention import _batch_group, pallas_rect_attention

    assert _batch_group(100) == 10
    assert _batch_group(7) == 7
    assert _batch_group(13) == 1
    q, k, v, _ = _inputs(B=6, seed=5)
    out = pallas_rect_attention(q, k, v, True)  # G=6 grouping
    per = jnp.concatenate(
        [
            pallas_rect_attention(q[i : i + 1], k[i : i + 1], v[i : i + 1], True)
            for i in range(6)
        ]
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(per), rtol=1e-6, atol=1e-6)


def _pair_heads(x):
    B, H, L, D = x.shape
    return x.transpose(0, 2, 1, 3).reshape(B, L, H // 2, 2 * D).transpose(0, 2, 1, 3)


def test_rect_paired_matches_unpaired():
    """Paired-head kernel == per-head rect attention after re-pairing."""
    from rpo_tpu.ops.pallas_attention import (
        pallas_rect_attention,
        pallas_rect_attention_paired,
    )

    q, k, v, _ = _inputs(B=4, H=4, L=12, D=8, seed=6)
    kr, vr = k[:, :, :9], v[:, :, :9]
    ref = pallas_rect_attention(q, kr, vr, True)
    out2 = pallas_rect_attention_paired(
        _pair_heads(q), _pair_heads(kr), _pair_heads(vr), 8, True
    )
    np.testing.assert_allclose(
        np.asarray(_pair_heads(ref)), np.asarray(out2), rtol=1e-5, atol=1e-5
    )


def test_rect_paired_backward():
    from rpo_tpu.ops.pallas_attention import pallas_rect_attention_paired

    q, k, v, _ = _inputs(B=2, H=2, L=10, D=8, seed=7)
    q2, k2, v2 = _pair_heads(q), _pair_heads(k[:, :, :6]), _pair_heads(v[:, :, :6])

    def loss_pallas(q2, k2, v2):
        return jnp.sum(pallas_rect_attention_paired(q2, k2, v2, 8, True) ** 2)

    def loss_ref(q2, k2, v2):
        outs = []
        for h in (0, 1):
            sl = slice(h * 8, (h + 1) * 8)
            s = jnp.einsum("bhqd,bhkd->bhqk", q2[..., sl], k2[..., sl]) * (8 ** -0.5)
            w = jax.nn.softmax(s.astype(jnp.float32), axis=-1)
            outs.append(jnp.einsum("bhqk,bhkd->bhqd", w.astype(v2.dtype), v2[..., sl]))
        return jnp.sum(jnp.concatenate(outs, axis=-1) ** 2)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(q2, k2, v2)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q2, k2, v2)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_rect_paired_in_tower():
    """multihead_attention_rect dispatches to the paired kernel when
    head_dim==64 and heads are even; results must match the XLA tower."""
    from rpo_tpu.ops import attention as attn_ops

    rng = np.random.RandomState(8)
    B, L, n_kv, D, H = 2, 9, 7, 128, 2  # head_dim = 64 -> paired path
    x = jnp.asarray(rng.randn(B, L, D), jnp.float32)
    params = {
        "qkv_w": jnp.asarray(rng.randn(D, 3 * D) * 0.05, jnp.float32),
        "qkv_b": jnp.asarray(rng.randn(3 * D) * 0.01, jnp.float32),
        "out_w": jnp.asarray(rng.randn(D, D) * 0.05, jnp.float32),
        "out_b": jnp.asarray(rng.randn(D) * 0.01, jnp.float32),
    }
    ref = attn_ops.multihead_attention_rect(x, params, H, n_kv)
    # force the pallas branch under interpret mode via monkeypatched flag
    import rpo_tpu.ops.pallas_attention as pa

    orig = pa.pallas_rect_attention_paired

    def interp(q2, k2, v2, half=64, interpret=False):
        return orig(q2, k2, v2, half, True)

    pa_flag = attn_ops.use_pallas_attention
    try:
        attn_ops.use_pallas_attention = lambda: True
        import rpo_tpu.ops.pallas_attention as pmod

        pmod.pallas_rect_attention_paired = interp
        out = attn_ops.multihead_attention_rect(x, params, H, n_kv)
    finally:
        attn_ops.use_pallas_attention = pa_flag
        pmod.pallas_rect_attention_paired = orig
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_unmasked_mha_paired_dispatch():
    """multihead_attention with bias=None and head_dim 64 routes through
    the paired rect path (n_kv = L) and must match the XLA result."""
    from rpo_tpu.ops import attention as attn_ops
    import rpo_tpu.ops.pallas_attention as pmod

    rng = np.random.RandomState(9)
    B, L, D, H = 2, 11, 128, 2
    x = jnp.asarray(rng.randn(B, L, D), jnp.float32)
    params = {
        "qkv_w": jnp.asarray(rng.randn(D, 3 * D) * 0.05, jnp.float32),
        "qkv_b": jnp.asarray(rng.randn(3 * D) * 0.01, jnp.float32),
        "out_w": jnp.asarray(rng.randn(D, D) * 0.05, jnp.float32),
        "out_b": jnp.asarray(rng.randn(D) * 0.01, jnp.float32),
    }
    ref = attn_ops.multihead_attention(x, params, H, None)
    orig = pmod.pallas_rect_attention_paired
    flag = attn_ops.use_pallas_attention
    try:
        attn_ops.use_pallas_attention = lambda: True
        pmod.pallas_rect_attention_paired = (
            lambda q2, k2, v2, half=64, interpret=False: orig(q2, k2, v2, half, True)
        )
        out = attn_ops.multihead_attention(x, params, H, None)
    finally:
        attn_ops.use_pallas_attention = flag
        pmod.pallas_rect_attention_paired = orig
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_pallas_scope_is_thread_local():
    """The compile-prewarm threads trace the train program (scope False)
    and the eval program (scope True) CONCURRENTLY; the trace-time flag
    must be per-thread or one thread's scope leaks into the other's
    jit-cached executable (the round-2 review's top finding)."""
    import threading
    import time as _time

    from rpo_tpu.ops import attention as attn_ops

    results = {}
    barrier = threading.Barrier(2)

    def eval_like():
        with attn_ops.pallas_attention_scope(True):
            barrier.wait()  # both threads inside their scopes
            _time.sleep(0.05)
            results["eval"] = attn_ops._flag()

    def train_like():
        barrier.wait()
        _time.sleep(0.05)
        results["train"] = attn_ops._flag()  # default: scope not entered

    ts = [threading.Thread(target=f) for f in (eval_like, train_like)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert results["eval"] is True
    assert results["train"] is False, "eval thread's scope leaked into the train thread"
    # and the scope restored the entering thread's default on exit
    assert attn_ops._flag() is False


def test_shared_bias_broadcast():
    q, k, v, _ = _inputs(seed=2)
    L = q.shape[2]
    bias = jnp.zeros((1, 1, L, L), jnp.float32)
    ref = dot_product_attention(q, k, v, bias)
    out = pallas_attention(q, k, v, bias, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)
