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


def test_shared_bias_broadcast():
    q, k, v, _ = _inputs(seed=2)
    L = q.shape[2]
    bias = jnp.zeros((1, 1, L, L), jnp.float32)
    ref = dot_product_attention(q, k, v, bias)
    out = pallas_attention(q, k, v, bias, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)
