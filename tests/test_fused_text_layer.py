"""Fused whole-layer text-tower kernel (ops/fused_text_layer.py) must
reproduce the XLA transformer exactly (fp32) / to bf16-reassociation
tolerance (bf16), including the row-padding and ragged-L mask-extension
plumbing, and the CoCoOp flattened eval path must match the vmapped
XLA path.

On-TPU numerics are gated by ops/selftest.py ("fused text layer
(408,16,512)"); these tests run the same kernel body in interpret mode
on CPU.  Measured on v5e: the fused path sits CLOSER to the fp32
reference than the XLA bf16 path (top-1 agreement 88/100 vs 72/100 at
random weights, BASELINE.md r5).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rpo_tpu.models.clip import ARCHS, cast_params, init_clip
from rpo_tpu.models.clip.layers import transformer
from rpo_tpu.models.clip.model import causal_mask
from rpo_tpu.ops import fused_text_layer as ftl


@pytest.fixture(scope="module")
def tiny():
    cfg = ARCHS["TINY"]
    params = init_clip(jax.random.PRNGKey(0), cfg)
    return cfg, params


@pytest.mark.parametrize("L", [16, 11])
def test_fused_tower_matches_transformer_fp32(tiny, L):
    """fp32 interpret mode is exact (reassociation-free comparison);
    L=11 exercises the ragged-L pad + causal-mask extension."""
    cfg, params = tiny
    t = params["text"]["blocks"]
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(13, L, cfg.text_width), jnp.float32)
    mask = causal_mask(L)
    ref = transformer(x, t, cfg.text_heads, mask[None, None])
    got = ftl.fused_text_tower(
        x, t, cfg.text_heads, mask, block_rows=4, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(ref), np.asarray(got), atol=1e-5, rtol=1e-5
    )


def test_fused_cocoop_logits_end_to_end(tiny, monkeypatch):
    """The flattened fused eval path inside cocoop_logits (chunked and
    unchunked) matches the vmapped XLA path to bf16-reassociation
    tolerance — pins the flatten/broadcast/EOT plumbing, not just the
    kernel."""
    from rpo_tpu.methods import cocoop, coop

    cfg, params_f32 = tiny
    params = cast_params(params_f32, jnp.bfloat16)
    n_cls = 6
    classnames = [f"thing {i}" for i in range(n_cls)]
    k_ctx, k_meta = jax.random.split(jax.random.PRNGKey(1))
    ctx_params, prefix, n_ctx = coop.init_ctx(
        k_ctx, params, cfg, n_cls, 2, False, ""
    )
    mp = {
        "ctx": ctx_params["ctx"],
        "meta_net": cocoop.init_meta_net(k_meta, cfg.embed_dim, cfg.text_width),
    }
    task = coop.make_task(cfg, classnames, n_ctx, False, "end", prefix)
    rng = np.random.RandomState(3)
    B = 4
    imf = jnp.asarray(rng.randn(B, cfg.embed_dim), jnp.float32)

    def run(fused, chunk):
        if fused:
            monkeypatch.setattr(ftl, "_INTERPRET", True)
            ctx_mgr = ftl.fused_text_scope(True)
        else:
            monkeypatch.setattr(ftl, "_INTERPRET", False)
            ctx_mgr = ftl.fused_text_scope(False)
        with ctx_mgr:
            out = cocoop.cocoop_logits(
                mp, params, task, None, chunk=chunk, image_features=imf
            )
        return np.asarray(out, np.float32)

    for chunk in (0, 2):
        ref = run(False, chunk)
        got = run(True, chunk)
        assert got.shape == (B, n_cls)
        scale = np.max(np.abs(ref))
        np.testing.assert_allclose(
            ref / scale, got / scale, atol=2e-2, rtol=0,
            err_msg=f"fused-vs-xla mismatch beyond bf16 band at chunk={chunk}",
        )


def test_fused_gate_off_on_cpu(monkeypatch):
    """Without the interpret hook the kernel must never engage on the CPU
    backend, even inside an enabled scope (Mosaic is TPU-only)."""
    monkeypatch.setattr(ftl, "_INTERPRET", False)
    with ftl.fused_text_scope(True):
        assert not ftl.use_fused_text()


def test_fused_tower_bf16_close_to_fp32(tiny):
    """The bf16 fused tower must stay within the XLA-bf16 path's own
    distance from the fp32 reference (x1.5 headroom) — the 'equal or
    better numerics' acceptance that gated the kernel (BASELINE.md r5)."""
    cfg, params = tiny
    t32 = params["text"]["blocks"]
    t16 = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), t32)
    rng = np.random.RandomState(0)
    L = 16
    x32 = jnp.asarray(rng.randn(13, L, cfg.text_width), jnp.float32)
    x16 = x32.astype(jnp.bfloat16)
    mask = causal_mask(L)
    ref32 = np.asarray(transformer(x32, t32, cfg.text_heads, mask[None, None]))
    xla16 = np.asarray(
        transformer(x16, t16, cfg.text_heads, mask[None, None]), np.float32
    )
    fused16 = np.asarray(
        ftl.fused_text_tower(
            x16, t16, cfg.text_heads, mask, block_rows=4, interpret=True
        ),
        np.float32,
    )
    xla_err = np.max(np.abs(xla16 - ref32))
    fused_err = np.max(np.abs(fused16 - ref32))
    assert fused_err <= 1.5 * xla_err + 1e-6, (fused_err, xla_err)
