"""Numerical parity of the JAX CLIP vs the torch reference (fp32).

The torch reference model (/root/reference/clip/model.py) is imported by
file path and used as the oracle: a tiny CLIP is randomly initialized in
torch, its state dict converted via rpo_tpu's converter, and outputs are
compared on fixed inputs — per stage and end-to-end (SURVEY.md §4).
"""
import importlib.util

import numpy as np
import pytest

import jax.numpy as jnp

from rpo_tpu.models.clip import (
    CLIPConfig,
    causal_mask,
    clip_forward,
    convert_state_dict,
    encode_image,
    encode_text,
    infer_config,
)

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref_clip_module():
    spec = importlib.util.spec_from_file_location(
        "_ref_clip_model", "/root/reference/clip/model.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def tiny_pair(ref_clip_module):
    torch.manual_seed(0)
    model = ref_clip_module.CLIP(
        embed_dim=64,
        image_resolution=32,
        vision_layers=2,
        vision_width=64,
        vision_patch_size=16,
        context_length=77,
        vocab_size=49408,
        transformer_width=128,
        transformer_heads=2,
        transformer_layers=2,
    ).float().eval()
    sd = {k: v for k, v in model.state_dict().items()}
    params = convert_state_dict(sd)
    cfg = infer_config({k: v.numpy() for k, v in sd.items()})
    return model, params, cfg


def test_infer_config(tiny_pair):
    _, _, cfg = tiny_pair
    assert cfg == CLIPConfig(
        embed_dim=64,
        image_resolution=32,
        vision_layers=2,
        vision_width=64,
        vision_patch_size=16,
        context_length=77,
        vocab_size=49408,
        text_width=128,
        text_heads=2,
        text_layers=2,
    )


def _rand_images(n=3, res=32):
    rng = np.random.RandomState(42)
    return rng.randn(n, res, res, 3).astype(np.float32)


def _rand_tokens(n=5):
    rng = np.random.RandomState(7)
    toks = np.zeros((n, 77), dtype=np.int64)
    for i in range(n):
        length = rng.randint(3, 20)
        toks[i, 0] = 49406
        toks[i, 1:length] = rng.randint(1, 49000, size=length - 1)
        toks[i, length] = 49407
    return toks


def test_encode_image_parity(tiny_pair):
    model, params, cfg = tiny_pair
    imgs = _rand_images(res=cfg.image_resolution)
    with torch.no_grad():
        ref = model.encode_image(torch.from_numpy(imgs).permute(0, 3, 1, 2)).numpy()
    ours = np.asarray(encode_image(params, cfg, jnp.asarray(imgs)))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_encode_text_parity(tiny_pair):
    model, params, cfg = tiny_pair
    toks = _rand_tokens()
    with torch.no_grad():
        ref = model.encode_text(torch.from_numpy(toks)).numpy()
    ours = np.asarray(encode_text(params, cfg, jnp.asarray(toks.astype(np.int32))))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_clip_forward_parity(tiny_pair):
    model, params, cfg = tiny_pair
    imgs = _rand_images(n=4, res=cfg.image_resolution)
    toks = _rand_tokens(n=6)
    with torch.no_grad():
        ref_i, ref_t = model(
            torch.from_numpy(imgs).permute(0, 3, 1, 2), torch.from_numpy(toks)
        )
    ours_i, ours_t = clip_forward(
        params, cfg, jnp.asarray(imgs), jnp.asarray(toks.astype(np.int32))
    )
    np.testing.assert_allclose(np.asarray(ours_i), ref_i.numpy(), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(ours_t), ref_t.numpy(), rtol=1e-3, atol=1e-3)


def test_masked_text_transformer_matches_reference_mask_semantics(tiny_pair):
    """Running our text tower with an explicit causal bias must equal the
    built-in causal path — validates the runtime-mask plumbing that the
    reference added to upstream CLIP (model.py:202-207)."""
    from rpo_tpu.models.clip import text_embed, text_transformer_run
    from rpo_tpu.models.clip.layers import layer_norm

    model, params, cfg = tiny_pair
    toks = jnp.asarray(_rand_tokens().astype(np.int32))
    t = params["text"]
    x = text_embed(t, toks)
    bias = causal_mask(cfg.context_length)[None, None]
    out = text_transformer_run(t, cfg, x, bias)
    out = layer_norm(out, t["ln_final"])

    with torch.no_grad():
        ref_x = model.token_embedding(torch.from_numpy(np.asarray(toks, np.int64)))
        ref_x = ref_x + model.positional_embedding
        ref_x = ref_x.permute(1, 0, 2)
        ref_x = model.transformer(ref_x)
        ref_x = ref_x.permute(1, 0, 2)
        ref_x = model.ln_final(ref_x)
    np.testing.assert_allclose(np.asarray(out), ref_x.numpy(), rtol=1e-4, atol=1e-4)


def test_bf16_mode_close(tiny_pair):
    """bf16 params stay within bf16-scale error of the fp32 oracle."""
    from rpo_tpu.models.clip import cast_params

    model, params, cfg = tiny_pair
    imgs = _rand_images(res=cfg.image_resolution)
    with torch.no_grad():
        ref = model.encode_image(torch.from_numpy(imgs).permute(0, 3, 1, 2)).numpy()
    bf = cast_params(params, jnp.bfloat16)
    ours = np.asarray(encode_image(bf, cfg, jnp.asarray(imgs))).astype(np.float32)
    # bf16 has ~3 decimal digits; feature magnitudes are O(1)
    np.testing.assert_allclose(ours, ref, rtol=0.1, atol=0.12)
