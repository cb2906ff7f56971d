"""Widened checkpoint intake (VERDICT r3 "do this" #5): HF-transformers
CLIPModel state dicts, open_clip training-checkpoint envelopes, and
safetensors files must all load into the same parameter pytree as the
OpenAI-layout pickle the reference downloads
(/root/reference/clip/clip.py:29-36) — so ANY locally-present ViT-B/16
checkpoint variant unlocks the real-weights accuracy stage.

The HF fixture here is synthetic (zero egress): an OpenAI-layout state
dict is generated for the TINY config and the HF layout is derived from
it by the exact inverse of the documented HF->OpenAI conversion (split
q/k/v projections, transposed nn.Linear projection heads,
text_model./vision_model. trees, the sic ``pre_layrnorm`` spelling,
position_ids buffers).
"""
from __future__ import annotations

import dataclasses

import numpy as np
import pytest

from rpo_tpu.models.clip import TINY
from rpo_tpu.models.clip.convert import (
    convert_state_dict,
    infer_config,
    normalize_state_dict,
    remap_hf_state_dict,
)


def _openai_tiny_sd(seed: int = 0) -> dict:
    """Random OpenAI-layout ViT state dict at the TINY config."""
    r = np.random.RandomState(seed)
    cfg = TINY
    W, Wt, E, P = cfg.vision_width, cfg.text_width, cfg.embed_dim, cfg.vision_patch_size

    def a(*shape):
        return r.randn(*shape).astype(np.float32) * 0.05

    sd = {
        "visual.conv1.weight": a(W, 3, P, P),
        "visual.class_embedding": a(W),
        "visual.positional_embedding": a(cfg.vision_seq_len, W),
        "visual.ln_pre.weight": a(W),
        "visual.ln_pre.bias": a(W),
        "visual.ln_post.weight": a(W),
        "visual.ln_post.bias": a(W),
        "visual.proj": a(W, E),
        "token_embedding.weight": a(cfg.vocab_size, Wt),
        "positional_embedding": a(cfg.context_length, Wt),
        "ln_final.weight": a(Wt),
        "ln_final.bias": a(Wt),
        "text_projection": a(Wt, E),
        "logit_scale": np.full((), np.log(1 / 0.07), np.float32),
    }

    def blocks(prefix, n, D):
        for i in range(n):
            p = f"{prefix}.{i}"
            sd[f"{p}.ln_1.weight"] = a(D)
            sd[f"{p}.ln_1.bias"] = a(D)
            sd[f"{p}.attn.in_proj_weight"] = a(3 * D, D)
            sd[f"{p}.attn.in_proj_bias"] = a(3 * D)
            sd[f"{p}.attn.out_proj.weight"] = a(D, D)
            sd[f"{p}.attn.out_proj.bias"] = a(D)
            sd[f"{p}.ln_2.weight"] = a(D)
            sd[f"{p}.ln_2.bias"] = a(D)
            sd[f"{p}.mlp.c_fc.weight"] = a(4 * D, D)
            sd[f"{p}.mlp.c_fc.bias"] = a(4 * D)
            sd[f"{p}.mlp.c_proj.weight"] = a(D, 4 * D)
            sd[f"{p}.mlp.c_proj.bias"] = a(D)

    blocks("visual.transformer.resblocks", cfg.vision_layers, W)
    blocks("transformer.resblocks", cfg.text_layers, Wt)
    return sd


def _hf_from_openai(sd: dict) -> dict:
    """Inverse of remap_hf_state_dict: OpenAI layout -> HF CLIPModel keys."""
    hf = {
        "text_model.embeddings.token_embedding.weight": sd["token_embedding.weight"],
        "text_model.embeddings.position_embedding.weight": sd["positional_embedding"],
        "text_model.final_layer_norm.weight": sd["ln_final.weight"],
        "text_model.final_layer_norm.bias": sd["ln_final.bias"],
        "text_projection.weight": sd["text_projection"].T.copy(),
        "vision_model.embeddings.class_embedding": sd["visual.class_embedding"],
        "vision_model.embeddings.patch_embedding.weight": sd["visual.conv1.weight"],
        "vision_model.embeddings.position_embedding.weight": sd[
            "visual.positional_embedding"
        ],
        # sic: the attribute HF ships is "pre_layrnorm"
        "vision_model.pre_layrnorm.weight": sd["visual.ln_pre.weight"],
        "vision_model.pre_layrnorm.bias": sd["visual.ln_pre.bias"],
        "vision_model.post_layernorm.weight": sd["visual.ln_post.weight"],
        "vision_model.post_layernorm.bias": sd["visual.ln_post.bias"],
        "visual_projection.weight": sd["visual.proj"].T.copy(),
        "logit_scale": sd["logit_scale"],
        # registered buffers real HF checkpoints carry; must be ignored
        "text_model.embeddings.position_ids": np.arange(77)[None].astype(np.int64),
        "vision_model.embeddings.position_ids": np.arange(5)[None].astype(np.int64),
    }

    def blocks(src, dst):
        i = 0
        while f"{src}.{i}.ln_1.weight" in sd:
            s, d = f"{src}.{i}", f"{dst}.{i}"
            D = sd[f"{s}.ln_1.weight"].shape[0]
            hf[f"{d}.layer_norm1.weight"] = sd[f"{s}.ln_1.weight"]
            hf[f"{d}.layer_norm1.bias"] = sd[f"{s}.ln_1.bias"]
            hf[f"{d}.layer_norm2.weight"] = sd[f"{s}.ln_2.weight"]
            hf[f"{d}.layer_norm2.bias"] = sd[f"{s}.ln_2.bias"]
            for j, p in enumerate("qkv"):
                hf[f"{d}.self_attn.{p}_proj.weight"] = sd[
                    f"{s}.attn.in_proj_weight"
                ][j * D : (j + 1) * D]
                hf[f"{d}.self_attn.{p}_proj.bias"] = sd[f"{s}.attn.in_proj_bias"][
                    j * D : (j + 1) * D
                ]
            hf[f"{d}.self_attn.out_proj.weight"] = sd[f"{s}.attn.out_proj.weight"]
            hf[f"{d}.self_attn.out_proj.bias"] = sd[f"{s}.attn.out_proj.bias"]
            hf[f"{d}.mlp.fc1.weight"] = sd[f"{s}.mlp.c_fc.weight"]
            hf[f"{d}.mlp.fc1.bias"] = sd[f"{s}.mlp.c_fc.bias"]
            hf[f"{d}.mlp.fc2.weight"] = sd[f"{s}.mlp.c_proj.weight"]
            hf[f"{d}.mlp.fc2.bias"] = sd[f"{s}.mlp.c_proj.bias"]
            i += 1

    blocks("visual.transformer.resblocks", "vision_model.encoder.layers")
    blocks("transformer.resblocks", "text_model.encoder.layers")
    return hf


def _tree_equal(a, b):
    import jax

    la, ta = jax.tree_util.tree_flatten(a)
    lb, tb = jax.tree_util.tree_flatten(b)
    assert ta == tb
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_hf_remap_key_exact():
    sd = _openai_tiny_sd()
    back = remap_hf_state_dict(_hf_from_openai(sd))
    assert set(back) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(back[k], sd[k], err_msg=k)


def test_hf_state_dict_converts_to_identical_pytree():
    sd = _openai_tiny_sd()
    hf = _hf_from_openai(sd)
    norm = normalize_state_dict(hf)
    # infer_config derives text_heads = width // 64 (exact for every real
    # CLIP width; the TINY test fixture's 64-wide 2-head tower is the one
    # shape where that heuristic differs)
    cfg = infer_config(norm)
    assert dataclasses.replace(cfg, text_heads=TINY.text_heads) == TINY
    _tree_equal(convert_state_dict(sd, cfg=TINY), convert_state_dict(norm, cfg=cfg))


def test_open_clip_envelope_and_module_prefix():
    sd = _openai_tiny_sd()
    wrapped = {
        "epoch": 3,  # scalar metadata must be dropped, not converted
        "state_dict": {f"module.{k}": v for k, v in sd.items()},
    }
    norm = normalize_state_dict(wrapped)
    assert set(norm) == set(sd)
    _tree_equal(convert_state_dict(sd, cfg=TINY), convert_state_dict(norm, cfg=TINY))


def test_safetensors_file_intake(tmp_path):
    pytest.importorskip("safetensors")
    from safetensors.numpy import save_file

    from rpo_tpu.models.clip.convert import load_torch_state_dict

    sd = _openai_tiny_sd()
    hf = _hf_from_openai(sd)
    path = str(tmp_path / "model.safetensors")
    save_file(hf, path)
    norm = load_torch_state_dict(path)
    cfg = infer_config(norm)
    assert dataclasses.replace(cfg, text_heads=TINY.text_heads) == TINY
    _tree_equal(convert_state_dict(sd, cfg=TINY), convert_state_dict(norm, cfg=TINY))


def test_torch_training_checkpoint_envelope(tmp_path):
    torch = pytest.importorskip("torch")

    from rpo_tpu.models.clip.convert import load_torch_state_dict

    sd = _openai_tiny_sd()
    ckpt = {
        "epoch": 7,
        "state_dict": {f"module.{k}": torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
    }
    path = str(tmp_path / "open_clip_epoch_7.pt")
    torch.save(ckpt, path)
    norm = load_torch_state_dict(path)
    cfg = infer_config(norm)
    assert dataclasses.replace(cfg, text_heads=TINY.text_heads) == TINY
    _tree_equal(convert_state_dict(sd, cfg=TINY), convert_state_dict(norm, cfg=TINY))
