"""User-level ``rpo_tpu.clip`` API vs the vendored reference package.

Reference surface: /root/reference/clip/clip.py —
``available_models`` (:24-26, keys of the ``_MODELS`` table :29-36),
``load`` (:86-99 contract), ``tokenize`` (:185-221), ``_transform``
eval preprocessing (:71-78); model call surface
/root/reference/clip/model.py:344-376.
"""
import os

import numpy as np
import pytest

from tests.oracle import make_small_torch_clip

jnp = pytest.importorskip("jax.numpy")


def test_available_models_matches_reference_table():
    from rpo_tpu import clip

    # clip/clip.py:29-36 _MODELS keys, same order
    assert clip.available_models() == [
        "RN50", "RN101", "RN50x4", "RN50x16", "ViT-B/32", "ViT-B/16",
    ]


def test_load_rejects_unknown_name_without_checkpoint(monkeypatch):
    from rpo_tpu import clip

    monkeypatch.delenv("CLIP_CHECKPOINT", raising=False)
    # a developer env with downloads enabled must not turn this into a
    # real 340 MB network fetch
    monkeypatch.delenv("RPO_TPU_ALLOW_DOWNLOAD", raising=False)
    monkeypatch.setenv("CLIP_CACHE_DIR", "/nonexistent-cache")
    with pytest.raises(FileNotFoundError):
        clip.load("ViT-B/16", require_weights=True)
    with pytest.raises(KeyError):
        clip.load("ViT-Z/99")


@pytest.fixture()
def oracle_checkpoint(tmp_path, monkeypatch):
    """Small torch CLIP saved as a reference-style .pt state dict and
    exposed via $CLIP_CHECKPOINT (the explicit-file resolution branch)."""
    import torch

    model, _, _ = make_small_torch_clip(seed=3)
    path = tmp_path / "oracle.pt"
    torch.save(model.state_dict(), str(path))
    monkeypatch.setenv("CLIP_CHECKPOINT", str(path))
    return model


def test_load_model_matches_torch_oracle(oracle_checkpoint):
    import torch

    from rpo_tpu import clip
    from rpo_tpu.tokenizer.bpe import eot_trim

    model, preprocess = clip.load("ViT-B/16")  # name cosmetic: explicit ckpt
    res = model.visual_input_resolution
    assert res == 32  # inferred from the state dict, not the name

    rng = np.random.RandomState(0)
    images = rng.rand(3, res, res, 3).astype(np.float32) * 2 - 1
    tokens = clip.tokenize(["a photo of a cat", "a diagram", "hello world"])

    with torch.no_grad():
        t_img = oracle_checkpoint.encode_image(
            torch.from_numpy(images.transpose(0, 3, 1, 2))
        ).numpy()
        t_txt = oracle_checkpoint.encode_text(
            torch.from_numpy(tokens).long()
        ).numpy()
        t_li, t_lt = oracle_checkpoint(
            torch.from_numpy(images.transpose(0, 3, 1, 2)),
            torch.from_numpy(tokens).long(),
        )

    j_img = np.asarray(model.encode_image(images))
    j_txt = np.asarray(model.encode_text(tokens))
    j_li, j_lt = model(images, tokens)

    np.testing.assert_allclose(j_img, t_img, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(j_txt, t_txt, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(j_li), t_li.numpy(), atol=2e-3)
    np.testing.assert_allclose(np.asarray(j_lt), t_lt.numpy(), atol=2e-3)

    # EOT-trimmed tokens are exact (encode_text is length-agnostic)
    j_txt_trim = np.asarray(model.encode_text(eot_trim(tokens)))
    np.testing.assert_allclose(j_txt_trim, j_txt, atol=1e-5)

    # single-image convenience: 3-D input promoted to batch 1
    one = np.asarray(model.encode_image(images[0]))
    np.testing.assert_allclose(one[0], j_img[0], atol=1e-5)


def test_preprocess_matches_reference_transform_semantics(oracle_checkpoint):
    """_transform = Resize(shorter->n_px, bicubic) + CenterCrop + RGB +
    ToTensor + Normalize (clip/clip.py:71-78); helpers are PIL-exact per
    tests/test_native_pipeline.py — here pin composition + constants."""
    from PIL import Image

    from rpo_tpu import clip
    from rpo_tpu.data.transforms import center_crop, resize_shorter

    model, preprocess = clip.load("ViT-B/16")
    n_px = model.visual_input_resolution

    rng = np.random.RandomState(1)
    img = Image.fromarray(rng.randint(0, 256, (53, 77, 3), np.uint8))
    out = preprocess(img)
    assert out.shape == (n_px, n_px, 3) and out.dtype == np.float32

    expect = np.asarray(
        center_crop(resize_shorter(img, n_px, "bicubic"), n_px), np.float32
    ) / 255.0
    expect = (expect - clip.PIXEL_MEAN) / clip.PIXEL_STD
    np.testing.assert_allclose(out, expect, atol=1e-6)

    # normalization constants are the reference's (clip/clip.py:75-76)
    np.testing.assert_allclose(
        clip.PIXEL_MEAN, [0.48145466, 0.4578275, 0.40821073]
    )
    np.testing.assert_allclose(
        clip.PIXEL_STD, [0.26862954, 0.26130258, 0.27577711]
    )


def test_tokenize_contract():
    from rpo_tpu import clip

    toks = clip.tokenize("a photo of a cat")
    assert toks.shape == (1, 77) and toks.dtype == np.int32
    long = " ".join(["word"] * 200)
    with pytest.raises(RuntimeError):
        clip.tokenize(long)
    trunc = clip.tokenize(long, truncate=True)
    assert trunc.shape == (1, 77) and trunc[0, -1] == 49407  # EOT kept
