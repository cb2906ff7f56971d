"""Tokenizer parity: our BPE must match the reference bit-for-bit.

The reference implementation (/root/reference/clip/simple_tokenizer.py) is
imported directly (with a stub for its optional ftfy dependency) and used as
the oracle on a broad set of inputs, including every classname-like string
the framework will ever tokenize.
"""
import html
import sys
import types
import unicodedata

import numpy as np
import pytest

from rpo_tpu.tokenizer import (
    CONTEXT_LENGTH,
    EOT_TOKEN,
    SOT_TOKEN,
    VOCAB_SIZE,
    ClipTokenizer,
    tokenize,
)


@pytest.fixture(scope="module")
def reference_tokenizer():
    if "ftfy" not in sys.modules:
        stub = types.ModuleType("ftfy")
        stub.fix_text = lambda t: unicodedata.normalize("NFC", t)
        sys.modules["ftfy"] = stub
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "_ref_simple_tokenizer", "/root/reference/clip/simple_tokenizer.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.SimpleTokenizer()


@pytest.fixture(scope="module")
def ours():
    return ClipTokenizer()


SAMPLES = [
    "a photo of a dog.",
    "a photo of a abyssinian, a type of pet.",
    "A PHOTO of A Golden   Retriever!!!",
    "itap of a 2012 BMW ActiveHybrid 5 Sedan.",
    "satellite photo of annual crop land.",
    "the quick brown fox jumps over the lazy dog 1234567890",
    "don't can't won't it's we're I'll I'd I've I'm",
    "face-to-face; semi-detached houses & <html> entities &amp;amp;",
    "crème brûlée café über straße",
    "日本語のテスト",  # CJK goes through byte fallback
    "",
    "   ",
    "a",
    "supercalifragilisticexpialidocious pneumonoultramicroscopicsilicovolcanoconiosis",
    "electrical_devices photo of a forest, a type of texture.",
]


def test_vocab_size(ours):
    assert len(ours.encoder) == VOCAB_SIZE
    assert ours.encoder["<|startoftext|>"] == SOT_TOKEN
    assert ours.encoder["<|endoftext|>"] == EOT_TOKEN


def test_encode_parity(ours, reference_tokenizer):
    for text in SAMPLES:
        assert ours.encode(text) == reference_tokenizer.encode(text), text


def test_decode_roundtrip(ours, reference_tokenizer):
    for text in SAMPLES:
        ids = ours.encode(text)
        assert ours.decode(ids) == reference_tokenizer.decode(ids)


def test_classname_corpus_parity(ours, reference_tokenizer):
    # Class-name shaped strings: underscores replaced, template-filled.
    names = [
        "air conditioner",
        "wild_cat",
        "1932 Ford Model A",
        "Boeing 717-200",
        "crested auklet",
        "electric guitar",
    ]
    for n in names:
        for t in ["a photo of a {}.", "{} texture.", "itap of a {}."]:
            s = t.format(n.replace("_", " "))
            assert ours.encode(s) == reference_tokenizer.encode(s), s


def test_tokenize_shape_and_padding():
    arr = tokenize(["a photo of a dog.", "cat"])
    assert arr.shape == (2, CONTEXT_LENGTH)
    assert arr.dtype == np.int32
    assert arr[0, 0] == SOT_TOKEN
    row = arr[0]
    eot_pos = int(np.argmax(row))
    assert row[eot_pos] == EOT_TOKEN
    assert (row[eot_pos + 1 :] == 0).all()


def test_tokenize_overflow():
    long_text = "word " * 200
    with pytest.raises(RuntimeError):
        tokenize(long_text)
    arr = tokenize(long_text, truncate=True)
    assert arr.shape == (1, CONTEXT_LENGTH)
    assert arr[0, -1] == EOT_TOKEN


def test_eot_trim_exact_encode_text():
    """eot_trim + length-agnostic encode_text == full-77 encode_text
    (the reference always runs 77, clip/model.py:354)."""
    import jax
    import jax.numpy as jnp
    from rpo_tpu.tokenizer import eot_trim
    from rpo_tpu.models.clip.model import CLIPConfig, encode_text, init_clip

    cfg = CLIPConfig(
        embed_dim=32, image_resolution=32, vision_layers=2, vision_width=32,
        vision_patch_size=8, context_length=CONTEXT_LENGTH, vocab_size=49408,
        text_layers=2, text_width=32, text_heads=2,
    )
    params = init_clip(jax.random.PRNGKey(0), cfg, jnp.float32)
    tokens = tokenize(["a photo of a dog.", "cat", "a centered satellite photo of forest"])
    trimmed = eot_trim(tokens)
    assert trimmed.shape[1] < CONTEXT_LENGTH and trimmed.shape[1] % 8 == 0
    full = np.asarray(encode_text(params, cfg, jnp.asarray(tokens)))
    trim = np.asarray(encode_text(params, cfg, jnp.asarray(trimmed)))
    np.testing.assert_allclose(trim, full, rtol=1e-5, atol=1e-5)
