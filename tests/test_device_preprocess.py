"""Device-side preprocessing vs the PIL reference path."""
import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from rpo_tpu.data.transforms import center_crop, resize_shorter
from rpo_tpu.ops.preprocess import (
    device_eval_preprocess,
    resize_bicubic,
)

MEAN = [0.48145466, 0.4578275, 0.40821073]
STD = [0.26862954, 0.26130258, 0.27577711]


def test_resize_matches_pil():
    rng = np.random.RandomState(0)
    arr = rng.randint(0, 256, size=(64, 96, 3), dtype=np.uint8)
    img = Image.fromarray(arr)
    ref = np.asarray(img.resize((48, 32), Image.BICUBIC))  # (w, h) order
    out = np.asarray(resize_bicubic(jnp.asarray(arr[None], jnp.float32), 32, 48))[0]
    diff = np.abs(out - ref.astype(np.float64))
    assert diff.max() <= 2.0, diff.max()


def test_device_eval_preprocess_matches_host():
    rng = np.random.RandomState(1)
    arr = rng.randint(0, 256, size=(4, 96, 128, 3), dtype=np.uint8)
    out = np.asarray(
        jax.jit(lambda x: device_eval_preprocess(x, 64, MEAN, STD))(jnp.asarray(arr))
    )
    for i in range(4):
        img = Image.fromarray(arr[i])
        ref_u8 = np.asarray(center_crop(resize_shorter(img, 64, "bicubic"), 64))
        ref = (ref_u8.astype(np.float32) - np.asarray(MEAN) * 255) / (
            np.asarray(STD) * 255
        )
        # per-pass quantization matches PIL; tolerate 1-2 rounding LSB
        assert np.abs(out[i] - ref).max() < 2.01 / (min(STD) * 255)


