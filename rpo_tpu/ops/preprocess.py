"""Device-side image preprocessing for TPU.

The division of labor (SURVEY.md §7 step 6): variable-size decode +
resize happen host-side (PIL or the native C++ pipeline); THIS module
covers the device-side pieces:

  - ``device_normalize_fn`` (in data/transforms.py): uint8 -> normalized
    float, fused by XLA into the patch-embed matmul — preprocessing costs
    zero extra HBM round-trips in every train/eval step.
  - ``resize_bicubic``: PIL-compatible antialiased bicubic resize as two
    separable weight-matrix contractions — resize as MXU matmuls.  For
    fixed-size sources (e.g. EuroSAT 64x64, or a decode-once cache) the
    whole resize->crop->normalize chain runs on device under jit
    (``device_eval_preprocess``).
  - ``device_train_preprocess``: the train-path augmentation executed on
    device (RandomResizedCrop from host-sampled boxes + flip + normalize;
    the random plan is sampled host-side to preserve the reference's RNG
    discipline).

Only bicubic resampling is implemented; the consumers of
INPUT.DEVICE_RESIZE validate INPUT.INTERPOLATION accordingly.
"""
from __future__ import annotations

from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np


def _cubic(x, a: float = -0.5, xp=np):
    """Catmull-Rom bicubic kernel; one copy of the coefficients shared by
    the static host weights (xp=np) and the traced device weights
    (xp=jnp)."""
    x = xp.abs(x)
    out = xp.where(x < 1.0, ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0, 0.0)
    out = xp.where((x >= 1.0) & (x < 2.0), (((x - 5.0) * x + 8.0) * x - 4.0) * a, out)
    return out


def _mean_std_u8(mean: Iterable[float], std: Iterable[float]):
    """Normalization constants scaled to uint8 pixel range, as device
    arrays — the single definition all device preprocess paths share."""
    mean_a = jnp.asarray(np.asarray(list(mean), np.float32) * 255.0)
    std_a = jnp.asarray(np.asarray(list(std), np.float32) * 255.0)
    return mean_a, std_a


def resize_weights(in_size: int, out_size: int) -> np.ndarray:
    """(out_size, in_size) PIL-style antialiased bicubic weight matrix."""
    scale = in_size / out_size
    filterscale = max(scale, 1.0)
    support = 2.0 * filterscale
    W = np.zeros((out_size, in_size), np.float32)
    for i in range(out_size):
        center = (i + 0.5) * scale
        xmin = max(0, int(center - support + 0.5))
        xmax = min(in_size, int(center + support + 0.5))
        xs = np.arange(xmin, xmax)
        w = _cubic((xs - center + 0.5) / filterscale)
        W[i, xmin:xmax] = w / w.sum()
    return W


def resize_bicubic(
    images: jax.Array, out_h: int, out_w: int, quantize: bool = True
) -> jax.Array:
    """Batched separable bicubic resize on device: (B, H, W, C) float ->
    (B, out_h, out_w, C).  Two einsums -> two MXU contractions.

    ``quantize`` rounds+clamps to uint8 range after each pass like PIL
    does (clips the cubic overshoot between passes — required for close
    agreement with the host path on high-frequency content; jnp.round is
    half-to-even where PIL truncates +0.5, so exact-.5 intermediates may
    differ by one u8 step — within the documented 1-2 LSB contract)."""
    B, H, W, C = images.shape
    wv = jnp.asarray(resize_weights(H, out_h))
    wh = jnp.asarray(resize_weights(W, out_w))
    x = images.astype(jnp.float32)
    # PIL order: horizontal pass first, then vertical.  Full-f32 MXU
    # passes: TPU matmuls default to bf16 inputs, which would stack extra
    # rounding on top of the documented 1-2 u8 LSB PIL contract; the
    # resize is <1% of any consumer's FLOPs, so HIGHEST costs nothing.
    hi = jax.lax.Precision.HIGHEST
    x = jnp.einsum("pw,bhwc->bhpc", wh, x, precision=hi)
    if quantize:
        x = jnp.clip(jnp.round(x), 0, 255)
    x = jnp.einsum("oh,bhpc->bopc", wv, x, precision=hi)
    if quantize:
        x = jnp.clip(jnp.round(x), 0, 255)
    return x


def device_eval_preprocess(
    images_u8: jax.Array,
    size: int,
    mean: Iterable[float],
    std: Iterable[float],
) -> jax.Array:
    """Fixed-size eval path fully on device: resize shorter side to
    ``size`` (aspect preserved), center-crop, normalize.  Requires a
    uniform input shape (B, H, W, 3) uint8."""
    B, H, W, _ = images_u8.shape
    if W <= H:
        rw, rh = size, (int(size * H / W) if H != W else size)
    else:
        rh, rw = size, int(size * W / H)
    x = resize_bicubic(images_u8.astype(jnp.float32), rh, rw)
    top = int(round((rh - size) / 2.0))
    left = int(round((rw - size) / 2.0))
    x = x[:, top : top + size, left : left + size, :]
    mean_a, std_a = _mean_std_u8(mean, std)
    return (x - mean_a) / std_a


def _traced_resize_weights(src: int, out: int, start, length) -> jax.Array:
    """(out, src) PIL-style antialiased bicubic weights for resizing the
    window [start, start+length) of a src-length axis to ``out`` samples —
    with ``start``/``length`` TRACED scalars, so the matrix is built ON
    DEVICE per image from the host-sampled crop box.

    Same math as resize_weights() (which has static python ints): for
    output i, center = start + (i+0.5)*scale, support = 2*filterscale,
    window [xmin, xmax) with the reference's int() truncation semantics,
    cubic kernel normalized over the window.  All shapes static
    ((out, src)); the box only moves values, so this vmaps over a batch.
    """
    start = jnp.asarray(start, jnp.float32)
    length = jnp.maximum(jnp.asarray(length, jnp.float32), 1.0)
    scale = length / out
    filterscale = jnp.maximum(scale, 1.0)
    support = 2.0 * filterscale
    i = jnp.arange(out, dtype=jnp.float32)[:, None]  # (out, 1)
    j = jnp.arange(src, dtype=jnp.float32)[None, :]  # (1, src)
    center = start + (i + 0.5) * scale
    # int() truncates toward zero (resize_weights uses python int())
    xmin = jnp.maximum(0.0, jnp.trunc(center - support + 0.5))
    xmax = jnp.minimum(float(src), jnp.trunc(center + support + 0.5))
    w = _cubic((j - center + 0.5) / filterscale, xp=jnp)
    w = jnp.where((j >= xmin) & (j < xmax), w, 0.0)
    norm = jnp.sum(w, axis=1, keepdims=True)
    return w / jnp.where(norm == 0.0, 1.0, norm)


def device_train_preprocess(
    images_u8: jax.Array,
    boxes: jax.Array,
    flips: jax.Array,
    size: int,
    mean: Iterable[float],
    std: Iterable[float],
) -> jax.Array:
    """Train-path augmentation fully on device for fixed-size sources:
    RandomResizedCrop (integer box per image, host-sampled: left, top,
    crop_w, crop_h) + horizontal flip + normalize.

    (B, S, S, 3) uint8 + (B, 4) int32 boxes + (B,) flips ->
    (B, size, size, 3) float.  The per-image bicubic resample weights are
    built on device from the box scalars (_traced_resize_weights) and
    applied as two separable contractions — the whole augmentation is
    MXU work inside the jitted train step, and the host ships S x S raw
    pixels instead of size x size resized ones (12x fewer bytes at
    S=64/size=224).  A full-frame box (0, 0, S, S) reproduces the plain
    resize; flip is applied AFTER the resize, matching the host
    transform order (random_resized_crop then random_flip).
    """
    B, S, _, _ = images_u8.shape
    mean_a, std_a = _mean_std_u8(mean, std)

    def one(img, box, flip):
        left, top, cw, ch = box[0], box[1], box[2], box[3]
        wh = _traced_resize_weights(S, size, left, cw)  # (size, S)
        wv = _traced_resize_weights(S, size, top, ch)
        x = img.astype(jnp.float32)
        # PIL order: horizontal pass then vertical, quantizing between
        # passes like the host path (clips cubic overshoot); full-f32
        # passes — see resize_bicubic on why precision is pinned
        hi = jax.lax.Precision.HIGHEST
        x = jnp.einsum("pw,hwc->hpc", wh, x, precision=hi)
        x = jnp.clip(jnp.round(x), 0, 255)
        x = jnp.einsum("oh,hpc->opc", wv, x, precision=hi)
        x = jnp.clip(jnp.round(x), 0, 255)
        x = jnp.where(flip > 0, x[:, ::-1, :], x)
        return (x - mean_a) / std_a

    return jax.vmap(one)(images_u8, boxes, flips)
