"""Host-side image transforms (PIL decode/resize/crop) + device-side
normalize.

Split of responsibilities (SURVEY.md §7 step 6):
  - Host: decode, resize, crop, flip — per-image, PIL, parallelized by
    the loader.  Eval-path resize/center-crop matches torchvision's PIL
    backend exactly (the accuracy-critical path); train-path randomness
    is distributionally equivalent to RandomResizedCrop/RandomFlip.
  - Device: uint8 -> float, mean/std normalize — executed inside the
    jitted step where XLA fuses it into the patch-embed matmul (the
    "fused preprocessing" of the north star; see also ops/preprocess.py).

Transform functions return HWC uint8 arrays; normalization constants ride
in the batch pipeline config.
"""
from __future__ import annotations

import math
import random
from typing import Iterable, Tuple

import numpy as np

try:
    from PIL import Image

    _BICUBIC = Image.BICUBIC
    _BILINEAR = Image.BILINEAR
except Exception:  # pragma: no cover
    Image = None
    _BICUBIC = _BILINEAR = None


def _interp(name: str):
    return {"bicubic": _BICUBIC, "bilinear": _BILINEAR}.get(name, _BICUBIC)


def load_image(impath: str) -> "Image.Image":
    """Decode an image path (or synthesize one for synthetic:// URIs)."""
    if impath.startswith("synthetic://"):
        return synth_image(impath)
    img = Image.open(impath).convert("RGB")
    return img


def synth_image(uri: str, size: int = 224) -> "Image.Image":
    """Deterministic pseudo-image for tests/benchmarks: synthetic://<label>/<idx>.
    Uses a stable hash (Python's ``hash`` is salted per process)."""
    import zlib

    seed = zlib.crc32(uri.encode()) % (2 ** 31)
    rng = np.random.RandomState(seed)
    arr = rng.randint(0, 256, size=(size, size, 3), dtype=np.uint8)
    return Image.fromarray(arr)


def resize_shorter(img, size: int, interpolation: str = "bicubic"):
    """torchvision Resize(int) semantics: shorter side -> size, keep aspect."""
    w, h = img.size
    if (w <= h and w == size) or (h <= w and h == size):
        return img
    if w < h:
        ow, oh = size, int(size * h / w)
    else:
        ow, oh = int(size * w / h), size
    return img.resize((ow, oh), _interp(interpolation))


def center_crop(img, size: int):
    w, h = img.size
    if w < size or h < size:  # pad like torchvision when smaller
        new = Image.new("RGB", (max(w, size), max(h, size)))
        new.paste(img, ((max(w, size) - w) // 2, (max(h, size) - h) // 2))
        img = new
        w, h = img.size
    left = int(round((w - size) / 2.0))
    top = int(round((h - size) / 2.0))
    return img.crop((left, top, left + size, top + size))


def sample_rrc_box(
    w: int,
    h: int,
    scale: Tuple[float, float] = (0.08, 1.0),
    ratio: Tuple[float, float] = (3.0 / 4.0, 4.0 / 3.0),
    rng=random,
) -> Tuple[int, int, int, int]:
    """torchvision RandomResizedCrop box sampling.  ``rng`` is any object
    with the ``random.Random`` draw API (defaults to the global module;
    the loader passes a private per-epoch Random so producer threads
    never touch the seeded global stream).
    Returns (left, top, crop_w, crop_h)."""
    area = w * h
    log_ratio = (math.log(ratio[0]), math.log(ratio[1]))
    for _ in range(10):
        target_area = area * rng.uniform(*scale)
        aspect = math.exp(rng.uniform(*log_ratio))
        cw = int(round(math.sqrt(target_area * aspect)))
        ch = int(round(math.sqrt(target_area / aspect)))
        if 0 < cw <= w and 0 < ch <= h:
            left = rng.randint(0, w - cw)
            top = rng.randint(0, h - ch)
            return left, top, cw, ch
    # fallback: center crop to in-range aspect
    in_ratio = w / h
    if in_ratio < ratio[0]:
        cw, ch = w, int(round(w / ratio[0]))
    elif in_ratio > ratio[1]:
        ch, cw = h, int(round(h * ratio[1]))
    else:
        cw, ch = w, h
    return (w - cw) // 2, (h - ch) // 2, cw, ch


def random_resized_crop(
    img,
    size: int,
    scale: Tuple[float, float] = (0.08, 1.0),
    ratio: Tuple[float, float] = (3.0 / 4.0, 4.0 / 3.0),
    interpolation: str = "bicubic",
):
    """torchvision RandomResizedCrop (PIL path)."""
    w, h = img.size
    left, top, cw, ch = sample_rrc_box(w, h, scale, ratio)
    return img.resize(
        (size, size), _interp(interpolation), box=(left, top, left + cw, top + ch)
    )


class TransformPipeline:
    """cfg.INPUT -> callable(impath, train: bool) -> HWC uint8 array.

    Reference train transforms: [random_resized_crop, random_flip,
    normalize]; eval: resize + center-crop + normalize
    (configs/trainers/RPO/main.yaml:10-14 and Dassl build_transform).
    Normalize is deferred to the device (see module docstring).
    """

    def __init__(self, cfg_input):
        self.size = int(cfg_input.SIZE[0])
        self.interpolation = str(cfg_input.INTERPOLATION)
        self.scale = tuple(cfg_input.RRCROP_SCALE)
        transforms = tuple(cfg_input.TRANSFORMS)
        self.use_rrc = "random_resized_crop" in transforms
        self.use_flip = "random_flip" in transforms
        self.mean = np.asarray(cfg_input.PIXEL_MEAN, np.float32)
        self.std = np.asarray(cfg_input.PIXEL_STD, np.float32)
        # INPUT.DEVICE_RESIZE > 0: eval images leave the host at this raw
        # source size; the resize to self.size runs on device (see
        # ops/preprocess.py and CLIPMethodTrainer.build_model)
        self.device_resize = int(getattr(cfg_input, "DEVICE_RESIZE", 0))
        if self.device_resize and self.interpolation != "bicubic":
            # the device resample ops implement bicubic only; silently
            # mixing kernels across host/device paths would skew accuracy
            raise ValueError(
                "INPUT.DEVICE_RESIZE requires INPUT.INTERPOLATION "
                f"'bicubic' (got {self.interpolation!r}); all CLIP "
                "protocol configs set bicubic"
            )

    def image_size(self, impath: str) -> Tuple[int, int]:
        """(width, height) from the header only (no full decode)."""
        if impath.startswith("synthetic://"):
            return (224, 224)
        if impath.lower().endswith((".jpg", ".jpeg")):
            from rpo_tpu._native import get_lib

            lib = get_lib()
            if lib is not None:
                import ctypes

                w = ctypes.c_int()
                h = ctypes.c_int()
                if lib.rpo_image_size(impath.encode(), ctypes.byref(w), ctypes.byref(h)) == 0:
                    return (w.value, h.value)
        with Image.open(impath) as img:
            return img.size

    def make_plan(self, impath: str, train: bool, size=None, rng=None):
        """Draw ALL augmentation randomness for one image.

        Must be called in deterministic item order against a given
        ``rng`` stream: this is what keeps seeded runs reproducible even
        though the decode/resize work itself fans out to a thread pool
        (or the C++ pipeline) in arbitrary order.  ``rng`` is any object
        with the ``random.Random`` draw API; None means the global
        module (direct/test callers).  The loader hands its producer a
        PRIVATE per-epoch ``random.Random`` seeded once from the global
        stream on the consumer thread, so seeded determinism holds by
        construction — an abandoned producer's in-flight draws come from
        its own dead stream and can never interleave with a new epoch's.

        Plan: (box_or_None, flip).  Dassl applies random_flip
        independently of random_resized_crop, so flip is drawn whenever
        enabled even without RRC.  ``size`` (w, h) skips the per-image
        header read when the caller already knows it (the RNG draw order
        is unchanged).
        """
        if not train or not (self.use_rrc or self.use_flip):
            return None
        if rng is None:
            rng = random
        box = None
        if self.use_rrc:
            # ALWAYS sampled in ORIGINAL image coordinates, so the crop
            # distribution matches the reference's RandomResizedCrop over
            # the full frame.  In device-augment mode, exact-(S, S) sources
            # (the documented fast path, e.g. EuroSAT 64x64) have original
            # == source coordinates and the box applies on device; for any
            # other size the loader host-applies the box during decode
            # (raw_source(box=...)) — a center-cropped source would never
            # see the edge content of non-square images.
            w, h = size if size is not None else self.image_size(impath)
            box = sample_rrc_box(w, h, self.scale, rng=rng)
        flip = bool(self.use_flip and rng.random() < 0.5)
        return (box, flip)

    def raw_source(self, impath: str, box=None) -> np.ndarray:
        """Device-augment path: the raw (S, S, 3) uint8 source.

        Exact-(S, S) images ship verbatim (the crop/resize/flip in the
        plan run on device, ops/preprocess.py::device_train_preprocess).
        Other sizes are host-normalized to (S, S): with ``box`` (an RRC
        box in ORIGINAL coordinates) the crop is applied here so the
        augmentation distribution covers the full frame; without, the
        eval-style resize-shorter + center-crop."""
        S = self.device_resize
        img = load_image(impath)
        if img.size != (S, S):
            if box is not None:
                left, top, cw, ch = box
                img = img.resize(
                    (S, S), _interp(self.interpolation),
                    box=(left, top, left + cw, top + ch),
                )
            else:
                img = center_crop(resize_shorter(img, S, self.interpolation), S)
        return np.asarray(img, dtype=np.uint8)

    def __call__(self, impath: str, train: bool, plan=None) -> np.ndarray:
        if not train and self.device_resize:
            # Device-resize eval path: ship the raw source pixels; the
            # jitted eval step does bicubic resize + crop + normalize on
            # device.  (The loader's batch path serves the same result
            # via the native C++ kernel.)
            return self.raw_source(impath)
        if train and self.device_resize:
            # Host-side equivalent of the device-augment train path:
            # decode to the uniform source, apply the planned box/flip
            # with PIL.  Production batches run this math on device
            # (device_train_preprocess); this path keeps the transform
            # callable coherent for per-item fallbacks and tests.
            if plan is None:
                plan = self.make_plan(impath, train)
            box, flip = plan if plan is not None else (None, False)
            S = self.device_resize
            exact = self.image_size(impath) == (S, S)
            # non-exact sources: the box (original coordinates) is
            # host-applied inside raw_source; the device sees the full
            # (S, S) frame — mirror that here
            img = Image.fromarray(
                self.raw_source(impath, box=None if exact else box)
            )
            left, top, cw, ch = (
                box if (box is not None and exact) else (0, 0, S, S)
            )
            img = img.resize(
                (self.size, self.size),
                _interp(self.interpolation),
                box=(left, top, left + cw, top + ch),
            )
            if flip:
                img = img.transpose(Image.FLIP_LEFT_RIGHT)
            return np.asarray(img, dtype=np.uint8)
        if train and plan is None:
            plan = self.make_plan(impath, train)
        native = self._native_path(impath, train, plan)
        if native is not None:
            return native
        img = load_image(impath)
        box, flip = plan if (train and plan is not None) else (None, False)
        if box is not None:
            left, top, cw, ch = box
            img = img.resize(
                (self.size, self.size),
                _interp(self.interpolation),
                box=(left, top, left + cw, top + ch),
            )
        else:
            img = resize_shorter(img, self.size, self.interpolation)
            img = center_crop(img, self.size)
        if flip:
            img = img.transpose(Image.FLIP_LEFT_RIGHT)
        return np.asarray(img, dtype=np.uint8)

    def _native_path(self, impath: str, train: bool, plan) -> np.ndarray | None:
        """C++ decode+resize+crop fast path (JPEG only, bicubic).  The
        randomness lives in ``plan`` — the native library only executes."""
        if self.interpolation != "bicubic" or not impath.lower().endswith(
            (".jpg", ".jpeg")
        ):
            return None
        from rpo_tpu._native import get_lib

        lib = get_lib()
        if lib is None:
            return None
        import ctypes

        path_b = impath.encode()
        out = np.empty((self.size, self.size, 3), dtype=np.uint8)
        out_ptr = out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        if train and plan is not None and plan[0] is not None:
            (left, top, cw, ch), flip = plan
            rc = lib.rpo_train_preprocess(
                path_b, left, top, cw, ch, int(flip), self.size, out_ptr
            )
        else:
            rc = lib.rpo_eval_preprocess(path_b, self.size, out_ptr)
            if rc == 0 and train and plan is not None and plan[1]:
                out = out[:, ::-1].copy()  # flip-only train path
        return out if rc == 0 else None


def device_normalize_fn(mean: Iterable[float], std: Iterable[float], dtype=None):
    """Returns a jit-friendly uint8 -> normalized float fn (fuses into the
    first matmul under XLA).

    ``dtype`` sets the OUTPUT dtype (normalize computes in fp32, rounds
    once).  Within a fused jit program XLA already folds the fp32
    intermediate into the patch-embed matmul, so this mainly matters when
    normalized images are materialized (e.g. cached feature pipelines)."""
    import jax.numpy as jnp

    from rpo_tpu.ops.preprocess import _mean_std_u8

    mean_a, std_a = _mean_std_u8(mean, std)

    def normalize(images_u8):
        out = (images_u8.astype(jnp.float32) - mean_a) / std_a
        return out.astype(dtype) if dtype is not None else out

    return normalize
