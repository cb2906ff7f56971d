"""Native C++ image pipeline vs the PIL reference path."""
import os
import random

import numpy as np
import pytest
from PIL import Image

from rpo_tpu._native import get_lib
from rpo_tpu.data.transforms import TransformPipeline, center_crop, resize_shorter


class _Input:
    SIZE = (224, 224)
    INTERPOLATION = "bicubic"
    RRCROP_SCALE = (0.08, 1.0)
    TRANSFORMS = ("random_resized_crop", "random_flip", "normalize")
    PIXEL_MEAN = [0.48145466, 0.4578275, 0.40821073]
    PIXEL_STD = [0.26862954, 0.26130258, 0.27577711]


@pytest.fixture(scope="module")
def lib():
    lib = get_lib()
    if lib is None:
        pytest.skip("native library unavailable (no g++/libjpeg)")
    return lib


@pytest.fixture(scope="module")
def jpeg_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.RandomState(0)
    paths = []
    for i, (w, h) in enumerate([(640, 480), (300, 500), (224, 224), (100, 80)]):
        arr = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        # smooth it so JPEG artifacts don't dominate the comparison
        arr = (arr.astype(np.float32) * 0.3 + 128 * 0.7).astype(np.uint8)
        p = str(d / f"img_{i}.jpg")
        Image.fromarray(arr).save(p, quality=95)
        paths.append(p)
    return paths


def test_eval_preprocess_matches_pil(lib, jpeg_files):
    import ctypes

    for p in jpeg_files:
        out = np.empty((224, 224, 3), np.uint8)
        rc = lib.rpo_eval_preprocess(
            p.encode(), 224, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        )
        assert rc == 0
        img = Image.open(p).convert("RGB")
        ref = np.asarray(center_crop(resize_shorter(img, 224, "bicubic"), 224))
        diff = np.abs(out.astype(int) - ref.astype(int))
        # we replicate PIL's fixed-point scheme exactly
        assert int(diff.max()) <= 1, int(diff.max())


def test_pipeline_uses_native_and_matches(jpeg_files):
    tp = TransformPipeline(_Input)
    for p in jpeg_files:
        out = tp(p, train=False)
        assert out.shape == (224, 224, 3) and out.dtype == np.uint8
        img = Image.open(p).convert("RGB")
        ref = np.asarray(center_crop(resize_shorter(img, 224, "bicubic"), 224))
        assert int(np.abs(out.astype(int) - ref.astype(int)).max()) <= 1


def test_train_path_deterministic_across_backends(lib, jpeg_files):
    """Same seed -> same crop/flip plan on native and PIL paths (the RNG
    draws live in Python for both)."""
    tp = TransformPipeline(_Input)
    p = jpeg_files[0]

    random.seed(123)
    native_out = tp(p, train=True)

    os.environ["RPO_TPU_NO_NATIVE"] = "1"
    try:
        import rpo_tpu._native as nat

        nat._lib = None  # force re-decision
        random.seed(123)
        pil_out = tp(p, train=True)
    finally:
        del os.environ["RPO_TPU_NO_NATIVE"]
        nat._lib = None
    assert native_out.shape == pil_out.shape
    diff = np.abs(native_out.astype(int) - pil_out.astype(int))
    assert float(diff.mean()) < 2.0, float(diff.mean())


def test_batch_api(lib, jpeg_files):
    import ctypes

    n = len(jpeg_files)
    out = np.empty((n, 224, 224, 3), np.uint8)
    ok = np.zeros((n,), np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in jpeg_files])
    successes = lib.rpo_eval_preprocess_batch(
        arr, n, 224,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        4,
    )
    assert successes == n
    assert ok.all()
    assert out[0].std() > 1  # actually wrote pixels


def test_train_batch_api_matches_per_image(lib, jpeg_files):
    """rpo_train_preprocess_batch == per-image native calls for the same
    plans (crop-box, flip-only, and plain eval-style entries)."""
    import ctypes

    tp = TransformPipeline(_Input)
    n = len(jpeg_files)
    plans = [
        ((50, 40, 200, 180), True),   # crop box + flip
        ((10, 10, 150, 150), False),  # crop box only
        (None, True),                 # flip-only (eval-style resize+crop)
        (None, False),                # plain
    ]
    boxes = np.full((n, 4), -1, np.int32)
    flips = np.zeros((n,), np.uint8)
    for i, (box, flip) in enumerate(plans):
        flips[i] = int(flip)
        if box is not None:
            boxes[i] = box
    out = np.empty((n, 224, 224, 3), np.uint8)
    ok = np.zeros((n,), np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in jpeg_files])
    successes = lib.rpo_train_preprocess_batch(
        arr, boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        flips.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n, 224,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), 4,
    )
    assert successes == n and ok.all()
    for i, (p, plan) in enumerate(zip(jpeg_files, plans)):
        ref = tp(p, train=True, plan=plan)  # per-image (native) path
        np.testing.assert_array_equal(out[i], ref)


def test_loader_native_train_batch_matches_pil(jpeg_files):
    """BatchLoader's batched native train path is bit-identical to the
    PIL path for the same seeded plans."""
    from rpo_tpu.data.datum import Datum
    from rpo_tpu.data.loader import BatchLoader

    items = [Datum(impath=p, label=i, classname="x") for i, p in enumerate(jpeg_files)]
    tp = TransformPipeline(_Input)

    def one_epoch():
        loader = BatchLoader(
            items, tp, batch_size=len(items), train=True, shuffle=False,
            num_workers=2, prefetch=1,
        )
        return next(iter(loader))["img"]

    random.seed(7)
    native = one_epoch()

    os.environ["RPO_TPU_NO_NATIVE"] = "1"
    try:
        import rpo_tpu._native as nat

        nat._lib = None
        random.seed(7)
        pil = one_epoch()
    finally:
        del os.environ["RPO_TPU_NO_NATIVE"]
        nat._lib = None
    diff = np.abs(native.astype(int) - pil.astype(int))
    assert float(diff.mean()) < 2.0, float(diff.mean())


def test_bad_file_falls_back(lib, tmp_path):
    bad = tmp_path / "notajpeg.jpg"
    bad.write_bytes(b"this is not a jpeg")
    import ctypes

    out = np.empty((224, 224, 3), np.uint8)
    rc = lib.rpo_eval_preprocess(
        str(bad).encode(), 224, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    )
    assert rc == -1  # python caller falls back to PIL


def test_stale_so_rebuilds_in_process(lib, tmp_path):
    """A stale librpo_image.so (mtime newer than the source, missing newer
    symbols) must be rebuilt AND usable in the same process.  The rebuild
    links into a temp file and os.replace's it over _SO: the retry dlopen
    then sees a fresh inode instead of glibc's cached handle for the stale
    mapping (which ctypes never dlcloses)."""
    import subprocess

    import rpo_tpu._native as native

    stub_c = tmp_path / "stub.c"
    stub_c.write_text("int rpo_stub(void) { return 0; }\n")
    stub_so = tmp_path / "stub.so"
    res = subprocess.run(
        ["g++", "-shared", "-fPIC", str(stub_c), "-o", str(stub_so)],
        capture_output=True,
    )
    if res.returncode != 0:
        pytest.skip("cannot compile stub library")

    # Plant the stub at _SO as a NEW inode (unlink first — truncating the
    # mapped good library in place would corrupt live handles) with an
    # mtime beating the source, as a copied/touched artifact would have.
    os.unlink(native._SO)
    with open(stub_so, "rb") as s, open(native._SO, "wb") as d:
        d.write(s.read())
    src_mtime = os.path.getmtime(native._SRC)
    os.utime(native._SO, (src_mtime + 10, src_mtime + 10))
    native._lib = None
    native._build_failed = False

    fresh = native.get_lib()
    assert fresh is not None, "in-process rebuild after stale-symbol load failed"
    assert hasattr(fresh, "rpo_train_preprocess_batch")
