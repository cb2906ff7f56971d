"""Dassl cache interop (data/interop.py) + loader/transform review fixes.

The reference shares pickle caches across runs at canonical paths
(/root/reference/datasets/oxford_pets.py:36-49, imagenet.py:24-39); both
frameworks must be able to read what the other wrote.
"""
import os
import pickle
import sys
import types

import numpy as np
import pytest

from rpo_tpu.data.datum import Datum
from rpo_tpu.data.interop import (
    DASSL_DATUM_MODULE,
    dump_datum_pickle,
    load_datum_pickle,
)


def _clear_dassl_modules():
    for name in list(sys.modules):
        if name == "dassl" or name.startswith("dassl."):
            del sys.modules[name]


def _install_fake_dassl():
    """A stand-in for the real dassl package: Datum with the reference's
    private-attr state layout and property accessors."""
    _clear_dassl_modules()
    parts = DASSL_DATUM_MODULE.split(".")
    for i in range(1, len(parts) + 1):
        name = ".".join(parts[:i])
        mod = types.ModuleType(name)
        sys.modules[name] = mod
        if i > 1:
            setattr(sys.modules[".".join(parts[: i - 1])], parts[i - 1], mod)

    class FakeDasslDatum:
        def __init__(self, impath="", label=0, domain=0, classname=""):
            self._impath = impath
            self._label = label
            self._domain = domain
            self._classname = classname

        @property
        def impath(self):
            return self._impath

        @property
        def label(self):
            return self._label

        @property
        def classname(self):
            return self._classname

    FakeDasslDatum.__module__ = DASSL_DATUM_MODULE
    FakeDasslDatum.__qualname__ = "Datum"
    FakeDasslDatum.__name__ = "Datum"
    sys.modules[DASSL_DATUM_MODULE].Datum = FakeDasslDatum
    return FakeDasslDatum


@pytest.fixture(autouse=True)
def _isolate_dassl_stub():
    yield
    _clear_dassl_modules()


def _payload():
    return {
        "train": [Datum("a/b.jpg", 3, "cat"), Datum("c/d.jpg", 0, "dog")],
        "val": [Datum("e.jpg", 1, "bird")],
    }


def test_roundtrip_ours(tmp_path):
    p = tmp_path / "shot_4-seed_1.pkl"
    with open(p, "wb") as f:
        dump_datum_pickle(_payload(), f)
    with open(p, "rb") as f:
        back = load_datum_pickle(f)
    assert [d.impath for d in back["train"]] == ["a/b.jpg", "c/d.jpg"]
    assert [d.label for d in back["train"]] == [3, 0]
    assert back["val"][0].classname == "bird"
    assert isinstance(back["train"][0], Datum)


def test_our_cache_loads_in_a_dassl_environment(tmp_path):
    """What rpo_tpu writes must be a plain pickle.load away in the torch
    reference's env: the stream's Datum global must resolve to dassl's
    class with its exact state layout (reference oxford_pets.py:36-39 has
    no try/except, so a foreign-class pickle would crash it)."""
    _clear_dassl_modules()  # force the stub write path (no dassl here)
    p = tmp_path / "shot_16-seed_2.pkl"
    with open(p, "wb") as f:
        dump_datum_pickle(_payload(), f)

    # simulate the reference environment: real-ish dassl installed,
    # bare pickle.load (no custom unpickler)
    fake_cls = _install_fake_dassl()
    with open(p, "rb") as f:
        data = pickle.load(f)
    d = data["train"][0]
    assert type(d) is fake_cls
    assert d.impath == "a/b.jpg" and d.label == 3 and d.classname == "cat"
    assert d._domain == 0


def test_dassl_cache_loads_here(tmp_path):
    """A cache written by the torch reference (dassl Datum objects) must
    load as rpo_tpu Datum objects — previously it was unpicklable here
    and forced a silent resample every run."""
    fake_cls = _install_fake_dassl()
    payload = {"train": [fake_cls("x/y.jpg", 7, 0, "horse")]}
    p = tmp_path / "shot_1-seed_3.pkl"
    with open(p, "wb") as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
    _clear_dassl_modules()  # back to the rpo_tpu env: dassl gone

    with open(p, "rb") as f:
        back = load_datum_pickle(f)
    d = back["train"][0]
    assert isinstance(d, Datum)
    assert d.impath == "x/y.jpg" and d.label == 7 and d.classname == "horse"


def test_fewshot_cache_roundtrips_through_interop(tmp_path):
    """load_or_create_fewshot writes the canonical path in Dassl format
    and reads it back identically on the next run."""
    import random

    from rpo_tpu.data.datum import DatasetBase
    from rpo_tpu.data.splits import load_or_create_fewshot

    train = [
        Datum(f"img_{c}_{i}.jpg", c, f"class{c}")
        for c in range(3)
        for i in range(8)
    ]
    ds = DatasetBase(train_x=train, val=train, test=train)
    random.seed(1)
    t1, v1 = load_or_create_fewshot(ds, train, train, str(tmp_path), 2, 1)
    # second call must come from the cache (no RNG use), identical items
    t2, v2 = load_or_create_fewshot(ds, train, train, str(tmp_path), 2, 1)
    assert [d.impath for d in t1] == [d.impath for d in t2]
    assert [d.label for d in v1] == [d.label for d in v2]
    # and the on-disk file is dassl-loadable
    fake_cls = _install_fake_dassl()
    with open(os.path.join(str(tmp_path), "shot_2-seed_1.pkl"), "rb") as f:
        data = pickle.load(f)
    assert type(data["train"][0]) is fake_cls


def test_second_iterator_wakes_blocked_first_consumer():
    """Starting a new iteration while an old iterator is mid-epoch must
    raise in the old consumer instead of deadlocking it on q.get()
    (review finding: the new __iter__ killed the old producer, so its
    stop sentinel never arrived)."""
    import threading

    from rpo_tpu.data.loader import BatchLoader

    items = [Datum(f"synthetic://{i % 3}/{i}", i % 3, f"c{i % 3}") for i in range(16)]

    def transform(impath, train):
        return np.zeros((8, 8, 3), np.uint8)

    loader = BatchLoader(
        items, transform, batch_size=2, train=False, shuffle=False,
        num_workers=1, prefetch=1,
    )
    it1 = iter(loader)
    next(it1)
    it2 = iter(loader)
    next(it2)

    result = {}

    def drain_first():
        try:
            for _ in it1:
                pass
            result["outcome"] = "completed"
        except RuntimeError as exc:
            result["outcome"] = "raised"
            result["msg"] = str(exc)

    t = threading.Thread(target=drain_first, daemon=True)
    t.start()
    t.join(timeout=20)
    assert not t.is_alive(), "first consumer deadlocked on the stale queue"
    assert result["outcome"] == "raised"
    assert "concurrent" in result["msg"]


def test_device_augment_nonsquare_rrc_covers_full_frame(tmp_path):
    """Device-augment mode must sample RRC boxes over the ORIGINAL frame:
    for a non-square source the crop is host-applied, so edge content
    outside the center square still reaches training (review finding:
    boxes were sampled on the center-cropped SxS source)."""
    import random

    from PIL import Image

    from rpo_tpu.data.loader import BatchLoader
    from rpo_tpu.data.transforms import TransformPipeline

    # a 128x64 image whose left/right 32-px strips are marked
    w, h, S = 128, 64, 64
    arr = np.zeros((h, w, 3), np.uint8)
    arr[:, :32, 0] = 255  # left strip red
    arr[:, -32:, 2] = 255  # right strip blue
    p = str(tmp_path / "wide.png")
    Image.fromarray(arr).save(p)

    class CfgInput:
        SIZE = (224, 224)
        INTERPOLATION = "bicubic"
        RRCROP_SCALE = (0.08, 1.0)
        PIXEL_MEAN = [0.5, 0.5, 0.5]
        PIXEL_STD = [0.5, 0.5, 0.5]
        TRANSFORMS = ["random_resized_crop", "random_flip", "normalize"]
        DEVICE_RESIZE = S

    tp = TransformPipeline(CfgInput)
    # 1) the plan's box lives in original (128, 64) coordinates
    random.seed(0)
    seen_beyond_center = False
    for _ in range(64):
        box, _flip = tp.make_plan(p, True)
        left, top, cw, ch = box
        assert 0 <= left and left + cw <= w and 0 <= top and top + ch <= h
        if left < 32 or left + cw > w - 32:
            seen_beyond_center = True
    assert seen_beyond_center, "no sampled box ever reached the edge strips"

    # 2) the loader host-applies the crop (identity device box) and the
    # shipped source can contain edge-strip pixels
    items = [Datum(p, 0, "wide")] * 8
    loader = BatchLoader(
        items, tp, batch_size=8, train=True, shuffle=False, num_workers=1
    )
    random.seed(0)
    batch = next(iter(loader))
    assert batch["img"].shape == (8, S, S, 3)
    np.testing.assert_array_equal(
        batch["box"], np.tile(np.asarray([0, 0, S, S], np.int32), (8, 1))
    )
    # red/blue strip content appears in at least one shipped source
    reds = (batch["img"][..., 0] > 200) & (batch["img"][..., 2] < 50)
    blues = (batch["img"][..., 2] > 200) & (batch["img"][..., 0] < 50)
    assert reds.any() or blues.any()
