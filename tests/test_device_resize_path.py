"""INPUT.DEVICE_RESIZE wiring: raw small-source eval batches + on-device
resize (the measured 10.6x eval path for 64x64 sources, BASELINE.md r3).

Pins: the transform ships raw source pixels for eval (and normalizes odd
sizes to the uniform source shape), the loader skips the native host-
resize batch path, make_image_prep routes by shape (full-size batches
just normalize; source-size batches go through device_eval_preprocess),
and the routed result matches the host PIL pipeline's logits path within
the resize tolerance.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from rpo_tpu.data.transforms import TransformPipeline
from rpo_tpu.engine import get_cfg_default


def _cfg(device_resize=64):
    cfg = get_cfg_default()
    cfg.INPUT.SIZE = (224, 224)
    cfg.INPUT.INTERPOLATION = "bicubic"
    cfg.INPUT.DEVICE_RESIZE = device_resize
    cfg.INPUT.PIXEL_MEAN = [0.48145466, 0.4578275, 0.40821073]
    cfg.INPUT.PIXEL_STD = [0.26862954, 0.26130258, 0.27577711]
    cfg.INPUT.TRANSFORMS = ("random_resized_crop", "random_flip", "normalize")
    return cfg


@pytest.fixture()
def img_dir(tmp_path):
    from PIL import Image

    rng = np.random.RandomState(0)
    paths = []
    for i, size in enumerate([64, 64, 48]):  # one odd-sized source
        arr = rng.randint(0, 256, size=(size, size, 3), dtype=np.uint8)
        p = tmp_path / f"im{i}.jpg"
        Image.fromarray(arr).save(str(p), quality=95)
        paths.append(str(p))
    return paths


def test_transform_ships_raw_source_for_eval(img_dir):
    tp = TransformPipeline(_cfg().INPUT)
    out = tp(img_dir[0], train=False)
    assert out.shape == (64, 64, 3) and out.dtype == np.uint8
    # odd-sized source is host-normalized to the uniform source shape
    odd = tp(img_dir[2], train=False)
    assert odd.shape == (64, 64, 3)
    # train path still produces full-size augmented images on host
    tr = tp(img_dir[0], train=True)
    assert tr.shape == (224, 224, 3)


def test_loader_eval_batches_at_source_size(img_dir):
    """Eval batches in device-resize mode carry raw source-size pixels
    (served by the native C++ kernel at size=S when available)."""
    from rpo_tpu.data.datum import Datum
    from rpo_tpu.data.loader import BatchLoader

    tp = TransformPipeline(_cfg().INPUT)
    items = [Datum(impath=p, label=i) for i, p in enumerate(img_dir)]
    loader = BatchLoader(items, tp, batch_size=4, train=False, shuffle=False,
                         num_workers=1)
    batch = next(iter(loader))
    assert batch["img"].shape == (4, 64, 64, 3)  # padded to 4, source size
    assert batch["n"] == 3
    # the native kernel and the PIL raw_source path must agree bit-for-bit
    native = loader._native_fixed_batch(items, 64)
    if native is not None:
        for im, it in zip(native, items):
            np.testing.assert_array_equal(im, tp.raw_source(it.impath))


def test_make_image_prep_routes_by_shape(img_dir):
    from rpo_tpu.methods.base_trainer import make_image_prep
    from rpo_tpu.ops.preprocess import device_eval_preprocess

    cfg = _cfg()
    prep = make_image_prep(cfg, jnp.float32)
    rng = np.random.RandomState(1)
    small = jnp.asarray(rng.randint(0, 256, size=(2, 64, 64, 3)), jnp.uint8)
    full = jnp.asarray(rng.randint(0, 256, size=(2, 224, 224, 3)), jnp.uint8)

    out_small = prep(small)
    assert out_small.shape == (2, 224, 224, 3)
    ref = device_eval_preprocess(small, 224, cfg.INPUT.PIXEL_MEAN, cfg.INPUT.PIXEL_STD)
    np.testing.assert_allclose(np.asarray(out_small), np.asarray(ref), atol=1e-5)

    out_full = prep(full)
    # full-size batches take the plain normalize path
    mean = np.asarray(cfg.INPUT.PIXEL_MEAN, np.float32) * 255.0
    std = np.asarray(cfg.INPUT.PIXEL_STD, np.float32) * 255.0
    np.testing.assert_allclose(
        np.asarray(out_full), (np.asarray(full, np.float32) - mean) / std,
        rtol=1e-6,
    )

    # DEVICE_RESIZE=0 returns the plain normalizer (no shape branch)
    prep0 = make_image_prep(_cfg(device_resize=0), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(prep0(full)),
        (np.asarray(full, np.float32) - mean) / std, rtol=1e-6,
    )


def test_device_path_matches_host_pipeline(img_dir):
    """End-to-end: device-resized eval input produces (nearly) the same
    normalized tensor as the host PIL resize path."""
    from rpo_tpu.methods.base_trainer import make_image_prep

    cfg = _cfg()
    tp_host = TransformPipeline(_cfg(device_resize=0).INPUT)
    tp_dev = TransformPipeline(cfg.INPUT)
    prep = make_image_prep(cfg, jnp.float32)

    host_img = tp_host(img_dir[0], train=False)  # (224,224,3) u8, PIL path
    dev_src = tp_dev(img_dir[0], train=False)  # (64,64,3) u8 raw

    mean = np.asarray(cfg.INPUT.PIXEL_MEAN, np.float32) * 255.0
    std = np.asarray(cfg.INPUT.PIXEL_STD, np.float32) * 255.0
    host_norm = (host_img.astype(np.float32) - mean) / std
    dev_norm = np.asarray(prep(jnp.asarray(dev_src[None])))[0]
    # device bicubic is within +-2/255 of PIL per channel (test_device_preprocess)
    tol = 2.01 / (0.26130258 * 255)
    assert np.abs(dev_norm - host_norm).max() < tol


def test_device_train_preprocess_matches_pil_rrc(img_dir):
    """device_train_preprocess (on-device per-image bicubic resample
    weights built from the host-sampled integer crop box) matches PIL's
    box-resize + flip within the same +-2/255 as the eval resize."""
    import random

    from PIL import Image

    from rpo_tpu.data.transforms import sample_rrc_box
    from rpo_tpu.ops.preprocess import device_train_preprocess

    cfg = _cfg()
    mean = np.asarray(cfg.INPUT.PIXEL_MEAN, np.float32) * 255.0
    std = np.asarray(cfg.INPUT.PIXEL_STD, np.float32) * 255.0
    rng = np.random.RandomState(3)
    random.seed(3)
    S, OUT = 64, 224
    imgs = rng.randint(0, 256, size=(5, S, S, 3), dtype=np.uint8)
    boxes = [(0, 0, S, S)] + [sample_rrc_box(S, S) for _ in range(4)]
    flips = [0, 1, 0, 1, 1]
    out = np.asarray(
        device_train_preprocess(
            jnp.asarray(imgs), jnp.asarray(boxes, jnp.int32),
            jnp.asarray(flips, jnp.int32), OUT,
            cfg.INPUT.PIXEL_MEAN, cfg.INPUT.PIXEL_STD,
        )
    )
    tol = 2.01 / (0.26130258 * 255)
    for i, ((left, top, cw, ch), flip) in enumerate(zip(boxes, flips)):
        ref = Image.fromarray(imgs[i]).resize(
            (OUT, OUT), Image.BICUBIC, box=(left, top, left + cw, top + ch)
        )
        ref = np.asarray(ref, np.float32)
        if flip:
            ref = ref[:, ::-1]
        ref = (ref - mean) / std
        assert np.abs(out[i] - ref).max() < tol, f"image {i}"


def test_loader_device_augment_train_batch(img_dir):
    from rpo_tpu.data.datum import Datum
    from rpo_tpu.data.loader import BatchLoader

    tp = TransformPipeline(_cfg().INPUT)
    items = [Datum(impath=p, label=i) for i, p in enumerate(img_dir)]
    loader = BatchLoader(items, tp, batch_size=4, train=True, shuffle=False,
                         num_workers=1)
    batch = next(iter(loader))
    assert batch["img"].shape == (4, 64, 64, 3)
    assert batch["box"].shape == (4, 4) and batch["box"].dtype == np.int32
    assert batch["flip"].shape == (4,)
    # real rows carry RRC boxes inside the source frame
    for i in range(batch["n"]):
        left, top, cw, ch = batch["box"][i]
        assert 0 < cw <= 64 and 0 < ch <= 64
        assert 0 <= left <= 64 - cw and 0 <= top <= 64 - ch
    # padding rows are full-frame (valid resample weights)
    assert list(batch["box"][3]) == [0, 0, 64, 64]


def test_make_image_prep_routes_train_dict(img_dir):
    from rpo_tpu.methods.base_trainer import make_image_prep
    from rpo_tpu.ops.preprocess import device_train_preprocess

    cfg = _cfg()
    prep = make_image_prep(cfg, jnp.float32)
    rng = np.random.RandomState(5)
    d = {
        "img": jnp.asarray(rng.randint(0, 256, size=(2, 64, 64, 3)), jnp.uint8),
        "box": jnp.asarray([[0, 0, 64, 64], [8, 8, 32, 40]], jnp.int32),
        "flip": jnp.asarray([0, 1], jnp.int32),
    }
    out = prep(d)
    assert out.shape == (2, 224, 224, 3)
    ref = device_train_preprocess(
        d["img"], d["box"], d["flip"], 224,
        cfg.INPUT.PIXEL_MEAN, cfg.INPUT.PIXEL_STD,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_device_augment_images_shard_on_mesh():
    """The {img, box, flip} train-images pytree shards over the data mesh
    (NamedSharding prefix applies to every leaf) and the sharded step
    matches single-device."""
    import jax

    if jax.device_count() < 2:
        pytest.skip("needs the virtual multi-device mesh")
    from rpo_tpu.ops.preprocess import device_train_preprocess
    from rpo_tpu.parallel.dp import make_mesh, shard_train_step

    mesh = make_mesh()
    n = jax.device_count()
    B = 2 * n
    rng = np.random.RandomState(0)
    imgs = {
        "img": jnp.asarray(rng.randint(0, 256, size=(B, 16, 16, 3)), jnp.uint8),
        "box": jnp.tile(jnp.asarray([[2, 2, 12, 12]], jnp.int32), (B, 1)),
        "flip": jnp.asarray(rng.randint(0, 2, size=(B,)), jnp.int32),
    }

    def train_step(params, opt_state, frozen, images, labels, mask, lr):
        x = device_train_preprocess(
            images["img"], images["box"], images["flip"], 32,
            [0.5, 0.5, 0.5], [0.25, 0.25, 0.25],
        )
        loss = jnp.sum(x * mask[:, None, None, None] * params["w"]) / jnp.sum(mask)
        return params, opt_state, loss

    params = {"w": jnp.float32(1.0)}
    labels = jnp.zeros((B,), jnp.int32)
    mask = jnp.asarray((np.arange(B) < B - 1).astype(np.float32))
    step = shard_train_step(train_step, mesh, donate=False)
    _, _, loss_dp = step(params, None, None, imgs, labels, mask, jnp.float32(0.1))
    _, _, loss_sd = jax.jit(train_step)(
        params, None, None, imgs, labels, mask, jnp.float32(0.1)
    )
    # cross-device reduction order differs on the ~100k-element sum
    np.testing.assert_allclose(float(loss_dp), float(loss_sd), rtol=1e-4)


def test_cli_smoke_device_resize(tmp_path):
    """Full CLI train+eval through the device-augment batches (train) and
    device-resize eval path — the real user surface with
    INPUT.DEVICE_RESIZE."""
    import os

    from .test_engine_e2e import run_cli

    out = str(tmp_path / "run")
    proc = run_cli(
        [
            "--seed", "1",
            "--trainer", "RPO",
            "--dataset-config-file", "configs/datasets/synthetic.yaml",
            "--config-file", "configs/trainers/RPO/main.yaml",
            "--output-dir", out,
            "DATASET.NUM_SHOTS", "4",
            "OPTIM.MAX_EPOCH", "1",
            "MODEL.BACKBONE.NAME", "TINY",
            "INPUT.SIZE", "(32, 32)",
            "TRAINER.RPO.PREC", "fp32",
            "INPUT.DEVICE_RESIZE", "16",
            # grouped dispatch must handle the {img,box,flip} batch pytree
            "TRAIN.STEPS_PER_DISPATCH", "2",
        ]
    )
    log = open(os.path.join(out, "log.txt")).read()
    assert "Finish training" in log and "* accuracy:" in log


def test_traced_resize_weights_match_static():
    """_traced_resize_weights with a full frame (start 0, length src)
    reproduces the static resize_weights matrix exactly, for both up-
    and down-scaling."""
    from rpo_tpu.ops.preprocess import _traced_resize_weights, resize_weights

    for src, out in [(64, 224), (224, 64), (48, 224), (224, 224)]:
        ref = resize_weights(src, out)
        got = np.asarray(_traced_resize_weights(src, out, 0, src))
        # static path computes in float64 numpy, traced in fp32 on device
        np.testing.assert_allclose(got, ref, atol=1e-5, err_msg=f"{src}->{out}")


def test_host_train_call_matches_device_path(img_dir):
    """TransformPipeline(train=True) in device-resize mode is the host
    PIL equivalent of the device-augment path for the SAME plan — the
    per-item fallback and the jitted path agree within resize tolerance."""
    from rpo_tpu.ops.preprocess import device_train_preprocess

    cfg = _cfg()
    tp = TransformPipeline(cfg.INPUT)
    plan = ((8, 4, 40, 48), True)
    host = tp(img_dir[0], train=True, plan=plan)  # (224,224,3) u8
    src = tp.raw_source(img_dir[0])
    dev = np.asarray(
        device_train_preprocess(
            jnp.asarray(src[None]), jnp.asarray([[8, 4, 40, 48]], jnp.int32),
            jnp.asarray([1], jnp.int32), 224,
            cfg.INPUT.PIXEL_MEAN, cfg.INPUT.PIXEL_STD,
        )
    )[0]
    mean = np.asarray(cfg.INPUT.PIXEL_MEAN, np.float32) * 255.0
    std = np.asarray(cfg.INPUT.PIXEL_STD, np.float32) * 255.0
    host_norm = (host.astype(np.float32) - mean) / std
    tol = 2.01 / (0.26130258 * 255)
    assert np.abs(dev - host_norm).max() < tol


def test_device_train_preprocess_downscale_boxes():
    """Crop boxes larger than the target (downscale: antialiased window
    with filterscale > 1) also match PIL — the regime the TINY-config
    dryrun runs (source 16 -> target 32 with sub-frame crops covers
    upscale; here source 64 -> target 32 makes full-frame and large
    boxes are true downscales)."""
    from PIL import Image

    from rpo_tpu.ops.preprocess import device_train_preprocess

    mean = [0.5, 0.5, 0.5]
    std = [0.25, 0.25, 0.25]
    rng = np.random.RandomState(9)
    S, OUT = 64, 32
    imgs = rng.randint(0, 256, size=(3, S, S, 3), dtype=np.uint8)
    boxes = [(0, 0, 64, 64), (4, 8, 56, 48), (10, 2, 40, 60)]
    flips = [0, 1, 0]
    out = np.asarray(
        device_train_preprocess(
            jnp.asarray(imgs), jnp.asarray(boxes, jnp.int32),
            jnp.asarray(flips, jnp.int32), OUT, mean, std,
        )
    )
    for i, ((left, top, cw, ch), flip) in enumerate(zip(boxes, flips)):
        ref = Image.fromarray(imgs[i]).resize(
            (OUT, OUT), Image.BICUBIC, box=(left, top, left + cw, top + ch)
        )
        ref = np.asarray(ref, np.float32)
        if flip:
            ref = ref[:, ::-1]
        ref = (ref - np.asarray(mean) * 255.0) / (np.asarray(std) * 255.0)
        assert np.abs(out[i] - ref).max() < 2.01 / (0.25 * 255), f"image {i}"


def test_device_augment_plans_deterministic(img_dir):
    """Seeded runs draw identical crop/flip plans in device-augment mode
    (randomness sequential on the producer thread, as in the host path)."""
    import random

    from rpo_tpu.data.datum import Datum
    from rpo_tpu.data.loader import BatchLoader

    tp = TransformPipeline(_cfg().INPUT)
    items = [Datum(impath=p, label=i) for i, p in enumerate(img_dir)]

    def run():
        random.seed(7)
        loader = BatchLoader(items, tp, batch_size=4, train=True, shuffle=True,
                             num_workers=2)
        out = []
        for _ in range(2):  # two epochs
            for b in loader:
                out.append((b["label"].copy(), b["box"].copy(), b["flip"].copy()))
        return out

    a, b = run(), run()
    assert len(a) == len(b)
    for (la, xa, fa), (lb, xb, fb) in zip(a, b):
        np.testing.assert_array_equal(la, lb)
        np.testing.assert_array_equal(xa, xb)
        np.testing.assert_array_equal(fa, fb)
