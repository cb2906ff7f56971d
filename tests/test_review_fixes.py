"""Regression tests for the round-1 code-review findings."""
import random

import numpy as np
import pytest

from rpo_tpu.data.datum import Datum
from rpo_tpu.data.loader import BatchLoader
from rpo_tpu.engine import get_cfg_default, lr_at_epoch


def _items(n):
    return [Datum(impath=f"synthetic://t/{i % 3}/{i}", label=i % 3) for i in range(n)]


def _transform(cfg=None):
    from rpo_tpu.data.transforms import TransformPipeline

    class I:
        SIZE = (32, 32)
        INTERPOLATION = "bicubic"
        RRCROP_SCALE = (0.08, 1.0)
        TRANSFORMS = ("random_flip", "normalize")  # flip WITHOUT rrc
        PIXEL_MEAN = [0.5, 0.5, 0.5]
        PIXEL_STD = [0.5, 0.5, 0.5]

    return TransformPipeline(I)


def test_linear_warmup_matches_dassl():
    cfg = get_cfg_default()
    o = cfg.OPTIM
    o.LR = 0.01
    o.MAX_EPOCH = 20
    o.LR_SCHEDULER = "cosine"
    o.WARMUP_EPOCH = 5
    o.WARMUP_TYPE = "linear"
    o.WARMUP_MIN_LR = 1e-5
    assert lr_at_epoch(o, 0) == 1e-5  # min LR at epoch 0
    assert abs(lr_at_epoch(o, 1) - 0.01 * 1 / 5) < 1e-12
    assert abs(lr_at_epoch(o, 4) - 0.01 * 4 / 5) < 1e-12
    # Dassl recount: the cosine successor starts at 0 when warmup ends,
    # so the first post-warmup epoch runs at the full base LR
    assert abs(lr_at_epoch(o, 5) - 0.01) < 1e-12
    assert lr_at_epoch(o, 6) < 0.01  # then cosine decays


def test_train_loader_drops_last_partial_batch():
    tr = _transform()
    loader = BatchLoader(_items(10), tr, batch_size=4, train=True, shuffle=False,
                         num_workers=1, drop_last=True)
    assert len(loader) == 2
    batches = list(loader)
    assert len(batches) == 2
    assert all(b["n"] == 4 for b in batches)
    # eval keeps (padded) remainder
    ev = BatchLoader(_items(10), tr, batch_size=4, train=False, shuffle=False,
                     num_workers=1)
    assert len(ev) == 3 and list(ev)[-1]["n"] == 2
    # drop_last degrades gracefully when dataset < batch_size
    small = BatchLoader(_items(3), tr, batch_size=4, train=True, shuffle=False,
                        num_workers=1, drop_last=True)
    assert len(small) == 1


def test_flip_without_rrc_is_applied():
    tr = _transform()
    path = "synthetic://t/0/0"
    random.seed(0)
    flips = [tr.make_plan(path, train=True)[1] for _ in range(64)]
    assert any(flips) and not all(flips)  # flip is actually drawn
    base = tr(path, train=False)
    random.seed(0)
    outs = [tr(path, train=True) for _ in range(8)]
    flipped_seen = any(np.array_equal(o, base[:, ::-1]) for o in outs)
    unflipped_seen = any(np.array_equal(o, base) for o in outs)
    assert flipped_seen and unflipped_seen


def test_loader_propagates_producer_errors():
    def bad_transform(impath, train, plan=None):
        raise RuntimeError("corrupt image")

    loader = BatchLoader(_items(4), bad_transform, batch_size=2, train=False,
                         shuffle=False, num_workers=1)
    with pytest.raises(RuntimeError, match="corrupt image"):
        list(loader)


def test_fewshot_cache_unreadable_fallback(tmp_path):
    from rpo_tpu.data.datum import DatasetBase
    from rpo_tpu.data.splits import load_or_create_fewshot

    cache_dir = tmp_path / "split_fewshot"
    cache_dir.mkdir()
    (cache_dir / "shot_2-seed_1.pkl").write_bytes(b"\x80\x04 garbage from dassl")
    items = _items(12)
    ds = DatasetBase(train_x=items)
    random.seed(1)
    train, val = load_or_create_fewshot(ds, items, items, str(cache_dir), 2, 1)
    assert len(train) == 6  # regenerated (3 classes x 2 shots)
    # the unreadable (reference) cache was NOT overwritten
    assert (cache_dir / "shot_2-seed_1.pkl").read_bytes().startswith(b"\x80\x04 garbage")


def test_amp_aliases_fp16():
    """PREC 'amp' and PREC 'fp16' compile to IDENTICAL programs on TPU.

    The reference's amp path (trainers/rpo.py:278,300-307) pairs fp16
    compute with a GradScaler because fp16 gradients underflow; bf16
    keeps fp32's exponent range, so on TPU both settings map to bf16
    with no loss scaling and must lower to the same HLO.
    """
    import jax
    import jax.numpy as jnp

    from rpo_tpu.methods import rpo as core
    from rpo_tpu.methods.base_trainer import prec_dtype
    from rpo_tpu.models.clip import ARCHS, cast_params, init_clip

    assert prec_dtype("amp") is prec_dtype("fp16") is jnp.bfloat16

    cfg = ARCHS["TINY"]
    base = init_clip(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    classnames = ["cat", "dog"]
    task = core.make_task(cfg, classnames, "a photo of a _.", K=2)
    images = jnp.zeros((2, cfg.image_resolution, cfg.image_resolution, 3),
                       jnp.float32)
    labels = jnp.zeros((2,), jnp.int32)

    def lowered(prec):
        params = cast_params(base, prec_dtype(prec))
        prompts = core.init_prompts(jax.random.PRNGKey(1), params, cfg, K=2)
        frozen = core.make_frozen(params, task)

        def step(prompts, frozen, images, labels):
            loss, _ = core.rpo_loss(prompts, frozen, task, images, labels)
            return loss

        return jax.jit(step).lower(prompts, frozen, images, labels).as_text()

    assert lowered("amp") == lowered("fp16")


@pytest.mark.slow
def test_cocoop_remat_and_chunking_equivalent():
    """The large-train-batch memory-wall escapes — remat_per_image
    (jax.checkpoint on the per-image text encoder) and the production
    B >= 16 policy of remat + chunked lax.map (mirroring bench.py's
    measured policy) — must not change logits or gradients vs the plain
    vmapped formulation.  One shared baseline keeps CPU compiles to 3."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rpo_tpu.methods import cocoop
    from rpo_tpu.methods import coop
    from rpo_tpu.models.clip import ARCHS, init_clip

    cfg = ARCHS["TINY"]
    clip_params = init_clip(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    classnames = ["cat", "dog", "fox"]
    k_ctx, k_meta = jax.random.split(jax.random.PRNGKey(1))
    ctx_params, prefix, n_ctx = coop.init_ctx(
        k_ctx, clip_params, cfg, len(classnames), 4, False, ""
    )
    params = {
        "ctx": ctx_params["ctx"],
        "meta_net": cocoop.init_meta_net(k_meta, cfg.embed_dim, cfg.text_width),
    }
    task = coop.make_task(cfg, classnames, n_ctx, False, "end", prefix)
    # numerics are B-independent; small B keeps the CPU compile cheap while
    # still exercising the chunked lax.map path (chunk < B)
    B = 8
    images = jax.random.uniform(
        jax.random.PRNGKey(2), (B, cfg.image_resolution, cfg.image_resolution, 3)
    )
    labels = jnp.asarray(np.arange(B) % len(classnames))

    def loss(p, chunk, remat):
        lg = cocoop.cocoop_logits(p, clip_params, task, images,
                                  chunk=chunk, remat_per_image=remat)
        lp = jax.nn.log_softmax(lg, -1)
        return -jnp.take_along_axis(lp, labels[:, None], -1).mean()

    l0, g0 = jax.value_and_grad(lambda p: loss(p, 0, False))(params)
    for chunk, remat in ((0, True), (4, True)):
        l1, g1 = jax.value_and_grad(
            lambda p, _c=chunk, _r=remat: loss(p, _c, _r)
        )(params)
        np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
        for a, b in zip(
            jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
            )


def test_merge_from_list_respects_freeze():
    """merge_from_list must fail on a frozen cfg like _merge_dict/yacs do,
    not silently mutate state that derived objects (jit programs,
    loaders) were built from."""
    import pytest

    from rpo_tpu.engine import get_cfg_default

    cfg = get_cfg_default()
    cfg.merge_from_list(["OPTIM.LR", "0.1"])  # mutable: fine
    assert cfg.OPTIM.LR == 0.1
    cfg.freeze()
    with pytest.raises(AttributeError):
        cfg.merge_from_list(["OPTIM.LR", "0.2"])
    assert cfg.OPTIM.LR == 0.1


def test_cached_checkpoint_sha_verification(tmp_path, monkeypatch):
    """A cached checkpoint at the canonical name with a wrong SHA256 is
    (a) warned about but still returned when downloads are off (it may be
    deliberate custom weights), (b) quarantined to .corrupt and
    re-resolved when RPO_TPU_ALLOW_DOWNLOAD=1 (reference clip.py:49-53
    redownload-on-mismatch semantics)."""
    import os

    from rpo_tpu.models.clip import pretrained as P

    monkeypatch.delenv("CLIP_CHECKPOINT", raising=False)
    monkeypatch.setenv("CLIP_CACHE_DIR", str(tmp_path))
    monkeypatch.delenv("RPO_TPU_ALLOW_DOWNLOAD", raising=False)
    path = tmp_path / P._FILENAMES["ViT-B/16"]
    path.write_bytes(b"not a checkpoint")

    assert P.find_checkpoint("ViT-B/16") == str(path)  # warn, not destroy

    monkeypatch.setenv("RPO_TPU_ALLOW_DOWNLOAD", "1")
    # no egress in this environment: the redownload attempt fails and the
    # resolution falls back to None — but the corrupt file is quarantined
    assert P.find_checkpoint("ViT-B/16") is None
    assert os.path.exists(str(path) + ".corrupt")
    assert not path.exists()


def test_pallas_gate_rejects_nonbroadcastable_bias():
    """A bias whose batch dim matches neither 1 nor B must take the XLA
    path (which raises a broadcast error) — a Pallas BlockSpec would
    clamp the out-of-range block index and silently reuse rows."""
    import jax
    import jax.numpy as jnp
    import pytest

    from rpo_tpu.ops.attention import dot_product_attention, pallas_attention_scope

    B, H, L, D = 4, 2, 128, 64
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(k1, (B, H, L, D), jnp.float32)
    k = jax.random.normal(k2, (B, H, L, D), jnp.float32)
    v = jax.random.normal(k3, (B, H, L, D), jnp.float32)
    bad_bias = jnp.zeros((2, 1, L, L), jnp.float32)  # batch 2 != 1, != 4
    with pallas_attention_scope(True):
        with pytest.raises(Exception):
            dot_product_attention(q, k, v, bad_bias)


def test_prewarm_plan_matches_engine_dispatch():
    """prewarm_plan must warm exactly the programs run_epoch dispatches:
    the grouped program only for full groups, the per-batch step for the
    trailing partial group (engine/trainer.py run_epoch routes the
    remainder through forward_backward, commit 5003a91)."""
    from rpo_tpu.methods.base_trainer import prewarm_plan

    for group in (1, 2, 3, 4, 8):
        for num_batches in (0, 1, 2, 3, 4, 5, 7, 8, 9, 16):
            # simulate run_epoch's routing
            if group > 1:
                full_groups = num_batches // group
                singles = num_batches % group
            else:
                full_groups, singles = 0, num_batches
            expect = (full_groups > 0, singles > 0 or full_groups == 0)
            got = prewarm_plan(group, num_batches)
            assert got == expect, (group, num_batches, got, expect)


def test_checkpoint_pickle_with_zip_tail_signature(tmp_path):
    """_load_checkpoint_file must route by the LEADING torch-zip magic:
    a native pickle whose trailing bytes happen to contain a valid EOCD
    record (as raw fp32 momentum bytes can, ~1 in 70k checkpoints) still
    loads via pickle (zipfile.is_zipfile scans the tail and would have
    misrouted it to torch.load)."""
    import pickle
    import zipfile

    import numpy as np

    from rpo_tpu.engine.trainer import _load_checkpoint_file

    path = str(tmp_path / "model.pth.tar-5")
    payload = {"state_dict": {"w": np.ones((2, 2), np.float32)}, "epoch": 5}
    with open(path, "wb") as f:
        pickle.dump(payload, f)
        # a structurally valid, empty end-of-central-directory record —
        # pickle.load stops at the STOP opcode and ignores trailing bytes
        f.write(b"PK\x05\x06" + b"\x00" * 16 + b"\x00\x00")
    assert zipfile.is_zipfile(path)  # the old router's trap
    out = _load_checkpoint_file(path)
    assert out["epoch"] == 5
    np.testing.assert_array_equal(out["state_dict"]["w"], np.ones((2, 2)))


def test_set_ckpt_state_validation():
    """Checkpoints are validated against the method pytree: unexpected
    keys are dropped with a warning, missing keys keep their init, and a
    shape mismatch fails AT THE LOAD SITE."""
    import jax.numpy as jnp
    import numpy as np
    import pytest

    from rpo_tpu.methods.linear_probe import LP

    tr = object.__new__(LP)
    tr.params = {"w": jnp.zeros((4, 4)), "b": jnp.zeros((4,))}
    # unexpected + missing keys: warn, keep init for the missing one
    tr.set_ckpt_state("lp_layer", {"w": np.ones((4, 4)), "junk": np.ones(3)})
    assert "junk" not in tr.params
    np.testing.assert_array_equal(np.asarray(tr.params["w"]), np.ones((4, 4)))
    np.testing.assert_array_equal(np.asarray(tr.params["b"]), np.zeros(4))
    # wrong shape: a checkpoint from another backbone fails loudly
    with pytest.raises(ValueError, match="shape mismatch"):
        tr.set_ckpt_state("lp_layer", {"w": np.ones((8, 8)), "b": np.zeros(4)})


def test_loader_prefetch_zero_is_bounded(tmp_path):
    """prefetch=0 must not mean queue.Queue(maxsize=0) == unbounded (the
    whole epoch resident in RAM); it clamps to the minimum real bound and
    the loader still serves every batch."""
    import numpy as np
    from PIL import Image

    from rpo_tpu.data.datum import Datum
    from rpo_tpu.data.loader import BatchLoader
    from rpo_tpu.data.transforms import TransformPipeline
    from rpo_tpu.engine.config import get_cfg_default

    rng = np.random.RandomState(0)
    paths = []
    for i in range(5):
        p = str(tmp_path / f"im{i}.png")
        Image.fromarray(rng.randint(0, 255, (48, 48, 3), np.uint8)).save(p)
        paths.append(p)
    cfg = get_cfg_default()
    cfg.INPUT.SIZE = (32, 32)
    tp = TransformPipeline(cfg.INPUT)
    items = [Datum(impath=p, label=i) for i, p in enumerate(paths)]
    loader = BatchLoader(items, tp, batch_size=2, train=False, shuffle=False,
                         num_workers=1, prefetch=0)
    batches = list(loader)
    assert sum(b["n"] for b in batches) == len(items)


def test_override_pallas_attention_precedence():
    """bench.py's hardened gate downgrades every subsequently-traced
    program to the XLA path via override_pallas_attention("0") — the
    override must beat a thread-local scope that asks for Pallas, and
    override(None) must restore env control (attention.py r4)."""
    from rpo_tpu.ops import attention as attn_ops

    assert not attn_ops.use_pallas_attention()  # cpu backend default-off
    try:
        with attn_ops.pallas_attention_scope(True):
            # scope alone: still off on the cpu backend (Mosaic is TPU-only)
            assert not attn_ops.use_pallas_attention()
        attn_ops.override_pallas_attention("0")
        with attn_ops.pallas_attention_scope(True):
            # the scope is a no-op while the override forces the XLA path:
            # _ENV == "0" wins before any thread-local state is consulted
            assert not attn_ops.use_pallas_attention()
            # and the scope must not have installed a lingering TLS value
            # that would outlive the override (it yields without setting)
        attn_ops.override_pallas_attention(None)
        # env control restored: _ENV re-reads the real environment
        import os as _os

        assert attn_ops._ENV == _os.environ.get("RPO_TPU_PALLAS_ATTENTION", "")
        assert not attn_ops.use_pallas_attention()
    finally:
        attn_ops.override_pallas_attention(None)
