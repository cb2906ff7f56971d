"""Failure-path robustness: interrupted checkpoints, resume best-result,
abandoned loader iterators, explicit-checkpoint typos."""
import os
import pickle
import threading
import time

import numpy as np
import pytest


def _write_ckpt(path, epoch, val_result, state=None):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(
            {
                "state_dict": state or {"w": np.zeros((2,), np.float32)},
                "epoch": epoch,
                "optimizer": None,
                "val_result": val_result,
            },
            f,
        )


class _ResumeTrainer:
    """Minimal stand-in exposing the checkpoint surface resume uses."""

    def __init__(self):
        from rpo_tpu.engine.trainer import TrainerBase

        self._t = TrainerBase.__new__(TrainerBase)
        self._t._model_names = ["m"]
        self._t.best_result = -np.inf
        self._t.loaded = {}
        self._t.set_ckpt_state = lambda name, sd: None
        self._t.set_optim_state = lambda name, st: None

    def resume(self, directory):
        return self._t.resume_model_if_exist(directory)

    @property
    def best_result(self):
        return self._t.best_result


def test_resume_ignores_tmp_files(tmp_path):
    """A .tmp left by a job killed mid-atomic_dump must not break resume
    (engine/trainer.py write-then-rename)."""
    d = str(tmp_path)
    _write_ckpt(os.path.join(d, "m", "model.pth.tar-2"), 2, 55.0)
    # interrupted write: garbage content, unparseable epoch suffix
    with open(os.path.join(d, "m", "model.pth.tar-5.tmp"), "wb") as f:
        f.write(b"\x00truncated")
    tr = _ResumeTrainer()
    assert tr.resume(d) == 2
    assert tr.best_result == 55.0  # restored best-so-far from the payload


def test_resume_restores_best_result(tmp_path):
    """Without restoring val_result, a worse post-resume epoch would
    overwrite model-best.pth.tar."""
    d = str(tmp_path)
    _write_ckpt(os.path.join(d, "m", "model.pth.tar-10"), 10, 80.0)
    tr = _ResumeTrainer()
    assert tr.resume(d) == 10
    assert tr.best_result == 80.0


def test_resume_no_checkpoints(tmp_path):
    tr = _ResumeTrainer()
    assert tr.resume(str(tmp_path)) == 0
    assert tr.best_result == -np.inf


def test_loader_abandoned_iterator_releases_producer():
    """Dropping the iterator mid-epoch (exception in the step loop) must
    not leave the producer thread parked on a full queue forever."""
    from rpo_tpu.data.datum import Datum
    from rpo_tpu.data.loader import BatchLoader

    items = [Datum(impath=f"synthetic://{i}", label=0, classname="x") for i in range(64)]
    calls = []

    def transform(path, train):
        calls.append(path)
        time.sleep(0.005)
        return np.zeros((4, 4, 3), np.uint8)

    loader = BatchLoader(
        items, transform, batch_size=4, train=True, shuffle=False,
        num_workers=2, prefetch=1,
    )
    def producers():
        return [t for t in threading.enumerate() if t.name == "batch-producer"]

    it = iter(loader)
    next(it)
    assert producers()
    it.close()  # abandon mid-epoch
    deadline = time.time() + 5.0
    while producers() and time.time() < deadline:
        time.sleep(0.05)
    assert not producers(), "producer thread leaked"
    # and the producer stopped decoding: far fewer than all 64 items
    assert len(calls) < 64


@pytest.mark.slow
def test_cli_resume_continues_training(tmp_path):
    """--resume picks up from the last checkpoint: 2-epoch run, then a
    4-epoch run resuming it trains only epochs 3..4 (reference RESUME
    semantics, train.py:179-183)."""
    from .test_engine_e2e import run_cli

    out = str(tmp_path / "run")
    flags = [
        "--seed", "1",
        "--trainer", "RPO",
        "--dataset-config-file", "configs/datasets/synthetic.yaml",
        "--config-file", "configs/trainers/RPO/main.yaml",
        "--output-dir", out,
    ]
    opts = [
        "DATASET.NUM_SHOTS", "2",
        "MODEL.BACKBONE.NAME", "TINY", "INPUT.SIZE", "(32, 32)",
        "TRAINER.RPO.PREC", "fp32", "TEST.NO_TEST", "True",
        "TRAIN.CHECKPOINT_FREQ", "1",
    ]
    run_cli(flags + opts + ["OPTIM.MAX_EPOCH", "2"])
    stdout = run_cli(flags + ["--resume", out] + opts + ["OPTIM.MAX_EPOCH", "4"])
    assert "Resumed" in stdout and "(epoch 2)" in stdout
    assert "epoch [3/4]" in stdout and "epoch [4/4]" in stdout
    assert "epoch [1/4]" not in stdout  # did not restart from scratch
    assert os.path.exists(os.path.join(out, "prompt_learner", "model.pth.tar-4"))


def test_explicit_checkpoint_typo_raises(tmp_path, monkeypatch):
    """$CLIP_CHECKPOINT pointing nowhere must raise, never silently fall
    through to a different cached file or random weights."""
    from rpo_tpu.models.clip.pretrained import find_checkpoint

    monkeypatch.setenv("CLIP_CHECKPOINT", str(tmp_path / "nope.pt"))
    with pytest.raises(FileNotFoundError):
        find_checkpoint("ViT-B/16")


@pytest.mark.slow
def test_cli_auto_resume_from_output_dir(tmp_path):
    """WITHOUT --resume, relaunching the same command over an output dir
    that already holds checkpoints must resume from them (Dassl
    before_train falls back from cfg.RESUME to OUTPUT_DIR) instead of
    silently retraining from epoch 0."""
    from .test_engine_e2e import run_cli

    out = str(tmp_path / "run")
    flags = [
        "--seed", "1",
        "--trainer", "RPO",
        "--dataset-config-file", "configs/datasets/synthetic.yaml",
        "--config-file", "configs/trainers/RPO/main.yaml",
        "--output-dir", out,
    ]
    opts = [
        "DATASET.NUM_SHOTS", "2",
        "MODEL.BACKBONE.NAME", "TINY", "INPUT.SIZE", "(32, 32)",
        "TRAINER.RPO.PREC", "fp32", "TEST.NO_TEST", "True",
        "TRAIN.CHECKPOINT_FREQ", "1",
    ]
    run_cli(flags + opts + ["OPTIM.MAX_EPOCH", "2"])
    stdout = run_cli(flags + opts + ["OPTIM.MAX_EPOCH", "4"])  # no --resume
    assert "Resumed" in stdout and "(epoch 2)" in stdout
    assert "epoch [3/4]" in stdout and "epoch [1/4]" not in stdout
    assert os.path.exists(os.path.join(out, "prompt_learner", "model.pth.tar-4"))


def test_abandoned_epoch_does_not_poison_seeded_determinism(tmp_path):
    """Dropping an iterator mid-epoch and immediately re-iterating must
    not let the abandoned producer's in-flight global-`random` draws
    (shuffle, make_plan) interleave with the new epoch's: __iter__ joins
    the previous producer first.  Asserts the batches after an abandoned
    epoch equal those of a clean run with the same seed."""
    import random as pyrandom

    import numpy as np

    from rpo_tpu.data.datum import Datum
    from rpo_tpu.data.loader import BatchLoader
    from rpo_tpu.data.transforms import TransformPipeline

    class CfgInput:  # minimal transform config: RRC + flip => make_plan draws
        SIZE = (32, 32)
        INTERPOLATION = "bicubic"
        RRCROP_SCALE = (0.08, 1.0)
        PIXEL_MEAN = [0.5, 0.5, 0.5]
        PIXEL_STD = [0.5, 0.5, 0.5]
        TRANSFORMS = ("random_resized_crop", "random_flip", "normalize")
        DEVICE_RESIZE = 0

    items = [
        Datum(impath=f"synthetic://train/{i % 3}/{i}", label=i % 3, classname=str(i % 3))
        for i in range(12)
    ]

    def make_loader():
        tf = TransformPipeline(CfgInput)
        return BatchLoader(
            items, tf, batch_size=4, shuffle=True, train=True,
            num_workers=2, prefetch=1,
        )

    def epochs(loader, n):
        out = []
        for _ in range(n):
            epoch = [b["img"].copy() for b in loader]
            out.append(np.stack(epoch))
        return out

    # clean reference: two full epochs
    pyrandom.seed(123)
    ref = epochs(make_loader(), 2)

    # abandoned run: same seed, drop epoch 1 after one batch, then run
    # two full epochs — epoch arrays must be internally consistent (the
    # run is deterministic), which fails if the abandoned producer's
    # draws interleave with the restart's
    pyrandom.seed(123)
    loader = make_loader()
    it = iter(loader)
    next(it)
    del it  # abandon mid-epoch (generator close sets the abandoned flag)
    run_a = epochs(loader, 2)

    pyrandom.seed(123)
    loader = make_loader()
    it = iter(loader)
    next(it)
    del it
    run_b = epochs(loader, 2)

    for a, b in zip(run_a, run_b):
        np.testing.assert_array_equal(a, b)
    assert len(ref) == len(run_a)
