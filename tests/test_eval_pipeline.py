"""Pipelined test() keeps batch/label association and drains everything.

TrainerBase.test() defers the numpy conversion of each batch's logits
behind a depth-2 dispatch queue (engine/trainer.py); these tests pin that
the deferral never reorders or drops (logits, labels) pairs — the
accuracy must equal the per-batch-sync result — and that the async hook
is actually used.
"""
import numpy as np

from rpo_tpu.engine.evaluator import ClassificationEvaluator
from rpo_tpu.engine.trainer import TrainerBase


class _FakeLoader:
    """7 batches of 5, labels 0..4; batch b's logits are one-hot correct
    only when b is even -> expected accuracy = 4/7 of batches = 20/35."""

    def __init__(self, n_batches=7, b=5, n_cls=5):
        self.n_batches, self.b, self.n_cls = n_batches, b, n_cls

    def __iter__(self):
        for i in range(self.n_batches):
            labels = np.arange(self.b) % self.n_cls
            yield {
                "img": np.full((self.b, 2, 2, 3), i, np.uint8),
                "label": labels,
                "n": self.b,
            }


class _FakeDM:
    val_loader = None

    def __init__(self):
        self.test_loader = _FakeLoader()


class _LazyLogits:
    """Stand-in for an in-flight device array: only materializes when
    np.asarray is called on it (i.e. at drain time)."""

    def __init__(self, arr, log):
        self._arr = arr
        self._log = log
        self.materialized = False

    def __array__(self, dtype=None, copy=None):
        self.materialized = True
        self._log.append("drain")
        return self._arr.astype(dtype or np.float32)


class _PipelinedTrainer(TrainerBase):
    def __init__(self):  # bypass TrainerBase.__init__ (no DataManager)
        from rpo_tpu.engine.config import get_cfg_default

        self.cfg = get_cfg_default()
        self.dm = _FakeDM()
        self.evaluator = ClassificationEvaluator(None)
        self.events = []
        self.lazies = []

    def model_inference_async(self, images):
        b, n_cls = images.shape[0], 5
        batch_id = int(images[0, 0, 0, 0])
        logits = np.zeros((b, n_cls), np.float32)
        correct = batch_id % 2 == 0
        for r in range(b):
            lab = r % n_cls
            logits[r, lab if correct else (lab + 1) % n_cls] = 1.0
        self.events.append("dispatch")
        lazy = _LazyLogits(logits, self.events)
        self.lazies.append(lazy)
        return lazy


def test_pipelined_eval_accuracy_and_order():
    tr = _PipelinedTrainer()
    acc = tr.test()
    # 4 of 7 batches fully correct
    assert abs(acc - 100.0 * 20 / 35) < 1e-6
    assert all(lz.materialized for lz in tr.lazies)
    # the pipeline really defers: by the time the first batch is drained,
    # more than one dispatch has been issued
    first_drain = tr.events.index("drain")
    assert tr.events[:first_drain].count("dispatch") >= 3
    assert tr.events.count("dispatch") == 7
    assert tr.events.count("drain") == 7


def test_pipelined_eval_single_batch():
    tr = _PipelinedTrainer()
    tr.dm.test_loader = _FakeLoader(n_batches=1)
    acc = tr.test()
    assert acc == 100.0  # batch 0 is "correct" in the fake
