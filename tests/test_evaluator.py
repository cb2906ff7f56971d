"""Evaluator output contract (parse_test_res scrapes these lines)."""
import io
import sys

import numpy as np

from rpo_tpu.engine import get_cfg_default
from rpo_tpu.engine.evaluator import ClassificationEvaluator


def _run(per_class=False):
    cfg = get_cfg_default()
    cfg.TEST.PER_CLASS_RESULT = per_class
    ev = ClassificationEvaluator(cfg, classnames=["cat", "dog", "bird"])
    logits = np.array(
        [[2.0, 1.0, 0.0], [0.0, 2.0, 1.0], [2.0, 0.0, 1.0], [0.0, 0.0, 2.0]]
    )
    labels = np.array([0, 1, 1, 2])  # 3 correct, 1 wrong
    ev.process(logits, labels)
    buf = io.StringIO()
    old = sys.stdout
    sys.stdout = buf
    try:
        results = ev.evaluate()
    finally:
        sys.stdout = old
    return results, buf.getvalue()


def test_log_contract():
    results, out = _run()
    assert results["accuracy"] == 75.0
    assert "=> result" in out
    assert "* total: 4" in out
    assert "* correct: 3" in out
    assert "* accuracy: 75.0%" in out
    assert "* error: 25.0%" in out
    assert "* macro_f1:" in out


def test_per_class_block():
    _, out = _run(per_class=True)
    assert "=> per-class result" in out
    assert "* class: 0 (cat)" in out
    assert "* average:" in out


def test_macro_f1_value():
    results, _ = _run()
    # per-class F1: cat tp=1 fp=1 fn=0 -> 2/3; dog tp=1 fp=0 fn=1 -> 2/3;
    # bird tp=1 fp=0 fn=0 -> 1.0 ; macro = 7/9
    np.testing.assert_allclose(results["macro_f1"], 100 * 7 / 9, rtol=1e-6)


def test_confusion_matrix_saved(tmp_path):
    cfg = get_cfg_default()
    cfg.OUTPUT_DIR = str(tmp_path)
    cfg.TEST.COMPUTE_CMAT = True
    ev = ClassificationEvaluator(cfg, classnames=["a", "b"])
    ev.process(np.array([[1.0, 0.0], [0.0, 1.0], [1.0, 0.0]]), np.array([0, 1, 1]))
    ev.evaluate()
    import torch

    # Dassl artifact: cmat.pt, sklearn confusion_matrix(normalize="true")
    cmat = torch.load(tmp_path / "cmat.pt").numpy()
    np.testing.assert_allclose(cmat, [[1.0, 0.0], [0.5, 0.5]])
