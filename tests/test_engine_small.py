"""Coverage for small engine pieces: logger tee, device prefetch,
CfgNode clone/freeze, ZeroshotCLIP2 re-instantiation."""
import os
import subprocess
import sys

import numpy as np

from rpo_tpu.engine import get_cfg_default


def test_logger_tee(tmp_path):
    # run in a subprocess: setup_logger replaces sys.stdout
    code = f"""
from rpo_tpu.engine import setup_logger
setup_logger({str(tmp_path)!r})
print("hello tee")
"""
    r = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True,
                       cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 0, r.stderr
    assert "hello tee" in r.stdout
    assert "hello tee" in open(tmp_path / "log.txt").read()


def test_logger_preserves_old_log(tmp_path):
    """Dassl precedence: the EXISTING log.txt is never touched — the new
    run writes to log.txt-<timestamp>.  parse_test_res reads exactly
    log.txt, so the first run's results win for a reused output dir."""
    (tmp_path / "log.txt").write_text("old run\n")
    code = f"""
from rpo_tpu.engine import setup_logger
setup_logger({str(tmp_path)!r})
print("new run")
"""
    subprocess.run([sys.executable, "-c", code], capture_output=True, text=True,
                   cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    logs = sorted(os.listdir(tmp_path))
    assert len(logs) == 2  # untouched log.txt + timestamped new log
    assert open(tmp_path / "log.txt").read() == "old run\n"
    ts_log = [l for l in logs if l != "log.txt"][0]
    assert ts_log.startswith("log.txt-")
    assert "new run" in open(tmp_path / ts_log).read()


def test_device_prefetch_order_and_content():
    from rpo_tpu.engine.trainer import device_prefetch

    batches = [
        {"img": np.full((2, 4, 4, 3), i, np.uint8), "label": np.array([i, i]),
         "mask": np.ones(2, np.float32), "n": 2}
        for i in range(5)
    ]
    out = list(device_prefetch(iter(batches), depth=2))
    assert len(out) == 5
    for i, b in enumerate(out):
        assert int(np.asarray(b["label"])[0]) == i
        assert b["n"] == 2  # non-array fields pass through


def test_cfgnode_clone_freeze():
    cfg = get_cfg_default()
    cfg.freeze()
    c2 = cfg.clone()
    assert c2.is_frozen()
    c2.defrost()
    c2.SEED = 7
    assert cfg.SEED == -1  # deep copy


def test_cfg_type_mismatch_raises_at_merge():
    """yacs semantics: a float onto an int default and None onto a str
    default must fail at the merge site, not deep in the trainer (the
    lenient coercions masked e.g. BATCH_SIZE 64.5 until the loader)."""
    import pytest

    from rpo_tpu.engine.config import get_cfg_default

    cfg = get_cfg_default()
    with pytest.raises(ValueError, match="Type mismatch"):
        cfg.merge_from_list(["DATALOADER.TRAIN_X.BATCH_SIZE", "64.5"])
    with pytest.raises(ValueError, match="Type mismatch"):
        cfg.merge_from_list(["TRAINER.COOP.CTX_INIT", "None"])
    # still-legal coercions: int onto float, int-literal onto str default
    cfg.merge_from_list(["OPTIM.LR", "1", "MODEL.BACKBONE.NAME", "16"])
    assert cfg.OPTIM.LR == 1.0 and cfg.MODEL.BACKBONE.NAME == "16"


def test_evaluator_perclass_key_and_no_classnames(capsys):
    """PER_CLASS_RESULT stores Dassl's perclass_accuracy key and works
    without classnames (label ids used as names)."""
    import numpy as np

    from rpo_tpu.engine.config import get_cfg_default
    from rpo_tpu.engine.evaluator import ClassificationEvaluator

    cfg = get_cfg_default()
    cfg.TEST.PER_CLASS_RESULT = True
    ev = ClassificationEvaluator(cfg, classnames=None)
    ev.process(np.array([[1.0, 0.0], [0.0, 1.0], [1.0, 0.0]]), np.array([0, 1, 1]))
    res = ev.evaluate()
    out = capsys.readouterr().out
    assert "=> per-class result" in out
    assert res["perclass_accuracy"] == 75.0  # class 0: 100%, class 1: 50%
