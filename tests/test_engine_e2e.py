"""End-to-end engine tests: config merge, CLI train/eval on the synthetic
dataset, checkpoint round-trip across class subsets, log contract.
"""
import os
import pickle
import re
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(args, cwd=REPO):
    env = dict(os.environ)
    env["RPO_TPU_FORCE_CPU"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, "train.py"] + args,
        cwd=cwd,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, f"STDOUT:\n{proc.stdout}\nSTDERR:\n{proc.stderr}"
    return proc.stdout


# ---------------------------------------------------------------------------
# config system
# ---------------------------------------------------------------------------

def test_config_merge_pipeline():
    from rpo_tpu.engine import get_cfg_default

    cfg = get_cfg_default()
    cfg.merge_from_file(os.path.join(REPO, "configs/datasets/synthetic.yaml"))
    cfg.merge_from_file(os.path.join(REPO, "configs/trainers/RPO/main_K24.yaml"))
    cfg.merge_from_list(["DATASET.NUM_SHOTS", "16", "DATASET.SUBSAMPLE_CLASSES", "base"])
    assert cfg.DATASET.NAME == "Synthetic"
    assert cfg.TRAINER.RPO.K == 24
    assert cfg.INPUT.SIZE == (224, 224)  # literal-eval'd from "(224, 224)"
    assert cfg.OPTIM.LR == 0.01
    assert cfg.OPTIM.WARMUP_CONS_LR == 1e-5
    assert cfg.DATASET.NUM_SHOTS == 16
    assert cfg.DATASET.SUBSAMPLE_CLASSES == "base"
    cfg.freeze()
    with pytest.raises(AttributeError):
        cfg.SEED = 3
    with pytest.raises(KeyError):
        cfg2 = get_cfg_default()
        cfg2.merge_from_list(["DATASET.NO_SUCH_KEY", "1"])


def test_lr_schedule_semantics():
    from rpo_tpu.engine import get_cfg_default, lr_at_epoch

    cfg = get_cfg_default()
    cfg.merge_from_file(os.path.join(REPO, "configs/trainers/RPO/main_K24.yaml"))
    o = cfg.OPTIM
    assert lr_at_epoch(o, 0) == 1e-5  # constant warmup epoch
    # Dassl recount: first post-warmup epoch restarts the cosine at LR
    assert abs(lr_at_epoch(o, 1) - 0.01) < 1e-12
    assert abs(lr_at_epoch(o, 2) - 0.01 * 0.5 * (1 + np.cos(np.pi * 1 / 15))) < 1e-9
    assert lr_at_epoch(o, 14) < lr_at_epoch(o, 2)


# ---------------------------------------------------------------------------
# full CLI runs (subprocess — the real user surface)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def trained_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("rpo_synth"))
    run_cli(
        [
            "--seed", "1",
            "--trainer", "RPO",
            "--dataset-config-file", "configs/datasets/synthetic.yaml",
            "--config-file", "configs/trainers/RPO/main.yaml",
            "--output-dir", out,
            "DATASET.NUM_SHOTS", "4",
            "DATASET.SUBSAMPLE_CLASSES", "base",
            "OPTIM.MAX_EPOCH", "2",
            "MODEL.BACKBONE.NAME", "TINY",
            "INPUT.SIZE", "(32, 32)",
            "DATALOADER.TRAIN_X.BATCH_SIZE", "8",
            "DATALOADER.TEST.BATCH_SIZE", "16",
            "TRAINER.RPO.PREC", "fp32",
        ]
    )
    return out


def test_train_produces_log_contract(trained_dir):
    log = open(os.path.join(trained_dir, "log.txt")).read()
    assert "Finish training" in log
    # parse_test_res contract: accuracy line after the end signal
    m = re.search(r"\* accuracy: ([\.\deE+-]+)%", log)
    assert m, log
    assert "=> result" in log
    assert "* total:" in log and "* correct:" in log
    assert "* macro_f1:" in log


def test_checkpoint_files(trained_dir):
    ckpt = os.path.join(trained_dir, "prompt_learner", "model.pth.tar-2")
    assert os.path.exists(ckpt)
    with open(ckpt, "rb") as f:
        payload = pickle.load(f)
    assert payload["epoch"] == 2
    assert set(payload["state_dict"]) == {"text_prompt", "img_prompt"}
    assert payload["state_dict"]["text_prompt"].shape == (4, 64)  # TINY d_t
    assert payload["optimizer"] is not None


def test_eval_only_cross_class_set(trained_dir, tmp_path):
    """base-trained checkpoint evaluated on the *new* class half — the
    class-agnostic checkpoint property (SURVEY.md §3.5)."""
    out = str(tmp_path / "eval_new")
    stdout = run_cli(
        [
            "--seed", "1",
            "--trainer", "RPO",
            "--dataset-config-file", "configs/datasets/synthetic.yaml",
            "--config-file", "configs/trainers/RPO/main.yaml",
            "--output-dir", out,
            "--eval-only",
            "--model-dir", trained_dir,
            "--load-epoch", "2",
            "DATASET.NUM_SHOTS", "4",
            "DATASET.SUBSAMPLE_CLASSES", "new",
            "OPTIM.MAX_EPOCH", "2",
            "MODEL.BACKBONE.NAME", "TINY",
            "INPUT.SIZE", "(32, 32)",
            "DATALOADER.TEST.BATCH_SIZE", "16",
            "TRAINER.RPO.PREC", "fp32",
        ]
    )
    assert "Loading weights to prompt_learner" in stdout
    assert re.search(r"\* accuracy: ([\.\deE+-]+)%", stdout)


def test_subsample_classes_semantics():
    from rpo_tpu.data.datum import Datum
    from rpo_tpu.data.splits import subsample_classes

    items = [Datum(impath=f"x{i}", label=i % 5, classname=f"c{i % 5}") for i in range(20)]
    (base,) = subsample_classes(items, subsample="base")
    (new,) = subsample_classes(items, subsample="new")
    assert {d.label for d in base} == {0, 1, 2}  # ceil(5/2)=3 base classes
    assert {d.classname for d in base} == {"c0", "c1", "c2"}
    assert {d.label for d in new} == {0, 1}  # relabeled contiguously
    assert {d.classname for d in new} == {"c3", "c4"}


def test_fewshot_sampler_deterministic():
    import random

    from rpo_tpu.data.datum import Datum, DatasetBase

    items = [
        Datum(impath=f"x{i}", label=i % 3, classname=f"c{i % 3}") for i in range(30)
    ]
    ds = DatasetBase(train_x=items)
    random.seed(7)
    a = ds.generate_fewshot_dataset(items, num_shots=2)
    random.seed(7)
    b = ds.generate_fewshot_dataset(items, num_shots=2)
    assert [d.impath for d in a] == [d.impath for d in b]
    assert len(a) == 6
    per_class = {}
    for d in a:
        per_class.setdefault(d.label, []).append(d)
    assert all(len(v) == 2 for v in per_class.values())
