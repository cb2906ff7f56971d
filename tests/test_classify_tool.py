"""tools/classify.py — the ad-hoc serving path — produces valid top-k
JSON using the same eval step as protocol evaluation."""
import json
import os
import subprocess
import sys

import numpy as np

from .test_engine_e2e import REPO


def test_classify_tool_json(tmp_path):
    from PIL import Image

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    for i, c in enumerate([(255, 0, 0), (0, 0, 255), (0, 255, 0)]):
        Image.new("RGB", (48, 40), c).save(str(img_dir / f"im{i}.jpg"))

    env = dict(os.environ)
    env["RPO_TPU_FORCE_CPU"] = "1"
    proc = subprocess.run(
        [
            sys.executable, "tools/classify.py", str(img_dir),
            "--trainer", "RPO",
            "--dataset-config-file", "configs/datasets/synthetic.yaml",
            "--config-file", "configs/trainers/RPO/main.yaml",
            "--top-k", "3", "--batch-size", "2", "--json",
            "MODEL.BACKBONE.NAME", "TINY", "INPUT.SIZE", "(32, 32)",
            "TRAINER.RPO.PREC", "fp32",
        ],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, f"STDOUT:\n{proc.stdout}\nSTDERR:\n{proc.stderr}"
    lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    assert len(lines) == 3  # one JSON object per image (batch 2 -> padded tail)
    for line in lines:
        rec = json.loads(line)
        assert os.path.basename(rec["image"]).startswith("im")
        assert len(rec["top"]) == 3
        probs = [t["prob"] for t in rec["top"]]
        assert probs == sorted(probs, reverse=True)
        assert 0.0 < sum(probs) <= 1.0 + 1e-6
    # same image set, different order of classes would break this: the
    # synthetic dataset has 10 classes, all names non-empty strings
    assert all(t["class"] for rec in map(json.loads, lines) for t in rec["top"])


def test_classify_tool_with_checkpoint(tmp_path):
    """Serving from a trained checkpoint: train 1 epoch, then classify
    with --model-dir/--load-epoch (the load path protocol eval uses)."""
    from PIL import Image

    out_dir = tmp_path / "run"
    env = dict(os.environ)
    env["RPO_TPU_FORCE_CPU"] = "1"
    common = [
        "--trainer", "RPO",
        "--dataset-config-file", "configs/datasets/synthetic.yaml",
        "--config-file", "configs/trainers/RPO/main.yaml",
        "MODEL.BACKBONE.NAME", "TINY", "INPUT.SIZE", "(32, 32)",
        "TRAINER.RPO.PREC", "fp32",
    ]
    proc = subprocess.run(
        [sys.executable, "train.py", "--output-dir", str(out_dir), "--seed", "1"]
        + common
        + ["DATASET.NUM_SHOTS", "1", "OPTIM.MAX_EPOCH", "1", "TEST.NO_TEST", "True"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr

    img = tmp_path / "probe.jpg"
    Image.new("RGB", (40, 40), (120, 30, 200)).save(str(img))
    proc = subprocess.run(
        [
            sys.executable, "tools/classify.py", str(img),
            "--model-dir", str(out_dir), "--load-epoch", "1",
            "--top-k", "1", "--json",
        ]
        + common,
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert f"model.pth.tar-1" in proc.stdout or "prompt_learner" in proc.stdout
    recs = [json.loads(l) for l in proc.stdout.splitlines() if l.startswith("{")]
    assert len(recs) == 1 and len(recs[0]["top"]) == 1
