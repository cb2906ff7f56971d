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
