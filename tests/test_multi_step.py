"""Multi-step dispatch must be numerically identical to per-step dispatch."""
import os
import re

import numpy as np
import pytest

from .test_engine_e2e import REPO, run_cli

ARGS = [
    "--seed", "1",
    "--trainer", "RPO",
    "--dataset-config-file", "configs/datasets/synthetic.yaml",
    "--config-file", "configs/trainers/RPO/main.yaml",
    "DATASET.NUM_SHOTS", "4",
    "OPTIM.MAX_EPOCH", "2",
    "MODEL.BACKBONE.NAME", "TINY",
    "INPUT.SIZE", "(32, 32)",
    "DATALOADER.TRAIN_X.BATCH_SIZE", "4",
    "DATALOADER.TEST.BATCH_SIZE", "16",
    "TRAINER.RPO.PREC", "fp32",
    "TRAIN.PRINT_FREQ", "1",
]


def _losses(stdout: str):
    return [float(m) for m in re.findall(r"loss (\d+\.\d+) \(", stdout)]


@pytest.mark.slow
def test_grouped_dispatch_matches_single(tmp_path):
    out1 = str(tmp_path / "single")
    out8 = str(tmp_path / "grouped")
    s1 = run_cli(["--output-dir", out1] + ARGS + ["TRAIN.STEPS_PER_DISPATCH", "1"])
    s8 = run_cli(["--output-dir", out8] + ARGS + ["TRAIN.STEPS_PER_DISPATCH", "3"])
    l1, l8 = _losses(s1), _losses(s8)
    assert len(l1) == len(l8) > 0
    np.testing.assert_allclose(l1, l8, rtol=1e-4, atol=1e-5)
    a1 = re.search(r"\* accuracy: ([\.\d]+)%", s1).group(1)
    a8 = re.search(r"\* accuracy: ([\.\d]+)%", s8).group(1)
    assert a1 == a8
