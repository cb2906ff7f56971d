"""Loading reference (torch-format) prompt checkpoints, e.g. rpo.zip."""
import os
import re
import subprocess
import sys

import numpy as np
import pytest

from .test_engine_e2e import REPO, run_cli

torch = pytest.importorskip("torch")


def test_eval_with_torch_checkpoint(tmp_path):
    # fabricate a reference-style checkpoint: torch tensors, fp16, with the
    # stale class-dependent buffers the reference strips on load
    ckpt_dir = tmp_path / "ref_ckpt" / "prompt_learner"
    os.makedirs(ckpt_dir)
    state = {
        "text_prompt": torch.randn(4, 64, dtype=torch.float16),
        "img_prompt": torch.randn(4, 64, dtype=torch.float16),
        "token_prefix": torch.zeros(3, 1, 64),
        "token_suffix": torch.zeros(3, 72, 64),
    }
    torch.save(
        {"state_dict": state, "epoch": 15, "val_result": 0.0},
        str(ckpt_dir / "model.pth.tar-15"),
    )

    out = str(tmp_path / "eval_out")
    stdout = run_cli(
        [
            "--seed", "1",
            "--trainer", "RPO",
            "--dataset-config-file", "configs/datasets/synthetic.yaml",
            "--config-file", "configs/trainers/RPO/main.yaml",
            "--output-dir", out,
            "--eval-only",
            "--model-dir", str(tmp_path / "ref_ckpt"),
            "--load-epoch", "15",
            "MODEL.BACKBONE.NAME", "TINY",
            "INPUT.SIZE", "(32, 32)",
            "DATALOADER.TEST.BATCH_SIZE", "16",
            "TRAINER.RPO.PREC", "fp32",
        ]
    )
    assert "Loading weights to prompt_learner" in stdout
    assert re.search(r"\* accuracy: ([\.\deE+-]+)%", stdout)
