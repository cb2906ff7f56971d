"""CLI smoke for every registered trainer on the synthetic dataset."""
import os
import re

import pytest

from .test_engine_e2e import REPO, run_cli

COMMON = [
    "--seed", "1",
    "--dataset-config-file", "configs/datasets/synthetic.yaml",
    "DATASET.NUM_SHOTS", "2",
    "OPTIM.MAX_EPOCH", "1",
    "MODEL.BACKBONE.NAME", "TINY",
    "INPUT.SIZE", "(32, 32)",
    "DATALOADER.TRAIN_X.BATCH_SIZE", "8",
    "DATALOADER.TEST.BATCH_SIZE", "16",
]


def _acc(stdout: str) -> float:
    m = re.search(r"\* accuracy: ([\.\deE+-]+)%", stdout)
    assert m, stdout
    return float(m.group(1))


@pytest.mark.parametrize(
    "trainer,config,extra",
    [
        ("CoOp", "configs/trainers/CoOp/vit_b16_ep50.yaml", ["TRAINER.COOP.PREC", "fp32", "TRAINER.COOP.CLASS_TOKEN_POSITION", "end"]),
        ("CoOp", "configs/trainers/CoOp/vit_b16_ep50_ctxv1.yaml", ["TRAINER.COOP.PREC", "fp32"]),
        ("CoCoOp", "configs/trainers/CoCoOp/vit_b16_c4_ep10_batch1.yaml", ["TRAINER.COCOOP.PREC", "fp32", "DATALOADER.TRAIN_X.BATCH_SIZE", "4"]),
        ("LP", "configs/trainers/LP/vit_b16_c4_ep10_batch1.yaml", ["TRAINER.LP.PREC", "fp32", "DATALOADER.TRAIN_X.BATCH_SIZE", "4"]),
        # RN-backbone protocol family (reference configs/trainers/CoOp/rn50*.yaml)
        # on the tiny ModifiedResNet — exercises the resnet visual tower
        # through the full engine path, not just tower parity.
        ("CoOp", "configs/trainers/CoOp/rn50_ep50.yaml", ["TRAINER.COOP.PREC", "fp32", "MODEL.BACKBONE.NAME", "TINY_RN"]),
    ],
)
def test_trainer_cli_smoke(tmp_path, trainer, config, extra):
    out = str(tmp_path / trainer)
    stdout = run_cli(
        ["--trainer", trainer, "--config-file", config, "--output-dir", out]
        + COMMON
        + extra
    )
    assert "Finish training" in stdout
    _acc(stdout)
    # checkpoint written under the registered model name
    sub = {"CoOp": "prompt_learner", "CoCoOp": "prompt_learner", "LP": "lp_layer"}[trainer]
    assert os.path.exists(os.path.join(out, sub, "model.pth.tar-1"))


@pytest.mark.parametrize("trainer", ["ZeroshotCLIP", "ZeroshotCLIP2"])
def test_zeroshot_eval_only(tmp_path, trainer):
    out = str(tmp_path / trainer)
    stdout = run_cli(
        ["--trainer", trainer, "--eval-only", "--output-dir", out] + COMMON
    )
    _acc(stdout)
    assert "Finish training" not in stdout


def test_zeroshot_eval_only_resnet_backbone(tmp_path):
    out = str(tmp_path / "zs_rn")
    stdout = run_cli(
        ["--trainer", "ZeroshotCLIP", "--eval-only", "--output-dir", out]
        + COMMON
        + ["MODEL.BACKBONE.NAME", "TINY_RN"]
    )
    _acc(stdout)


def test_rpo_rejects_resnet_backbone(tmp_path):
    """RPO is ViT-only (the reference hardcodes the patch grid and d_v,
    rpo.py:78,140-159); an RN backbone must fail with a clear error, not
    a ZeroDivisionError from grid_size (TINY_RN has vision_patch_size=0
    like the real RN configs)."""
    import subprocess
    import sys

    env = dict(os.environ)
    env["RPO_TPU_FORCE_CPU"] = "1"
    proc = subprocess.run(
        [sys.executable, "train.py", "--trainer", "RPO",
         "--output-dir", str(tmp_path / "rpo_rn")]
        + COMMON[:-4]  # drop the batch-size overrides, keep dataset/backbone
        + ["MODEL.BACKBONE.NAME", "TINY_RN"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode != 0
    assert "RPO requires a ViT backbone" in (proc.stderr + proc.stdout)
