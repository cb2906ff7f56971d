"""Smoke tests for the repo tools' build surfaces.

These pin the tool-facing signatures (profile_step's phase builders, the
reference-GPU bench harness) so library refactors can't silently rot
them: each tool is exercised end-to-end on CPU at tiny sizes.
"""
import argparse
import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


def _args(phase: str, batch: int) -> argparse.Namespace:
    return argparse.Namespace(
        phase=phase, steps=2, batch=batch, n_cls=5, k=4,
        backbone="TINY", trace_dir="/tmp/rpo_profile_test", top=5,
    )


@pytest.mark.parametrize(
    "phase,batch",
    [("train", 2), ("eval", 4), ("cocoop-train", 2), ("cocoop-eval", 4)],
)
def test_profile_step_build_phases(phase, batch):
    import profile_step

    run_one = profile_step.build(_args(phase, batch))
    out = np.asarray(run_one())
    assert np.all(np.isfinite(out))


def test_bench_reference_gpu_cpu_smoke():
    """The measurement recipe runs end-to-end on CPU (fp32, 1-layer
    towers) and emits the bench.py JSON schema."""
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "bench_reference_gpu.py"),
         "--device", "cpu", "--layers", "1", "--steps", "1", "--passes", "1",
         "--eval-batch", "2", "--n-cls", "3"],
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    rec = json.loads(proc.stdout.strip().splitlines()[-1])
    assert rec["metric"] == "reference_rpo_train_images_per_sec"
    assert rec["value"] > 0
    assert rec["extras"]["eval_images_per_sec"] > 0
    assert rec["extras"]["prec"] == "fp32"
