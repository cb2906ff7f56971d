"""Real-weights validation path (scripts/validate_real_weights.py).

Without weights (this offline environment) the script must exit 2 with a
precise diagnosis; its tower-parity machinery is unit-tested against a
small reference torch CLIP; with real weights present the full script is
exercised (skipped otherwise).
"""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "validate_real_weights.py")


def _have_real_weights() -> bool:
    from rpo_tpu.models.clip.pretrained import find_checkpoint

    return find_checkpoint("ViT-B/16") is not None


def test_script_diagnoses_missing_weights(tmp_path):
    env = dict(os.environ)
    env.pop("CLIP_CHECKPOINT", None)
    env.pop("RPO_TPU_ALLOW_DOWNLOAD", None)
    env["CLIP_CACHE_DIR"] = str(tmp_path / "empty_cache")
    env["JAX_PLATFORMS"] = "cpu"
    env["RPO_TPU_FORCE_CPU"] = "1"  # env JAX_PLATFORMS is ignored here (CLAUDE.md)
    proc = subprocess.run(
        [sys.executable, SCRIPT], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 2, proc.stdout + proc.stderr
    assert "No real weights" in proc.stdout
    assert "$CLIP_CHECKPOINT" in proc.stdout


def test_torch_tower_parity_machinery(tmp_path):
    """Stage-2 machinery on a small random torch CLIP: the same state
    dict through convert.load_clip and the reference build_model must
    produce matching towers (weights need not be trained for parity)."""
    import torch

    sys.path.insert(0, REPO)
    from scripts.validate_real_weights import torch_tower_parity
    from tests.oracle import make_small_torch_clip

    model, params, cfg = make_small_torch_clip(seed=3)
    path = str(tmp_path / "small_clip.pt")
    torch.save(model.state_dict(), path)

    from rpo_tpu.models.clip.convert import load_clip

    jparams, jcfg = load_clip(path)
    assert jcfg.image_resolution == cfg.image_resolution
    torch_tower_parity(path, jparams, jcfg)


@pytest.mark.skipif(not _have_real_weights(), reason="no real CLIP weights on host")
def test_full_script_with_real_weights():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["RPO_TPU_FORCE_CPU"] = "1"  # env JAX_PLATFORMS is ignored here (CLAUDE.md)
    proc = subprocess.run(
        [sys.executable, SCRIPT], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=1200,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "semantic smoke: OK" in proc.stdout
