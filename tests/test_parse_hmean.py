"""--hmean aggregates test_base/test_new only — a sibling train_base/
(whose training-run accuracy lines also follow an end signal) must not
enter the base mean (reference protocol: H = 2bn/(b+n) over TEST runs)."""
import os
import subprocess
import sys

from .test_engine_e2e import REPO


def _log(path, acc, train_run=False):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        if train_run:  # a real training log ends with the final test
            f.write("Finish training\n")
        f.write(f"=> result\n* accuracy: {acc:.1f}%\n")


def test_hmean_protocol_layout(tmp_path):
    """--hmean walks the sweep's real nested layout:
    <root>/test_{base,new}/<dataset>/shots_N/<trainer>/<cfg>/<seed>/log.txt."""
    root = tmp_path / "b2n"
    for sub, accs in (("test_base", (70.0, 90.0)), ("test_new", (60.0, 60.0))):
        for ds in ("caltech101", "dtd"):
            _log(
                str(root / sub / ds / "shots_16" / "RPO" / "main_K24" / "seed1" / "log.txt"),
                accs[0] if ds == "caltech101" else accs[1],
            )
    _log(str(root / "train_base" / "caltech101" / "shots_16" / "RPO" /
             "main_K24" / "seed1" / "log.txt"), 99.0, train_run=True)
    proc = subprocess.run(
        [sys.executable, "parse_test_res.py", str(root), "--hmean", "--test-log"],
        cwd=REPO, capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    h_lines = [l for l in proc.stdout.splitlines() if "harmonic mean" in l]
    assert len(h_lines) == 1
    # base mean 80, new mean 60 -> H = 68.57
    h = float(h_lines[0].split(":")[1].strip().rstrip("%"))
    assert abs(h - 2 * 80 * 60 / 140) < 0.01, h_lines[0]


def test_hmean_ignores_train_base(tmp_path):
    root = tmp_path / "collection"
    _log(str(root / "train_base" / "seed1" / "log.txt"), 99.0, train_run=True)
    _log(str(root / "test_base" / "seed1" / "log.txt"), 80.0)
    _log(str(root / "test_new" / "seed1" / "log.txt"), 60.0)
    proc = subprocess.run(
        [sys.executable, "parse_test_res.py", str(root), "--multi-exp", "--hmean",
         "--test-log"],
        cwd=REPO, capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    h_lines = [l for l in proc.stdout.splitlines() if "harmonic mean" in l]
    assert len(h_lines) == 1
    # H over (80, 60) = 68.57; with train_base wrongly included the base
    # mean would be 89.5 -> H = 71.84
    h = float(h_lines[0].split(":")[1].strip().rstrip("%"))
    assert abs(h - 2 * 80 * 60 / 140) < 0.01, h_lines[0]


def test_hmean_tolerates_in_progress_seed_dir(tmp_path):
    """An in-progress seed dir (created, no log.txt yet) next to completed
    seeds is skipped with a warning rather than crashing the aggregation;
    the walk also stops at a matched leaf so nested dirs can't be
    double-counted."""
    root = tmp_path / "b2n"
    _log(str(root / "test_base" / "seed1" / "log.txt"), 80.0)
    _log(str(root / "test_new" / "seed1" / "log.txt"), 60.0)
    # seed2 exists but its run hasn't produced a log yet
    os.makedirs(str(root / "test_base" / "seed2"))
    # and a seed log exists but hasn't reached the end signal
    os.makedirs(str(root / "test_new" / "seed2"))
    with open(str(root / "test_new" / "seed2" / "log.txt"), "w") as f:
        f.write("still training...\n")
    proc = subprocess.run(
        [sys.executable, "parse_test_res.py", str(root), "--hmean", "--test-log"],
        cwd=REPO, capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    h_lines = [l for l in proc.stdout.splitlines() if "harmonic mean" in l]
    assert len(h_lines) == 1
    h = float(h_lines[0].split(":")[1].strip().rstrip("%"))
    assert abs(h - 2 * 80 * 60 / 140) < 0.01, h_lines[0]


def test_hmean_without_test_log_flag(tmp_path):
    """--hmean must aggregate without --test-log: test_base/test_new are
    eval-only runs whose logs end with "=> result", never the train-log
    default "Finish training" (regression: the r3 on-TPU protocol run's
    plain `--hmean` invocation found zero completed leaves)."""
    root = tmp_path / "b2n"
    _log(str(root / "test_base" / "seed1" / "log.txt"), 80.0)
    _log(str(root / "test_new" / "seed1" / "log.txt"), 60.0)
    proc = subprocess.run(
        [sys.executable, "parse_test_res.py", str(root), "--hmean"],
        cwd=REPO, capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    h_lines = [l for l in proc.stdout.splitlines() if "harmonic mean" in l]
    assert len(h_lines) == 1, proc.stdout
    h = float(h_lines[0].split(":")[1].strip().rstrip("%"))
    assert abs(h - 2 * 80 * 60 / 140) < 0.01, h_lines[0]
