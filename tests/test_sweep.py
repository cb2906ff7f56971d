"""Sweep runner logic tests (job matrix, sharding, done detection)."""
import importlib.util
import os
import sys
import types


def _load_sweep():
    spec = importlib.util.spec_from_file_location(
        "_sweep", os.path.join(os.path.dirname(__file__), "..", "scripts", "sweep.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _args(**kw):
    defaults = dict(
        trainer="RPO", cfg="main_K24", datasets=["caltech101", "dtd"],
        seeds=[1, 2], shots=[16], load_epoch=15, root="", workers=1,
        retries=0, shard="",
    )
    defaults.update(kw)
    return types.SimpleNamespace(**defaults)


def test_job_matrix():
    sweep = _load_sweep()
    jobs = sweep.make_base2new_jobs(_args())
    # 2 datasets x 2 seeds x 1 shot x (train + test_base + test_new)
    assert len(jobs) == 12
    phases = {j["phase"] for j in jobs}
    assert phases == {"train", "test_base", "test_new"}
    train = [j for j in jobs if j["phase"] == "train"][0]
    assert "DATASET.SUBSAMPLE_CLASSES" in train["argv"]
    assert "base" in train["argv"]
    test_new = [j for j in jobs if j["phase"] == "test_new"][0]
    assert "--eval-only" in test_new["argv"]
    assert "--model-dir" in test_new["argv"]


def test_job_done_detection(tmp_path):
    sweep = _load_sweep()
    d = tmp_path / "out"
    assert not sweep.job_done(str(d))
    os.makedirs(d)
    (d / "log.txt").write_text("epoch [1/2] ...\n")
    assert not sweep.job_done(str(d))
    (d / "log.txt").write_text("...\nFinish training\n* accuracy: 50.0%\n")
    assert sweep.job_done(str(d))


def test_job_done_train_phase_needs_end_marker(tmp_path):
    """Per-epoch best-val evaluation prints '=> result' long before the
    final checkpoint lands — a killed training run must not be skipped."""
    sweep = _load_sweep()
    d = tmp_path / "out"
    os.makedirs(d)
    (d / "log.txt").write_text("=> result\n* accuracy: 40.0%\nepoch [2/15]...\n")
    assert sweep.job_done(str(d), "test_base")  # eval-only runs ARE done
    assert not sweep.job_done(str(d), "train")
    (d / "log.txt").write_text("...\nFinish training\n=> result\n* accuracy: 50.0%\n")
    assert sweep.job_done(str(d), "train")


def test_run_job_places_root_before_overrides(tmp_path, monkeypatch):
    """train.py's `opts` is argparse.REMAINDER: a trailing --root would be
    swallowed into the config-override list and crash every job."""
    sweep = _load_sweep()
    captured = {}

    def fake_run(argv, cwd=None):
        captured["argv"] = argv
        return types.SimpleNamespace(returncode=1)

    monkeypatch.setattr(sweep.subprocess, "run", fake_run)
    job = sweep.make_base2new_jobs(_args(root="/data"))[0]
    job["output_dir"] = str(tmp_path / "never")
    sweep.run_job(job, _args(root="/data"))
    argv = captured["argv"]
    root_i = argv.index("--root")
    first_opt_i = argv.index("DATASET.NUM_SHOTS")
    assert root_i < first_opt_i, argv


def test_sharding_partitions_matrix():
    sweep = _load_sweep()
    jobs = sweep.make_base2new_jobs(_args())
    keys = sorted({(j["dataset"], j["seed"], j["shot"]) for j in jobs})
    seen = set()
    for i in range(2):
        mine = {k for n, k in enumerate(keys) if n % 2 == i}
        assert mine, "each shard gets work"
        assert not (mine & seen)
        seen |= mine
    assert seen == set(keys)


def test_test_jobs_blocked_when_train_incomplete(tmp_path, monkeypatch, capsys):
    """A test job whose train run never completed must be reported as
    blocked, not launched (it would fail or evaluate a stale checkpoint
    from a previous sweep at the same train_dir)."""
    import pytest

    sweep = _load_sweep()
    launched = []
    monkeypatch.setattr(
        sweep, "run_job", lambda job, args: launched.append(job["output_dir"]) or True
    )
    monkeypatch.setattr(sweep, "REPO", str(tmp_path))
    monkeypatch.setattr(sweep.sys, "argv", [
        "sweep.py", "base2new", "--datasets", "dtd", "--seeds", "1",
        "--shots", "16", "--workers", "1",
    ])
    with pytest.raises(SystemExit) as exc:
        sweep.main()
    assert exc.value.code == 1  # blocked jobs fail the sweep
    out = capsys.readouterr().out
    # the train job ran; both test jobs were blocked, not launched
    assert len(launched) == 1 and "train_base" in launched[0]
    assert out.count("[blocked]") == 2


def test_completed_test_jobs_not_blocked_by_pruned_train_dir(tmp_path, monkeypatch, capsys):
    """Re-running a finished sweep after the train dirs were pruned (large
    checkpoints) must not report the completed test jobs as blocked: the
    phase-1 gate checks the test job's own completion before requiring a
    live train log, so the sweep re-verifies and exits 0."""
    sweep = _load_sweep()
    launched = []
    monkeypatch.setattr(
        sweep, "run_job", lambda job, args: launched.append(job["output_dir"]) or True
    )
    monkeypatch.setattr(sweep, "REPO", str(tmp_path))
    jobs = sweep.make_base2new_jobs(_args(datasets=["dtd"], seeds=[1]))
    done_log = "=> result\n* accuracy: 50.0%\nFinish training\n"
    for j in jobs:
        if j["phase"] != "train":
            os.makedirs(tmp_path / j["output_dir"])
            (tmp_path / j["output_dir"] / "log.txt").write_text(done_log)
        # train_dir is deliberately absent (pruned)
    monkeypatch.setattr(sweep.sys, "argv", [
        "sweep.py", "base2new", "--datasets", "dtd", "--seeds", "1",
        "--shots", "16", "--workers", "1",
    ])
    sweep.main()  # must NOT sys.exit(1)
    out = capsys.readouterr().out
    assert "[blocked]" not in out
    # all 3 jobs reached run_job (which skips the completed ones)
    assert len(launched) == 3
